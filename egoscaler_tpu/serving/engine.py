"""Continuous-batching decode engine for TrajPointLLM (TPU serving).

Beyond-parity subsystem: the reference serves its model through a
single-request gradio chat (pointllm/eval/chat_gradio.py) and a batch
evaluate loop (models/pointllm/evaluate.py:97-170) — there is no
concurrent-request path.  This engine is the TPU-native production
answer:

* a fixed pool of ``num_slots`` decode slots shares ONE compiled
  decode program (static shapes — XLA never recompiles as requests
  come and go);
* every slot decodes at its OWN position: ``decode_step`` takes a
  ``(B,)`` cache-index vector (per-slot rotary positions, per-slot
  causal masks, one scatter row per slot into the stacked KV cache —
  models/llama.py);
* admission = a batched prefill whose KV blocks are scattered into
  the admitted slots' cache lanes, while the other slots' state is
  untouched; prefill programs are compiled per power-of-two admission
  size (a "ladder": 1, 2, 4, ... num_slots), so a burst of arrivals
  shares one MXU-efficient prefill instead of B=1 dispatches;
* the host syncs once per decode CHUNK (a ``lax.scan`` on device),
  not per token — through a remote relay a per-token fetch would cost
  more than the decode itself; chunk length is picked per step from a
  small compiled ladder to track the minimum remaining budget across
  active slots (few syncs on long tails, fine-grained slot release
  near the end);
* all device state (cache, masks, token/index/done vectors) is donated
  through both programs, so serving steady-state allocates nothing;
* the scheduler DISPATCHES AHEAD: slot-release times are predicted
  from per-request budgets, so prefills and decode chunks enqueue on
  the device while earlier chunks' token fetches complete in the
  background (bounded by ``lookahead``) — the ~30 ms relay fetch hides
  under device compute instead of serializing the loop.

Slot reuse needs no cache scrubbing: a position's K/V row is always
rewritten by the new request before its causal mask can see it.

Speculative mode (``draft_model=``): each dispatch runs a lax.scan of
``chunk`` draft-propose/target-verify rounds (serving/speculative.py
semantics, greedy-exact per slot) and returns ONE packed int32 array
``(B, chunk, k+2)`` = [count | k+1 token lanes] — a single relay fetch
per dispatch no matter how many tokens a round accepts.  Slots advance
by a variable ``a+1`` tokens per round, so slot release is
harvest-driven (a finished request is discovered when its chunk is
fetched) instead of budget-predicted; the dispatch-ahead window bounds
the extra speculative rounds a finished lane burns.  Composes with
``weight_quant="int8"`` params — speculation amortizes the per-step
weight read, int8 halves it.
"""
from __future__ import annotations

import dataclasses
from collections import deque
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from egoscaler_tpu.models.llama import init_kv_cache
from egoscaler_tpu.models.pointllm import (
    GenerateConfig,
    TrajPointLLM,
    sample_token,
)


@dataclasses.dataclass
class _Request:
    req_id: int
    input_ids: np.ndarray      # (P,) int32, right-padded
    prompt_mask: np.ndarray    # (P,) bool
    point_cloud: np.ndarray    # (N, 6) float32
    budget: int                # max new tokens for THIS request


@dataclasses.dataclass
class _SlotState:
    req_id: int
    tokens: List[int]
    budget: int
    finished: bool = False
    ticks_alloc: int = 0   # decode ticks DISPATCHED for this request
    delivered: bool = False


class ServingEngine:
    """Fixed-slot continuous batching over one compiled decode program.

    Parameters
    ----------
    model, params: the TrajPointLLM and its param tree.
    num_slots: concurrent decode lanes (the static batch dimension).
    prompt_len: static prompt length P (shorter prompts right-pad with
        ``prompt_mask`` False — mid-prompt pads are honored by the
        attention kv-mask exactly as in training, dataset.py:150-194).
    gen: sampling config; ``max_new_tokens`` bounds each request.
    chunk: MAX decode ticks per host sync (the top of the compiled
        chunk ladder; actual chunk length adapts per step).
    auto_param_layouts: compile the decode program with AUTO input
        layouts, MATERIALIZE params/state in the layouts it declares,
        and pin every other program to them (runtime/layouts.py).  At
        7B, default layouts make XLA insert ~3.2 GiB of in-program
        transposed weight copies — over HBM on one chip; AUTO layouts
        are how the 7B engine fits (same trick as scripts/run_7b_chip).
        Donation keeps state layouts stable across the program ladder
        (an aliased output inherits its input's layout).
    donate_params: with auto_param_layouts, DELETE the caller's param
        buffers as each leaf is relayouted (peak extra HBM = one leaf —
        required at 7B, where a second param copy cannot coexist).
        Default False: the caller's tree stays valid, at the cost of a
        transient full copy.
    """

    def __init__(
        self,
        model: TrajPointLLM,
        params: Any,
        *,
        num_slots: int,
        prompt_len: int,
        gen: GenerateConfig = GenerateConfig(),
        chunk: int = 8,
        cache_dtype=jnp.bfloat16,
        seed: int = 0,
        lookahead: int = 2,
        auto_param_layouts: bool = False,
        donate_params: bool = False,
        draft_model: Optional[TrajPointLLM] = None,
        draft_params: Any = None,
        spec_k: int = 4,
        param_shardings: Any = None,
    ):
        self.model = model
        self.params = params
        self.num_slots = num_slots
        self.prompt_len = prompt_len
        self.gen = gen
        self.chunk = chunk
        self._key = jax.random.PRNGKey(seed)
        self._spec = draft_model is not None
        self.spec_k = spec_k
        if self._spec:
            if gen.do_sample:
                raise ValueError(
                    "speculative serving is greedy-exact; use "
                    "GenerateConfig(do_sample=False)"
                )
            if auto_param_layouts:
                raise ValueError(
                    "auto_param_layouts is not supported in speculative "
                    "mode (int8 params fit 7B without it)"
                )
        # spec verify chunks write up to k+1 slots past the accepted
        # prefix — the cache carries that slack (serving ticks stop at
        # prompt_len + max_new, so writes stay in bounds)
        t_max = prompt_len + gen.max_new_tokens + (
            spec_k + 1 if self._spec else 0
        )
        self.t_max = t_max

        b = num_slots
        self._cache = init_kv_cache(model.cfg.llama, b, t_max, cache_dtype)
        self._kv_mask = jnp.zeros((b, t_max), bool)
        self._tokens = jnp.zeros((b,), jnp.int32)
        self._indices = jnp.zeros((b,), jnp.int32)
        self._done = jnp.ones((b,), bool)

        # Mesh serving: place params under the given NamedShardings
        # (e.g. Megatron TP rules from parallel.sharding.param_shardings)
        # and replicate the engine state over the same device set so one
        # compiled decode program runs TP-sharded.  Cache shards follow
        # from XLA propagation (KV heads split over `model`).
        if param_shardings is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            if auto_param_layouts:
                raise ValueError(
                    "param_shardings and auto_param_layouts are mutually "
                    "exclusive (AUTO layouts are a single-chip path)"
                )
            self.params = jax.device_put(self.params, param_shardings)
            mesh = jax.tree_util.tree_leaves(param_shardings)[0].mesh
            rep = NamedSharding(mesh, PartitionSpec())
            self._cache = jax.device_put(self._cache, rep)
            self._kv_mask = jax.device_put(self._kv_mask, rep)
            self._tokens = jax.device_put(self._tokens, rep)
            self._indices = jax.device_put(self._indices, rep)
            self._done = jax.device_put(self._done, rep)

        self._queue: deque[_Request] = deque()
        self._slots: List[Optional[_SlotState]] = [None] * b
        self._results: Dict[int, np.ndarray] = {}
        self._next_id = 0
        # dispatch-ahead: decode chunks in flight whose emitted tokens
        # have not been fetched yet — (device array, slot snapshot)
        self._inflight: deque = deque()
        self.lookahead = lookahead

        gen_args = (gen.temperature, gen.top_k, gen.top_p, gen.do_sample)

        def make_prefill_prog(k):
            def prefill_prog(params, cache, kv_mask, tokens, indices,
                             done, slots_, ids, pmask, pc, key):
                # batched prefill of k requests into a private cache,
                # scattered into the admitted slot lanes; the other
                # slots' state is untouched.
                small = init_kv_cache(
                    model.cfg.llama, k, t_max, cache_dtype
                )
                full_mask = jnp.concatenate(
                    [pmask.astype(bool),
                     jnp.ones((k, t_max - prompt_len), bool)], axis=1,
                )
                logits, small = model.apply(
                    params, ids, pc, full_mask, small,
                    method=TrajPointLLM.prefill,
                )
                cache = jax.tree_util.tree_map(
                    lambda full, sm: full.at[:, slots_].set(sm),
                    cache, small,
                )  # generic over bf16 {k,v} and KV8 {k,v,*_scale}
                kv_mask = kv_mask.at[slots_].set(full_mask)
                tok = sample_token(logits, key, *gen_args)  # (k,)
                tokens = tokens.at[slots_].set(tok)
                indices = indices.at[slots_].set(prompt_len)
                done = done.at[slots_].set(tok == gen.eos_token_id)
                return cache, kv_mask, tokens, indices, done

            return prefill_prog

        # prefill ladder: one compiled program per power-of-two
        # admission size (built lazily; warmup() precompiles)
        self._prefill_ladder = {}
        self._make_prefill_prog = make_prefill_prog

        def make_decode_prog(length):
            def decode_chunk_prog(params, cache, kv_mask, tokens, indices,
                                  done, key):
                def tick(carry, _):
                    tok, cache, indices, done, key = carry
                    key, sub = jax.random.split(key)
                    logits, cache = model.apply(
                        params, tok, indices, kv_mask, cache,
                        method=TrajPointLLM.decode_step,
                    )
                    nxt = sample_token(logits, sub, *gen_args)
                    nxt = jnp.where(done, gen.eos_token_id, nxt)
                    emitted = tok
                    done = done | (nxt == gen.eos_token_id)
                    indices = indices + 1
                    return (nxt, cache, indices, done, key), emitted

                (tok, cache, indices, done, key), toks = jax.lax.scan(
                    tick, (tokens, cache, indices, done, key),
                    None, length=length,
                )
                return cache, tok, indices, done, jnp.swapaxes(toks, 0, 1)

            return decode_chunk_prog

        # decode-chunk ladder: compiled scan programs of a few lengths;
        # step() picks one queue-aware (see step()).
        self._decode_sizes = sorted({
            max(chunk // d, 1) for d in (1, 2, 4, 8, 16)
        })
        self._decode_ladder = {}
        self._make_decode_prog = make_decode_prog
        self._auto = auto_param_layouts
        self._donate_params = donate_params
        self._fmt = None  # input formats chosen by the first AUTO compile

        if self._spec:
            self.draft_model = draft_model
            self.draft_params = draft_params
            self._dcache = init_kv_cache(
                draft_model.cfg.llama, b, t_max, cache_dtype
            )
            eos = gen.eos_token_id
            cap = prompt_len + gen.max_new_tokens

            def make_spec_prefill_prog(kk):
                def prog(params, dparams, cache, dcache, kv_mask, tokens,
                         indices, done, slots_, ids, pmask, pc):
                    small = init_kv_cache(
                        model.cfg.llama, kk, t_max, cache_dtype
                    )
                    dsmall = init_kv_cache(
                        draft_model.cfg.llama, kk, t_max, cache_dtype
                    )
                    full_mask = jnp.concatenate(
                        [pmask.astype(bool),
                         jnp.ones((kk, t_max - prompt_len), bool)], axis=1,
                    )
                    logits, small = model.apply(
                        params, ids, pc, full_mask, small,
                        method=TrajPointLLM.prefill,
                    )
                    _, dsmall = draft_model.apply(
                        dparams, ids, pc, full_mask, dsmall,
                        method=TrajPointLLM.prefill,
                    )
                    cache = jax.tree_util.tree_map(
                        lambda full, sm: full.at[:, slots_].set(sm),
                        cache, small,
                    )
                    dcache = jax.tree_util.tree_map(
                        lambda full, sm: full.at[:, slots_].set(sm),
                        dcache, dsmall,
                    )
                    kv_mask = kv_mask.at[slots_].set(full_mask)
                    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    tokens = tokens.at[slots_].set(tok)
                    indices = indices.at[slots_].set(prompt_len)
                    done = done.at[slots_].set(tok == eos)
                    return (cache, dcache, kv_mask, tokens, indices, done,
                            tok)
                return prog

            self._make_spec_prefill_prog = make_spec_prefill_prog

            def make_spec_prog(m):
                kk = spec_k
                jidx = jnp.arange(kk + 1, dtype=jnp.int32)[None, :]

                def spec_prog(params, dparams, tcache, dcache, kv_mask,
                              tokens, indices, done):
                    def round_(carry, _):
                        tok, tc, dc, idx, dn = carry

                        # draft: k proposals + 1 ingest (speculative.py)
                        def dstep(c2, _):
                            t2, dc2, pos = c2
                            lg, dc2 = draft_model.apply(
                                dparams, t2, pos, kv_mask, dc2,
                                method=TrajPointLLM.decode_step,
                            )
                            nxt = jnp.argmax(lg, -1).astype(jnp.int32)
                            return (nxt, dc2, pos + 1), nxt

                        (_, dc, _), drafts = jax.lax.scan(
                            dstep, (tok, dc, idx), None, length=kk + 1
                        )
                        drafts = jnp.swapaxes(drafts[:kk], 0, 1)  # (B, k)

                        chunk_in = jnp.concatenate(
                            [tok[:, None], drafts], axis=1
                        )
                        lg, tc = model.apply(
                            params, chunk_in, idx, kv_mask, tc,
                            method=TrajPointLLM.decode_chunk,
                        )
                        greedy = jnp.argmax(lg, -1).astype(jnp.int32)
                        match = (drafts == greedy[:, :kk]).astype(jnp.int32)
                        a = jnp.sum(jnp.cumprod(match, axis=1), axis=1)
                        bonus = jnp.take_along_axis(
                            greedy, a[:, None], axis=1
                        )[:, 0]
                        drafts_p = jnp.concatenate(
                            [drafts, jnp.zeros((b, 1), jnp.int32)], axis=1
                        )
                        emit = jnp.where(
                            jidx < a[:, None], drafts_p,
                            jnp.where(jidx == a[:, None],
                                      bonus[:, None], eos),
                        )
                        iseos = emit == eos
                        seen = (jnp.cumsum(iseos.astype(jnp.int32), axis=1)
                                - iseos) > 0
                        emit = jnp.where(seen, eos, emit)
                        last_new = jnp.take_along_axis(
                            emit, a[:, None], axis=1
                        )[:, 0]

                        active = ~dn
                        adv = jnp.where(active, a + 1, 0)
                        idx = idx + adv
                        dn = dn | (last_new == eos) | (idx > cap)
                        tok = jnp.where(active, last_new, tok)
                        # packed row: [emitted count | k+1 token lanes]
                        row = jnp.concatenate(
                            [adv[:, None],
                             jnp.where(active[:, None], emit, eos)],
                            axis=1,
                        )  # (B, k+2)
                        return (tok, tc, dc, idx, dn), row

                    (tokens, tcache, dcache, indices, done), rows = (
                        jax.lax.scan(
                            round_,
                            (tokens, tcache, dcache, indices, done),
                            None, length=m,
                        )
                    )
                    return (tcache, dcache, tokens, indices, done,
                            jnp.swapaxes(rows, 0, 1))  # (B, m, k+2)

                return spec_prog

            self._make_spec_prog = make_spec_prog

    # ---- internals ----

    def _decode_args(self, key):
        return (self.params, self._cache, self._kv_mask, self._tokens,
                self._indices, self._done, key)

    @staticmethod
    def _aot(fn, example_args, donate, in_shardings, out_shardings=None):
        import jax.tree_util as jtu

        kw = {} if out_shardings is None else {
            "out_shardings": out_shardings
        }
        jf = jax.jit(fn, in_shardings=in_shardings, donate_argnums=donate,
                     **kw)
        abstract = jtu.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), example_args
        )
        return jf.lower(*abstract).compile()

    def _establish_formats(self) -> None:
        """AUTO-compile the top decode program, materialize params AND
        engine state in the layouts it declares, and remember them so
        every other ladder program is pinned to the same formats."""
        if self._fmt is not None:
            return
        from jax.experimental.layout import Format, Layout

        from egoscaler_tpu.runtime.layouts import relayout_tree

        c = self._decode_sizes[-1]
        key = jax.random.PRNGKey(0)
        compiled = self._aot(
            self._make_decode_prog(c), self._decode_args(key),
            donate=(1, 3, 4, 5), in_shardings=Format(Layout.AUTO),
            out_shardings=Format(Layout.AUTO),
        )
        fmt = compiled.input_formats[0]
        # leaf-by-leaf relayout (with donate_params, peak extra HBM =
        # one leaf; otherwise the caller's buffers are left intact)
        self.params = relayout_tree(
            self.params, fmt[0], delete_src=self._donate_params
        )
        self._cache = relayout_tree(self._cache, fmt[1])
        self._kv_mask = relayout_tree(self._kv_mask, fmt[2])
        self._tokens = relayout_tree(self._tokens, fmt[3])
        self._indices = relayout_tree(self._indices, fmt[4])
        self._done = relayout_tree(self._done, fmt[5])
        self._fmt = fmt
        self._decode_ladder[c] = compiled

    def _get_decode(self, c: int):
        prog = self._decode_ladder.get(c)
        if prog is not None:
            return prog
        if self._spec:
            prog = jax.jit(
                self._make_spec_prog(c), donate_argnums=(2, 3, 5, 6, 7)
            )
            self._decode_ladder[c] = prog
            return prog
        fn = self._make_decode_prog(c)
        if not self._auto:
            prog = jax.jit(fn, donate_argnums=(1, 3, 4, 5))
        else:
            self._establish_formats()
            prog = self._decode_ladder.get(c)
            if prog is None:  # another size than the top one
                prog = self._aot(
                    fn, self._decode_args(jax.random.PRNGKey(0)),
                    donate=(1, 3, 4, 5), in_shardings=self._fmt,
                )
        self._decode_ladder[c] = prog
        return prog

    def _get_prefill(self, k: int):
        prog = self._prefill_ladder.get(k)
        if prog is not None:
            return prog
        if self._spec:
            prog = jax.jit(
                self._make_spec_prefill_prog(k),
                donate_argnums=(2, 3, 4, 5, 6, 7),
            )
            self._prefill_ladder[k] = prog
            return prog
        fn = self._make_prefill_prog(k)
        if not self._auto:
            prog = jax.jit(fn, donate_argnums=(1, 2, 3, 4, 5))
        else:
            self._establish_formats()
            npts = self.model.cfg.point_bert.npoints
            example = (
                self.params, self._cache, self._kv_mask, self._tokens,
                self._indices, self._done,
                jnp.zeros((k,), jnp.int32),
                jnp.zeros((k, self.prompt_len), jnp.int32),
                jnp.zeros((k, self.prompt_len), bool),
                jnp.zeros((k, npts, 6), jnp.float32),
                jax.random.PRNGKey(0),
            )
            pinned = self._fmt[:6] + (None,) * 5
            prog = self._aot(
                fn, example, donate=(1, 2, 3, 4, 5), in_shardings=pinned,
            )
        self._prefill_ladder[k] = prog
        return prog

    def _ladder_sizes(self) -> List[int]:
        sizes, k = [], 1
        while k < self.num_slots:
            sizes.append(k)
            k *= 2
        sizes.append(self.num_slots)
        return sizes

    def _admit(self, free: List[int]) -> None:
        """Prefill queued requests into free slots, largest
        power-of-two groups first (one compiled program per size)."""
        while free and self._queue:
            n = min(len(free), len(self._queue))
            k = max(s for s in self._ladder_sizes() if s <= n)
            slots_ = free[:k]
            free = free[k:]
            reqs = [self._queue.popleft() for _ in range(k)]
            prog = self._get_prefill(k)
            if self._spec:
                (self._cache, self._dcache, self._kv_mask, self._tokens,
                 self._indices, self._done, first_tok) = prog(
                    self.params, self.draft_params, self._cache,
                    self._dcache, self._kv_mask, self._tokens,
                    self._indices, self._done,
                    jnp.asarray(slots_, jnp.int32),
                    jnp.asarray(np.stack([r.input_ids for r in reqs])),
                    jnp.asarray(np.stack([r.prompt_mask for r in reqs])),
                    jnp.asarray(np.stack([r.point_cloud for r in reqs])),
                )
                # spec rounds emit tokens AFTER the prefill sample; the
                # sample itself is delivered here (one fetch per
                # admission batch, amortized over the request lifetime)
                first_tok = np.asarray(first_tok)
                for s, req, t0 in zip(slots_, reqs, first_tok):
                    st = _SlotState(req.req_id, [], req.budget)
                    self._slots[s] = st
                    st.tokens.append(int(t0))
                    if (int(t0) == self.gen.eos_token_id
                            or len(st.tokens) >= st.budget):
                        st.finished = True
                        st.delivered = True
                        self._results[st.req_id] = np.asarray(
                            st.tokens, np.int32
                        )
                continue
            self._key, sub = jax.random.split(self._key)
            (self._cache, self._kv_mask, self._tokens, self._indices,
             self._done) = prog(
                self.params, self._cache, self._kv_mask, self._tokens,
                self._indices, self._done,
                jnp.asarray(slots_, jnp.int32),
                jnp.asarray(np.stack([r.input_ids for r in reqs])),
                jnp.asarray(np.stack([r.prompt_mask for r in reqs])),
                jnp.asarray(np.stack([r.point_cloud for r in reqs])),
                sub,
            )
            for s, req in zip(slots_, reqs):
                self._slots[s] = _SlotState(req.req_id, [], req.budget)

    # ---- public API ----

    def warmup(self) -> None:
        """Precompile every prefill-ladder size and every decode-chunk
        size so serving latency never pays a compile.  Runs real
        (dummy) requests through the engine."""
        zeros_pc = np.zeros(
            (self.model.cfg.point_bert.npoints, 6), np.float32
        )
        ids = np.zeros((self.prompt_len,), np.int32)
        pmask = np.ones((self.prompt_len,), bool)
        for k in self._ladder_sizes():
            for _ in range(k):
                self.submit(ids, pmask, zeros_pc, max_new_tokens=1)
            self.run()
        if self._spec:
            # budget-1 requests finish at admission (the prefill sample
            # fills them), so spec round programs are AOT-compiled here
            import jax.tree_util as jtu

            args = (self.params, self.draft_params, self._cache,
                    self._dcache, self._kv_mask, self._tokens,
                    self._indices, self._done)
            abstract = jtu.tree_map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), args
            )
            for c in self._decode_sizes:
                if c not in self._decode_ladder:
                    jf = jax.jit(self._make_spec_prog(c),
                                 donate_argnums=(2, 3, 5, 6, 7))
                    self._decode_ladder[c] = jf.lower(*abstract).compile()
            return
        for c in self._decode_sizes:
            self.submit(ids, pmask, zeros_pc,
                        max_new_tokens=min(c, self.gen.max_new_tokens))
            self.run()

    def submit(self, input_ids, prompt_mask, point_cloud,
               max_new_tokens: Optional[int] = None) -> int:
        """Queue a request; returns its id.  ``input_ids`` is (P,) int32
        right-padded, ``prompt_mask`` (P,) bool, ``point_cloud`` (N, 6).

        ``max_new_tokens`` is this request's OWN decode budget (default:
        the engine-wide ``gen.max_new_tokens``).  Per-request budgets are
        the point of continuous batching: a short request frees its slot
        early and a queued request is admitted into it, while a static
        batch would idle the lane until the longest member finishes."""
        ids = np.asarray(input_ids, np.int32)
        if ids.shape != (self.prompt_len,):
            raise ValueError(
                f"prompt must be shape ({self.prompt_len},), got {ids.shape}"
            )
        budget = (self.gen.max_new_tokens if max_new_tokens is None
                  else int(max_new_tokens))
        if not 0 < budget <= self.gen.max_new_tokens:
            raise ValueError(
                f"max_new_tokens must be in (0, {self.gen.max_new_tokens}] "
                f"(the cache is sized for the engine-wide max), got {budget}"
            )
        rid = self._next_id
        self._next_id += 1
        self._queue.append(_Request(
            rid, ids, np.asarray(prompt_mask, bool),
            np.asarray(point_cloud, np.float32), budget,
        ))
        return rid

    @property
    def pending(self) -> bool:
        return (bool(self._queue) or bool(self._inflight)
                or any(s is not None for s in self._slots))

    @staticmethod
    def _is_ready(arr) -> bool:
        try:
            return arr.is_ready()
        except AttributeError:  # older jax.Array without is_ready
            return False

    def _harvest(self, emitted, snapshot) -> None:
        """Fetch one in-flight chunk's tokens (blocking if the device is
        still on it) and append them to the snapshot's slot states.

        Non-spec: ``emitted`` is (B, c), one token per tick.  Spec:
        ``emitted`` is (B, m, k+2) packed rounds — [count | tokens];
        only the first ``count`` tokens of a round are real."""
        emitted = np.asarray(emitted)
        for slot, st in snapshot:
            if self._spec:
                toks = []
                for row in emitted[slot]:
                    toks.extend(row[1:1 + int(row[0])].tolist())
            else:
                toks = emitted[slot]
            for tok in toks:
                if st.finished:
                    break
                tok = int(tok)
                st.tokens.append(tok)
                if (tok == self.gen.eos_token_id
                        or len(st.tokens) >= st.budget):
                    st.finished = True
            if st.finished and not st.delivered:
                st.delivered = True
                self._results[st.req_id] = np.asarray(st.tokens, np.int32)

    def step(self) -> None:
        """One scheduler iteration: drain ready fetches, admit queued
        requests into predictably-free slots, dispatch one decode chunk
        — WITHOUT waiting for it.

        Dispatch-ahead: slot release times are computed from per-request
        BUDGETS (`ticks_alloc`), not from fetched tokens, so admissions
        and decode chunks are enqueued on the device while earlier
        chunks' token fetches overlap device compute (through a remote
        relay a synchronous fetch costs ~30 ms — more than several
        decode ticks).  An eos that lands before the budget is only
        discovered at harvest: the lane idles its remaining planned
        ticks, exactly the padding waste a static batch pays — never
        wrong tokens, since harvest truncates at the first eos.
        """
        # 1. drain fetches that are already on the host side; bound the
        # dispatch-ahead window (deep queues add latency, no throughput)
        while self._inflight and (
            len(self._inflight) > self.lookahead
            or self._is_ready(self._inflight[0][0])
        ):
            self._harvest(*self._inflight.popleft())

        # 2. admission into predictably-free slots
        free = []
        for i, st in enumerate(self._slots):
            if st is None:
                free.append(i)
            elif st.ticks_alloc >= st.budget or (
                self._spec and st.finished
            ):
                # request's planned ticks fully dispatched (spec: every
                # round emits >=1 token, so `budget` rounds always
                # finish it; harvest-driven `finished` releases earlier
                # when long prefixes were accepted) — its tokens live in
                # _inflight snapshots; the LANE is reusable (the new
                # prefill rewrites it strictly after the old chunks)
                self._slots[i] = None
                free.append(i)
        if free and self._queue:
            self._admit(free)

        active = [(i, st) for i, st in enumerate(self._slots)
                  if st is not None]
        if not active:
            if self._inflight:  # nothing to dispatch: make progress
                self._harvest(*self._inflight.popleft())
            return

        # 3. chunk-size policy (queue-aware).  Overshooting a lane's
        # budget inside a chunk wastes that lane's ticks, never emits
        # wrong tokens; it only COSTS anything when a queued request
        # could have used the slot.
        #   queue waiting -> smallest compiled size covering the MIN
        #     remaining budget (release slots promptly);
        #   queue empty  -> largest size not overshooting the MAX
        #     remaining budget (nobody is waiting; fewer fetches wins).
        rems = [st.budget - st.ticks_alloc for _, st in active]
        if self._queue:
            c = next(
                (s for s in self._decode_sizes if s >= min(rems)),
                self._decode_sizes[-1],
            )
        else:
            fits = [s for s in self._decode_sizes if s <= max(rems)]
            c = fits[-1] if fits else self._decode_sizes[0]
        prog = self._get_decode(c)
        if self._spec:
            (self._cache, self._dcache, self._tokens, self._indices,
             self._done, emitted) = prog(
                self.params, self.draft_params, self._cache, self._dcache,
                self._kv_mask, self._tokens, self._indices, self._done,
            )
        else:
            self._key, sub = jax.random.split(self._key)
            (self._cache, self._tokens, self._indices, self._done,
             emitted) = prog(*self._decode_args(sub))
        for _, st in active:
            st.ticks_alloc += c
        self._inflight.append((emitted, active))

    def take_results(self) -> Dict[int, np.ndarray]:
        """Pop completed requests: {req_id: generated tokens}."""
        out, self._results = self._results, {}
        return out

    def run(self) -> Dict[int, np.ndarray]:
        """Drive until every submitted request completes; returns
        {req_id: generated tokens (eos-terminated or budget-truncated)}."""
        while self.pending:
            self.step()
        return self.take_results()
