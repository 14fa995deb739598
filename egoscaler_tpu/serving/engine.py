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
* admission = a B=1 prefill whose KV block is scattered into the
  slot's cache lane, while the other slots' state is untouched;
* the host syncs once per ``chunk`` decode ticks (a ``lax.scan`` on
  device), not per token — through a remote relay a per-token fetch
  would cost more than the decode itself;
* all device state (cache, masks, token/index/done vectors) is donated
  through both programs, so serving steady-state allocates nothing.

Slot reuse needs no cache scrubbing: a position's K/V row is always
rewritten by the new request before its causal mask can see it.
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


@dataclasses.dataclass
class _SlotState:
    req_id: int
    tokens: List[int]
    finished: bool = False


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
    chunk: decode ticks per host sync.
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
    ):
        self.model = model
        self.params = params
        self.num_slots = num_slots
        self.prompt_len = prompt_len
        self.gen = gen
        self.chunk = chunk
        self._key = jax.random.PRNGKey(seed)
        t_max = prompt_len + gen.max_new_tokens
        self.t_max = t_max

        b = num_slots
        self._cache = init_kv_cache(model.cfg.llama, b, t_max, cache_dtype)
        self._kv_mask = jnp.zeros((b, t_max), bool)
        self._tokens = jnp.zeros((b,), jnp.int32)
        self._indices = jnp.zeros((b,), jnp.int32)
        self._done = jnp.ones((b,), bool)

        self._queue: deque[_Request] = deque()
        self._slots: List[Optional[_SlotState]] = [None] * b
        self._results: Dict[int, np.ndarray] = {}
        self._next_id = 0

        gen_args = (gen.temperature, gen.top_k, gen.top_p, gen.do_sample)

        def prefill_prog(params, cache, kv_mask, tokens, indices, done,
                         slot, ids, pmask, pc, key):
            # B=1 prefill into a private cache, scattered into the slot
            # lane; other slots' state is untouched.
            small = init_kv_cache(model.cfg.llama, 1, t_max, cache_dtype)
            full_mask1 = jnp.concatenate(
                [pmask.astype(bool)[None],
                 jnp.ones((1, t_max - prompt_len), bool)], axis=1,
            )
            logits, small = model.apply(
                params, ids[None], pc[None], full_mask1, small,
                method=TrajPointLLM.prefill,
            )
            cache = {
                "k": cache["k"].at[:, slot].set(small["k"][:, 0]),
                "v": cache["v"].at[:, slot].set(small["v"][:, 0]),
            }
            kv_mask = kv_mask.at[slot].set(full_mask1[0])
            tok = sample_token(logits, key, *gen_args)[0]
            tokens = tokens.at[slot].set(tok)
            indices = indices.at[slot].set(prompt_len)
            done = done.at[slot].set(tok == gen.eos_token_id)
            return cache, kv_mask, tokens, indices, done

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
                None, length=chunk,
            )
            return cache, tok, indices, done, jnp.swapaxes(toks, 0, 1)

        self._prefill = jax.jit(prefill_prog, donate_argnums=(1, 2, 3, 4, 5))
        self._decode_chunk = jax.jit(decode_chunk_prog,
                                     donate_argnums=(1, 3, 4, 5))

    # ---- public API ----

    def submit(self, input_ids, prompt_mask, point_cloud) -> int:
        """Queue a request; returns its id.  ``input_ids`` is (P,) int32
        right-padded, ``prompt_mask`` (P,) bool, ``point_cloud`` (N, 6)."""
        ids = np.asarray(input_ids, np.int32)
        if ids.shape != (self.prompt_len,):
            raise ValueError(
                f"prompt must be shape ({self.prompt_len},), got {ids.shape}"
            )
        rid = self._next_id
        self._next_id += 1
        self._queue.append(_Request(
            rid, ids, np.asarray(prompt_mask, bool),
            np.asarray(point_cloud, np.float32),
        ))
        return rid

    @property
    def pending(self) -> bool:
        return bool(self._queue) or any(
            s is not None for s in self._slots
        )

    def step(self) -> None:
        """Admit queued requests into free slots, then run one decode
        chunk and harvest emitted tokens."""
        for slot in range(self.num_slots):
            if self._slots[slot] is None and self._queue:
                req = self._queue.popleft()
                self._key, sub = jax.random.split(self._key)
                (self._cache, self._kv_mask, self._tokens, self._indices,
                 self._done) = self._prefill(
                    self.params, self._cache, self._kv_mask, self._tokens,
                    self._indices, self._done,
                    jnp.asarray(slot, jnp.int32),
                    jnp.asarray(req.input_ids),
                    jnp.asarray(req.prompt_mask),
                    jnp.asarray(req.point_cloud), sub,
                )
                self._slots[slot] = _SlotState(req.req_id, [])

        if all(s is None for s in self._slots):
            return

        self._key, sub = jax.random.split(self._key)
        (self._cache, self._tokens, self._indices, self._done,
         emitted) = self._decode_chunk(
            self.params, self._cache, self._kv_mask, self._tokens,
            self._indices, self._done, sub,
        )
        emitted = np.asarray(emitted)  # (B, chunk)
        for slot, st in enumerate(self._slots):
            if st is None:
                continue
            for tok in emitted[slot]:
                if st.finished:
                    break
                tok = int(tok)
                st.tokens.append(tok)
                if (tok == self.gen.eos_token_id
                        or len(st.tokens) >= self.gen.max_new_tokens):
                    st.finished = True
            if st.finished:
                self._results[st.req_id] = np.asarray(st.tokens, np.int32)
                self._slots[slot] = None

    def run(self) -> Dict[int, np.ndarray]:
        """Drive until every submitted request completes; returns
        {req_id: generated tokens (eos-terminated or budget-truncated)}."""
        while self.pending:
            self.step()
        out, self._results = self._results, {}
        return out
