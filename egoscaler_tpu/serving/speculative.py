"""Speculative decoding: draft-model propose, target verify — greedy.

Decode is parameter-bandwidth bound on TPU (PARITY.md: 1.1B decode
5.78 ms/step vs a ~2.8 ms/step streaming roofline; 7B 153 tok/s): every
step re-reads all weights from HBM to emit ONE token.  Speculative
decoding [Leviathan et al. 2023] amortizes that read: a small DRAFT
model proposes `k` tokens autoregressively, then the TARGET verifies
all of them in a single (k+1)-token forward whose cost is ~one decode
step (the matmuls stay bandwidth-bound at tiny sequence length).  With
`a` accepted drafts the chunk emits `a + 1` tokens (the bonus token
comes from the target's own logits).

Exactness contract (measured, DIAG_DECODE.json on the trained 1.1B):
acceptance never changes the DISTRIBUTION of choices — every emitted
token is a greedy argmax of a target forward over the same prefix —
but with bf16 weights the token stream is equivalent to plain
`generate`, not bit-identical.  XLA tiles the (k+1)-token verify
matmuls differently than the 1-token decode matmuls (M = B(k+1) vs
M = B), and the epsilon-different bf16 accumulation flips argmax at
near-ties: teacher-forced, the verify forward flips 2/1072 positions
(0.19%/token), every flip at a top-2 logit gap <= 0.125 where the
median gap is 6.4.  One early flip re-contexts the rest of the row, so
end-to-end token agreement is 0.99 and the task impact is nil (traj
delta 1.8 mm, val ADE 0.3142 -> 0.3154).  Two corollaries, both
verified on chip: re-running even the SAME 1-token program in a fresh
jit context flips ~1/1072 (generate is not bit-stable against itself
under recompilation), and with int8 weights speculative IS token-exact
vs its own baseline — the Pallas w8a16 kernel accumulates over K in a
fixed block order regardless of M, so its numerics are shape-invariant
(ops/quant_matmul.py).  Bit-exactness under bf16 would require pinning
every matmul tiling across both program shapes, which XLA does not
expose; tests assert exactness on CPU (f32 accumulation there is
shape-invariant) and equivalence-quality on hardware.

The reference has no serving/speculation story at all (evaluate.py
statically batches a file; chat_gradio.py is single-request) — this is
a beyond-parity capability, natural here because trajectory-token
streams are highly predictable (structured <p*> grammar), so small
drafts accept long prefixes.

Greedy only (do_sample=False): acceptance is `draft token == target
argmax`, which makes the equivalence testable token-exactly on CPU
(tests/test_speculative.py) and as ~0.99 token agreement + ADE parity
on TPU (scripts/diag_decode_numerics.py).  The stochastic
rejection-sampling variant preserves the target DISTRIBUTION but not
the sample path; it is not needed for the evaluate/serving greedy paths
and is left out.

Cache discipline (static shapes, one XLA program):
- both KV caches are padded to prompt + max_new + k + 1 slots;
- a verify chunk writes k+1 entries at per-row positions `n..n+k`
  (models/llama.py per-row branch); after accepting `a` drafts the
  valid prefix is `n..n+a` and the next chunk starts at `n+a+1`,
  overwriting every stale speculative slot before it can be attended
  to (causal masking covers the gap in between);
- the draft runs k+1 single-token steps per chunk: k proposals plus a
  final ingest of its own last proposal, so its cache never has a hole
  when all k drafts are accepted.

The whole generate is ONE jitted program (`lax.while_loop` over
chunks), so the axon relay is paid once per call, not per token.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from egoscaler_tpu.models.llama import init_kv_cache
from egoscaler_tpu.models.pointllm import (
    GenerateConfig,
    TrajPointLLM,
)


SpecStats = Dict[str, jax.Array]
# {"chunks": () int32 verify chunks executed,
#  "drafts_accepted": () int32 total accepted draft tokens,
#  "tokens_emitted": () int32 total tokens emitted (capped at max_new)}
# — a plain dict so the stats pytree can cross a jit boundary.


def speculative_generate(
    model: TrajPointLLM,
    params: Any,
    draft_model: TrajPointLLM,
    draft_params: Any,
    input_ids: jax.Array,        # (B, P) right-padded prompt
    attention_mask: jax.Array,   # (B, P) bool
    point_clouds: Optional[jax.Array],
    gen: GenerateConfig = GenerateConfig(do_sample=False),
    k: int = 4,
    cache_dtype=jnp.bfloat16,
) -> Tuple[jax.Array, jax.Array, SpecStats]:
    """Greedy speculative generation.

    Returns (tokens (B, max_new_tokens), lengths (B,), SpecStats) with
    tokens equivalent to `generate(..., do_sample=False)` on the target
    model alone — the draft only accelerates.  Bit-identity holds where
    matmul numerics are shape-invariant (CPU f32, int8 Pallas weights);
    under bf16 on TPU, near-tie argmax flips give ~0.99 token agreement
    with no task-level drift (module docstring, DIAG_DECODE.json).
    """
    if gen.do_sample:
        raise ValueError(
            "speculative_generate is greedy-exact; pass do_sample=False"
        )
    b, p = input_ids.shape
    max_new = gen.max_new_tokens
    eos = gen.eos_token_id
    t_max = p + max_new + k + 1  # slack: a chunk may write past max_new
    width = max_new + k + 1

    tcache = init_kv_cache(model.cfg.llama, b, t_max, cache_dtype)
    dcache = init_kv_cache(draft_model.cfg.llama, b, t_max, cache_dtype)
    full_mask = jnp.concatenate(
        [attention_mask.astype(bool), jnp.ones((b, t_max - p), bool)], axis=1
    )

    tlogits, tcache = model.apply(
        params, input_ids, point_clouds, full_mask, tcache,
        method=TrajPointLLM.prefill,
    )
    _, dcache = draft_model.apply(
        draft_params, input_ids, point_clouds, full_mask, dcache,
        method=TrajPointLLM.prefill,
    )
    tok0 = jnp.argmax(tlogits, axis=-1).astype(jnp.int32)

    out = jnp.full((b, width), eos, jnp.int32)
    out = out.at[:, 0].set(tok0)
    bidx = jnp.arange(b)[:, None]
    jidx = jnp.arange(k + 1, dtype=jnp.int32)[None, :]

    state = dict(
        out=out,
        ptr=jnp.ones((b,), jnp.int32),          # tokens emitted per row
        last=tok0,                               # emitted, not yet in caches
        done=tok0 == eos,
        n=jnp.full((b,), p, jnp.int32),          # next cache write slot
        tcache=tcache,
        dcache=dcache,
        chunks=jnp.asarray(0, jnp.int32),
        accepted=jnp.asarray(0, jnp.int32),
    )

    def cond(st):
        return jnp.any(~st["done"] & (st["ptr"] < max_new)) & (
            st["chunks"] < max_new
        )

    def body(st):
        # ---- draft: k proposals + 1 ingest step (cache holds all k)
        def dstep(carry, _):
            tok, dc, pos = carry
            logits, dc = draft_model.apply(
                draft_params, tok, pos, full_mask, dc,
                method=TrajPointLLM.decode_step,
            )
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (nxt, dc, pos + 1), nxt

        (_, dcache, _), drafts = jax.lax.scan(
            dstep, (st["last"], st["dcache"], st["n"]), None, length=k + 1
        )
        drafts = jnp.swapaxes(drafts[:k], 0, 1)  # (B, k)

        # ---- target verify: [last, d_0..d_{k-1}] in one chunk forward
        chunk_in = jnp.concatenate([st["last"][:, None], drafts], axis=1)
        logits, tcache = model.apply(
            params, chunk_in, st["n"], full_mask, st["tcache"],
            method=TrajPointLLM.decode_chunk,
        )
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, k+1)

        # accepted prefix length a in [0, k]
        match = (drafts == greedy[:, :k]).astype(jnp.int32)
        a = jnp.sum(jnp.cumprod(match, axis=1), axis=1)  # (B,)

        # chunk emission e_j: j<a -> draft j; j==a -> bonus greedy[a]
        bonus = jnp.take_along_axis(greedy, a[:, None], axis=1)[:, 0]
        drafts_p = jnp.concatenate(
            [drafts, jnp.zeros((b, 1), jnp.int32)], axis=1
        )
        emit = jnp.where(
            jidx < a[:, None], drafts_p,
            jnp.where(jidx == a[:, None], bonus[:, None], eos),
        )
        # eos cascade within the chunk (generate() forces eos after eos)
        iseos = emit == eos
        seen = (jnp.cumsum(iseos.astype(jnp.int32), axis=1) - iseos) > 0
        emit = jnp.where(seen, eos, emit)
        last_new = jnp.take_along_axis(emit, a[:, None], axis=1)[:, 0]

        active = ~st["done"] & (st["ptr"] < max_new)
        rows = st["ptr"][:, None] + jidx
        prev = st["out"][bidx, rows]
        vals = jnp.where(active[:, None] & (jidx <= a[:, None]), emit, prev)
        out = st["out"].at[bidx, rows].set(vals)

        adv = jnp.where(active, a + 1, 0)
        return dict(
            out=out,
            ptr=st["ptr"] + adv,
            last=jnp.where(active, last_new, st["last"]),
            done=st["done"] | (last_new == eos),
            n=st["n"] + jnp.where(active, a + 1, 0),
            tcache=tcache,
            dcache=dcache,
            chunks=st["chunks"] + 1,
            accepted=st["accepted"] + jnp.sum(jnp.where(active, a, 0)),
        )

    st = jax.lax.while_loop(cond, body, state)

    tokens = st["out"][:, :max_new]
    is_eos = tokens == eos
    lengths = jnp.where(
        jnp.any(is_eos, axis=1), jnp.argmax(is_eos, axis=1), max_new
    )
    stats = {
        "chunks": st["chunks"],
        "drafts_accepted": st["accepted"],
        "tokens_emitted": jnp.sum(jnp.minimum(st["ptr"], max_new)),
    }
    return tokens, lengths, stats
