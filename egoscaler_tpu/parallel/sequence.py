"""Sequence parallelism: ring attention over a `seq` mesh axis.

Beyond parity: the reference has NO sequence/context parallelism
(SURVEY.md §2.4 — "absent"; the long-context hook it names is exactly
this: blockwise attention + sequence sharding).  Activations are
sharded over the SEQUENCE dimension — each device holds (B, S/n, H, D)
of q/k/v — and the full softmax is recovered by rotating the K/V shard
around the ring with `ppermute` (ICI neighbor exchange, same pattern
as the GPipe loop in parallel/pipeline.py) while accumulating a
streaming (flash-style) softmax: running max `m`, denominator `l`,
and numerator `o` are corrected as new blocks arrive, so no device
ever materializes an (S, S) score tile — memory is O(S/n * S/n) per
step and O(S/n) for the carry.

Ring Attention (Liu et al., 2023) / blockwise-parallel-transformer
style; numerics match dense attention exactly up to fp associativity
(tests/test_sequence_parallel.py asserts vs the dense oracle on the
8-device CPU mesh).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _block_attn(q, k, v, valid, m, l, o, scale):
    """One blockwise-softmax accumulation step.

    q (B, Sq, H, D); k/v (B, Sk, H, D); valid (B, Sq, Sk) bool;
    m/l (B, H, Sq); o (B, Sq, H, D).  Returns updated (m, l, o).
    """
    s = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k,
        precision=jax.lax.Precision.HIGHEST,
    ) * scale
    s = jnp.where(valid[:, None], s, NEG_INF)
    m_new = jnp.maximum(m, s.max(axis=-1))
    corr = jnp.exp(m - m_new)
    p = jnp.exp(s - m_new[..., None])
    # fully-masked rows: p is exp(NEG_INF - NEG_INF) = 1 — zero them
    p = jnp.where(valid[:, None], p, 0.0)
    l = l * corr + p.sum(axis=-1)
    o = o * corr.transpose(0, 2, 1)[..., None] + jnp.einsum(
        "bhqk,bkhd->bqhd", p, v,
        precision=jax.lax.Precision.HIGHEST,
    )
    return m_new, l, o


def ring_attention(
    q: jax.Array,            # (B, S, H, D) — S sharded over `axis`
    k: jax.Array,
    v: jax.Array,
    kv_mask: jax.Array,      # (B, S) bool — valid key positions
    *,
    mesh: Mesh,
    axis: str = "seq",
    causal: bool = True,
) -> jax.Array:
    """Exact attention with q/k/v sharded over the sequence dim.

    Positions are global (0..S-1 in ring order: shard r holds
    [r*S/n, (r+1)*S/n)); causal masking compares global positions, so
    the result equals dense causal attention over the full sequence.
    Output is sharded like q.
    """
    n = mesh.shape[axis]
    scale = q.shape[-1] ** -0.5
    s_total = q.shape[1]
    assert s_total % n == 0, f"S {s_total} % ring {n} != 0"
    blk = s_total // n
    fwd = [(i, (i + 1) % n) for i in range(n)]

    def body(q, k, v, kv_mask):
        r = jax.lax.axis_index(axis)
        q_pos = r * blk + jnp.arange(blk)
        b, _, h, _ = q.shape
        m0 = jnp.full((b, h, blk), NEG_INF, q.dtype)
        l0 = jnp.zeros((b, h, blk), q.dtype)
        o0 = jnp.zeros_like(q)

        def step(carry, t):
            k, v, kmask, kpos0, m, l, o = carry
            # the K/V shard visiting at step t started at ring rank
            # (r - t) mod n; its global positions are kpos0
            kv_pos = kpos0 + jnp.arange(blk)
            valid = kmask[:, None, :]  # (B, 1, Sk)
            if causal:
                valid = valid & (
                    kv_pos[None, None, :] <= q_pos[None, :, None]
                )
            valid = jnp.broadcast_to(valid, (b, blk, blk))
            m, l, o = _block_attn(q, k, v, valid, m, l, o, scale)
            shift = lambda a: jax.lax.ppermute(a, axis, fwd)
            return (shift(k), shift(v), shift(kmask),
                    shift(kpos0), m, l, o), None

        kpos0 = jnp.asarray(r * blk, jnp.int32)
        (k, v, kv_mask, kpos0, m, l, o), _ = jax.lax.scan(
            step, (k, v, kv_mask, kpos0, m0, l0, o0), jnp.arange(n)
        )
        l_t = l.transpose(0, 2, 1)[..., None]  # (B, Sq, H, 1)
        return jnp.where(l_t > 0, o / jnp.maximum(l_t, 1e-30), 0.0)

    spec = P(None, axis)  # (batch, SEQ, heads, head_dim)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec, P(None, axis)),
        out_specs=spec,
        check_vma=False,
    )(q, k, v, kv_mask)
