"""Pallas TPU flash attention (online-softmax, tiled over KV).

TPU-native replacement for the reference's `flash_attn` CUDA kernels
(llama_flash_attn_monkey_patch.py:14-107).  Design per the Pallas guide:

* grid (B, H, num_q_blocks); each program streams KV blocks while
  holding a q block and running (max, sum, acc) statistics — the
  FlashAttention-2 schedule;
* MXU matmuls via jnp.dot with preferred_element_type=f32; statistics
  and accumulation in f32; inputs may be bf16;
* causal masking plus an arbitrary (B, T) key-validity mask (the
  trajectory prompts carry mid-sequence pads in the description slot —
  dataset.py:150-194 — so suffix-only kv_lengths is not enough);
* with `causal`, KV blocks entirely above the diagonal are skipped
  (fori_loop bound), no wasted MXU work.

Backward: `jax.custom_vjp` with fused Pallas kernels (FlashAttention-2
schedule): the forward additionally emits the per-row logsumexp; the
backward recomputes P = exp(S - lse) tile by tile — one kernel streams
KV blocks producing dQ, a second streams Q blocks producing dK/dV — so
no S^2 intermediate is ever materialized in either direction.  Set
`use_pallas_bwd=False` to fall back to differentiating the XLA
reference (useful on CPU).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _interpret() -> bool:
    """Run Pallas in interpreter mode off-TPU (CPU tests)."""
    return jax.default_backend() != "tpu"


def _flash_kernel(
    q_ref,            # (1, hpack, bq, d)
    k_ref,            # (1, hpack, T, d)
    v_ref,            # (1, hpack, T, d)
    mask_ref,         # (1, 1, T) int32 (1 = valid key)
    o_ref,            # (1, hpack, bq, d)
    lse_ref,          # (1, hpack, bq, 128) f32 logsumexp, lane-broadcast
                      # (Mosaic requires >=(8,128)-tileable blocks)
    *,
    block_kv: int,
    causal: bool,
    q_offset: int,
    scale: float,
    kv_len_static: int,
):
    qi = pl.program_id(2)
    hpack = q_ref.shape[1]
    bq = q_ref.shape[2]
    d = q_ref.shape[3]
    num_kv_blocks = kv_len_static // block_kv

    if causal:
        last_q_pos = q_offset + (qi + 1) * bq - 1
        needed = jnp.minimum(last_q_pos // block_kv + 1, num_kv_blocks)
    else:
        needed = num_kv_blocks

    # several heads per program (hpack) amortize the per-program
    # dispatch overhead (~3 us each — it dominated at d=64 ViT shapes);
    # matmuls stay in the input dtype (bf16 on the fast path) with f32
    # accumulation, the scale is applied to the f32 scores
    for hp in range(hpack):
        q = q_ref[0, hp, :, :]

        def body(ki, carry):
            m_prev, l_prev, acc = carry
            k_blk = k_ref[0, hp, pl.ds(ki * block_kv, block_kv), :]
            v_blk = v_ref[0, hp, pl.ds(ki * block_kv, block_kv), :]
            s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale

            kmask = mask_ref[0, 0, pl.ds(ki * block_kv, block_kv)]  # (bkv,)
            mask = jnp.broadcast_to(kmask[None, :] > 0, (bq, block_kv))
            if causal:
                kv_pos = ki * block_kv + jax.lax.broadcasted_iota(
                    jnp.int32, (bq, block_kv), 1
                )
                q_pos = q_offset + qi * bq + jax.lax.broadcasted_iota(
                    jnp.int32, (bq, block_kv), 0
                )
                mask = mask & (kv_pos <= q_pos)
            s = jnp.where(mask, s, _NEG_INF)

            m_cur = jnp.max(s, axis=-1)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new[:, None])
            l_new = l_prev * alpha + jnp.sum(p, axis=-1)
            acc = acc * alpha[:, None] + jnp.dot(
                p.astype(v_blk.dtype), v_blk,
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc

        m0 = jnp.full((bq,), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((bq,), jnp.float32)
        acc0 = jnp.zeros((bq, d), jnp.float32)

        m, l, acc = jax.lax.fori_loop(0, needed, body, (m0, l0, acc0))
        out = acc / jnp.maximum(l, 1e-30)[:, None]
        o_ref[0, hp, :, :] = out.astype(o_ref.dtype)
        if lse_ref is not None:  # only the VJP forward needs logsumexp
            lse = m + jnp.log(jnp.maximum(l, 1e-30))
            lse_ref[0, hp, :, :] = jnp.broadcast_to(
                lse[:, None], lse_ref.shape[2:]
            )


def _nolse_wrapper(kernel, q_ref, k_ref, v_ref, mask_ref, o_ref):
    kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, None)


def _flash_forward(
    q, k, v, mask_i32, *, causal, q_offset, scale, block_q, block_kv,
    need_lse=True,
):
    b, s, h, d = q.shape
    t = k.shape[1]
    s_pad = -(-s // block_q) * block_q
    t_pad = -(-t // block_kv) * block_kv
    qp = jnp.pad(q, ((0, 0), (0, s_pad - s), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))
    mp = jnp.pad(mask_i32, ((0, 0), (0, 0), (0, t_pad - t)))

    qp = jnp.swapaxes(qp, 1, 2)  # BHSD
    kp = jnp.swapaxes(kp, 1, 2)
    vp = jnp.swapaxes(vp, 1, 2)

    # pack heads per program to amortize dispatch; keep KV VMEM residency
    # (hpack copies of the full padded KV) within budget
    hpack = 1
    for cand in (4, 2):
        if h % cand == 0 and cand * t_pad * d * qp.dtype.itemsize * 2 <= 2**21:
            hpack = cand
            break

    grid = (b, h // hpack, s_pad // block_q)
    kernel = functools.partial(
        _flash_kernel,
        block_kv=block_kv,
        causal=causal,
        q_offset=q_offset,
        scale=scale,
        kv_len_static=t_pad,
    )
    out_specs = [
        pl.BlockSpec(
            (1, hpack, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)
        ),
    ]
    out_shape = [jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype)]
    if need_lse:
        out_specs.append(
            pl.BlockSpec(
                (1, hpack, block_q, 128), lambda bi, hi, qi: (bi, hi, qi, 0)
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct((b, h, s_pad, 128), jnp.float32)
        )
    else:
        # inference never reads the logsumexp; writing its lane-broadcast
        # (B, H, S, 128) f32 buffer cost 184 MB/layer of pure HBM writes
        # in the DepthAnything ViT-L forward
        kernel = functools.partial(_nolse_wrapper, kernel)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, hpack, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)
            ),
            pl.BlockSpec(
                (1, hpack, t_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0)
            ),
            pl.BlockSpec(
                (1, hpack, t_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0)
            ),
            pl.BlockSpec((1, 1, t_pad), lambda bi, hi, qi: (bi, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(qp, kp, vp, mp)

    return (
        jnp.swapaxes(out[0], 1, 2)[:, :s],
        out[1] if need_lse else None,
    )


def _flash_bwd_dq_kernel(
    q_ref,            # (1, 1, bq, d)
    k_ref,            # (1, 1, T, d)
    v_ref,            # (1, 1, T, d)
    do_ref,           # (1, 1, bq, d)
    lse_ref,          # (1, 1, bq, 128) lane-broadcast
    delta_ref,        # (1, 1, bq, 128) lane-broadcast
    mask_ref,         # (1, 1, T)
    dq_ref,           # (1, 1, bq, d)
    *,
    block_kv: int,
    causal: bool,
    q_offset: int,
    scale: float,
    kv_len_static: int,
):
    qi = pl.program_id(2)
    bq, d = q_ref.shape[2], q_ref.shape[3]
    num_kv_blocks = kv_len_static // block_kv

    q = q_ref[0, 0, :, :]
    do = do_ref[0, 0, :, :]
    lse = lse_ref[0, 0, :, 0]
    delta = delta_ref[0, 0, :, 0]

    def body(ki, dq):
        k_blk = k_ref[0, 0, pl.ds(ki * block_kv, block_kv), :]
        v_blk = v_ref[0, 0, pl.ds(ki * block_kv, block_kv), :]
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale
        kmask = mask_ref[0, 0, pl.ds(ki * block_kv, block_kv)]
        mask = jnp.broadcast_to(kmask[None, :] > 0, (bq, block_kv))
        if causal:
            kv_pos = ki * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_kv), 1
            )
            q_pos = q_offset + qi * bq + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_kv), 0
            )
            mask = mask & (kv_pos <= q_pos)
        s = jnp.where(mask, s, _NEG_INF)
        p = jnp.exp(s - lse[:, None])
        dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta[:, None])
        return dq + jnp.dot(
            ds.astype(k_blk.dtype), k_blk, preferred_element_type=jnp.float32
        )

    if causal:
        last_q_pos = q_offset + (qi + 1) * bq - 1
        needed = jnp.minimum(last_q_pos // block_kv + 1, num_kv_blocks)
    else:
        needed = num_kv_blocks
    dq = jax.lax.fori_loop(0, needed, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0, 0, :, :] = (dq * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref,            # (1, 1, S, d)
    k_ref,            # (1, 1, bkv, d)
    v_ref,            # (1, 1, bkv, d)
    do_ref,           # (1, 1, S, d)
    lse_ref,          # (1, 1, S, 128) lane-broadcast
    delta_ref,        # (1, 1, S, 128) lane-broadcast
    mask_ref,         # (1, 1, bkv)
    dk_ref,           # (1, 1, bkv, d)
    dv_ref,           # (1, 1, bkv, d)
    *,
    block_q: int,
    causal: bool,
    q_offset: int,
    scale: float,
    q_len_static: int,
):
    ki = pl.program_id(2)
    bkv, d = k_ref.shape[2], k_ref.shape[3]
    num_q_blocks = q_len_static // block_q

    k_blk = k_ref[0, 0, :, :]
    v_blk = v_ref[0, 0, :, :]
    kmask = mask_ref[0, 0, :] > 0

    def body(qi, carry):
        dk, dv = carry
        q_blk = q_ref[0, 0, pl.ds(qi * block_q, block_q), :]
        do_blk = do_ref[0, 0, pl.ds(qi * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(qi * block_q, block_q), 0]
        delta = delta_ref[0, 0, pl.ds(qi * block_q, block_q), 0]
        s = jnp.dot(q_blk, k_blk.T, preferred_element_type=jnp.float32) * scale
        mask = jnp.broadcast_to(kmask[None, :], (block_q, bkv))
        if causal:
            kv_pos = ki * bkv + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, bkv), 1
            )
            q_pos = q_offset + qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, bkv), 0
            )
            mask = mask & (kv_pos <= q_pos)
        s = jnp.where(mask, s, _NEG_INF)
        p = jnp.exp(s - lse[:, None])
        pb = p.astype(do_blk.dtype)
        dv = dv + jnp.dot(pb.T, do_blk, preferred_element_type=jnp.float32)
        dp = jnp.dot(do_blk, v_blk.T, preferred_element_type=jnp.float32)
        ds = (p * (dp - delta[:, None]) * scale).astype(q_blk.dtype)
        dk = dk + jnp.dot(ds.T, q_blk, preferred_element_type=jnp.float32)
        return dk, dv

    if causal:
        # first q block whose last position reaches this kv block
        start = jnp.maximum(0, (ki * bkv - q_offset) // block_q)
    else:
        start = 0
    dk, dv = jax.lax.fori_loop(
        start, num_q_blocks, body,
        (jnp.zeros((bkv, d), jnp.float32), jnp.zeros((bkv, d), jnp.float32)),
    )
    # ds was pre-scaled, so dk = (ds*scale)^T @ q carries the scale
    dk_ref[0, 0, :, :] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0, :, :] = dv.astype(dv_ref.dtype)


def _flash_backward(
    q, k, v, mask_i32, out, lse, g, *,
    causal, q_offset, scale, block_q, block_kv,
):
    """Fused Pallas backward: returns (dq, dk, dv)."""
    b, s, h, d = q.shape
    t = k.shape[1]
    s_pad = -(-s // block_q) * block_q
    t_pad = -(-t // block_kv) * block_kv

    qp = jnp.swapaxes(jnp.pad(q, ((0, 0), (0, s_pad - s), (0, 0), (0, 0))), 1, 2)
    kp = jnp.swapaxes(jnp.pad(k, ((0, 0), (0, t_pad - t), (0, 0), (0, 0))), 1, 2)
    vp = jnp.swapaxes(jnp.pad(v, ((0, 0), (0, t_pad - t), (0, 0), (0, 0))), 1, 2)
    gp = jnp.swapaxes(jnp.pad(g, ((0, 0), (0, s_pad - s), (0, 0), (0, 0))), 1, 2)
    op = jnp.swapaxes(
        jnp.pad(out, ((0, 0), (0, s_pad - s), (0, 0), (0, 0))), 1, 2
    )
    mp = jnp.pad(mask_i32, ((0, 0), (0, 0), (0, t_pad - t)))

    # delta = rowsum(dO * O) (FlashAttention-2 eq. 4) — elementwise, XLA
    delta = jnp.sum(
        gp.astype(jnp.float32) * op.astype(jnp.float32), axis=-1
    )  # (B, H, S_pad)
    delta = jnp.broadcast_to(delta[..., None], (*delta.shape, 128))

    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel,
            block_kv=block_kv, causal=causal, q_offset=q_offset,
            scale=scale, kv_len_static=t_pad,
        ),
        grid=(b, h, s_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, t_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, t_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec(
                (1, 1, block_q, 128), lambda bi, hi, qi: (bi, hi, qi, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_q, 128), lambda bi, hi, qi: (bi, hi, qi, 0)
            ),
            pl.BlockSpec((1, 1, t_pad), lambda bi, hi, qi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
        interpret=_interpret(),
    )(qp, kp, vp, gp, lse, delta, mp)

    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel,
            block_q=block_q, causal=causal, q_offset=q_offset,
            scale=scale, q_len_static=s_pad,
        ),
        grid=(b, h, t_pad // block_kv),
        in_specs=[
            pl.BlockSpec((1, 1, s_pad, d), lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, s_pad, d), lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec(
                (1, 1, s_pad, 128), lambda bi, hi, ki: (bi, hi, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, s_pad, 128), lambda bi, hi, ki: (bi, hi, 0, 0)
            ),
            pl.BlockSpec((1, 1, block_kv), lambda bi, hi, ki: (bi, 0, ki)),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, block_kv, d), lambda bi, hi, ki: (bi, hi, ki, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_kv, d), lambda bi, hi, ki: (bi, hi, ki, 0)
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t_pad, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, t_pad, d), v.dtype),
        ],
        interpret=_interpret(),
    )(qp, kp, vp, gp, lse, delta, mp)

    dq = jnp.swapaxes(dq, 1, 2)[:, :s]
    dk = jnp.swapaxes(dk, 1, 2)[:, :t]
    dv = jnp.swapaxes(dv, 1, 2)[:, :t]
    return dq, dk, dv


def _xla_reference(q, k, v, mask_i32, *, causal, q_offset, scale):
    """Mathematically identical XLA attention (used for the backward)."""
    s, t = q.shape[1], k.shape[1]
    mask = mask_i32[:, :, None, :] > 0  # (B, 1, 1, T)
    mask = jnp.swapaxes(mask, 1, 2)     # (B, 1, 1, T) -> broadcast heads
    if causal:
        q_pos = q_offset + jnp.arange(s)
        causal_m = (jnp.arange(t)[None, :] <= q_pos[:, None])[None, None]
        mask = mask & causal_m
    scores = jnp.einsum(
        "bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32
    ) * scale
    scores = jnp.where(mask, scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhst,bthd->bshd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "q_offset", "scale", "block_q", "block_kv", "use_pallas_bwd"
    ),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    q_offset: int = 0,
    kv_mask: Optional[jax.Array] = None,
    kv_lengths: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    use_pallas_bwd: bool = True,
) -> jax.Array:
    """Flash attention on (B, S, H, D) / (B, T, H, D) inputs.

    `kv_mask` (B, T) bool marks valid keys (mid-sequence pads allowed);
    `kv_lengths` (B,) is the suffix-padding special case.  Sequences are
    padded to block multiples internally.  Differentiable: the backward
    is a fused Pallas pair (dQ / dK+dV) with no S^2 intermediate;
    `use_pallas_bwd=False` differentiates the XLA reference instead.

    Default block sizes auto-tune to the sequence: 512 once the padded
    length amortizes it (fewer programs — dispatch overhead dominated at
    ViT shapes), 256 otherwise.
    """
    b, s, h, d = q.shape
    t = k.shape[1]
    if block_q is None:
        block_q = 256 if s >= 256 else 128
    if block_kv is None:
        t128 = -(-t // 128) * 128
        if not causal and t128 <= 2048:
            # one full-width KV block: minimal padding (ViT-L's S=1370
            # pads to 1408 instead of 1536) and no inter-block softmax
            # rescaling; measured 36.1 -> 31.4 ms on the 24-layer
            # DepthAnything attention at (16, 1370, 16, 64)
            block_kv = t128
        else:
            block_kv = 512 if t >= 1024 else 256
    scale = float(d ** -0.5 if scale is None else scale)
    if kv_mask is None:
        if kv_lengths is None:
            kv_mask = jnp.ones((b, t), bool)
        else:
            kv_mask = jnp.arange(t)[None, :] < kv_lengths[:, None]
    mask_i32 = kv_mask.astype(jnp.int32)[:, None, :]  # (B, 1, T)

    static = dict(
        causal=causal, q_offset=q_offset, scale=scale,
        block_q=block_q, block_kv=block_kv,
    )

    @jax.custom_vjp
    def fa(q, k, v, m):
        # primal (inference) path: skip the logsumexp output entirely
        return _flash_forward(q, k, v, m, **static, need_lse=False)[0]

    def fa_fwd(q, k, v, m):
        out, lse = _flash_forward(q, k, v, m, **static)
        return out, (q, k, v, m, out, lse)

    def fa_bwd(res, g):
        q, k, v, m, out, lse = res
        if use_pallas_bwd:
            dq, dk, dv = _flash_backward(
                q, k, v, m, out, lse, g, **static
            )
        else:
            ref_static = dict(causal=causal, q_offset=q_offset, scale=scale)
            _, vjp = jax.vjp(
                lambda q_, k_, v_: _xla_reference(q_, k_, v_, m, **ref_static),
                q, k, v,
            )
            dq, dk, dv = vjp(g)
        return dq, dk, dv, None

    fa.defvjp(fa_fwd, fa_bwd)
    return fa(q, k, v, mask_i32)
