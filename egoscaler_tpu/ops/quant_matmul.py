"""Weight-only int8 matmul (w8a16) for parameter-bandwidth-bound decode.

Single-token decode streams every weight matrix per step, so decode
throughput is set by bytes-of-params/step (PARITY.md: 5.78 ms/step at
1.1B bs8 vs a ~2.8 ms bf16 streaming roofline; 7B single-chip decode
streams ~12.6 GiB/step).  Storing the projection matrices as int8 with
per-output-channel f32 scales halves that traffic.  The reference has
no quantized inference path (HF fp16 generate, model_arch.py:77-108);
this is a TPU-native extension.

Why a Pallas kernel: XLA cannot fuse an int8->bf16 convert INTO a dot
operand — `x @ w_q.astype(bf16)` materializes the bf16 copy of the
weight in HBM first, which reads the int8 AND writes+reads the bf16
(more traffic than the bf16 matmul it was meant to beat).  The kernel
streams int8 blocks from HBM, converts in VMEM, and feeds the MXU
directly:

* grid (N/bn, K/bk), k innermost ("arbitrary" = sequential) so each
  program revisits its (M, bn) f32 accumulator scratch across k steps;
* per-output-channel scales applied once at the last k step, f32
  accumulation throughout (same numerics contract as ops/attention);
* M (tokens*batch at decode: ~8) is padded to the 8-sublane minimum —
  the matmul is bandwidth-bound, MXU occupancy is irrelevant.

Quantization: symmetric per-output-channel (absmax / 127), the
standard serving recipe (no zero points — LLaMA projections are
weight-norm-centered).  `quantize_weight` / `dequantize_weight` are
exact inverses up to the rounding step.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def quantize_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(K, N) float -> ((K, N) int8, (N,) f32 per-output-channel scale)."""
    w = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=0)  # (N,)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_weight(q: jax.Array, scale: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) * scale[None, :].astype(jnp.float32)


def _wq_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, nk: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    w = w_ref[...].astype(x.dtype)  # int8 -> compute dtype, in VMEM
    acc_ref[...] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _finish():
        o_ref[...] = (
            acc_ref[...] * s_ref[0, :][None, :]
        ).astype(o_ref.dtype)


def _pad_to(a: jax.Array, axis: int, mult: int) -> jax.Array:
    size = a.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k"))
def quant_matmul(
    x: jax.Array,          # (M, K) bf16/f32 activations
    w_q: jax.Array,        # (K, N) int8 weights
    scale: jax.Array,      # (N,) f32 per-output-channel scales
    *,
    block_m: int = 512,
    block_n: int = 512,
    block_k: int = 512,
) -> jax.Array:
    """x @ dequant(w_q, scale), streaming int8 from HBM.  Returns (M, N)
    in x.dtype with f32 accumulation.

    M is blocked too: decode (M~8) runs one M block as before, but the
    PREFILL path reuses this kernel at M = batch*seq (thousands) — an
    unblocked (M, block_n) f32 accumulator there blows the ~16 MB
    scoped-VMEM limit (measured: 26 MB at M=4352, N-block 512)."""
    m, k = x.shape
    k2, n = w_q.shape
    assert k == k2 and scale.shape == (n,), (x.shape, w_q.shape, scale.shape)
    block_k = min(block_k, max(8, k))
    block_n = min(block_n, max(128, n))
    block_m = min(block_m, max(8, m))

    xp = _pad_to(_pad_to(x, 0, block_m), 1, block_k)
    wp = _pad_to(_pad_to(w_q, 0, block_k), 1, block_n)
    sp = _pad_to(scale.astype(jnp.float32)[None, :], 1, block_n)  # (1, Np)
    mp, kp = xp.shape
    np_ = wp.shape[1]
    nm, nn, nk = mp // block_m, np_ // block_n, kp // block_k

    out = pl.pallas_call(
        functools.partial(_wq_kernel, nk=nk),
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda mi, ni, ki: (mi, ki)),
            pl.BlockSpec((block_k, block_n), lambda mi, ni, ki: (ki, ni)),
            pl.BlockSpec((1, block_n), lambda mi, ni, ki: (0, ni)),
        ],
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda mi, ni, ki: (mi, ni)
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(xp, wp, sp)
    return out[:m, :n]


@jax.custom_vjp
def quant_matmul_diff(x: jax.Array, w_q: jax.Array, scale: jax.Array) -> jax.Array:
    """quant_matmul with an activation gradient — lets the loss
    differentiate THROUGH int8-frozen layers (the QLoRA-style recipe:
    a trainable adapter around a quantized frozen trunk; the 7B
    frozen-recipe train at scripts/run_7b_chip.py --quant_trunk).
    Weights/scales get zero cotangents (they are frozen by contract)."""
    return quant_matmul(x, w_q, scale)


def _qmm_fwd(x, w_q, scale):
    # y.dtype == x.dtype, so dy's dtype serves as the dx dtype
    return quant_matmul(x, w_q, scale), (w_q, scale)


def _qmm_bwd(res, dy):
    w_q, scale = res
    # dx = (dy * scale) @ dequant(w)^T.  Contract over N of the int8
    # weight directly — one transient bf16 dequant per layer (XLA frees
    # it between layers; under remat the bwd recomputes it), no
    # persistent bf16 copy.
    dy_s = (dy.astype(jnp.float32) * scale[None, :]).astype(jnp.bfloat16)
    dx = jnp.einsum(
        "mn,kn->mk", dy_s, w_q.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(dy.dtype)
    import numpy as _np

    dw = _np.zeros(w_q.shape, jax.dtypes.float0)  # int8: zero-sized tangent
    return dx, dw, jnp.zeros_like(scale)


quant_matmul_diff.defvjp(_qmm_fwd, _qmm_bwd)


def quant_matmul_xla(x: jax.Array, w_q: jax.Array, scale: jax.Array) -> jax.Array:
    """XLA reference path (dequantizes through HBM — correctness oracle
    and CPU fallback, not a bandwidth win)."""
    y = jnp.dot(
        x, w_q.astype(x.dtype), preferred_element_type=jnp.float32
    )
    return (y * scale[None, :].astype(jnp.float32)).astype(x.dtype)
