"""Voxel-grid downsampling in fixed-shape JAX (sort + segment means).

Open3D equivalent: `pcd.voxel_down_sample(voxel_size)`
(pcm_tools.py:5-8) — averages points (and colors) within each voxel.
TPU-native approach: pack voxel coordinates into a sortable int32 key,
sort, and reduce runs with segment sums — no hashing, no dynamic shapes.
Output is padded to `max_out` with a validity mask.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# 10 bits per axis -> voxel coords in [0, 1024); at voxel 0.1 m that spans
# 102 m, far beyond the 5 m depth cutoff of the pipeline (configs/data.py)
_BITS = 10
_SPAN = 1 << _BITS
_INVALID_KEY = jnp.int32(2**31 - 1)


def voxel_downsample(
    points: jax.Array,
    colors: Optional[jax.Array],
    mask: jax.Array,
    voxel_size: float,
    max_out: int,
    packed: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(N,3) points (+colors) + mask -> (max_out, 3) voxel means + mask.

    Points are binned at floor(p / voxel); all valid points in a bin are
    averaged (Open3D semantics).  Bins beyond max_out are dropped
    (deterministically, in key order).

    `packed` (default): the sort — the dominant cost of the whole
    registration prep — carries 3 int32 columns instead of 8 f32:
    the voxel key (which already encodes the integer voxel coords),
    the 3x10-bit in-voxel fractions, and rgb888.  Reconstruction error
    is <= voxel/1024 per axis (0.1 mm at voxel 0.1 m) and <= 1/255 in
    color (exact for uint8-sourced images); both are far below
    registration tolerances.  `packed=False` keeps the exact f32
    payload sort.
    """
    n = points.shape[0]
    if colors is not None and colors.shape[1] != 3:
        packed = False  # rgb888 pack assumes 3 channels; exact path is general
    origin = jnp.min(
        jnp.where(mask[:, None], points, jnp.inf), axis=0
    )  # local origin keeps coords positive
    # all-masked input: origin is +inf and would reconstruct NaN points in
    # the packed path; any finite origin gives the same (empty) output
    origin = jnp.where(jnp.isfinite(origin), origin, 0.0)
    scaled = (points - origin) / voxel_size
    coords = jnp.floor(scaled).astype(jnp.int32)
    coords = jnp.clip(coords, 0, _SPAN - 1)
    key = (coords[:, 0] << (2 * _BITS)) | (coords[:, 1] << _BITS) | coords[:, 2]
    key = jnp.where(mask, key, _INVALID_KEY)

    # Three sort strategies (all measured on v5e-lite):
    #  * packed sort (default) — 3 int32 columns, ~40% the traffic of the
    #    f32 payload sort; quantization documented above;
    #  * exact payload sort — moves f32 point/color columns with the keys;
    #  * argsort + gathers — payload columns inflate sort traffic at
    #    multi-million points (payload sort was 27% slower at 1408^2).
    if packed:
        frac = jnp.clip(
            ((scaled - coords) * 1024.0).astype(jnp.int32), 0, 1023
        )
        fpack = (frac[:, 0] << 20) | (frac[:, 1] << 10) | frac[:, 2]
        if colors is not None:
            c8 = jnp.clip(
                (colors * 255.0 + 0.5).astype(jnp.int32), 0, 255
            )
            cpack = (c8[:, 0] << 16) | (c8[:, 1] << 8) | c8[:, 2]
            key_s, fpack_s, cpack_s = jax.lax.sort(
                [key, fpack, cpack], num_keys=1
            )
        else:
            key_s, fpack_s = jax.lax.sort([key, fpack], num_keys=1)
            cpack_s = None
        coords_s = jnp.stack(
            [
                (key_s >> (2 * _BITS)) & (_SPAN - 1),
                (key_s >> _BITS) & (_SPAN - 1),
                key_s & (_SPAN - 1),
            ],
            axis=1,
        ).astype(jnp.float32)
        frac_s = jnp.stack(
            [
                (fpack_s >> 20) & 1023,
                (fpack_s >> 10) & 1023,
                fpack_s & 1023,
            ],
            axis=1,
        ).astype(jnp.float32)
        pts_s = origin + (coords_s + (frac_s + 0.5) / 1024.0) * voxel_size
        if cpack_s is not None:
            cols_s = (
                jnp.stack(
                    [
                        (cpack_s >> 16) & 255,
                        (cpack_s >> 8) & 255,
                        cpack_s & 255,
                    ],
                    axis=1,
                ).astype(jnp.float32)
                / 255.0
            )
        else:
            cols_s = None
    elif n <= (1 << 19):
        operands = [key] + [points[:, i] for i in range(3)]
        if colors is not None:
            operands += [colors[:, i] for i in range(colors.shape[1])]
        sorted_ops = jax.lax.sort(operands, num_keys=1)
        key_s = sorted_ops[0]
        pts_s = jnp.stack(sorted_ops[1:4], axis=1)
        cols_s = (
            jnp.stack(sorted_ops[4:], axis=1) if colors is not None else None
        )
    else:
        order = jnp.argsort(key)
        key_s = key[order]
        pts_s = points[order]
        cols_s = colors[order] if colors is not None else None
    valid_s = key_s != _INVALID_KEY

    # run boundaries
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), key_s[1:] != key_s[:-1]]
    ) & valid_s
    seg_id = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # -1 before first run
    seg_id = jnp.where(valid_s, seg_id, max_out)  # invalid -> overflow bin
    seg_id = jnp.clip(seg_id, 0, max_out)

    # Segment reduction.  Packed path: EXACT int32 prefix sums + one
    # boundary gather — cheaper than XLA's row-serialized sorted
    # scatter (measured ~9 ms/call faster at 147k x 7).  The quantized
    # payload makes integer sums exact: frac <= 1023 so the cumsum
    # stays < 2^31 up to ~2M points; larger inputs (or the exact-f32
    # payload paths, where f32 prefix differences would cancel
    # catastrophically at ~1e7 magnitudes) keep the sorted scatter.
    n_rows = key_s.shape[0]
    if packed and n_rows * 1024 < 2**31:
        v = valid_s.astype(jnp.int32)
        frac_i = jnp.stack(
            [(fpack_s >> 20) & 1023, (fpack_s >> 10) & 1023, fpack_s & 1023],
            axis=1,
        ) * v[:, None]
        cols_list = []
        if cpack_s is not None:
            cols_list = [
                jnp.stack(
                    [(cpack_s >> 16) & 255, (cpack_s >> 8) & 255,
                     cpack_s & 255],
                    axis=1,
                ) * v[:, None]
            ]
        payload_i = jnp.concatenate([v[:, None], frac_i] + cols_list, axis=1)
        csum = jnp.cumsum(payload_i, axis=0)
        # last row of each segment via unrolled binary search (a while-
        # loop searchsorted costs ~0.6 ms in pure loop overhead)
        ends = jnp.searchsorted(
            seg_id, jnp.arange(max_out), side="right",
            method="scan_unrolled",
        ) - 1
        ends = jnp.clip(ends, 0, n_rows - 1)  # all-invalid: zero rows only
        at_end = csum[ends]                   # (max_out, C)
        prev = jnp.concatenate(
            [jnp.zeros((1, at_end.shape[1]), jnp.int32), at_end[:-1]], axis=0
        )
        sums = (at_end - prev).astype(jnp.float32)
        counts = sums[:, 0]
        out_mask = counts > 0
        denom = jnp.maximum(counts, 1.0)
        # all rows of a segment share the voxel coords encoded in its key
        key_e = key_s[ends]
        coords_e = jnp.stack(
            [
                (key_e >> (2 * _BITS)) & (_SPAN - 1),
                (key_e >> _BITS) & (_SPAN - 1),
                key_e & (_SPAN - 1),
            ],
            axis=1,
        ).astype(jnp.float32)
        # mean point = origin + (coords + (sum(frac) + 0.5*count) /
        # (1024*count)) * voxel — identical to averaging reconstructed
        # per-point positions (they share coords; frac is exact int)
        out_pts = origin + (
            coords_e
            + (sums[:, 1:4] + 0.5 * counts[:, None])
            / (1024.0 * denom[:, None])
        ) * voxel_size
        if cpack_s is not None:
            out_cols = sums[:, 4:7] / (255.0 * denom[:, None])
        else:
            out_cols = jnp.zeros_like(out_pts)
        return out_pts, out_cols, out_mask

    ones = valid_s.astype(points.dtype)
    payload = [ones[:, None], pts_s * ones[:, None]]
    if cols_s is not None:
        payload.append(cols_s * ones[:, None])
    sums_all = jax.ops.segment_sum(
        jnp.concatenate(payload, axis=1), seg_id,
        num_segments=max_out + 1, indices_are_sorted=True,
    )[:max_out]
    counts = sums_all[:, 0]
    out_mask = counts > 0
    denom = jnp.maximum(counts, 1.0)[:, None]
    out_pts = sums_all[:, 1:4] / denom
    if cols_s is not None:
        out_cols = sums_all[:, 4:7] / denom
    else:
        out_cols = jnp.zeros_like(out_pts)
    return out_pts, out_cols, out_mask


def voxel_downsample_hash(
    points: jax.Array,
    colors: Optional[jax.Array],
    mask: jax.Array,
    voxel_size: float,
    max_out: int,
    num_buckets: int = 1 << 20,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sort-free voxel downsampling: scatter-add into hash buckets, then
    top-k occupied buckets.

    Written against the profile showing the ~2M-element sort dominating
    the full-res pipeline (~120 ms/frame at 1408^2) — but MEASURED SLOWER
    than the sort on v5e-lite (XLA lowers the 2^20-segment scatter as a
    sort anyway, plus the top_k): 1.52 vs 2.04 clips/s at 384^2.  Kept as
    an option for backends with fast native scatter.
    Distinct voxels collide with probability ~n_voxels/num_buckets
    (<1% at typical scene voxel counts); a collision merges two voxel
    means — tolerance-level for registration, NOT bit-identical to
    `voxel_downsample`.
    """
    origin = jnp.min(jnp.where(mask[:, None], points, jnp.inf), axis=0)
    coords = jnp.floor((points - origin) / voxel_size).astype(jnp.int32)
    coords = jnp.clip(coords, 0, _SPAN - 1)
    key = (coords[:, 0] << (2 * _BITS)) | (coords[:, 1] << _BITS) | coords[:, 2]
    # Fibonacci hash; take the HIGH bits (low bits of key*K mod 2^b only
    # depend on key mod 2^b and would collapse the x-coordinate bits)
    bucket_bits = int(np.log2(num_buckets))
    hashed = (key * jnp.int32(-1640531527)) & jnp.int32(0x7FFFFFFF)
    bucket = (hashed >> (31 - bucket_bits)).astype(jnp.int32)
    bucket = jnp.where(mask, bucket, num_buckets)  # overflow bin

    w = mask.astype(points.dtype)
    counts = jax.ops.segment_sum(
        w, bucket, num_segments=num_buckets + 1
    )[:num_buckets]
    psums = jax.ops.segment_sum(
        points * w[:, None], bucket, num_segments=num_buckets + 1
    )[:num_buckets]
    top_counts, top_idx = jax.lax.top_k(counts, max_out)
    out_mask = top_counts > 0
    denom = jnp.maximum(top_counts, 1.0)[:, None]
    out_pts = psums[top_idx] / denom
    if colors is not None:
        csums = jax.ops.segment_sum(
            colors * w[:, None], bucket, num_segments=num_buckets + 1
        )[:num_buckets]
        out_cols = csums[top_idx] / denom
    else:
        out_cols = jnp.zeros_like(out_pts)
    return out_pts, out_cols, out_mask
