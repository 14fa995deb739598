"""Pyramidal Lucas-Kanade point tracking, fully jittable.

A deterministic, weight-free tracker filling the SpaTracker role
(mask-seeded point tracks with per-track depth — SURVEY.md §2.2) for
pipeline bring-up and tests; the learned tracker (models/tracker.py)
plugs into the same interface once weights exist.

Classic pyramidal LK: per level, iterate  d <- d + G^{-1} b  where G is
the structure tensor of the template window and b the image mismatch.
All tracks and pyramid levels are vectorized; the frame loop is a
lax.scan.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _gray(img: jax.Array) -> jax.Array:
    return jnp.mean(img.astype(jnp.float32), axis=-1)


def _pyramid(gray: jax.Array, levels: int):
    pyr = [gray]
    for _ in range(levels - 1):
        h, w = pyr[-1].shape
        pyr.append(
            jax.image.resize(pyr[-1], (h // 2, w // 2), method="linear")
        )
    return pyr


def _int_patch(img: jax.Array, x0: jax.Array, y0: jax.Array, size: int):
    """ONE gather of a size x size integer patch with replicated borders.
    All bilinear taps and gradient shifts are then slices of this patch —
    the per-iteration cost is one gather instead of four (the LK loop is
    gather-latency bound on TPU: 1.45 s -> ~0.4 s per 16-frame clip)."""
    h, w = img.shape
    ys = jnp.clip(y0 + jnp.arange(size), 0, h - 1)
    xs = jnp.clip(x0 + jnp.arange(size), 0, w - 1)
    return img[ys[:, None], xs[None, :]]


def _bilinear_from(big: jax.Array, oy: int, ox: int, win: int,
                   dx: jax.Array, dy: jax.Array) -> jax.Array:
    """(2win+1)^2 bilinear patch from an integer patch, origin (oy, ox)."""
    p = big[oy : oy + 2 * win + 2, ox : ox + 2 * win + 2]
    p00, p01 = p[:-1, :-1], p[:-1, 1:]
    p10, p11 = p[1:, :-1], p[1:, 1:]
    return (
        p00 * (1 - dy) * (1 - dx)
        + p01 * (1 - dy) * dx
        + p10 * dy * (1 - dx)
        + p11 * dy * dx
    )


def _bilinear_patch(img: jax.Array, center: jax.Array, win: int) -> jax.Array:
    """Sample a (2win+1)^2 patch around float center (x, y)."""
    x0 = jnp.floor(center[0]).astype(jnp.int32)
    y0 = jnp.floor(center[1]).astype(jnp.int32)
    dx = center[0] - x0
    dy = center[1] - y0
    big = _int_patch(img, x0 - win, y0 - win, 2 * win + 2)
    return _bilinear_from(big, 0, 0, win, dx, dy)


def _track_level(prev_img, next_img, p_prev, p_guess, win, iters):
    """LK iterations for one point at one pyramid level."""
    # template + central-difference gradients from ONE integer gather
    x0 = jnp.floor(p_prev[0]).astype(jnp.int32)
    y0 = jnp.floor(p_prev[1]).astype(jnp.int32)
    dx0 = p_prev[0] - x0
    dy0 = p_prev[1] - y0
    big = _int_patch(prev_img, x0 - win - 1, y0 - win - 1, 2 * win + 4)
    tpl = _bilinear_from(big, 1, 1, win, dx0, dy0)
    gx = (_bilinear_from(big, 1, 2, win, dx0, dy0)
          - _bilinear_from(big, 1, 0, win, dx0, dy0)) / 2
    gy = (_bilinear_from(big, 2, 1, win, dx0, dy0)
          - _bilinear_from(big, 0, 1, win, dx0, dy0)) / 2
    gxx = jnp.sum(gx * gx)
    gxy = jnp.sum(gx * gy)
    gyy = jnp.sum(gy * gy)
    det = gxx * gyy - gxy * gxy
    inv = jnp.where(
        jnp.abs(det) > 1e-6,
        jnp.asarray([[gyy, -gxy], [-gxy, gxx]]) / jnp.where(det == 0, 1.0, det),
        jnp.zeros((2, 2)),
    )

    def body(_, p):
        cur = _bilinear_patch(next_img, p, win)
        diff = tpl - cur
        b = jnp.asarray([jnp.sum(diff * gx), jnp.sum(diff * gy)])
        return p + inv @ b

    return jax.lax.fori_loop(0, iters, body, p_guess)


def lk_track_pair(
    prev_rgb: jax.Array,
    next_rgb: jax.Array,
    points: jax.Array,
    levels: int = 3,
    win: int = 7,
    iters: int = 10,
) -> jax.Array:
    """Track (Q, 2) pixel points from prev to next frame."""
    pg = _gray(prev_rgb)
    ng = _gray(next_rgb)
    ppyr = _pyramid(pg, levels)
    npyr = _pyramid(ng, levels)

    def one_point(p):
        guess = p / (2 ** (levels - 1))
        for lvl in range(levels - 1, -1, -1):
            p_lvl = p / (2 ** lvl)
            guess = _track_level(
                ppyr[lvl], npyr[lvl], p_lvl, guess, win, iters
            )
            if lvl > 0:
                guess = guess * 2.0
        return guess

    return jax.vmap(one_point)(points.astype(jnp.float32))


def lk_track_clip(
    clip: jax.Array,          # (T, H, W, 3)
    depths: jax.Array,        # (T, H, W)
    query_points: jax.Array,  # (Q, 2) pixel coords in frame 0
    levels: int = 3,
    win: int = 7,
    iters: int = 10,
) -> jax.Array:
    """SpaTracker-interface tracking: (T, Q, 3) (x, y, depth).

    Depth per track is sampled from the per-frame depth maps at the
    tracked position (predictor.py:209-218 behavior).
    """
    t, h, w, _ = clip.shape

    def step(p, i):
        nxt = lk_track_pair(clip[i], clip[i + 1], p, levels, win, iters)
        return nxt, nxt

    p0 = query_points.astype(jnp.float32)
    _, rest = jax.lax.scan(step, p0, jnp.arange(t - 1))
    pts = jnp.concatenate([p0[None], rest], axis=0)  # (T, Q, 2)

    xs = jnp.clip(jnp.round(pts[..., 0]).astype(jnp.int32), 0, w - 1)
    ys = jnp.clip(jnp.round(pts[..., 1]).astype(jnp.int32), 0, h - 1)
    z = depths[jnp.arange(t)[:, None], ys, xs]
    return jnp.concatenate([pts, z[..., None]], axis=-1)


def mask_query_points(
    mask: jax.Array, max_points: int, key: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Seed query points inside a segmentation mask
    (predictor.py:160-175: mask-seeded queries capped at a budget).

    Returns ((max_points, 2) xy pixel coords, valid mask).
    """
    h, w = mask.shape
    flat = mask.reshape(-1).astype(jnp.float32)
    n_valid = jnp.sum(flat).astype(jnp.int32)
    logits = jnp.where(flat > 0, 0.0, -jnp.inf)
    g = jax.random.gumbel(key, (h * w,)) + logits
    _, idx = jax.lax.top_k(g, max_points)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    valid = jnp.arange(max_points) < n_valid
    return jnp.stack([xs, ys], axis=-1), valid
