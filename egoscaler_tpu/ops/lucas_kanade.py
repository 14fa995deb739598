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


def _bilinear_patch(img: jax.Array, center: jax.Array, win: int) -> jax.Array:
    """Sample a (2win+1)^2 patch around float center (x, y)."""
    h, w = img.shape
    off = jnp.arange(-win, win + 1, dtype=jnp.float32)
    gy = center[1] + off[:, None]
    gx = center[0] + off[None, :]
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    dx = gx - x0
    dy = gy - y0

    def at(yy, xx):
        yy = jnp.clip(yy.astype(jnp.int32), 0, h - 1)
        xx = jnp.clip(xx.astype(jnp.int32), 0, w - 1)
        return img[yy, xx]

    return (
        at(y0, x0) * (1 - dy) * (1 - dx)
        + at(y0, x0 + 1) * (1 - dy) * dx
        + at(y0 + 1, x0) * dy * (1 - dx)
        + at(y0 + 1, x0 + 1) * dy * dx
    )


def _track_level(prev_img, next_img, p_prev, p_guess, win, iters):
    """LK iterations for one point at one pyramid level."""
    tpl = _bilinear_patch(prev_img, p_prev, win)
    # spatial gradients of the template (central differences)
    gx = (_bilinear_patch(prev_img, p_prev + jnp.asarray([1.0, 0.0]), win)
          - _bilinear_patch(prev_img, p_prev + jnp.asarray([-1.0, 0.0]), win)) / 2
    gy = (_bilinear_patch(prev_img, p_prev + jnp.asarray([0.0, 1.0]), win)
          - _bilinear_patch(prev_img, p_prev + jnp.asarray([0.0, -1.0]), win)) / 2
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
