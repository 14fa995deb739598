"""Fisheye624 -> pinhole undistortion as a JAX gather kernel.

TPU-native replacement for projectaria's `distort_by_calibration`
(SURVEY.md §2.3): precompute the pinhole->fisheye sampling map once per
calibration, then every frame is one bilinear gather on device — the
whole 80-frame clip undistorts in a single vmapped call instead of 80
C++ round trips.

Fisheye624 model (projectaria convention): for a camera ray (x, y, z),
r = ||(x, y)|| / z, theta = atan(r); radial polynomial
  theta_d = theta * (1 + k0 th^2 + k1 th^4 + ... + k5 th^12)
distorted (a, b) = (x, y)/r * theta_d, plus tangential (p0, p1) and
thin-prism (s0..s3) terms; pixel = f * (a', b') + (cx, cy).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Fisheye624:
    """Aria RGB calibration: f, cx, cy, k0..k5, p0, p1, s0..s3."""

    f: float
    cx: float
    cy: float
    ks: Tuple[float, ...] = (0.0,) * 6
    ps: Tuple[float, float] = (0.0, 0.0)
    ss: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0)

    def project(self, rays: jax.Array) -> jax.Array:
        """(..., 3) camera rays -> (..., 2) fisheye pixel coords."""
        x, y, z = rays[..., 0], rays[..., 1], rays[..., 2]
        r = jnp.sqrt(x * x + y * y)
        theta = jnp.arctan2(r, z)
        th2 = theta * theta
        poly = jnp.ones_like(theta)
        tp = th2
        for k in self.ks:
            poly = poly + k * tp
            tp = tp * th2
        theta_d = theta * poly
        inv_r = jnp.where(r > 1e-8, 1.0 / r, 0.0)
        a = x * inv_r * theta_d
        b = y * inv_r * theta_d
        # tangential + thin-prism
        r2 = a * a + b * b
        p0, p1 = self.ps
        s0, s1, s2, s3 = self.ss
        a2 = a + (2 * p0 * a * b + p1 * (r2 + 2 * a * a)) + (s0 * r2 + s1 * r2 * r2)
        b2 = b + (p0 * (r2 + 2 * b * b) + 2 * p1 * a * b) + (s2 * r2 + s3 * r2 * r2)
        u = self.f * a2 + self.cx
        v = self.f * b2 + self.cy
        return jnp.stack([u, v], axis=-1)


def build_undistort_map(
    calib: Fisheye624,
    out_size: int,
    out_focal: float,
    out_pp: float,
) -> jax.Array:
    """(H, W, 2) fisheye source coords for each pinhole target pixel."""
    u = jax.lax.broadcasted_iota(jnp.float32, (out_size, out_size), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (out_size, out_size), 0)
    rays = jnp.stack(
        [(u - out_pp) / out_focal, (v - out_pp) / out_focal, jnp.ones_like(u)],
        axis=-1,
    )
    return calib.project(rays)


def remap_bilinear(image: jax.Array, src_map: jax.Array) -> jax.Array:
    """Gather `image` (H, W, C) at float coords (H', W', 2) (u, v)."""
    h, w = image.shape[:2]
    x = src_map[..., 0]
    y = src_map[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0)[..., None]
    dy = (y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    inside = (
        (x >= 0) & (x < w - 1) & (y >= 0) & (y < h - 1)
    )[..., None]

    def at(yy, xx):
        return image[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]

    out = (
        at(y0, x0) * (1 - dy) * (1 - dx)
        + at(y0, x0 + 1) * (1 - dy) * dx
        + at(y0 + 1, x0) * dy * (1 - dx)
        + at(y0 + 1, x0 + 1) * dy * dx
    )
    return jnp.where(inside, out, 0.0)


def undistort_clip(
    frames: jax.Array,
    calib: Fisheye624,
    out_size: int,
    out_focal: float,
    out_pp: float,
) -> jax.Array:
    """(T, H, W, C) fisheye frames -> (T, S, S, C) pinhole, one gather."""
    src = build_undistort_map(calib, out_size, out_focal, out_pp)
    return jax.vmap(lambda f: remap_bilinear(f.astype(jnp.float32), src))(frames)
