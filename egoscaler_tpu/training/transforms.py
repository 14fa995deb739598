"""Image augmentation combinators, JAX-native.

Rebuild of models/utils/transforms.py (torchvision-v2 combinators
vendored from HF LeRobot): RandomSubsetApply, SharpnessJitter, and the
get_image_transforms factory — as pure functions over PRNG keys so a
whole augmentation pipeline jits into the input pipeline.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Transform = Callable[[jax.Array, jax.Array], jax.Array]  # (key, img) -> img


def adjust_brightness(img, factor):
    return jnp.clip(img * factor, 0.0, 1.0)


def adjust_contrast(img, factor):
    mean = jnp.mean(img, axis=(-3, -2, -1), keepdims=True)
    return jnp.clip((img - mean) * factor + mean, 0.0, 1.0)


def adjust_saturation(img, factor):
    gray = jnp.mean(img, axis=-1, keepdims=True)
    return jnp.clip(gray + (img - gray) * factor, 0.0, 1.0)


def adjust_hue(img, delta):
    """Approximate hue rotation in YIQ space (delta in [-0.5, 0.5] turns)."""
    theta = delta * 2.0 * jnp.pi
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    m = jnp.asarray(
        [
            [0.299, 0.587, 0.114],
            [0.596, -0.274, -0.322],
            [0.211, -0.523, 0.312],
        ]
    )
    minv = jnp.linalg.inv(m)
    rot = jnp.asarray(
        [[1.0, 0, 0], [0, cos, -sin], [0, sin, cos]]
    )
    out = img @ (minv @ rot @ m).T
    return jnp.clip(out, 0.0, 1.0)


def adjust_sharpness(img, factor):
    """Blend with a 3x3 smoothing kernel (SharpnessJitter,
    transforms.py:92)."""
    kernel = jnp.asarray(
        [[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]
    ) / 13.0
    blurred = jax.lax.conv_general_dilated(
        jnp.moveaxis(img, -1, 0)[:, None],
        kernel[None, None],
        (1, 1), "SAME",
    )[:, 0]
    blurred = jnp.moveaxis(blurred, 0, -1)
    out = img + (img - blurred) * (factor - 1.0)
    # borders keep the original (torchvision behavior)
    h, w = img.shape[-3], img.shape[-2]
    ry = jnp.arange(h)
    rx = jnp.arange(w)
    border = (
        (ry[:, None] == 0) | (ry[:, None] == h - 1)
        | (rx[None, :] == 0) | (rx[None, :] == w - 1)
    )[..., None]
    return jnp.clip(jnp.where(border, img, out), 0.0, 1.0)


@dataclasses.dataclass(frozen=True)
class RangeTransform:
    fn: Callable[[jax.Array, jax.Array], jax.Array]
    lo: float
    hi: float

    def __call__(self, key: jax.Array, img: jax.Array) -> jax.Array:
        f = jax.random.uniform(key, (), minval=self.lo, maxval=self.hi)
        return self.fn(img, f)


@dataclasses.dataclass(frozen=True)
class RandomSubsetApply:
    """Apply a random subset of transforms in random order
    (transforms.py:25-90)."""

    transforms: Tuple[RangeTransform, ...]
    n_subset: Optional[int] = None
    p: float = 1.0

    def __call__(self, key: jax.Array, img: jax.Array) -> jax.Array:
        n = len(self.transforms)
        k = self.n_subset or n
        k_apply, k_order, k_keys = jax.random.split(key, 3)
        do = jax.random.uniform(k_apply, ()) < self.p
        order = jax.random.permutation(k_order, n)[:k]
        keys = jax.random.split(k_keys, n)

        out = img
        # static unrolled order-independent application: each transform
        # applies iff its index is in the sampled subset
        for i, t in enumerate(self.transforms):
            sel = jnp.any(order == i)
            out = jnp.where(sel, t(keys[i], out), out)
        return jnp.where(do, out, img)


def get_image_transforms(
    brightness: Tuple[float, float] = (0.8, 1.2),
    contrast: Tuple[float, float] = (0.8, 1.2),
    saturation: Tuple[float, float] = (0.5, 1.5),
    hue: Tuple[float, float] = (-0.05, 0.05),
    sharpness: Tuple[float, float] = (0.8, 1.2),
    max_num_transforms: Optional[int] = 3,
    enable: bool = True,
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Factory (transforms.py:140-197): returns (key, img[0,1]) -> img."""
    if not enable:
        return lambda key, img: img
    ts = (
        RangeTransform(adjust_brightness, *brightness),
        RangeTransform(adjust_contrast, *contrast),
        RangeTransform(adjust_saturation, *saturation),
        RangeTransform(adjust_hue, *hue),
        RangeTransform(adjust_sharpness, *sharpness),
    )
    return RandomSubsetApply(ts, n_subset=max_num_transforms)
