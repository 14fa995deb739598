"""DepthAnything pipeline wrapper: the `DepthAnything` class API of the
reference (metric_depth/depth.py:13-63) on the flax model.

`get_depth` / `get_only_depth` match the reference signatures: infer
metric depth, nearest-resize to the target size, optionally back-project
to a colored point cloud with pinhole intrinsics.  Batched variants add
the TPU-native path the reference lacks (per-frame python loop,
7_get_object_trajectory.py:112-124 -> one vmapped call here).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from egoscaler_tpu.geometry.camera import backproject_depth
from egoscaler_tpu.models.depth_anything import (
    DepthAnythingConfig,
    DepthAnythingV2,
    infer_depth,
    preprocess_image,
)
from egoscaler_tpu.models.convert import convert_depth_anything, load_torch_file


def _nearest_resize(depth: jax.Array, size: Tuple[int, int]) -> jax.Array:
    return jax.image.resize(depth, size, method="nearest")


class DepthAnything:
    """Reference-compatible wrapper (depth.py:13-63)."""

    def __init__(
        self,
        cfg: Optional[DepthAnythingConfig] = None,
        checkpoint_path: Optional[str] = None,
        params=None,
        input_size: int = 518,
        rng_seed: int = 0,
    ):
        self.cfg = cfg or DepthAnythingConfig.vitl()
        self.model = DepthAnythingV2(self.cfg)
        self.input_size = input_size
        if params is not None:
            self.params = params
        elif checkpoint_path is not None:
            sd = load_torch_file(checkpoint_path)
            self.params = convert_depth_anything(sd, depth=self.cfg.depth)
        else:
            # random init (tests / smoke runs without the reference ckpt)
            dummy = jnp.zeros((1, 112, 112, 3), jnp.float32)
            self.params = self.model.init(jax.random.PRNGKey(rng_seed), dummy)
        self._jit_forward = jax.jit(self.model.apply)

    def infer(self, image: jax.Array) -> jax.Array:
        """(H, W, 3) rgb [0,255] -> (H, W) metric depth at input res."""
        x, (h, w) = preprocess_image(image, self.input_size)
        depth = self._jit_forward(self.params, x)[0]
        return _nearest_resize(depth, (h, w))

    def get_only_depth(
        self, image: jax.Array, final_width: int, final_height: int
    ) -> jax.Array:
        depth = self.infer(image)
        return _nearest_resize(depth, (final_height, final_width))

    def get_depth(
        self,
        image: jax.Array,
        final_width: int,
        final_height: int,
        focal_len_x: float = 0.0,
        focal_len_y: float = 0.0,
        principal_point: float = 0.0,
    ):
        z = self.get_only_depth(image, final_width, final_height)
        if focal_len_x > 0 and focal_len_y > 0 and principal_point > 0:
            points = backproject_depth(
                z, focal_len_x, focal_len_y, principal_point
            ).reshape(-1, 3)
            img = jax.image.resize(
                image.astype(jnp.float32),
                (final_height, final_width, 3),
                method="nearest",
            )
            colors = img.reshape(-1, 3) / 255.0
        else:
            points, colors = None, None
        return z, points, colors

    def get_depth_batch(self, images: jax.Array) -> jax.Array:
        """(T, H, W, 3) uint8 clip -> (T, H, W) depth in ONE compiled call
        (the TPU replacement for the reference's per-frame loop)."""
        t, h, w, _ = images.shape
        x = images.astype(jnp.float32) / 255.0
        # resize all frames once
        nh = int(round(h * self.input_size / min(h, w) / 14) * 14)
        nw = int(round(w * self.input_size / min(h, w) / 14) * 14)
        x = jax.image.resize(x, (t, nh, nw, 3), method="bicubic")
        from egoscaler_tpu.models.depth_anything import IMAGENET_MEAN, IMAGENET_STD

        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        depth = self._jit_forward(self.params, x)
        return jax.image.resize(depth, (t, h, w), method="nearest")
