"""Trajectory resampling and smoothing, jittable.

Reference: egoscaler/models/utils/traj_utils.py (numpy, data-dependent
shapes).  Here trajectories are fixed-shape (T_max, D) with a validity
count `length`, so both ops compile once for the padded shape.
"""
from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def preprocess_traj(
    traj: jax.Array,
    length: Union[int, jax.Array],
    num_steps: int,
) -> Tuple[jax.Array, jax.Array]:
    """Resample the first `length` rows of `traj` to exactly `num_steps`.

    Semantics of traj_utils.py:3-39:
      * length >= num_steps: take rows at linspace(0, length-1, num_steps)
        cast to int (floor, like numpy .astype(int));
      * length < num_steps: keep rows and pad with the last valid row.

    Returns (sampled (num_steps, D), padding_mask (num_steps,) int 1=real).
    """
    t_max = traj.shape[0]
    length = jnp.asarray(length, jnp.int32)
    lengthf = length.astype(jnp.float32)

    steps = jnp.arange(num_steps, dtype=jnp.float32)
    # indices for the downsampling branch: linspace(0, L-1, num_steps)
    down_idx = jnp.floor(steps * (lengthf - 1.0) / max(num_steps - 1, 1)).astype(
        jnp.int32
    )
    # indices for the padding branch: 0..L-1 then repeat L-1
    pad_idx = jnp.minimum(jnp.arange(num_steps, dtype=jnp.int32), length - 1)

    use_down = length >= num_steps
    idx = jnp.where(use_down, down_idx, pad_idx)
    idx = jnp.clip(idx, 0, t_max - 1)
    sampled = traj[idx]
    mask = jnp.where(
        use_down,
        jnp.ones((num_steps,), jnp.int32),
        (jnp.arange(num_steps) < length).astype(jnp.int32),
    )
    return sampled, mask


def smoothing_traj(traj: jax.Array, length: Union[int, jax.Array]) -> jax.Array:
    """5-tap position smoothing with the reference's boundary weights
    (traj_utils.py:41-97), applied to traj[:, :3]; rotation dims pass
    through.  Rows at index >= length are left untouched.

    The reference's general case averages [j-2 .. j+2] equally; boundary
    frames use the special-cased weights.  We reproduce them exactly for
    length >= 4 (clips shorter than 4 frames keep the reference's shorter
    fallbacks).
    """
    t_max, _ = traj.shape
    length = jnp.asarray(length, jnp.int32)
    pos = traj[:, :3]
    idx = jnp.arange(t_max)

    def row(j):
        lm1 = length - 1

        def at(k):
            return pos[jnp.clip(k, 0, t_max - 1)]

        # general: (p[j-2]+p[j-1]+p[j]+p[j+1]+p[j+2]) / 5
        general = (at(j - 2) + at(j - 1) + at(j) + at(j + 1) + at(j + 2)) / 5.0
        # j == 0: (3 p0 + p1 + p2)/5   (L>=3), (3 p0 + p1)/4 (L==2), p0 (L==1)
        first = jnp.where(
            length >= 3,
            (3.0 * at(0) + at(1) + at(2)) / 5.0,
            jnp.where(length == 2, (3.0 * at(0) + at(1)) / 4.0, at(0)),
        )
        # j == 1: (2 p0 + p1 + p2 + p3)/5 (L>=4), (2 p0 + p1 + p2)/4 (L==3)
        second = jnp.where(
            length >= 4,
            (2.0 * at(0) + at(1) + at(2) + at(3)) / 5.0,
            jnp.where(length == 3, (2.0 * at(0) + at(1) + at(2)) / 4.0, at(j)),
        )
        # j == L-2: (p[j-2]+p[j-1]+p[j]+p[j+1])/4 (L>=4), (p[j-1]+p[j]+p[j+1])/3 (L==3)
        second_last = jnp.where(
            length >= 4,
            (at(j - 2) + at(j - 1) + at(j) + at(j + 1)) / 4.0,
            jnp.where(length == 3, (at(j - 1) + at(j) + at(j + 1)) / 3.0, at(j)),
        )
        # j == L-1: (p[j-2]+p[j-1]+p[j])/3 (L>=3), (p[j-1]+p[j])/2 (L==2)
        last = jnp.where(
            length >= 3,
            (at(j - 2) + at(j - 1) + at(j)) / 3.0,
            jnp.where(length == 2, (at(j - 1) + at(j)) / 2.0, at(j)),
        )
        out = general
        out = jnp.where(j == lm1 - 1, second_last, out)
        out = jnp.where(j == lm1, last, out)
        out = jnp.where(j == 1, second, out)
        out = jnp.where(j == 0, first, out)
        # rows beyond length untouched
        return jnp.where(j < length, out, at(j))

    smoothed = jax.vmap(row)(idx)
    return jnp.concatenate([smoothed, traj[:, 3:]], axis=-1)


def smoothing_traj_np(traj: np.ndarray) -> np.ndarray:
    """Numpy convenience wrapper for host-side dataset preprocessing."""
    out = np.asarray(smoothing_traj(jnp.asarray(traj), traj.shape[0]))
    return out
