"""Input perturbations modeling real pipeline noise.

The trajectory extractor's production inputs are dirty: metric depth
comes from DepthAnything (noisy, effectively quantized, with invalid
regions — 7_get_object_trajectory.py:112-124 feeds it straight into
registration, pcm_tools.py:5-66), and tracks come from the tracker with
pixel jitter and dropouts.  These helpers synthesize those corruptions
on the clean rendered clips so tests and the ROBUSTNESS.json curve can
bound the degradation (host-side test tooling -> pure numpy).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def perturb_depth(
    rgbd: np.ndarray,
    rng: np.random.Generator,
    noise_frac: float = 0.0,
    quant_step: float = 0.0,
    hole_frac: float = 0.0,
    keep_px: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Corrupt the depth channel of an RGBD clip (T, H, W, 4).

    noise_frac: multiplicative gaussian sigma (0.03 = +-3% depth noise).
    quant_step: round depth to this step in meters (0.01 = 1 cm levels,
      the effective resolution of 8-bit-normalized depth maps).
    hole_frac: fraction of valid pixels zeroed (invalid depth; the
      extractor's d_thres/validity mask must drop them).
    keep_px: optional (T, Q, 2) integer (x, y) pixels protected from
      holes — the reference samples depth at track pixels with NO
      validity filtering (7_get:224 `np.mean(depth[ys, xs] / zs)`), so
      holes there bias the scale for reference and rebuild alike; tests
      separate that known bias from registration robustness.
    """
    out = np.array(rgbd, np.float32, copy=True)
    depth = out[..., 3]
    valid = depth > 0
    if noise_frac:
        depth = np.where(
            valid, depth * (1.0 + noise_frac * rng.standard_normal(depth.shape)), 0.0
        ).astype(np.float32)
    if quant_step:
        depth = np.where(valid, np.round(depth / quant_step) * quant_step, 0.0)
    if hole_frac:
        holes = (rng.uniform(size=depth.shape) < hole_frac) & valid
        if keep_px is not None:
            protect = np.zeros(depth.shape, bool)
            t_ix = np.repeat(np.arange(depth.shape[0]), keep_px.shape[1])
            xs = np.clip(keep_px[..., 0].reshape(-1), 0, depth.shape[2] - 1)
            ys = np.clip(keep_px[..., 1].reshape(-1), 0, depth.shape[1] - 1)
            protect[t_ix, ys, xs] = True
            holes &= ~protect
        depth = np.where(holes, 0.0, depth)
    out[..., 3] = depth.astype(np.float32)
    return out


def perturb_tracks(
    tracks: np.ndarray,
    rng: np.random.Generator,
    jitter_px: float = 0.0,
    jitter_z_frac: float = 0.0,
    dropout_frac: float = 0.0,
    frame_size: Optional[Tuple[int, int]] = None,
) -> np.ndarray:
    """Corrupt tracker output (T, Q, 3) = (x px, y px, z m).

    jitter_px: gaussian pixel noise on x/y (frame 0 is left exact —
      the queries are seeded there).
    jitter_z_frac: multiplicative gaussian noise on the sampled depth.
    dropout_frac: fraction of queries pushed out of frame in one later
      frame; `validate_tracks` (7_get:205-214 semantics) must drop them
      from every computation.
    """
    out = np.array(tracks, np.float32, copy=True)
    t = out.shape[0]
    if jitter_px and t > 1:
        out[1:, :, :2] += jitter_px * rng.standard_normal(out[1:, :, :2].shape)
    if jitter_z_frac and t > 1:
        out[1:, :, 2] *= 1.0 + jitter_z_frac * rng.standard_normal(out[1:, :, 2].shape)
    if dropout_frac and t > 1:
        q = out.shape[1]
        n_drop = int(round(dropout_frac * q))
        if n_drop:
            drop = rng.choice(q, size=n_drop, replace=False)
            if frame_size is None:
                raise ValueError("dropout_frac needs frame_size=(w, h)")
            out[min(1, t - 1), drop, 0] = frame_size[0] + 50.0  # off-frame x
    return out
