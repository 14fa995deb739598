"""RT-2 style 6DoF trajectory token codec.

The reference declares the vocabulary (models/pointllm/constant.py:1-26,
builder.py:33-46) and the string->float parser
(models/pointllm/utils/utils.py:13-104) but the dataset's
`tokenize_traj`/`detokenize_traj` are missing from the snapshot
(SURVEY.md §8.1).  This module defines the codec explicitly, consistent
with every surviving consumer:

* a trajectory of `num_steps` waypoints, each 6 dims (x y z rx ry rz),
  normalized to [-1, 1] (workspace bounds for xyz — dataset.py:139-145 —
  and /pi for rotvec), is discretized into `num_bins` bins
  (utils.py:13-16: np.digitize against linspace(-1, 1, bins) minus 1);
* the token string is "<ts> wp0 <tsep> wp1 <tsep> ... wpN-1 <te>" where
  each wp is "<px> <py> <pz> <prx> <pry> <prz>" — space-separated to match
  the parser regex (utils.py:55) and split on "<tsep>" (utils.py:62);
* the training collate puts everything through the FIRST <tsep> into the
  prompt (dataset.py:180-182), i.e. the initial waypoint conditions
  generation and the model decodes the remaining waypoints.

Both a host-side (string/numpy) codec and a device-side (token-id jax)
codec are provided; the device codec lets decode->metric run fully jitted.

Token-id layout (appended after the base LLM vocab, builder.py:40-41):
  base_vocab + 0: <ts>   base_vocab + 1: <tsep>   base_vocab + 2: <te>
  base_vocab + 3 + b: <p{b}> for b in [0, num_bins)
"""
from __future__ import annotations

import dataclasses
import re
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from egoscaler_tpu.configs import TrajTokenConfig, WorkspaceConfig, AriaCameraConfig

_RT2_SEG_PATTERN = re.compile(
    r"<p(\d+)> <p(\d+)> <p(\d+)> <p(\d+)> <p(\d+)> <p(\d+)>"
)


# --------------------------------------------------------------------------
# Normalization (dataset.py:139-145 denorm, inverted for the forward path)
# --------------------------------------------------------------------------

def normalize_traj(
    traj: np.ndarray | jax.Array, ws: WorkspaceConfig = WorkspaceConfig()
) -> jax.Array:
    """Map camera-frame (T, 6) [xyz rotvec] into [-1, 1] per dim."""
    traj = jnp.asarray(traj)
    x = (traj[..., 0] - ws.min_x) / (ws.max_x - ws.min_x) * 2.0 - 1.0
    y = (traj[..., 1] - ws.min_y) / (ws.max_y - ws.min_y) * 2.0 - 1.0
    z = (traj[..., 2] - ws.min_z) / (ws.max_z - ws.min_z) * 2.0 - 1.0
    rot = traj[..., 3:6] / jnp.pi
    return jnp.concatenate(
        [jnp.stack([x, y, z], axis=-1), rot], axis=-1
    )


def denormalize_traj(
    traj: np.ndarray | jax.Array, ws: WorkspaceConfig = WorkspaceConfig()
) -> jax.Array:
    """Inverse of normalize_traj — exactly dataset.py:139-145."""
    traj = jnp.asarray(traj)
    p = (traj[..., :3] + 1.0) / 2.0
    x = p[..., 0] * (ws.max_x - ws.min_x) + ws.min_x
    y = p[..., 1] * (ws.max_y - ws.min_y) + ws.min_y
    z = p[..., 2] * (ws.max_z - ws.min_z) + ws.min_z
    rot = traj[..., 3:6] * jnp.pi
    return jnp.concatenate([jnp.stack([x, y, z], axis=-1), rot], axis=-1)


# --------------------------------------------------------------------------
# Bin discretization (utils.py:13-21)
# --------------------------------------------------------------------------

def discretize(values: jax.Array, num_bins: int = 256) -> jax.Array:
    """values in [-1, 1] -> bin ids in [0, num_bins-1].

    np.digitize(v, linspace(-1, 1, B)) - 1 == searchsorted(bins, v, 'right') - 1.
    Out-of-range values clamp to the boundary bins.
    """
    bins = jnp.linspace(-1.0, 1.0, num_bins)
    idx = jnp.searchsorted(bins, values, side="right") - 1
    return jnp.clip(idx, 0, num_bins - 1).astype(jnp.int32)


def undiscretize(bin_ids: jax.Array, num_bins: int = 256) -> jax.Array:
    """bin ids -> bin left edges (utils.py:18-21 token_to_action)."""
    bins = jnp.linspace(-1.0, 1.0, num_bins)
    return bins[jnp.clip(bin_ids, 0, num_bins - 1)]


# --------------------------------------------------------------------------
# RT-2 pixel-space scaler (utils.py:23-34) — kept for parity with the
# reference's alternative (pixel/depth) trajectory encoding.
# --------------------------------------------------------------------------

def rt2_scaler(
    traj: np.ndarray,
    maxmin: Tuple[float, float],
    camera: AriaCameraConfig = AriaCameraConfig(),
) -> np.ndarray:
    """De-scale [-1,1]-normalized (u, v, z, rot) into camera coords."""
    traj = np.array(traj, dtype=np.float32, copy=True)
    d_max, d_min = maxmin
    traj[:, [3, 4, 5]] = np.pi * traj[:, [3, 4, 5]]
    traj[:, 2] = 0.5 * traj[:, 2] + 0.5
    traj[:, 2] = (d_max - d_min) * traj[:, 2] + d_min
    w = camera.pinhole_image_size
    traj[:, 0] = (w / 2) * traj[:, 0] + (w / 2)
    traj[:, 0] = (traj[:, 0] - camera.principal_point) * traj[:, 2] / camera.focal_len
    traj[:, 1] = (w / 2) * traj[:, 1] + (w / 2)
    traj[:, 1] = (traj[:, 1] - camera.principal_point) * traj[:, 2] / camera.focal_len
    return traj


# --------------------------------------------------------------------------
# Codec
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TrajTokenizer:
    """Bidirectional trajectory <-> token codec.

    `base_vocab_size` is the LLM vocab before trajectory tokens were added
    (32003 for PointLLM_7B_v1.2 — builder.py:44 resizes after adding).
    """

    cfg: TrajTokenConfig = TrajTokenConfig()
    ws: WorkspaceConfig = WorkspaceConfig()
    base_vocab_size: int = 32003

    # ---- token ids ----
    @property
    def ts_id(self) -> int:
        return self.base_vocab_size

    @property
    def tsep_id(self) -> int:
        return self.base_vocab_size + 1

    @property
    def te_id(self) -> int:
        return self.base_vocab_size + 2

    @property
    def bin0_id(self) -> int:
        return self.base_vocab_size + 3

    @property
    def vocab_size(self) -> int:
        return self.base_vocab_size + 3 + self.cfg.num_bins

    def tokens_per_traj(self, num_steps: Optional[int] = None) -> int:
        """<ts> + per-step (6 bins) + (num_steps-1) <tsep> + <te>."""
        n = self.cfg.num_steps if num_steps is None else num_steps
        return 1 + 6 * n + (n - 1) + 1

    # ---- device-side codec (token ids) ----
    def encode_ids(self, traj: jax.Array) -> jax.Array:
        """(T, 6) camera-frame waypoints -> (1 + 7T, ) token ids.

        Layout: <ts> b0..b5 <tsep> b0..b5 <tsep> ... b0..b5 <te>
        (every waypoint is followed by a separator; the last by <te>).
        """
        n = traj.shape[0]
        normed = normalize_traj(traj, self.ws)
        bins = discretize(normed, self.cfg.num_bins) + self.bin0_id  # (T, 6)
        seps = jnp.full((n, 1), self.tsep_id, jnp.int32)
        body = jnp.concatenate([bins, seps], axis=-1).reshape(-1)  # (7T,)
        body = body.at[-1].set(self.te_id)
        return jnp.concatenate(
            [jnp.array([self.ts_id], jnp.int32), body]
        )

    def decode_ids(self, token_ids: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Token ids (L,) -> ((T_max, 6) camera-frame waypoints, count).

        Jit-friendly: scans for runs of 6 consecutive bin tokens between
        separators; malformed segments repeat the previous waypoint
        (utils.py:91-93 behavior).  T_max = cfg.num_steps.
        """
        t_max = self.cfg.num_steps
        token_ids = jnp.asarray(token_ids)  # scan body indexes with a tracer
        length = token_ids.shape[0]
        is_bin = (token_ids >= self.bin0_id) & (token_ids < self.bin0_id + self.cfg.num_bins)
        bin_val = jnp.where(is_bin, token_ids - self.bin0_id, 0)
        is_sep = (token_ids == self.tsep_id) | (token_ids == self.te_id)

        def step(carry, i):
            wp_buf, wp_fill, out, out_cnt, last_wp, have_last = carry
            b = bin_val[i]
            take_bin = is_bin[i] & (wp_fill < 6)
            wp_buf = jnp.where(
                take_bin, wp_buf.at[jnp.minimum(wp_fill, 5)].set(b), wp_buf
            )
            wp_fill = jnp.where(take_bin, wp_fill + 1, wp_fill)

            close = is_sep[i]
            complete = close & (wp_fill == 6)
            fallback = close & (wp_fill != 6) & have_last
            emit = (complete | fallback) & (out_cnt < t_max)
            new_wp = jnp.where(complete, wp_buf, last_wp)
            out = jnp.where(
                emit, out.at[jnp.minimum(out_cnt, t_max - 1)].set(new_wp), out
            )
            out_cnt = jnp.where(emit, out_cnt + 1, out_cnt)
            last_wp = jnp.where(complete, wp_buf, last_wp)
            have_last = have_last | complete
            wp_fill = jnp.where(close, 0, wp_fill)
            return (wp_buf, wp_fill, out, out_cnt, last_wp, have_last), None

        init = (
            jnp.zeros((6,), jnp.int32),
            jnp.asarray(0, jnp.int32),
            jnp.zeros((t_max, 6), jnp.int32),
            jnp.asarray(0, jnp.int32),
            jnp.zeros((6,), jnp.int32),
            jnp.asarray(False),
        )
        (wp_buf, wp_fill, out, out_cnt, last_wp, have_last), _ = jax.lax.scan(
            step, init, jnp.arange(length)
        )
        # handle a trailing waypoint with no closing separator (e.g. cut off
        # at max tokens): emit it if complete
        trailing = (wp_fill == 6) & (out_cnt < t_max)
        out = jnp.where(
            trailing, out.at[jnp.minimum(out_cnt, t_max - 1)].set(wp_buf), out
        )
        out_cnt = jnp.where(trailing, out_cnt + 1, out_cnt)

        values = undiscretize(out, self.cfg.num_bins)
        traj = denormalize_traj(values, self.ws)
        return traj, out_cnt

    # ---- host-side codec (strings, for HF-tokenizer interop) ----
    def encode_str(self, traj: np.ndarray) -> str:
        normed = np.asarray(normalize_traj(np.asarray(traj), self.ws))
        bins = np.asarray(discretize(jnp.asarray(normed), self.cfg.num_bins))
        wps = [
            " ".join(self.cfg.rt2_template.format(p=int(b)) for b in row)
            for row in bins
        ]
        return self.cfg.ts_token + self.cfg.tsep_token.join(wps) + self.cfg.te_token

    def decode_str(self, text: str) -> Optional[np.ndarray]:
        """String -> (T, 6) camera-frame waypoints (utils.py:47-104 shape).

        Returns None when no waypoint parses (the reference returns None).
        """
        text = text.replace(self.cfg.ts_token, "").replace(self.cfg.te_token, "")
        segments = text.split(self.cfg.tsep_token)
        rows = []
        last = None
        for seg in segments:
            m = _RT2_SEG_PATTERN.search(seg)
            if m:
                ids = np.array([int(g) for g in m.groups()], np.int64)
                vals = np.asarray(undiscretize(jnp.asarray(ids), self.cfg.num_bins))
                rows.append(vals)
                last = vals
            elif last is not None:
                rows.append(last)
        if not rows:
            return None
        normed = np.stack(rows).astype(np.float32)
        return np.asarray(denormalize_traj(jnp.asarray(normed), self.ws))
