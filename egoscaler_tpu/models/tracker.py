"""TPU-native 3D point tracker (SpaTracker-class architecture).

Rebuild of the reference tracker
(third_party/SpaTracker/models/spatracker/: BasicEncoder CNN, triplane
feature lifting via softmax splatting, EUpdateFormer iterative
refinement, sliding-window inference — SURVEY.md §2.2/§2.3), designed
TPU-first:

* BasicEncoder: instance-norm residual CNN, stride-4 features;
* triplane lifting: depth-guided softmax splatting (ops/softsplat.py —
  the Pallas/XLA rewrite of the CUDA kernels) of image features onto
  XY / XZ / YZ planes;
* iterative updates: a transformer alternating attention over the time
  axis and the track (space) axis predicts (dx, dy, dz) + visibility per
  iteration, consuming multi-scale correlation features sampled around
  the current estimates (CoTracker/SpaTracker scheme, 6 iterations);
* sliding-window predictor with overlap-carry (predictor.py:222).

The reference CUDA checkpoint is not directly loadable (different
backbone internals); this tracker trains from scratch or by distillation
from reference outputs.  The weight-free pyramidal-LK tracker
(ops/lucas_kanade.py) serves the same interface for bring-up.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from egoscaler_tpu.ops.softsplat import softsplat


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    feat_dim: int = 128
    stride: int = 4
    z_planes: int = 32          # depth bins for XZ / YZ triplanes
    corr_radius: int = 3
    corr_levels: int = 3
    update_dim: int = 256
    space_depth: int = 6
    time_depth: int = 6
    num_heads: int = 8
    iters: int = 6
    window: int = 12

    def tiny(self) -> "TrackerConfig":
        return dataclasses.replace(
            self, feat_dim=32, z_planes=8, update_dim=64,
            space_depth=1, time_depth=1, num_heads=4, iters=2, window=4,
        )


class ResBlock(nn.Module):
    dim: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.dim, (3, 3), strides=(self.stride, self.stride),
                    padding=1, name="conv1")(x)
        h = nn.GroupNorm(num_groups=8, name="norm1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.dim, (3, 3), padding=1, name="conv2")(h)
        h = nn.GroupNorm(num_groups=8, name="norm2")(h)
        if self.stride != 1 or x.shape[-1] != self.dim:
            x = nn.Conv(self.dim, (1, 1), strides=(self.stride, self.stride),
                        name="skip")(x)
        return nn.relu(x + h)


class BasicEncoder(nn.Module):
    """Stride-4 feature CNN (spatracker BasicEncoder equivalent)."""

    dim: int

    @nn.compact
    def __call__(self, images):  # (B, H, W, 3) in [0, 1]
        x = nn.Conv(self.dim // 2, (7, 7), strides=(2, 2), padding=3,
                    name="stem")(images)
        x = nn.GroupNorm(num_groups=8, name="stem_norm")(x)
        x = nn.relu(x)
        x = ResBlock(self.dim // 2, name="layer1")(x)
        x = ResBlock(self.dim, stride=2, name="layer2")(x)
        x = ResBlock(self.dim, name="layer3")(x)
        return nn.Conv(self.dim, (1, 1), name="head")(x)


def lift_triplanes(
    feats: jax.Array,   # (B, h, w, C) stride-s features
    depth: jax.Array,   # (B, h, w) depth at feature resolution
    z_planes: int,
    d_max: float = 8.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Softmax-splat features onto XY (identity), XZ, and YZ planes.

    The CUDA softsplat triplane construction (spatracker.py:539-733)
    expressed with ops.softsplat: target rows/cols are depth bins.
    """
    b, h, w, c = feats.shape
    f = jnp.moveaxis(feats, -1, 1)  # (B, C, h, w)
    zbin = jnp.clip(depth / d_max, 0.0, 1.0) * (z_planes - 1)
    metric = -jnp.abs(depth - jnp.mean(depth, axis=(1, 2), keepdims=True))[
        :, None
    ]  # sharper weight near median depth (reference uses learned metric)

    # XZ plane: map y -> z bin (flow moves rows to depth bins)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    flow_xz = jnp.stack(
        [jnp.zeros((b, h, w)), zbin - ys[None]], axis=1
    )
    xz = softsplat(f, flow_xz, metric, mode="softmax", out_hw=(z_planes, w))

    # YZ plane: map x -> z bin
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    flow_yz = jnp.stack(
        [zbin - xs[None], jnp.zeros((b, h, w))], axis=1
    )
    yz = softsplat(f, flow_yz, metric, mode="softmax", out_hw=(h, z_planes))

    return feats, jnp.moveaxis(xz, 1, -1), jnp.moveaxis(yz, 1, -1)


def _sample_feat(fm: jax.Array, xy: jax.Array) -> jax.Array:
    """Bilinear sample (h, w, C) at (Q, 2) float coords."""
    h, w, c = fm.shape
    x, y = xy[:, 0], xy[:, 1]
    x0 = jnp.floor(x); y0 = jnp.floor(y)
    dx = (x - x0)[:, None]; dy = (y - y0)[:, None]
    x0 = x0.astype(jnp.int32); y0 = y0.astype(jnp.int32)

    def at(yy, xx):
        return fm[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]

    return (
        at(y0, x0) * (1 - dy) * (1 - dx)
        + at(y0, x0 + 1) * (1 - dy) * dx
        + at(y0 + 1, x0) * dy * (1 - dx)
        + at(y0 + 1, x0 + 1) * dy * dx
    )


def build_pyramid(fmaps: jax.Array, levels: int) -> list:
    """(T, h, w, C) -> `levels` linearly-downsampled feature maps.
    Built ONCE per window: the old code rebuilt it inside every
    refinement iteration."""
    pyr = [fmaps]
    for _ in range(1, levels):
        t, h, w, c = pyr[-1].shape
        pyr.append(
            jax.image.resize(pyr[-1], (t, h // 2, w // 2, c), method="linear")
        )
    return pyr


def _sample_patches(fm_t: jax.Array, xy_t: jax.Array, radius: int) -> jax.Array:
    """Bilinear (2r+1)^2 patches around each track: (h,w,C), (Q,2) ->
    (Q, 2r+1, 2r+1, C).

    All patch points of one track share the SAME fractional offset, so
    instead of (2r+1)^2 x 4 scattered row gathers (profiled at 47 GB/s
    effective, 97 ms/clip) we block-gather ONE integer-aligned
    (2r+2)^2 patch per track via vmapped dynamic_slice and blend the 4
    shifted sub-patches — identical math for in-bounds tracks; the map
    is edge-padded so near-border patches replicate edges like the
    per-pixel clamp did."""
    h, w, c = fm_t.shape
    d = 2 * radius + 2
    pad = radius + 1
    fmp = jnp.pad(fm_t, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    base = jnp.floor(xy_t)
    frac = xy_t - base  # (Q, 2) in [0, 1)
    sx = jnp.clip(base[:, 0].astype(jnp.int32) - radius + pad, 0, w + 2 * pad - d)
    sy = jnp.clip(base[:, 1].astype(jnp.int32) - radius + pad, 0, h + 2 * pad - d)
    patch = jax.vmap(
        lambda y, x: jax.lax.dynamic_slice(fmp, (y, x, 0), (d, d, c))
    )(sy, sx)  # (Q, d, d, C)
    wx = frac[:, 0][:, None, None, None]
    wy = frac[:, 1][:, None, None, None]
    return (
        patch[:, :-1, :-1] * (1 - wy) * (1 - wx)
        + patch[:, :-1, 1:] * (1 - wy) * wx
        + patch[:, 1:, :-1] * wy * (1 - wx)
        + patch[:, 1:, 1:] * wy * wx
    )


def _use_pallas_gather(q: int) -> bool:
    """Route the correlation gather through the Pallas DMA kernel
    (ops/patch_gather.py) on TPU.  The XLA gather lowering runs at
    ~100 GB/s and dominated the scaled tracker (ROUND6.md item 4);
    EGOSCALER_PATCH_GATHER={pallas,xla} forces either path."""
    import os

    mode = os.environ.get("EGOSCALER_PATCH_GATHER", "auto")
    if mode == "pallas":
        return True
    if mode == "xla":
        return False
    from egoscaler_tpu.ops.patch_gather import GROUP

    return jax.default_backend() == "tpu" and q % GROUP == 0


def corr_features(
    fmaps: jax.Array,    # (T, h, w, C) feature maps
    track_feat: jax.Array,  # (Q, C) template features
    coords: jax.Array,   # (T, Q, 2) current estimates (feature coords)
    radius: int,
    levels: int,
    pyramid: Optional[list] = None,
) -> jax.Array:
    """Multi-scale local correlation patches around current estimates
    (CoTracker corr pyramid): (T, Q, levels*(2r+1)^2).

    `pyramid`: optional precomputed `build_pyramid(fmaps, levels)`."""
    if pyramid is None:
        pyramid = build_pyramid(fmaps, levels)
    inv_sqrt_c = 1.0 / jnp.sqrt(track_feat.shape[-1]).astype(fmaps.dtype)
    t, q_ = coords.shape[:2]
    use_pallas = _use_pallas_gather(q_)
    outs = []
    for lvl, fm in enumerate(pyramid):
        scale = 2 ** lvl

        if use_pallas and fm.shape[-1] % 128 == 0:
            from egoscaler_tpu.ops.patch_gather import ROWS, corr_patches_tpu

            h, w = fm.shape[1:3]
            d = 2 * radius + 2
            pad = radius + 1
            # extra bottom rows: the kernel DMAs ROWS rows from the
            # 8-ALIGNED origin below sy (Mosaic sublane alignment), so
            # the map needs slack past the last legal origin
            fmp = jnp.pad(
                fm, ((0, 0), (pad, pad + ROWS), (pad, pad), (0, 0)),
                mode="edge",
            )
            xy = coords / scale                      # (T, Q, 2)
            base = jnp.floor(xy)
            frac = (xy - base).astype(jnp.float32)
            sx = jnp.clip(
                base[..., 0].astype(jnp.int32) - radius + pad,
                0, w + 2 * pad - d,
            )
            sy = jnp.clip(
                base[..., 1].astype(jnp.int32) - radius + pad,
                0, h + 2 * pad - d,
            )
            corr = corr_patches_tpu(
                fmp, sy.reshape(-1), sx.reshape(-1),
                frac.reshape(-1, 2), track_feat, radius=radius,
            )  # (T*Q, k, k) f32
            k = 2 * radius + 1
            outs.append(
                corr.reshape(t, q_, k * k).astype(fmaps.dtype) * inv_sqrt_c
            )
            continue

        def per_frame(fm_t, xy_t):
            pat = _sample_patches(fm_t, xy_t / scale, radius)  # (Q,k,k,C)
            corr = jnp.sum(pat * track_feat[:, None, None, :], axis=-1)
            return corr.reshape(pat.shape[0], -1) * inv_sqrt_c

        outs.append(jax.vmap(per_frame)(fm, coords))
    return jnp.concatenate(outs, axis=-1)


class UpdateFormer(nn.Module):
    """Alternating time/space attention (EUpdateFormer equivalent)."""

    cfg: TrackerConfig

    @nn.compact
    def __call__(self, tokens):  # (T, Q, D)
        cfg = self.cfg
        d = cfg.update_dim
        x = nn.Dense(d, name="input_proj")(tokens)
        for i in range(max(cfg.time_depth, cfg.space_depth)):
            if i < cfg.time_depth:
                # attend over time per track
                h = nn.LayerNorm(name=f"tnorm_{i}")(x)
                h = jnp.swapaxes(h, 0, 1)  # (Q, T, D)
                h = nn.MultiHeadDotProductAttention(
                    num_heads=cfg.num_heads, name=f"tattn_{i}"
                )(h, h)
                x = x + jnp.swapaxes(h, 0, 1)
            if i < cfg.space_depth:
                # attend over tracks per frame
                h = nn.LayerNorm(name=f"snorm_{i}")(x)
                h = nn.MultiHeadDotProductAttention(
                    num_heads=cfg.num_heads, name=f"sattn_{i}"
                )(h, h)
                x = x + h
            h = nn.LayerNorm(name=f"mnorm_{i}")(x)
            h = nn.Dense(d * 4, name=f"mlp1_{i}")(h)
            h = nn.gelu(h)
            x = x + nn.Dense(d, name=f"mlp2_{i}")(h)
        x = nn.LayerNorm(name="out_norm")(x)
        delta = nn.Dense(3, name="delta_head",
                         kernel_init=nn.initializers.zeros)(x)
        vis = nn.Dense(1, name="vis_head")(x)
        return delta, vis[..., 0]


class SpaTracker(nn.Module):
    """Window tracker: clip + depth + queries -> (T, Q, 3) + visibility."""

    cfg: TrackerConfig

    @nn.compact
    def __call__(
        self,
        clip: jax.Array,      # (T, H, W, 3) in [0, 1]
        depths: jax.Array,    # (T, H, W)
        queries: jax.Array,   # (Q, 3) (x, y, z) in frame 0, pixel coords
    ):
        cfg = self.cfg
        t, h, w, _ = clip.shape
        s = cfg.stride
        fmaps = BasicEncoder(cfg.feat_dim, name="fnet")(clip)  # (T, h/s, w/s, C)
        fdepth = jax.image.resize(
            depths, (t, h // s, w // s), method="nearest"
        )
        xy_pl, xz_pl, yz_pl = lift_triplanes(
            fmaps, fdepth, cfg.z_planes
        )

        q = queries.shape[0]
        q_feat_xy = _sample_feat(xy_pl[0], queries[:, :2] / s)
        zbin = jnp.clip(queries[:, 2] / 8.0, 0, 1) * (cfg.z_planes - 1)
        q_feat_xz = _sample_feat(
            xz_pl[0], jnp.stack([queries[:, 0] / s, zbin], -1)
        )
        q_feat_yz = _sample_feat(
            yz_pl[0], jnp.stack([zbin, queries[:, 1] / s], -1)
        )
        track_feat = nn.Dense(cfg.feat_dim, name="track_fuse")(
            jnp.concatenate([q_feat_xy, q_feat_xz, q_feat_yz], axis=-1)
        )

        coords = jnp.broadcast_to(queries[None, :, :2], (t, q, 2))
        zs = jnp.broadcast_to(queries[None, :, 2], (t, q))
        vis = jnp.zeros((t, q))

        updater = UpdateFormer(cfg, name="updateformer")
        corr_dim = cfg.corr_levels * (2 * cfg.corr_radius + 1) ** 2
        pyramid = build_pyramid(fmaps, cfg.corr_levels)
        for _ in range(cfg.iters):
            corr = corr_features(
                fmaps, track_feat, coords / s, cfg.corr_radius,
                cfg.corr_levels, pyramid=pyramid,
            )
            rel = (coords - coords[0:1]) / jnp.asarray([w, h], jnp.float32)
            tokens = jnp.concatenate(
                [
                    corr,
                    rel,
                    zs[..., None],
                    jnp.broadcast_to(track_feat[None], (t, q, cfg.feat_dim)),
                ],
                axis=-1,
            )
            delta, vis = updater(tokens)
            coords = coords + delta[..., :2]
            zs = zs + delta[..., 2]

        tracks = jnp.concatenate([coords, zs[..., None]], axis=-1)
        return tracks, jax.nn.sigmoid(vis)


@dataclasses.dataclass
class SpaTrackerPredictor:
    """Sliding-window inference (predictor.py:37-78 equivalent).

    The WHOLE clip compiles into one XLA program (windows unrolled at
    trace time — clip lengths are static everywhere in the pipeline):
    the previous per-window host loop paid a ~28 ms relay fetch plus
    host dispatch gap per window (3 windows: 223 ms wall for 140 ms of
    device time), and its overlap bookkeeping emitted every window's
    full span then truncated, so the tail window's frames were dropped
    and re-labelled from the previous window.

    Window i>0 is seeded with the PREVIOUS window's track positions at
    window i's first frame and contributes only its new (non-overlap)
    frames — the reference predictor's overlap-carry semantics."""

    model: SpaTracker
    params: dict

    def __post_init__(self):
        # params arrive as HOST numpy from load_tracker_asset: without
        # this one-time device_put every clip call re-uploads the whole
        # tree through the axon relay (~26 MB for the scaled asset =
        # ~400 ms/call — measured as the tracker stage's wall/device gap
        # in round 5; the device compute itself is ~100 ms)
        self.params = jax.tree_util.tree_map(jnp.asarray, self.params)
        self._window_fn = jax.jit(
            lambda p, c, d, q: self.model.apply(p, c, d, q)
        )
        self._clip_fns: dict = {}

    def _build_clip_fn(self, t: int, win: int):
        stride = max(win // 2, 1)
        starts = list(range(stride, t - win + 1, stride))
        if not starts or starts[-1] != t - win:
            starts.append(t - win)  # clamped tail window

        def clip_fn(params, clip, depths, queries):
            tracks, _ = self.model.apply(
                params, clip[:win], depths[:win], queries
            )
            outs = [tracks]
            prev_start = 0
            for s in starts:
                # reseed at this window's first frame (local index in the
                # previous window: s - prev_start < win by construction)
                seed = tracks[s - prev_start]
                tracks, _ = self.model.apply(
                    params, clip[s:s + win], depths[s:s + win], seed
                )
                outs.append(tracks[prev_start + win - s:])  # new frames
                prev_start = s
            return jnp.concatenate(outs, axis=0)

        return jax.jit(clip_fn)

    def __call__(
        self,
        clip: jax.Array,
        depths: jax.Array,
        queries: jax.Array,
        window: Optional[int] = None,
    ):
        cfg = self.model.cfg
        win = window or cfg.window
        t = clip.shape[0]
        if t <= win:
            tracks, _ = self._window_fn(self.params, clip, depths, queries)
            return tracks
        key = (t, win)
        if key not in self._clip_fns:
            self._clip_fns[key] = self._build_clip_fn(t, win)
        return self._clip_fns[key](self.params, clip, depths, queries)


def default_asset_path() -> str:
    import os

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "tracker_occlusion.npz",
    )


def load_tracker_asset(
    path: Optional[str] = None,
    dtype: Optional[jnp.dtype] = None,
) -> Optional[Tuple[TrackerConfig, dict]]:
    """(config, params) for the trained tracker asset, or None when the
    asset is absent.

    The architecture is read from the ``<asset>.config.json`` sidecar
    written by scripts/train_tracker.py; assets trained before round 4
    have no sidecar and get the historical tiny config (iters=4,
    window=8).  Centralizing this lets a re-trained scaled asset flow
    to every consumer (stage 7, bench, profiling, tests) without their
    hard-coded configs drifting — the reference's analogue is the
    single torch checkpoint path in SpaTracker predictor.py:37-78.
    """
    import json
    import os

    import numpy as np
    from flax import traverse_util

    path = path or default_asset_path()
    if not os.path.exists(path):
        return None
    sidecar = path[: -len(".npz")] + ".config.json" if path.endswith(
        ".npz"
    ) else path + ".config.json"
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            cfg = TrackerConfig(**json.load(f))
    else:
        cfg = dataclasses.replace(TrackerConfig().tiny(), iters=4, window=8)
    with np.load(path) as z:
        params = traverse_util.unflatten_dict(
            {k: z[k] for k in z.files}, sep="/"
        )
    if dtype is not None:
        params = jax.tree_util.tree_map(
            lambda a: a.astype(dtype), params
        )
    return cfg, params
