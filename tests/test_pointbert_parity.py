"""PointBERT parity vs the reference torch implementation.

The reference PointTransformer (pointbert/point_encoder.py:101-189) is
imported standalone (timm's DropPath stubbed to identity — drop-path is
inactive in eval mode anyway), initialized tiny, and its state_dict is
converted with `convert_pointbert`.  The flax encoder must reproduce the
full stack — Group (FPS + kNN, dvae.py:143-187), Encoder
(dvae.py:189-221), 12-layer ViT (point_encoder.py:58-98) — to fp32
tolerance on the same input cloud.

The reference seeds FPS at a *random* index (misc.py:52 torch.randint);
the test pins it to 0 (our deterministic default) via mock so the
iterative farthest-point loop itself is still exercised.  kNN group
*ordering* differs (torch.topk sorted=False) but every group feature is
max-pooled over the neighborhood, so only membership matters.
"""
import importlib.util
import sys
import types
import unittest.mock as mock

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import traverse_util

from egoscaler_tpu.configs import PointBertConfig
from egoscaler_tpu.models.convert import convert_pointbert
from egoscaler_tpu.models.pointbert import PointTransformer

PB = "/root/reference/egoscaler/models/pointllm/pointllm/model/pointbert"


@pytest.fixture(scope="module")
def ref_point_encoder():
    import torch
    import torch.nn as nn

    if "timm" not in sys.modules:
        class _DropPath(nn.Module):
            def __init__(self, drop_prob=0.0):
                super().__init__()

            def forward(self, x):
                return x

        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        timm_layers = types.ModuleType("timm.models.layers")
        timm_layers.DropPath = _DropPath
        timm.models = timm_models
        timm_models.layers = timm_layers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.layers"] = timm_layers

    pkg = types.ModuleType("ref_pointbert")
    pkg.__path__ = [PB]
    sys.modules["ref_pointbert"] = pkg
    for name in ("logger", "checkpoint", "misc", "dvae", "point_encoder"):
        spec = importlib.util.spec_from_file_location(
            f"ref_pointbert.{name}", f"{PB}/{name}.py"
        )
        module = importlib.util.module_from_spec(spec)
        sys.modules[f"ref_pointbert.{name}"] = module
        spec.loader.exec_module(module)
    return torch, sys.modules["ref_pointbert.point_encoder"]


def tiny_cfg():
    return PointBertConfig(
        trans_dim=64,
        depth=3,
        drop_path_rate=0.0,
        num_heads=4,
        group_size=8,
        num_group=16,
        encoder_dims=32,
        point_dims=6,
        npoints=64,
    )


def build_ref_model(torch, ref_mod, cfg):
    ref_cfg = types.SimpleNamespace(
        trans_dim=cfg.trans_dim,
        depth=cfg.depth,
        drop_path_rate=cfg.drop_path_rate,
        cls_dim=40,  # classifier head dim; unused with use_max_pool=False
        num_heads=cfg.num_heads,
        group_size=cfg.group_size,
        num_group=cfg.num_group,
        point_dims=cfg.point_dims,
        encoder_dims=cfg.encoder_dims,
    )
    torch.manual_seed(0)
    return ref_mod.PointTransformer(ref_cfg, use_max_pool=False).eval().float()


def to_flax_variables(sd_np, depth):
    raw = convert_pointbert(sd_np, depth=depth, out_prefix="pb")
    flat = {}
    for k, v in raw.items():
        collection, rest = k.split("/", 1)
        flat[f"{collection}/{rest.split('pb/', 1)[1]}"] = v
    return traverse_util.unflatten_dict(flat, sep="/")


def test_pointbert_parity(ref_point_encoder, rng):
    torch, ref_mod = ref_point_encoder
    cfg = tiny_cfg()
    ref = build_ref_model(torch, ref_mod, cfg)

    sd_np = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = to_flax_variables(sd_np, cfg.depth)

    pts = rng.normal(size=(2, cfg.npoints, cfg.point_dims)).astype(np.float32)

    def pinned_randint(low, high, size, **kw):
        return torch.zeros(size, dtype=torch.long)

    with torch.no_grad(), mock.patch.object(torch, "randint", pinned_randint):
        ref_out = ref(torch.from_numpy(pts)).numpy()

    model = PointTransformer(cfg)
    ours = np.asarray(
        model.apply(variables, jnp.asarray(pts), train=False)
    )

    assert ours.shape == ref_out.shape == (2, cfg.num_group + 1, cfg.trans_dim)
    np.testing.assert_allclose(ours, ref_out, atol=5e-3, rtol=1e-3)


def test_pointbert_group_membership_parity(ref_point_encoder, rng):
    """FPS centers + kNN membership match the reference exactly
    (dvae.py:143-187) when the random FPS start is pinned."""
    torch, _ = ref_point_encoder
    misc = sys.modules["ref_pointbert.misc"]
    dvae = sys.modules["ref_pointbert.dvae"]
    from egoscaler_tpu.ops.fps import farthest_point_sampling, gather_points
    from egoscaler_tpu.ops.knn import knn_indices

    xyz = rng.normal(size=(2, 64, 3)).astype(np.float32)

    def pinned_randint(low, high, size, **kw):
        return torch.zeros(size, dtype=torch.long)

    with torch.no_grad(), mock.patch.object(torch, "randint", pinned_randint):
        ref_centers = misc.fps(torch.from_numpy(xyz), 16).numpy()
        ref_idx = dvae.knn_point(
            8, torch.from_numpy(xyz), torch.from_numpy(ref_centers)
        ).numpy()

    idx = farthest_point_sampling(jnp.asarray(xyz), 16)
    centers = np.asarray(gather_points(jnp.asarray(xyz), idx))
    np.testing.assert_allclose(centers, ref_centers, atol=1e-6)

    ours_idx = np.asarray(knn_indices(jnp.asarray(xyz), jnp.asarray(centers), 8))
    for b in range(2):
        for g in range(16):
            assert set(ours_idx[b, g]) == set(ref_idx[b, g])
