"""Depth-Anything-V2 parity vs the reference torch implementation.

The reference model files run on CPU torch (xformers absent -> plain
attention; torchvision/cv2 are only needed by the unused image2tensor
path, stubbed at import).  A tiny randomly-initialized reference model
is converted and must match our flax forward to fp32 tolerance.
"""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egoscaler_tpu.models.convert import convert_depth_anything
from egoscaler_tpu.models.depth_anything import (
    DepthAnythingConfig,
    DepthAnythingV2,
    infer_depth,
    preprocess_image,
)

REF = "/root/reference/egoscaler/data/third_party/Depth-Anything-V2/metric_depth"


@pytest.fixture(scope="module")
def torch_ref():
    # stub torchvision/cv2 so the reference dpt.py imports on this host;
    # REMOVE the stubs afterwards — a bare ModuleType has __spec__=None,
    # which poisons any later real `import torchvision` in the same
    # pytest process (test_sam's HF oracle hits importlib.util.find_spec)
    stubbed = "torchvision" not in sys.modules
    if stubbed:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        tr.Compose = lambda x: x
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
    sys.path.insert(0, REF)
    try:
        import torch
        from depth_anything_v2.dinov2 import DinoVisionTransformer
        from depth_anything_v2.dinov2_layers import (
            MemEffAttention,
            NestedTensorBlock,
        )
        from depth_anything_v2.dpt import DPTHead
    finally:
        if stubbed:
            sys.modules.pop("torchvision", None)
            sys.modules.pop("torchvision.transforms", None)

    return torch, DinoVisionTransformer, NestedTensorBlock, MemEffAttention, DPTHead


def build_tiny_ref(torch_mod, DVT, Block, Attn, DPTHead):
    import functools

    torch = torch_mod
    torch.manual_seed(0)
    enc = DVT(
        img_size=112,
        patch_size=14,
        embed_dim=64,
        depth=4,
        num_heads=4,
        mlp_ratio=4,
        block_fn=functools.partial(Block, attn_class=Attn),
        init_values=1.0,
        block_chunks=0,
    ).eval().float()
    head = DPTHead(
        64, features=16, use_bn=False, out_channels=[16, 24, 32, 32]
    ).eval().float()
    return enc, head


def test_depth_anything_parity(torch_ref, rng):
    torch, DVT, Block, Attn, DPTHead = torch_ref
    enc, head = build_tiny_ref(torch, DVT, Block, Attn, DPTHead)

    sd = {}
    for k, v in enc.state_dict().items():
        sd[f"pretrained.{k}"] = v.numpy()
    for k, v in head.state_dict().items():
        sd[f"depth_head.{k}"] = v.numpy()

    cfg = DepthAnythingConfig(
        embed_dim=64, depth=4, num_heads=4,
        out_channels=(16, 24, 32, 32),
        intermediate_layers=(0, 1, 2, 3),
        features=16, max_depth=20.0, native_grid=8,
    )
    variables = convert_depth_anything(sd, depth=4)

    img = rng.normal(size=(1, 112, 112, 3)).astype(np.float32)

    with torch.no_grad():
        x_t = torch.from_numpy(img.transpose(0, 3, 1, 2))
        feats = enc.get_intermediate_layers(
            x_t, [0, 1, 2, 3], return_class_token=True
        )
        ref = head(feats, 8, 8).numpy()[:, 0] * 20.0

    model = DepthAnythingV2(cfg)
    ours = np.asarray(model.apply(variables, jnp.asarray(img)))

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=1e-3)


def test_preprocess_shapes(rng):
    img = rng.integers(0, 255, size=(97, 130, 3)).astype(np.uint8)
    x, (h, w) = preprocess_image(jnp.asarray(img), input_size=56)
    assert (h, w) == (97, 130)
    assert x.shape[1] % 14 == 0 and x.shape[2] % 14 == 0
    assert min(x.shape[1], x.shape[2]) >= 56
