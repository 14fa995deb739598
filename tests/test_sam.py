"""SAM parity vs HF transformers SamModel (tiny random config)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egoscaler_tpu.models.convert import convert_sam
from egoscaler_tpu.models.sam import SamConfig, SamModel


@pytest.fixture(scope="module")
def hf_sam():
    import torch
    from transformers import SamConfig as HFSamConfig, SamModel as HFSamModel

    cfg = HFSamConfig(
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            image_size=64, patch_size=8, window_size=2,
            global_attn_indexes=[1], output_channels=16, mlp_dim=64,
            num_pos_feats=8, attn_implementation="eager",
        ),
        prompt_encoder_config=dict(
            hidden_size=16, image_size=64, patch_size=8,
            mask_input_channels=4,
        ),
        mask_decoder_config=dict(
            hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
            mlp_dim=32, iou_head_depth=2, iou_head_hidden_dim=16,
        ),
    )
    torch.manual_seed(0)
    model = HFSamModel(cfg).eval().float()
    # randomize the zero-initialized tables so parity is meaningful
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "rel_pos" in name or "pos_embed" in name:
                p.normal_(0, 0.05)
    return model


def ours_tiny():
    return SamModel(SamConfig().tiny())


def test_sam_parity_points(hf_sam, rng):
    import torch

    sd = {k: v.detach().numpy() for k, v in hf_sam.state_dict().items()}
    variables = convert_sam(sd, num_vision_layers=2)

    img = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    pts = np.array([[[[20.0, 30.0], [40.0, 10.0]]]], np.float32)  # (1,1,2,2)
    labels = np.array([[[1, 0]]], np.int32)

    with torch.no_grad():
        out = hf_sam(
            pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2)),
            input_points=torch.from_numpy(pts).double(),
            input_labels=torch.from_numpy(labels),
            multimask_output=True,
        )
    ref_masks = out.pred_masks.numpy()
    ref_iou = out.iou_scores.numpy()

    model = ours_tiny()
    masks, iou = model.apply(
        variables, jnp.asarray(img), input_points=jnp.asarray(pts),
        input_labels=jnp.asarray(labels),
    )
    assert masks.shape == ref_masks.shape
    np.testing.assert_allclose(np.asarray(iou), ref_iou, atol=2e-3)
    np.testing.assert_allclose(np.asarray(masks), ref_masks, atol=5e-3)


def test_sam_parity_boxes(hf_sam, rng):
    import torch

    sd = {k: v.detach().numpy() for k, v in hf_sam.state_dict().items()}
    variables = convert_sam(sd, num_vision_layers=2)
    img = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    boxes = np.array([[[8.0, 8.0, 40.0, 48.0]]], np.float32)

    with torch.no_grad():
        out = hf_sam(
            pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2)),
            input_boxes=torch.from_numpy(boxes).double(),
            multimask_output=True,
        )
    model = ours_tiny()
    masks, iou = model.apply(
        variables, jnp.asarray(img), input_boxes=jnp.asarray(boxes)
    )
    np.testing.assert_allclose(
        np.asarray(masks), out.pred_masks.numpy(), atol=5e-3
    )


def test_sam_segmenter_interface(rng):
    """SamSegmenter plugs into the GroundedSAM Segmenter protocol."""
    from egoscaler_tpu.models.sam import SamConfig

    cfg = SamConfig().tiny()
    model = SamModel(cfg)
    img = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    boxes = jnp.asarray([[[4.0, 4.0, 30.0, 30.0]]])
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(img), input_boxes=boxes
    )
    masks, iou = model.apply(
        variables, jnp.asarray(img), input_boxes=boxes
    )
    assert masks.shape[2] == 3  # multimask
    assert np.isfinite(np.asarray(masks)).all()


# ---------------------------------------------------------------------------
# automatic mask generation


def test_amg_point_grid_matches_spec():
    from egoscaler_tpu.models.sam_amg import build_point_grid

    g = build_point_grid(4)
    assert g.shape == (16, 2)
    assert abs(g[0, 0] - 1 / 8) < 1e-6 and abs(g[-1, 1] - 7 / 8) < 1e-6
    # row-major: x varies fastest
    assert abs(g[1, 0] - g[0, 0] - 1 / 4) < 1e-6
    assert abs(g[1, 1] - g[0, 1]) < 1e-6


def test_amg_stability_score():
    import jax.numpy as jnp

    from egoscaler_tpu.models.sam_amg import stability_score

    logits = jnp.asarray(
        np.stack([np.full((8, 8), 2.0), np.full((8, 8), 0.5)])
    )
    s = np.asarray(stability_score(logits, 0.0, 1.0))
    # 2.0 > +-1 everywhere -> 1.0 ; 0.5 only > -1 -> 0.0
    np.testing.assert_allclose(s, [1.0, 0.0])


def test_amg_generate_shapes_and_invariants():
    import jax

    from egoscaler_tpu.models.sam import SamConfig, SamModel
    from egoscaler_tpu.models.sam_amg import AMGConfig, AutomaticMaskGenerator

    cfg = SamConfig().tiny()
    model = SamModel(cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, cfg.vision.image_size,
                                       cfg.vision.image_size, 3)),
                      jnp.float32)
    pts = jnp.zeros((1, 1, 1, 2), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img, pts, None, None)
    amg_cfg = AMGConfig(points_per_side=4, pred_iou_thresh=-10.0,
                        stability_score_thresh=0.0, max_masks=8)
    amg = AutomaticMaskGenerator(model, params, amg_cfg)
    out = amg.generate(np.asarray(img[0]))
    k = amg_cfg.max_masks
    assert out["masks"].shape[0] == k and out["masks"].dtype == bool
    assert out["boxes"].shape == (k, 4)
    # invalid slots fully zeroed
    inv = ~out["valid"]
    assert not out["masks"][inv].any()
    assert (out["boxes"][inv] == 0).all()
    # every valid mask is inside its box
    for i in np.nonzero(out["valid"])[0]:
        ys, xs = np.nonzero(out["masks"][i])
        x1, y1, x2, y2 = out["boxes"][i]
        assert xs.min() >= x1 and xs.max() < x2
        assert ys.min() >= y1 and ys.max() < y2
