"""Grounding-DINO parity vs HF transformers (tiny random config).

The reference's stage-6 detector is `IDEA-Research/grounding-dino-base`
through HF (6_get_bounding_box.py:126-140).  A tiny randomly-initialized
HF GroundingDinoForObjectDetection is converted with
convert_grounding_dino; our flax stack (Swin backbone, BERT text
encoder, fusion encoder, deformable attention, two-stage query
selection, refinement decoder, contrastive heads) must match to fp32
tolerance.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import traverse_util

from egoscaler_tpu.models.convert import (
    convert_grounding_dino,
    convert_swin_backbone,
)
from egoscaler_tpu.models.grounding_dino import (
    GroundingDinoConfig,
    GroundingDinoForDetection,
    post_process_detection,
    special_token_masks,
)
from egoscaler_tpu.models.swin import SwinBackbone, SwinConfig


@pytest.fixture(scope="module")
def hf_gdino():
    import torch
    from transformers import (
        BertConfig as HFBertConfig,
        GroundingDinoConfig as HFGDConfig,
        SwinConfig as HFSwinConfig,
    )
    from transformers.models.grounding_dino.modeling_grounding_dino import (
        GroundingDinoForObjectDetection,
    )

    torch.manual_seed(0)
    hf_cfg = HFGDConfig(
        backbone_config=HFSwinConfig(
            image_size=64, patch_size=4, embed_dim=16, depths=[1, 2],
            num_heads=[2, 2], window_size=4,
            out_features=["stage1", "stage2"], attn_implementation="eager",
        ),
        text_config=HFBertConfig(
            vocab_size=1100, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            attn_implementation="eager",
        ),
        d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        num_feature_levels=3, num_queries=20, max_text_len=32,
    )
    model = GroundingDinoForObjectDetection(hf_cfg).eval().float()
    with torch.no_grad():
        # randomize zero-initialized heads so parity is meaningful
        for n, p in model.named_parameters():
            if (
                "sampling_offsets" in n or "attention_weights" in n
                or "bbox_embed" in n or "relative_position_bias_table" in n
            ) and p.ndim > 0:
                p.add_(torch.randn_like(p) * 0.02)
    return model


def to_variables(sd):
    flat = convert_grounding_dino(sd)
    return {
        "params": traverse_util.unflatten_dict(
            {k.split("params/", 1)[1]: v for k, v in flat.items()}, sep="/"
        )
    }


TOKEN_IDS = np.array(
    [
        [101, 7, 9, 1012, 11, 13, 102, 0],
        [101, 5, 1012, 8, 10, 12, 1012, 102],
    ],
    np.int64,
)


def test_special_token_masks_parity(hf_gdino):
    import torch
    from transformers.models.grounding_dino.modeling_grounding_dino import (
        generate_masks_with_special_tokens_and_transfer_map,
    )

    masks, pos = special_token_masks(TOKEN_IDS)
    ref_masks, ref_pos = generate_masks_with_special_tokens_and_transfer_map(
        torch.from_numpy(TOKEN_IDS)
    )
    np.testing.assert_array_equal(masks, ref_masks.numpy())
    np.testing.assert_array_equal(pos, ref_pos.numpy())


def test_grounding_dino_parity(hf_gdino, rng):
    import torch

    sd = {k: v.detach().numpy() for k, v in hf_gdino.state_dict().items()}
    variables = to_variables(sd)

    img = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    attn = (TOKEN_IDS != 0).astype(np.int64)
    tt = np.zeros_like(TOKEN_IDS)

    with torch.no_grad():
        ref = hf_gdino(
            pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2)),
            input_ids=torch.from_numpy(TOKEN_IDS),
            attention_mask=torch.from_numpy(attn),
            token_type_ids=torch.from_numpy(tt),
            return_dict=True,
        )

    masks, pos = special_token_masks(TOKEN_IDS)
    model = GroundingDinoForDetection(GroundingDinoConfig().tiny())
    out = model.apply(
        variables,
        jnp.asarray(img),
        jnp.asarray(TOKEN_IDS.astype(np.int32)),
        jnp.asarray(tt.astype(np.int32)),
        jnp.asarray(attn.astype(bool)),
        jnp.asarray(masks),
        jnp.asarray(pos.astype(np.int32)),
    )

    # compare on the probability scale (padded logits are -inf on both sides)
    s_ours = jax.nn.sigmoid(out["logits"])
    s_ref = 1.0 / (1.0 + np.exp(-ref.logits.numpy()))
    np.testing.assert_allclose(np.asarray(s_ours), s_ref, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(out["pred_boxes"]), ref.pred_boxes.numpy(), atol=5e-3
    )


def test_swin_backbone_parity(rng):
    import torch
    from transformers import SwinConfig as HFSwinConfig
    from transformers.models.swin.modeling_swin import (
        SwinBackbone as HFSwinBackbone,
    )

    torch.manual_seed(0)
    hf = HFSwinBackbone(
        HFSwinConfig(
            image_size=64, patch_size=4, embed_dim=16, depths=[1, 2],
            num_heads=[2, 2], window_size=4,
            out_features=["stage1", "stage2"], attn_implementation="eager",
        )
    ).eval().float()
    with torch.no_grad():
        for n, p in hf.named_parameters():
            if "relative_position_bias_table" in n:
                p.normal_(0, 0.05)

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    variables = traverse_util.unflatten_dict(convert_swin_backbone(sd), sep="/")

    # non-multiple-of-window resolution exercises pad + shifted windows
    img = rng.normal(size=(2, 96, 80, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(img.transpose(0, 3, 1, 2))).feature_maps

    model = SwinBackbone(SwinConfig().tiny())
    ours = model.apply(variables, jnp.asarray(img))
    assert len(ours) == len(ref)
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(
            np.asarray(o), r.numpy().transpose(0, 2, 3, 1), atol=5e-3, rtol=1e-3
        )


def test_post_process_detection():
    logits = np.full((1, 3, 8), -20.0)
    logits[0, 0, 1] = 3.0  # sigmoid ~ 0.95
    boxes = np.tile(np.array([0.5, 0.5, 0.2, 0.4]), (1, 3, 1))
    out = post_process_detection(logits, boxes, (100, 200), box_threshold=0.5)
    assert len(out) == 1 and len(out[0]["boxes"]) == 1
    x0, y0, x1, y1 = out[0]["boxes"][0]
    assert (x0, y0, x1, y1) == (80.0, 30.0, 120.0, 70.0)
    assert out[0]["scores"][0] > 0.9


def test_jax_detector_protocol(hf_gdino, rng):
    """JaxGroundingDino drives the stage-6 Detector protocol end to end
    with an injected toy tokenizer."""
    from egoscaler_tpu.pipelines.stages.stage6_boxes import JaxGroundingDino

    sd = {k: v.detach().numpy() for k, v in hf_gdino.state_dict().items()}
    variables = to_variables(sd)

    def toy_tokenizer(text):
        words = text.replace(".", " . ").split()
        ids = [101] + [1012 if w == "." else 5 + (hash(w) % 900) for w in words] + [102]
        return np.asarray(ids), np.zeros(len(ids), np.int64)

    det = JaxGroundingDino(
        GroundingDinoConfig().tiny(), variables, toy_tokenizer,
        image_size=64, text_len=16,
    )
    frames = [
        rng.integers(0, 255, size=(120, 160, 3)).astype(np.uint8)
        for _ in range(2)
    ]
    results = det.detect(frames, ["person", "hand", "cup"], threshold=0.0)
    assert len(results) == 2
    for dets in results:
        assert len(dets) > 0  # threshold 0: everything above
        for d in dets:
            box = d["box"]
            assert box["xmax"] >= box["xmin"] and box["ymax"] >= box["ymin"]
            assert 0.0 <= d["score"] <= 1.0


def test_hf_adapter_from_local_checkpoint(hf_gdino, tmp_path):
    """HFGroundingDino (the torch fallback adapter, stage6_boxes.py:38)
    loads a LOCAL checkpoint directory offline and returns dicts in the
    stage-6 schema — exercised with the tiny random HF model saved to
    disk plus hand-written processor assets (no network)."""
    from transformers import (
        BertTokenizer,
        GroundingDinoImageProcessor,
        GroundingDinoProcessor,
    )

    from egoscaler_tpu.pipelines.stages.stage6_boxes import HFGroundingDino

    path = tmp_path / "gdino_tiny"
    hf_gdino.save_pretrained(path)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", ".", "person",
             "hand", "cup"] + [f"w{i}" for i in range(40)]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab) + "\n")
    processor = GroundingDinoProcessor(
        image_processor=GroundingDinoImageProcessor(
            size={"shortest_edge": 64, "longest_edge": 64}
        ),
        tokenizer=BertTokenizer(str(tmp_path / "vocab.txt")),
    )
    processor.save_pretrained(path)

    det = HFGroundingDino(str(path))
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, size=(96, 128, 3)).astype(np.uint8)]
    results = det.detect(frames, ["person", "cup"], threshold=0.0)
    assert len(results) == 1
    for d in results[0]:
        box = d["box"]
        assert box["xmax"] >= box["xmin"] and box["ymax"] >= box["ymin"]
