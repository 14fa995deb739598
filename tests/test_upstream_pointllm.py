"""Upstream PointLLM components: conversations, pretrain stages,
transforms."""
import numpy as np
import jax
import jax.numpy as jnp

from egoscaler_tpu.configs import PointLLMConfig
from egoscaler_tpu.models.conversation import conv_templates
from egoscaler_tpu.training.pointllm_pretrain import (
    partial_state_dict,
    pretrain_config,
    render_conversation,
    stage_frozen_patterns,
)
from egoscaler_tpu.training.trainer import partition_params
from egoscaler_tpu.training.transforms import (
    adjust_brightness,
    get_image_transforms,
)


def test_conversation_render():
    conv = conv_templates["vicuna_v1_1"].copy()
    conv.append_message("USER", "Describe this object.")
    conv.append_message("ASSISTANT", None)
    p = conv.get_prompt()
    assert p.startswith("A chat between")
    assert "USER: Describe this object." in p
    assert p.endswith("ASSISTANT:")


def test_render_conversation_point_tokens():
    cfg = PointLLMConfig().tiny()
    prompt, _ = render_conversation(
        [{"from": "human", "value": "What is this <point>?"},
         {"from": "gpt", "value": "A mug."}],
        cfg,
    )
    assert prompt.count("<point_patch>") == cfg.point_bert.point_token_len
    assert "<point_start>" in prompt and "<point_end>" in prompt
    assert "A mug.</s>" in prompt


def test_stage_freeze_patterns(rng):
    from egoscaler_tpu.models.pointllm import TrajPointLLM

    cfg = PointLLMConfig().tiny()
    model = TrajPointLLM(cfg, remat=False)
    ids = jnp.asarray(np.full((1, 40), cfg.point_patch_token_id, np.int32))
    pc = jnp.asarray(rng.normal(size=(1, cfg.point_bert.npoints, 6)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), ids, pc)

    t1, f1 = partition_params(variables, stage_frozen_patterns(1))
    # stage 1: only projector (+ embed) trainable
    assert all("point_proj" in k or "embed_tokens" in k for k in t1)
    assert any("point_proj" in k for k in t1)

    t2, f2 = partition_params(variables, stage_frozen_patterns(2))
    assert any("model/layers_0" in k for k in t2)  # LLM trains in stage 2
    assert not any("point_backbone" in k for k in t2)

    # partial save keeps the projector subset
    part = partial_state_dict(variables)
    from flax import traverse_util

    keys = traverse_util.flatten_dict(part, sep="/")
    assert all("point_proj" in k or "embed_tokens" in k for k in keys)


def test_pretrain_configs():
    c1 = pretrain_config(1)
    c2 = pretrain_config(2)
    assert not c1.unfreeze_language_model and c2.unfreeze_language_model
    assert c1.lr > c2.lr


def test_image_transforms(rng):
    img = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    tf = get_image_transforms()
    out = tf(jax.random.PRNGKey(0), img)
    assert out.shape == img.shape
    assert np.isfinite(np.asarray(out)).all()
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0
    # disabled factory is identity
    ident = get_image_transforms(enable=False)
    np.testing.assert_array_equal(
        np.asarray(ident(jax.random.PRNGKey(1), img)), np.asarray(img)
    )
    # brightness math
    np.testing.assert_allclose(
        np.asarray(adjust_brightness(img, 0.5)), np.asarray(img) * 0.5,
        atol=1e-6,
    )
