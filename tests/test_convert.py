"""Checkpoint conversion parity: HF torch LLaMA vs our flax decoder.

The strongest available oracle: a real `transformers` LlamaForCausalLM
(CPU torch) with random weights, converted through
`convert_pointllm`, must produce fp32-tolerance-identical logits
(BASELINE.md parity definition).
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egoscaler_tpu.configs import LlamaConfig as OurLlamaConfig, PointLLMConfig
from egoscaler_tpu.models.convert import (
    convert_pointbert_standalone,
    convert_pointllm,
    export_pointllm,
)
from egoscaler_tpu.models.llama import LlamaModel
from egoscaler_tpu.models.pointllm import TrajPointLLM


def tiny_cfgs():
    ours = OurLlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=176,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=128,
    )
    return ours


@pytest.fixture(scope="module")
def torch_llama():
    import torch
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

    ours = tiny_cfgs()
    hf_cfg = HFConfig(
        vocab_size=ours.vocab_size,
        hidden_size=ours.hidden_size,
        intermediate_size=ours.intermediate_size,
        num_hidden_layers=ours.num_hidden_layers,
        num_attention_heads=ours.num_attention_heads,
        num_key_value_heads=ours.num_key_value_heads,
        max_position_embeddings=ours.max_position_embeddings,
        rms_norm_eps=ours.rms_norm_eps,
        rope_theta=ours.rope_theta,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval().float()
    return model, ours


def test_llama_logits_parity(torch_llama):
    import torch

    model, ours = torch_llama
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    pcfg = dataclasses.replace(
        PointLLMConfig().tiny(), llama=ours,
        point_patch_token_id=10, point_start_token_id=11,
        point_end_token_id=12,
    )
    variables = convert_pointllm(sd, pcfg, extend_vocab=False)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, ours.vocab_size, size=(2, 12)).astype(np.int32)

    with torch.no_grad():
        ref = model(torch.from_numpy(ids).long()).logits.numpy()

    # drive only the LLaMA trunk: embed -> layers -> head
    from flax import traverse_util

    flat = traverse_util.flatten_dict(variables, sep="/")
    emb = np.asarray(flat["params/embed_tokens/embedding"])
    head = np.asarray(flat["params/lm_head/kernel"])
    trunk_params = {
        "params": traverse_util.unflatten_dict(
            {
                tuple(k.split("/")[2:]): v
                for k, v in flat.items()
                if k.startswith("params/model/")
            }
        )
    }
    trunk = LlamaModel(ours)
    embeds = jnp.asarray(emb[ids])
    positions = jnp.broadcast_to(jnp.arange(ids.shape[1]), ids.shape)
    x, _ = trunk.apply(trunk_params, embeds, positions)
    logits = np.asarray(x @ head)

    np.testing.assert_allclose(logits, ref, atol=2e-3, rtol=1e-3)


def test_vocab_extension(torch_llama):
    model, ours = torch_llama
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    pcfg = dataclasses.replace(PointLLMConfig().tiny(), llama=ours)
    variables = convert_pointllm(sd, pcfg, extend_vocab=True)
    from flax import traverse_util

    flat = traverse_util.flatten_dict(variables, sep="/")
    emb = flat["params/embed_tokens/embedding"]
    assert emb.shape[0] == pcfg.extended_vocab_size
    # original rows preserved exactly
    np.testing.assert_array_equal(
        emb[: ours.vocab_size], sd["model.embed_tokens.weight"]
    )


def test_pointbert_roundtrip_via_inverse(rng):
    """Generate flax PointBERT params, map to a synthetic torch state_dict
    (inverse naming), convert back, and check exact equality."""
    from flax import traverse_util

    cfg = PointLLMConfig().tiny()
    model = TrajPointLLM(cfg, remat=False)
    ids = jnp.asarray(
        np.full((1, 40), cfg.point_patch_token_id, np.int32)
    )
    pc = jnp.asarray(
        rng.normal(size=(1, cfg.point_bert.npoints, 6)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), ids, pc)
    flat = traverse_util.flatten_dict(variables, sep="/")

    # build the torch-style dict for the point backbone
    sd = {}
    for k, v in flat.items():
        v = np.asarray(v)
        if not ("point_backbone" in k):
            continue
        k2 = k.split("point_backbone/")[-1]
        name = "module.point_encoder."
        if k2 in ("cls_token", "cls_pos"):
            sd[name + k2] = v
        elif k2.startswith("pos_embed_"):
            i = k2.split("_")[-1].split("/")[0]
            kind = "weight" if k2.endswith("kernel") else "bias"
            sd[f"{name}pos_embed.{i}.{kind}"] = v.T if kind == "weight" else v
        elif k2.startswith("reduce_dim"):
            kind = "weight" if k2.endswith("kernel") else "bias"
            sd[f"{name}reduce_dim.{kind}"] = v.T if kind == "weight" else v
        elif k2.startswith("encoder/"):
            rest = k2.split("/")  # encoder, first_conv_0, kernel
            conv, leaf = rest[1], rest[2]
            base, idx = conv.rsplit("_", 1)
            tn = f"{name}encoder.{base}.{idx}"
            if leaf == "kernel":
                sd[f"{tn}.weight"] = v.T[..., None]
            elif leaf == "scale":
                sd[f"{tn}.weight"] = v
            elif leaf == "bias":
                sd[f"{tn}.bias"] = v
            elif leaf == "mean":
                sd[f"{tn}.running_mean"] = v
            elif leaf == "var":
                sd[f"{tn}.running_var"] = v
        elif k2.startswith("blocks_"):
            parts = k2.split("/")  # blocks_0, norm1|attn_qkv|mlp_fc1, leaf
            i = parts[0].split("_")[1]
            mod, leaf = parts[1], parts[2]
            tmap = {
                "norm1": "norm1", "norm2": "norm2",
                "attn_qkv": "attn.qkv", "attn_proj": "attn.proj",
                "mlp_fc1": "mlp.fc1", "mlp_fc2": "mlp.fc2",
            }
            tn = f"{name}blocks.blocks.{i}.{tmap[mod]}"
            if leaf == "kernel":
                sd[f"{tn}.weight"] = v.T
            elif leaf == "scale":
                sd[f"{tn}.weight"] = v
            else:
                sd[f"{tn}.bias"] = v
        elif k2.startswith("norm/"):
            leaf = k2.split("/")[-1]
            sd[f"{name}norm.weight" if leaf == "scale" else f"{name}norm.bias"] = v

    converted = convert_pointbert_standalone(sd, depth=cfg.point_bert.depth)
    conv_flat = {
        "/".join(k): np.asarray(v)
        for k, v in traverse_util.flatten_dict(converted).items()
    }
    for k, v in flat.items():
        if "point_backbone" not in k:
            continue
        assert k in conv_flat, f"missing {k}"
        np.testing.assert_array_equal(np.asarray(v), conv_flat[k], err_msg=k)


def test_export_roundtrip(torch_llama):
    model, ours = torch_llama
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    pcfg = dataclasses.replace(PointLLMConfig().tiny(), llama=ours)
    variables = convert_pointllm(sd, pcfg, extend_vocab=False)
    back = export_pointllm(variables)
    for k in (
        "model.embed_tokens.weight",
        "model.layers.0.self_attn.q_proj.weight",
        "model.layers.1.mlp.down_proj.weight",
        "model.norm.weight",
        "lm_head.weight",
    ):
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_llama_gqa_logits_parity():
    """GQA (num_key_value_heads < heads, LLaMA-2/3-70B layout): our
    repeat-at-attention decoder must match HF's repeat_kv semantics and
    load the narrower k/v projections from the same state_dict."""
    import torch
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

    ours = dataclasses.replace(tiny_cfgs(), num_key_value_heads=2)
    hf_cfg = HFConfig(
        vocab_size=ours.vocab_size,
        hidden_size=ours.hidden_size,
        intermediate_size=ours.intermediate_size,
        num_hidden_layers=ours.num_hidden_layers,
        num_attention_heads=ours.num_attention_heads,
        num_key_value_heads=2,
        max_position_embeddings=ours.max_position_embeddings,
        rms_norm_eps=ours.rms_norm_eps,
        rope_theta=ours.rope_theta,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    model = LlamaForCausalLM(hf_cfg).eval().float()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    pcfg = dataclasses.replace(
        PointLLMConfig().tiny(), llama=ours,
        point_patch_token_id=10, point_start_token_id=11,
        point_end_token_id=12,
    )
    variables = convert_pointllm(sd, pcfg, extend_vocab=False)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, ours.vocab_size, size=(2, 12)).astype(np.int32)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids).long()).logits.numpy()

    from flax import traverse_util

    flat = traverse_util.flatten_dict(variables, sep="/")
    emb = np.asarray(flat["params/embed_tokens/embedding"])
    head = np.asarray(flat["params/lm_head/kernel"])
    trunk_params = {
        "params": traverse_util.unflatten_dict(
            {
                tuple(k.split("/")[2:]): v
                for k, v in flat.items()
                if k.startswith("params/model/")
            }
        )
    }
    trunk = LlamaModel(ours)
    embeds = jnp.asarray(emb[ids])
    positions = jnp.broadcast_to(jnp.arange(ids.shape[1]), ids.shape)
    x, _ = trunk.apply(trunk_params, embeds, positions)
    logits = np.asarray(x @ head)
    np.testing.assert_allclose(logits, ref, atol=2e-3, rtol=1e-3)


def test_llama3_70b_config():
    cfg = OurLlamaConfig.llama3_70b()
    assert cfg.num_hidden_layers == 80
    assert cfg.num_key_value_heads == 8
    assert cfg.vocab_size == 128256
    # GQA cache is heads/kv_heads smaller than MHA would be
    from egoscaler_tpu.models.llama import init_kv_cache

    cache = jax.eval_shape(lambda: init_kv_cache(cfg, 1, 16))
    assert cache["k"].shape == (80, 1, 16, 8, 128)
