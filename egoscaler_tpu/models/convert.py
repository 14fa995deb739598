"""Torch -> JAX checkpoint conversion for the reference model families.

The north-star requires loading reference checkpoints at fp32 tolerance
(BASELINE.md): PointLLM_7B_v1.2 (HF LLaMA + PointBERT + projector,
pointllm.py:26-353), standalone PointBERT checkpoints
(point_encoder.py:144-167 `module.point_encoder.` remap), and the
trajectory fine-tune checkpoints saved by train.py:287-308.

Torch tensors arrive as a flat state_dict (name -> numpy array); no
torch import is required here (callers may use `load_torch_file`).

Name mapping (torch -> flax path):
  model.embed_tokens.weight                -> embed_tokens/embedding
  model.layers.{i}.self_attn.{q,k,v,o}_proj.weight
        -> model/layers_{i}/self_attn/{q,k,v,o}_proj/kernel  (transposed)
  model.layers.{i}.mlp.{gate,up,down}_proj.weight -> ... (transposed)
  model.layers.{i}.input_layernorm.weight  -> .../input_layernorm/weight
  model.norm.weight                        -> model/norm/weight
  lm_head.weight                           -> lm_head/kernel (transposed)
  model.point_proj.{2k}.{weight,bias}      -> point_proj/proj_{2k}/...
  model.point_backbone.*                   -> point_backbone/* (see below)
"""
from __future__ import annotations

import re
from typing import Dict, Optional

import numpy as np

from flax import traverse_util

from egoscaler_tpu.configs import PointLLMConfig


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into numpy without keeping torch tensors."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]  # train.py:289 layout
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]        # PointBERT layout
    return {k: v.float().numpy() for k, v in obj.items()
            if hasattr(v, "numpy")}


def _linear(sd, name, out, path):
    out[f"params/{path}/kernel"] = sd[f"{name}.weight"].T
    if f"{name}.bias" in sd:
        out[f"params/{path}/bias"] = sd[f"{name}.bias"]


def _layernorm(sd, name, out, path):
    out[f"params/{path}/scale"] = sd[f"{name}.weight"]
    out[f"params/{path}/bias"] = sd[f"{name}.bias"]


def _batchnorm(sd, name, out, path):
    out[f"params/{path}/scale"] = sd[f"{name}.weight"]
    out[f"params/{path}/bias"] = sd[f"{name}.bias"]
    out[f"batch_stats/{path}/mean"] = sd[f"{name}.running_mean"]
    out[f"batch_stats/{path}/var"] = sd[f"{name}.running_var"]


def _conv1d_as_dense(sd, name, out, path):
    """torch Conv1d(k=1) weight (out, in, 1) -> Dense kernel (in, out)."""
    w = sd[f"{name}.weight"]
    out[f"params/{path}/kernel"] = w[..., 0].T
    if f"{name}.bias" in sd:
        out[f"params/{path}/bias"] = sd[f"{name}.bias"]


def convert_pointbert(
    sd: Dict[str, np.ndarray],
    prefix: str = "",
    out_prefix: str = "point_backbone",
    depth: int = 12,
) -> Dict[str, np.ndarray]:
    """PointTransformer weights (point_encoder.py:101-143 module tree)."""
    out: Dict[str, np.ndarray] = {}
    p = prefix
    o = out_prefix
    out[f"params/{o}/cls_token"] = sd[f"{p}cls_token"]
    out[f"params/{o}/cls_pos"] = sd[f"{p}cls_pos"]
    _linear(sd, f"{p}reduce_dim", out, f"{o}/reduce_dim")
    _linear(sd, f"{p}pos_embed.0", out, f"{o}/pos_embed_0")
    _linear(sd, f"{p}pos_embed.2", out, f"{o}/pos_embed_2")
    _conv1d_as_dense(sd, f"{p}encoder.first_conv.0", out, f"{o}/encoder/first_conv_0")
    _batchnorm(sd, f"{p}encoder.first_conv.1", out, f"{o}/encoder/first_conv_1")
    _conv1d_as_dense(sd, f"{p}encoder.first_conv.3", out, f"{o}/encoder/first_conv_3")
    _conv1d_as_dense(sd, f"{p}encoder.second_conv.0", out, f"{o}/encoder/second_conv_0")
    _batchnorm(sd, f"{p}encoder.second_conv.1", out, f"{o}/encoder/second_conv_1")
    _conv1d_as_dense(sd, f"{p}encoder.second_conv.3", out, f"{o}/encoder/second_conv_3")
    for i in range(depth):
        b = f"{p}blocks.blocks.{i}"
        t = f"{o}/blocks_{i}"
        _layernorm(sd, f"{b}.norm1", out, f"{t}/norm1")
        _layernorm(sd, f"{b}.norm2", out, f"{t}/norm2")
        _linear(sd, f"{b}.attn.qkv", out, f"{t}/attn_qkv")
        _linear(sd, f"{b}.attn.proj", out, f"{t}/attn_proj")
        _linear(sd, f"{b}.mlp.fc1", out, f"{t}/mlp_fc1")
        _linear(sd, f"{b}.mlp.fc2", out, f"{t}/mlp_fc2")
    _layernorm(sd, f"{p}norm", out, f"{o}/norm")
    return out


def convert_pointbert_standalone(sd: Dict[str, np.ndarray], depth: int = 12):
    """`module.point_encoder.` remap (point_encoder.py:144-151)."""
    stripped = {
        k.replace("module.point_encoder.", ""): v
        for k, v in sd.items()
        if k.startswith("module.point_encoder.")
    }
    return convert_pointbert(stripped, depth=depth)


def convert_pointllm(
    sd: Dict[str, np.ndarray],
    cfg: PointLLMConfig,
    extend_vocab: bool = True,
    seed: int = 0,
) -> dict:
    """Full PointLLM state_dict -> flax variables for TrajPointLLM.

    With `extend_vocab`, embed_tokens/lm_head rows for the trajectory
    tokens are appended: new input embeddings are drawn N(0, 0.02) and
    new output rows zero-init (builder.py:44 `mean_resizing=False`
    resizes without averaging — random init per HF).
    """
    out: Dict[str, np.ndarray] = {}
    n_layers = cfg.llama.num_hidden_layers

    emb = sd["model.embed_tokens.weight"]
    head = sd["lm_head.weight"].T  # (hidden, vocab)
    if extend_vocab:
        extra = cfg.extended_vocab_size - emb.shape[0]
        if extra > 0:
            rng = np.random.default_rng(seed)
            emb = np.concatenate(
                [emb, rng.normal(0, 0.02, (extra, emb.shape[1])).astype(emb.dtype)]
            )
            head = np.concatenate(
                [head, np.zeros((head.shape[0], extra), head.dtype)], axis=1
            )
    out["params/embed_tokens/embedding"] = emb
    out["params/lm_head/kernel"] = head

    for i in range(n_layers):
        src = f"model.layers.{i}"
        dst = f"model/layers_{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            _linear(sd, f"{src}.self_attn.{proj}", out, f"{dst}/self_attn/{proj}")
        for proj in ("gate_proj", "up_proj", "down_proj"):
            _linear(sd, f"{src}.mlp.{proj}", out, f"{dst}/mlp/{proj}")
        out[f"params/{dst}/input_layernorm/weight"] = sd[
            f"{src}.input_layernorm.weight"
        ]
        out[f"params/{dst}/post_attention_layernorm/weight"] = sd[
            f"{src}.post_attention_layernorm.weight"
        ]
    out["params/model/norm/weight"] = sd["model.norm.weight"]

    # projector (pointllm.py:63-82: point_proj is nn.Sequential 0,2,4)
    for k in sd:
        m = re.match(r"model\.point_proj\.(\d+)\.weight", k)
        if m:
            idx = int(m.group(1))
            _linear(sd, f"model.point_proj.{idx}", out, f"point_proj/proj_{idx}")

    if any(k.startswith("model.point_backbone.") for k in sd):
        pb = convert_pointbert(
            sd, prefix="model.point_backbone.",
            depth=cfg.point_bert.depth,
        )
        out.update(pb)

    nested = traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in out.items()}
    )
    return nested


def _conv2d(sd, name, out, path, flip: bool = False):
    """torch Conv2d weight (out, in, kh, kw) -> flax kernel (kh, kw, in, out)."""
    w = sd[f"{name}.weight"].transpose(2, 3, 1, 0)
    if flip:
        w = w[::-1, ::-1]
    out[f"params/{path}/kernel"] = w
    if f"{name}.bias" in sd:
        out[f"params/{path}/bias"] = sd[f"{name}.bias"]


def _convT2d(sd, name, out, path):
    """torch ConvTranspose2d weight (in, out, kh, kw) -> flax
    ConvTranspose kernel (kh, kw, in, out), spatially flipped (torch's
    transposed conv scatters the unflipped kernel; lax.conv_transpose
    correlates)."""
    w = sd[f"{name}.weight"].transpose(2, 3, 0, 1)
    out[f"params/{path}/kernel"] = w[::-1, ::-1]
    if f"{name}.bias" in sd:
        out[f"params/{path}/bias"] = sd[f"{name}.bias"]


META_TO_HF = (
    # Meta llama3 native naming -> HF naming (for the 70B annotation
    # judge of stages 2-3; SURVEY.md §2.2 llama3 submodule)
    (r"^tok_embeddings\.weight$", "model.embed_tokens.weight"),
    (r"^layers\.(\d+)\.attention\.wq\.weight$",
     r"model.layers.\1.self_attn.q_proj.weight"),
    (r"^layers\.(\d+)\.attention\.wk\.weight$",
     r"model.layers.\1.self_attn.k_proj.weight"),
    (r"^layers\.(\d+)\.attention\.wv\.weight$",
     r"model.layers.\1.self_attn.v_proj.weight"),
    (r"^layers\.(\d+)\.attention\.wo\.weight$",
     r"model.layers.\1.self_attn.o_proj.weight"),
    (r"^layers\.(\d+)\.feed_forward\.w1\.weight$",
     r"model.layers.\1.mlp.gate_proj.weight"),
    (r"^layers\.(\d+)\.feed_forward\.w2\.weight$",
     r"model.layers.\1.mlp.down_proj.weight"),
    (r"^layers\.(\d+)\.feed_forward\.w3\.weight$",
     r"model.layers.\1.mlp.up_proj.weight"),
    (r"^layers\.(\d+)\.attention_norm\.weight$",
     r"model.layers.\1.input_layernorm.weight"),
    (r"^layers\.(\d+)\.ffn_norm\.weight$",
     r"model.layers.\1.post_attention_layernorm.weight"),
    (r"^norm\.weight$", "model.norm.weight"),
    (r"^output\.weight$", "lm_head.weight"),
)


def meta_to_hf_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Meta-native LLaMA checkpoint names -> HF names, feeding
    convert_pointllm.  (fairscale-sharded checkpoints must be
    concatenated per tensor by the caller before remapping.)"""
    out = {}
    for k, v in sd.items():
        for pattern, repl in META_TO_HF:
            new, n = re.subn(pattern, repl, k)
            if n:
                out[new] = v
                break
        else:
            out[k] = v
    return out


def convert_depth_anything(sd: Dict[str, np.ndarray], depth: int = 24) -> dict:
    """Depth-Anything-V2 torch checkpoint -> flax variables.

    Name map for dinov2.py / dpt.py module trees (see
    models/depth_anything.py docstring).
    """
    out: Dict[str, np.ndarray] = {}
    p = "pretrained"
    out[f"params/{p}/cls_token"] = sd["pretrained.cls_token"]
    out[f"params/{p}/pos_embed"] = sd["pretrained.pos_embed"]
    w = sd["pretrained.patch_embed.proj.weight"].transpose(2, 3, 1, 0)
    out[f"params/{p}/patch_embed/kernel"] = w
    out[f"params/{p}/patch_embed/bias"] = sd["pretrained.patch_embed.proj.bias"]
    for i in range(depth):
        b = f"pretrained.blocks.{i}"
        t = f"{p}/blocks_{i}"
        _layernorm(sd, f"{b}.norm1", out, f"{t}/norm1")
        _layernorm(sd, f"{b}.norm2", out, f"{t}/norm2")
        # torch packs qkv as one (3*dim, dim) weight; the flax DinoBlock
        # runs three separate projections (avoids the strided slice of a
        # (B,S,3,H,D) pack on TPU), so split the rows here.
        qkv_w = sd[f"{b}.attn.qkv.weight"]
        qkv_b = sd[f"{b}.attn.qkv.bias"]
        dim = qkv_w.shape[0] // 3
        for j, nm in enumerate(("attn_q", "attn_k", "attn_v")):
            out[f"params/{t}/{nm}/kernel"] = qkv_w[j * dim : (j + 1) * dim].T
            out[f"params/{t}/{nm}/bias"] = qkv_b[j * dim : (j + 1) * dim]
        _linear(sd, f"{b}.attn.proj", out, f"{t}/attn_proj")
        _linear(sd, f"{b}.mlp.fc1", out, f"{t}/mlp_fc1")
        _linear(sd, f"{b}.mlp.fc2", out, f"{t}/mlp_fc2")
        out[f"params/{t}/ls1_gamma"] = sd[f"{b}.ls1.gamma"]
        out[f"params/{t}/ls2_gamma"] = sd[f"{b}.ls2.gamma"]
    _layernorm(sd, "pretrained.norm", out, f"{p}/norm")

    h = "depth_head"
    for i in range(4):
        _conv2d(sd, f"depth_head.projects.{i}", out, f"{h}/projects_{i}")
    _convT2d(sd, "depth_head.resize_layers.0", out, f"{h}/resize_0")
    _convT2d(sd, "depth_head.resize_layers.1", out, f"{h}/resize_1")
    _conv2d(sd, "depth_head.resize_layers.3", out, f"{h}/resize_3")
    for i in range(1, 5):
        _conv2d(sd, f"depth_head.scratch.layer{i}_rn", out, f"{h}/layer{i}_rn")
        rf = f"depth_head.scratch.refinenet{i}"
        t = f"{h}/refinenet{i}"
        _conv2d(sd, f"{rf}.out_conv", out, f"{t}/out_conv")
        for j in (1, 2):
            _conv2d(sd, f"{rf}.resConfUnit{j}.conv1", out, f"{t}/resConfUnit{j}/conv1")
            _conv2d(sd, f"{rf}.resConfUnit{j}.conv2", out, f"{t}/resConfUnit{j}/conv2")
    _conv2d(sd, "depth_head.scratch.output_conv1", out, f"{h}/output_conv1")
    _conv2d(sd, "depth_head.scratch.output_conv2.0", out, f"{h}/output_conv2_0")
    _conv2d(sd, "depth_head.scratch.output_conv2.2", out, f"{h}/output_conv2_2")

    nested = traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in out.items()}
    )
    return nested


def convert_sam(sd: Dict[str, np.ndarray], num_vision_layers: int,
                num_decoder_layers: int = 2) -> dict:
    """HF facebook/sam-vit-* state_dict -> flax variables for
    models/sam.SamModel (validated against transformers SamModel)."""
    out: Dict[str, np.ndarray] = {}

    out["params/shared_image_embedding/positional_embedding"] = sd[
        "shared_image_embedding.positional_embedding"
    ]

    v = "vision_encoder"
    out[f"params/{v}/pos_embed"] = sd[f"{v}.pos_embed"]
    out[f"params/{v}/patch_embed/kernel"] = sd[
        f"{v}.patch_embed.projection.weight"
    ].transpose(2, 3, 1, 0)
    out[f"params/{v}/patch_embed/bias"] = sd[f"{v}.patch_embed.projection.bias"]
    for i in range(num_vision_layers):
        b = f"{v}.layers.{i}"
        t = f"{v}/layers_{i}"
        _layernorm(sd, f"{b}.layer_norm1", out, f"{t}/layer_norm1")
        _layernorm(sd, f"{b}.layer_norm2", out, f"{t}/layer_norm2")
        _linear(sd, f"{b}.attn.qkv", out, f"{t}/attn/qkv")
        _linear(sd, f"{b}.attn.proj", out, f"{t}/attn/proj")
        out[f"params/{t}/attn/rel_pos_h"] = sd[f"{b}.attn.rel_pos_h"]
        out[f"params/{t}/attn/rel_pos_w"] = sd[f"{b}.attn.rel_pos_w"]
        _linear(sd, f"{b}.mlp.lin1", out, f"{t}/mlp_lin1")
        _linear(sd, f"{b}.mlp.lin2", out, f"{t}/mlp_lin2")
    _conv2d(sd, f"{v}.neck.conv1", out, f"{v}/neck_conv1")
    _layernorm(sd, f"{v}.neck.layer_norm1", out, f"{v}/neck_ln1")
    _conv2d(sd, f"{v}.neck.conv2", out, f"{v}/neck_conv2")
    _layernorm(sd, f"{v}.neck.layer_norm2", out, f"{v}/neck_ln2")

    p = "prompt_encoder"
    out[f"params/{p}/shared_embedding/positional_embedding"] = sd[
        f"{p}.shared_embedding.positional_embedding"
    ]
    for i in range(4):
        out[f"params/{p}/point_embed_{i}"] = sd[f"{p}.point_embed.{i}.weight"]
    out[f"params/{p}/not_a_point_embed"] = sd[f"{p}.not_a_point_embed.weight"]
    out[f"params/{p}/no_mask_embed"] = sd[f"{p}.no_mask_embed.weight"]

    m = "mask_decoder"
    out[f"params/{m}/iou_token"] = sd[f"{m}.iou_token.weight"]
    out[f"params/{m}/mask_tokens"] = sd[f"{m}.mask_tokens.weight"]
    for i in range(num_decoder_layers):
        b = f"{m}.transformer.layers.{i}"
        t = f"{m}/layers_{i}"
        for attn in ("self_attn", "cross_attn_token_to_image",
                     "cross_attn_image_to_token"):
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                _linear(sd, f"{b}.{attn}.{proj}", out, f"{t}/{attn}/{proj}")
        for ln in ("layer_norm1", "layer_norm2", "layer_norm3", "layer_norm4"):
            _layernorm(sd, f"{b}.{ln}", out, f"{t}/{ln}")
        _linear(sd, f"{b}.mlp.lin1", out, f"{t}/mlp_lin1")
        _linear(sd, f"{b}.mlp.lin2", out, f"{t}/mlp_lin2")
    for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
        _linear(
            sd, f"{m}.transformer.final_attn_token_to_image.{proj}", out,
            f"{m}/final_attn_token_to_image/{proj}",
        )
    _layernorm(
        sd, f"{m}.transformer.layer_norm_final_attn", out,
        f"{m}/layer_norm_final_attn",
    )
    _convT2d(sd, f"{m}.upscale_conv1", out, f"{m}/upscale_conv1")
    _convT2d(sd, f"{m}.upscale_conv2", out, f"{m}/upscale_conv2")
    _layernorm(sd, f"{m}.upscale_layer_norm", out, f"{m}/upscale_layer_norm")
    n_mask_tokens = sd[f"{m}.mask_tokens.weight"].shape[0]
    for i in range(n_mask_tokens):
        b = f"{m}.output_hypernetworks_mlps.{i}"
        t = f"{m}/hyper_mlps_{i}"
        _linear(sd, f"{b}.proj_in", out, f"{t}/proj_in")
        _linear(sd, f"{b}.proj_out", out, f"{t}/proj_out")
        j = 0
        while f"{b}.layers.{j}.weight" in sd:
            _linear(sd, f"{b}.layers.{j}", out, f"{t}/layers_{j}")
            j += 1
    b = f"{m}.iou_prediction_head"
    t = f"{m}/iou_prediction_head"
    _linear(sd, f"{b}.proj_in", out, f"{t}/proj_in")
    _linear(sd, f"{b}.proj_out", out, f"{t}/proj_out")
    j = 0
    while f"{b}.layers.{j}.weight" in sd:
        _linear(sd, f"{b}.layers.{j}", out, f"{t}/layers_{j}")
        j += 1

    nested = traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in out.items()}
    )
    return nested


def export_pointllm(variables: dict) -> Dict[str, np.ndarray]:
    """Inverse conversion: flax variables -> torch-layout state_dict
    (for writing checkpoints the reference harness can load)."""
    flat = traverse_util.flatten_dict(variables, sep="/")
    sd: Dict[str, np.ndarray] = {}

    def put_linear(path, name):
        sd[f"{name}.weight"] = np.asarray(flat[f"params/{path}/kernel"]).T
        if f"params/{path}/bias" in flat:
            sd[f"{name}.bias"] = np.asarray(flat[f"params/{path}/bias"])

    for k, v in flat.items():
        v = np.asarray(v)
        if k == "params/embed_tokens/embedding":
            sd["model.embed_tokens.weight"] = v
        elif k == "params/lm_head/kernel":
            sd["lm_head.weight"] = v.T
        elif k == "params/model/norm/weight":
            sd["model.norm.weight"] = v
        elif m := re.match(r"params/model/layers_(\d+)/(.*)/kernel", k):
            i, rest = m.group(1), m.group(2).replace("/", ".")
            sd[f"model.layers.{i}.{rest}.weight"] = v.T
        elif m := re.match(r"params/model/layers_(\d+)/(.*)/weight", k):
            i, rest = m.group(1), m.group(2).replace("/", ".")
            sd[f"model.layers.{i}.{rest}.weight"] = v
        elif m := re.match(r"params/point_proj/proj_(\d+)/kernel", k):
            sd[f"model.point_proj.{m.group(1)}.weight"] = v.T
        elif m := re.match(r"params/point_proj/proj_(\d+)/bias", k):
            sd[f"model.point_proj.{m.group(1)}.bias"] = v
    return sd


def convert_swin_backbone(
    sd: Dict[str, np.ndarray], prefix: str = ""
) -> Dict[str, np.ndarray]:
    """HF SwinBackbone state_dict -> flax models/swin.SwinBackbone params
    (modeling_swin.py module tree).  Conv weights OIHW -> HWIO; Linear
    transposed; LayerNorm weight -> scale."""
    out: Dict[str, np.ndarray] = {}
    p = prefix

    w = sd[f"{p}embeddings.patch_embeddings.projection.weight"]
    out["params/patch_embeddings_projection/kernel"] = w.transpose(2, 3, 1, 0)
    out["params/patch_embeddings_projection/bias"] = sd[
        f"{p}embeddings.patch_embeddings.projection.bias"
    ]
    _layernorm(sd, f"{p}embeddings.norm", out, "embeddings_norm")

    for key in sd:
        if not key.startswith(f"{p}encoder.layers."):
            continue
        rest = key[len(f"{p}encoder.layers."):]
        i, rest = rest.split(".", 1)
        if rest.startswith("blocks."):
            j, rest = rest[len("blocks."):].split(".", 1)
            base = f"layers_{i}_blocks_{j}"
            if rest == "attention.self.relative_position_bias_table":
                out[f"params/{base}/attention_self/relative_position_bias_table"] = sd[key]
            elif rest == "attention.self.relative_position_index":
                pass  # static buffer, recomputed
            elif rest.startswith("attention.self."):
                name, leaf = rest[len("attention.self."):].split(".")
                v = sd[key]
                out[f"params/{base}/attention_self/{name}/" +
                    ("kernel" if leaf == "weight" else "bias")] = (
                    v.T if leaf == "weight" else v
                )
            elif rest.startswith("attention.output.dense."):
                leaf = rest.rsplit(".", 1)[1]
                v = sd[key]
                out[f"params/{base}/attention_output_dense/" +
                    ("kernel" if leaf == "weight" else "bias")] = (
                    v.T if leaf == "weight" else v
                )
            elif rest.startswith("layernorm_before.") or rest.startswith("layernorm_after."):
                ln, leaf = rest.split(".")
                out[f"params/{base}/{ln}/" +
                    ("scale" if leaf == "weight" else "bias")] = sd[key]
            elif rest.startswith("intermediate.dense.") or rest.startswith("output.dense."):
                mod = rest.split(".")[0]
                leaf = rest.rsplit(".", 1)[1]
                v = sd[key]
                out[f"params/{base}/{mod}_dense/" +
                    ("kernel" if leaf == "weight" else "bias")] = (
                    v.T if leaf == "weight" else v
                )
        elif rest.startswith("downsample."):
            mod, leaf = rest[len("downsample."):].split(".")
            base = f"layers_{i}_downsample"
            if mod == "reduction":
                out[f"params/{base}/reduction/kernel"] = sd[key].T
            else:
                out[f"params/{base}/norm/" +
                    ("scale" if leaf == "weight" else "bias")] = sd[key]

    for key in sd:
        if key.startswith(f"{p}hidden_states_norms."):
            stage, leaf = key[len(f"{p}hidden_states_norms."):].split(".")
            out[f"params/hidden_states_norms_{stage}/" +
                ("scale" if leaf == "weight" else "bias")] = sd[key]
    return out


def convert_grounding_dino(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """HF GroundingDinoForObjectDetection state_dict -> flax
    models/grounding_dino.GroundingDinoForDetection params
    (modeling_grounding_dino.py module tree)."""
    out: Dict[str, np.ndarray] = {}

    # Swin backbone (shares the plain SwinBackbone converter)
    swin = convert_swin_backbone(sd, prefix="model.backbone.conv_encoder.model.")
    for k, v in swin.items():
        out[k.replace("params/", "params/backbone/")] = v

    def linear(torch_name, flax_path):
        out[f"params/{flax_path}/kernel"] = sd[f"{torch_name}.weight"].T
        if f"{torch_name}.bias" in sd:
            out[f"params/{flax_path}/bias"] = sd[f"{torch_name}.bias"]

    def ln(torch_name, flax_path):
        out[f"params/{flax_path}/scale"] = sd[f"{torch_name}.weight"]
        out[f"params/{flax_path}/bias"] = sd[f"{torch_name}.bias"]

    def mha(torch_base, flax_base):
        for p in ("query", "key", "value", "out_proj"):
            linear(f"{torch_base}.{p}", f"{flax_base}/{p}")

    def deformable(torch_base, flax_base):
        for p in ("sampling_offsets", "attention_weights", "value_proj",
                  "output_proj"):
            linear(f"{torch_base}.{p}", f"{flax_base}/{p}")

    def mlp_head(torch_base, flax_base, n):
        for i in range(n):
            linear(f"{torch_base}.layers.{i}", f"{flax_base}/layers_{i}")

    # input projections: Sequential(Conv2d, GroupNorm)
    i = 0
    while f"model.input_proj_vision.{i}.0.weight" in sd:
        w = sd[f"model.input_proj_vision.{i}.0.weight"]
        out[f"params/input_proj_vision_{i}_conv/kernel"] = w.transpose(2, 3, 1, 0)
        out[f"params/input_proj_vision_{i}_conv/bias"] = sd[
            f"model.input_proj_vision.{i}.0.bias"
        ]
        ln(f"model.input_proj_vision.{i}.1", f"input_proj_vision_{i}_norm")
        i += 1

    # text backbone (BERT)
    tb = "model.text_backbone."
    out["params/text_backbone/word_embeddings/embedding"] = sd[
        f"{tb}embeddings.word_embeddings.weight"
    ]
    out["params/text_backbone/position_embeddings/embedding"] = sd[
        f"{tb}embeddings.position_embeddings.weight"
    ]
    out["params/text_backbone/token_type_embeddings/embedding"] = sd[
        f"{tb}embeddings.token_type_embeddings.weight"
    ]
    ln(f"{tb}embeddings.LayerNorm", "text_backbone/embeddings_LayerNorm")
    li = 0
    while f"{tb}encoder.layer.{li}.attention.self.query.weight" in sd:
        b = f"{tb}encoder.layer.{li}"
        fb = f"text_backbone/layer_{li}"
        for p in ("query", "key", "value"):
            linear(f"{b}.attention.self.{p}", f"{fb}/attention_self/{p}")
        linear(f"{b}.attention.output.dense", f"{fb}/attention_output_dense")
        ln(f"{b}.attention.output.LayerNorm", f"{fb}/attention_output_LayerNorm")
        linear(f"{b}.intermediate.dense", f"{fb}/intermediate_dense")
        linear(f"{b}.output.dense", f"{fb}/output_dense")
        ln(f"{b}.output.LayerNorm", f"{fb}/output_LayerNorm")
        li += 1

    linear("model.text_projection", "text_projection")
    out["params/query_position_embeddings"] = sd[
        "model.query_position_embeddings.weight"
    ]
    out["params/level_embed"] = sd["model.level_embed"]

    # encoder layers
    ei = 0
    while f"model.encoder.layers.{ei}.fusion_layer.vision_param" in sd:
        b = f"model.encoder.layers.{ei}"
        fb = f"encoder_layers_{ei}"
        ln(f"{b}.fusion_layer.layer_norm_vision",
           f"{fb}/fusion_layer/layer_norm_vision")
        ln(f"{b}.fusion_layer.layer_norm_text",
           f"{fb}/fusion_layer/layer_norm_text")
        out[f"params/{fb}/fusion_layer/vision_param"] = sd[
            f"{b}.fusion_layer.vision_param"
        ]
        out[f"params/{fb}/fusion_layer/text_param"] = sd[
            f"{b}.fusion_layer.text_param"
        ]
        for p in ("vision_proj", "text_proj", "values_vision_proj",
                  "values_text_proj", "out_vision_proj", "out_text_proj"):
            linear(f"{b}.fusion_layer.attn.{p}", f"{fb}/fusion_layer/attn/{p}")
        mha(f"{b}.text_enhancer_layer.self_attn",
            f"{fb}/text_enhancer_layer/self_attn")
        linear(f"{b}.text_enhancer_layer.fc1", f"{fb}/text_enhancer_layer/fc1")
        linear(f"{b}.text_enhancer_layer.fc2", f"{fb}/text_enhancer_layer/fc2")
        ln(f"{b}.text_enhancer_layer.layer_norm_before",
           f"{fb}/text_enhancer_layer/layer_norm_before")
        ln(f"{b}.text_enhancer_layer.layer_norm_after",
           f"{fb}/text_enhancer_layer/layer_norm_after")
        deformable(f"{b}.deformable_layer.self_attn",
                   f"{fb}/deformable_layer/self_attn")
        ln(f"{b}.deformable_layer.self_attn_layer_norm",
           f"{fb}/deformable_layer/self_attn_layer_norm")
        linear(f"{b}.deformable_layer.fc1", f"{fb}/deformable_layer/fc1")
        linear(f"{b}.deformable_layer.fc2", f"{fb}/deformable_layer/fc2")
        ln(f"{b}.deformable_layer.final_layer_norm",
           f"{fb}/deformable_layer/final_layer_norm")
        ei += 1

    # decoder layers
    di = 0
    while f"model.decoder.layers.{di}.self_attn.query.weight" in sd:
        b = f"model.decoder.layers.{di}"
        fb = f"decoder_layers_{di}"
        mha(f"{b}.self_attn", f"{fb}/self_attn")
        ln(f"{b}.self_attn_layer_norm", f"{fb}/self_attn_layer_norm")
        mha(f"{b}.encoder_attn_text", f"{fb}/encoder_attn_text")
        ln(f"{b}.encoder_attn_text_layer_norm",
           f"{fb}/encoder_attn_text_layer_norm")
        deformable(f"{b}.encoder_attn", f"{fb}/encoder_attn")
        ln(f"{b}.encoder_attn_layer_norm", f"{fb}/encoder_attn_layer_norm")
        linear(f"{b}.fc1", f"{fb}/fc1")
        linear(f"{b}.fc2", f"{fb}/fc2")
        ln(f"{b}.final_layer_norm", f"{fb}/final_layer_norm")
        di += 1

    mlp_head("model.decoder.reference_points_head",
             "reference_points_head", 2)
    ln("model.decoder.layer_norm", "decoder_layer_norm")
    linear("model.enc_output", "enc_output")
    ln("model.enc_output_norm", "enc_output_norm")
    mlp_head("model.encoder_output_bbox_embed", "encoder_output_bbox_embed", 3)
    # decoder bbox heads are shared clones (decoder_bbox_embed_share=True);
    # index 0 carries the weights
    mlp_head("bbox_embed.0", "bbox_embed", 3)
    return out


def convert_bert_encoder(
    sd: Dict[str, np.ndarray], prefix: str = ""
) -> Dict[str, np.ndarray]:
    """Plain HF `BertModel` state_dict -> flax
    models/grounding_dino.BertTextEncoder params.

    Used by the sentence-embedding eval metric
    (training/caption_eval.JaxSentenceEncoder), standing in for the
    sentence-transformers encoders of the reference evaluator
    (pointllm/eval/traditional_evaluator.py:33-36).
    """
    out: Dict[str, np.ndarray] = {}

    def linear(torch_name, flax_path):
        out[f"params/{flax_path}/kernel"] = sd[f"{torch_name}.weight"].T
        out[f"params/{flax_path}/bias"] = sd[f"{torch_name}.bias"]

    def ln(torch_name, flax_path):
        out[f"params/{flax_path}/scale"] = sd[f"{torch_name}.weight"]
        out[f"params/{flax_path}/bias"] = sd[f"{torch_name}.bias"]

    p = prefix
    out["params/word_embeddings/embedding"] = sd[
        f"{p}embeddings.word_embeddings.weight"
    ]
    out["params/position_embeddings/embedding"] = sd[
        f"{p}embeddings.position_embeddings.weight"
    ]
    out["params/token_type_embeddings/embedding"] = sd[
        f"{p}embeddings.token_type_embeddings.weight"
    ]
    ln(f"{p}embeddings.LayerNorm", "embeddings_LayerNorm")
    li = 0
    while f"{p}encoder.layer.{li}.attention.self.query.weight" in sd:
        b = f"{p}encoder.layer.{li}"
        fb = f"layer_{li}"
        for q in ("query", "key", "value"):
            linear(f"{b}.attention.self.{q}", f"{fb}/attention_self/{q}")
        linear(f"{b}.attention.output.dense", f"{fb}/attention_output_dense")
        ln(f"{b}.attention.output.LayerNorm", f"{fb}/attention_output_LayerNorm")
        linear(f"{b}.intermediate.dense", f"{fb}/intermediate_dense")
        linear(f"{b}.output.dense", f"{fb}/output_dense")
        ln(f"{b}.output.LayerNorm", f"{fb}/output_LayerNorm")
        li += 1
    return out
