"""Model configuration dataclasses.

Covers the PointBERT encoder (reference:
models/pointllm/pointllm/model/pointbert/PointTransformer_8192point_2layer.yaml),
the LLaMA decoder (HF `RunsenXu/PointLLM_7B_v1.2` config), the fused
PointLLM model, and the RT-2 trajectory-token vocabulary
(reference: models/pointllm/constant.py:1-26, builder.py:33-46).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class PointBertConfig:
    """PointTransformer_8192point_2layer.yaml equivalent."""

    trans_dim: int = 384
    depth: int = 12
    drop_path_rate: float = 0.1
    num_heads: int = 6
    group_size: int = 32
    num_group: int = 512
    encoder_dims: int = 256
    point_dims: int = 6  # xyz + rgb (use_color=True, reference pointllm.py:42-43)
    projection_hidden_dims: Tuple[int, ...] = (1024, 2048)
    use_max_pool: bool = False
    npoints: int = 8192

    @property
    def point_token_len(self) -> int:
        """Number of point tokens spliced into the LLM (cls + groups)."""
        return self.num_group + 1 if not self.use_max_pool else 1


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    """Decoder config; defaults match LLaMA-7B (PointLLM_7B_v1.2)."""

    vocab_size: int = 32003  # 32000 + point patch/start/end tokens
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    # "int8": serve the projection matrices (q/k/v/o, gate/up/down and
    # the fused model's lm_head) as int8 + per-channel scales through
    # the Pallas w8a16 kernel (ops/quant_matmul.py) — decode is
    # parameter-bandwidth bound, so this ~halves ms/step.  Params must
    # come from models/quantize.quantize_decode_params.  None = bf16.
    weight_quant: Optional[str] = None
    # "int8": store the KV cache as int8 with per-(token, head) scales
    # and decode through the Pallas flash-decode kernel
    # (ops/kv8_attention.py) — at long contexts the cache stream rivals
    # the param stream, so this ~halves the attention-side HBM traffic.
    # Composes with weight_quant.  None = cache in the dtype passed to
    # init_kv_cache (bf16 default).
    kv_quant: Optional[str] = None

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @staticmethod
    def llama3_70b() -> "LlamaConfig":
        """LLaMA-3-70B-Instruct (the stage-2/3 judge, llm_judge.py:24):
        GQA with 8 kv heads (config.json of Meta-Llama-3-70B)."""
        return LlamaConfig(
            vocab_size=128256,
            hidden_size=8192,
            intermediate_size=28672,
            num_hidden_layers=80,
            num_attention_heads=64,
            num_key_value_heads=8,
            max_position_embeddings=8192,
            rms_norm_eps=1e-5,
            rope_theta=500000.0,
        )

    def tiny(self) -> "LlamaConfig":
        """A small config for tests / CPU simulation."""
        return dataclasses.replace(
            self,
            hidden_size=128,
            intermediate_size=352,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=4,
            max_position_embeddings=1024,
        )


@dataclasses.dataclass(frozen=True)
class TrajTokenConfig:
    """RT-2 style trajectory token vocabulary (reference constant.py:1-26).

    The tokenizer appends to the base LLM vocab, in order:
      <ts>, <tsep>, <te>  (timestep start/separator/end — builder.py:40)
      <p0> .. <p{num_bins-1}>  (RT-2 bins — builder.py:38-41)
    """

    num_bins: int = 256
    num_steps: int = 20  # waypoints per trajectory
    max_traj_token: int = 160
    max_desc_token: int = 20
    sep_token: str = "<sep>"
    ts_token: str = "<ts>"
    tsep_token: str = "<tsep>"
    te_token: str = "<te>"
    rt2_template: str = "<p{p}>"


@dataclasses.dataclass(frozen=True)
class PointLLMConfig:
    """Fused point-cloud LLM (reference pointllm.py:26-352, model_arch.py:8)."""

    llama: LlamaConfig = dataclasses.field(default_factory=LlamaConfig)
    point_bert: PointBertConfig = dataclasses.field(default_factory=PointBertConfig)
    traj: TrajTokenConfig = dataclasses.field(default_factory=TrajTokenConfig)
    # token id of <point_patch> in the base vocab (last base token, 32002 w/
    # vocab 32003; reference adds it via tokenizer.add_tokens)
    point_patch_token_id: int = 32000
    mm_use_point_start_end: bool = True
    point_start_token_id: int = 32001
    point_end_token_id: int = 32002

    @property
    def extended_vocab_size(self) -> int:
        """Base vocab + 3 timestep tokens + num_bins RT-2 tokens."""
        return self.llama.vocab_size + 3 + self.traj.num_bins

    def tiny(self) -> "PointLLMConfig":
        return dataclasses.replace(
            self,
            llama=self.llama.tiny(),
            point_bert=dataclasses.replace(
                self.point_bert,
                trans_dim=64,
                depth=2,
                num_heads=4,
                group_size=8,
                num_group=16,
                encoder_dims=64,
                projection_hidden_dims=(96, 112),
                npoints=256,
            ),
        )

    def draft_tpu(self) -> "PointLLMConfig":
        """Speculative-decoding draft (serving/speculative.py): the SAME
        point_bert + tokenizer as flagship_tpu (identical prompt layout —
        513 spliced point tokens, same extended vocab) with a ~25M
        trunk, so the k+1 draft steps of a verify chunk cost a fraction
        of one target decode step."""
        return dataclasses.replace(
            self,
            llama=dataclasses.replace(
                self.llama,
                hidden_size=512,
                intermediate_size=1376,
                num_hidden_layers=4,
                num_attention_heads=8,
                num_key_value_heads=8,
            ),
        )

    def flagship_tpu(self) -> "PointLLMConfig":
        """Single-v5e-lite flagship: full PointBERT encoder (the reference's
        8192-point/512-group config) + a ~1.1B LLaMA trunk that fits one
        16 GB chip in bf16 with activations.  The full 7B config (default
        `llama`) is used when sharded over a multi-chip mesh."""
        return dataclasses.replace(
            self,
            llama=dataclasses.replace(
                self.llama,
                hidden_size=2048,
                intermediate_size=5504,
                num_hidden_layers=16,
                num_attention_heads=16,
                num_key_value_heads=16,
            ),
        )
