"""Upstream PointLLM two-stage pretraining (Objaverse captions).

Rebuild of models/pointllm/pointllm/train/train.py:40-216 +
pointllm_trainer.py:25-49 + data/object_point_dataset.py:62 on the
TPU-native stack:

* stage 1: LLM and point backbone frozen, ONLY the projector (+ point
  tokens' embeddings) train (fix_llm=True, fix_pointnet=True);
* stage 2: LLM + projector train, point backbone frozen
  (fix_llm=False);
* conversation preprocessing (preprocess_v1/point-token substitution,
  data/utils.py:59-144): the <point> placeholder expands to
  [point_start][patch x N][point_end] and conversations render through
  the vicuna template;
* partial checkpointing (projector + embeddings subset — the
  `PointLLMTrainer._save` behavior) via `partial_state_dict`.

FSDP's role (train.py:181-196) is covered by the mesh sharding rules in
parallel/sharding.py (fully-sharded = P over `data`).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from egoscaler_tpu.configs import PointLLMConfig, TrainConfig
from egoscaler_tpu.models.conversation import conv_vicuna_v1_1
from egoscaler_tpu.training.dataset import PAD_ID

POINT_PLACEHOLDER = "<point>"

# freeze patterns per stage (pointllm/train/train.py:118-168)
STAGE1_FROZEN = (
    r"^params/point_backbone/.*",
    r"^params/model/.*",
    r"^params/lm_head/.*",
)
STAGE2_FROZEN = (r"^params/point_backbone/.*",)


def stage_frozen_patterns(stage: int) -> Tuple[str, ...]:
    return STAGE1_FROZEN if stage == 1 else STAGE2_FROZEN


def render_conversation(
    conversations: Sequence[Dict[str, str]],
    cfg: PointLLMConfig,
) -> Tuple[str, List[Tuple[str, str]]]:
    """Substitute the point placeholder and render the vicuna prompt
    (data/utils.py:129-144 + preprocess_v1)."""
    n_patch = cfg.point_bert.point_token_len
    replace = "<point_patch>" * n_patch
    if cfg.mm_use_point_start_end:
        replace = "<point_start>" + replace + "<point_end>"
    conv = conv_vicuna_v1_1.copy()
    rendered = []
    for turn in conversations:
        role = conv.roles[0] if turn.get("from") in ("human", "user") else conv.roles[1]
        text = turn["value"].replace(POINT_PLACEHOLDER, replace)
        conv.append_message(role, text)
        rendered.append((role, text))
    return conv.get_prompt(), rendered


class ObjectPointCloudDataset:
    """Objaverse caption dataset (object_point_dataset.py:62): per sample
    an 8192-point cloud npy + a conversation about the object."""

    def __init__(
        self,
        data_root: str,
        anno_file: str = "PointLLM_brief_description.json",
        pointnum: int = 8192,
        use_color: bool = True,
    ):
        self.data_root = data_root
        self.pointnum = pointnum
        self.use_color = use_color
        with open(os.path.join(data_root, anno_file)) as f:
            self.annotations = json.load(f)

    def __len__(self) -> int:
        return len(self.annotations)

    def __getitem__(self, idx: int):
        from egoscaler_tpu.models.pointbert import pc_norm
        import jax.numpy as jnp

        ann = self.annotations[idx]
        object_id = ann["object_id"]
        pc = np.load(
            os.path.join(
                self.data_root, f"{object_id}_{self.pointnum}.npy"
            )
        )
        pc = np.asarray(pc_norm(jnp.asarray(pc)), np.float32)
        if not self.use_color:
            pc = pc[:, :3]
        return {"point_clouds": pc, "conversations": ann["conversations"]}


class ModelNetDataset:
    """ModelNet40 classification split (data/modelnet.py:9)."""

    def __init__(self, data_root: str, split: str = "test",
                 pointnum: int = 8192):
        self.data_root = data_root
        self.split = split
        self.pointnum = pointnum
        names_file = os.path.join(data_root, "modelnet40_shape_names.txt")
        with open(names_file) as f:
            self.categories = [l.strip() for l in f if l.strip()]
        list_file = os.path.join(data_root, f"modelnet40_{split}.txt")
        with open(list_file) as f:
            self.items = [l.strip() for l in f if l.strip()]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx: int):
        from egoscaler_tpu.models.pointbert import pc_norm
        import jax.numpy as jnp

        name = self.items[idx]
        category = "_".join(name.split("_")[:-1])
        pc = np.load(os.path.join(self.data_root, category, name + ".npy"))
        pc = np.asarray(pc_norm(jnp.asarray(pc[:, :3])), np.float32)
        return {"point_clouds": pc, "label": self.categories.index(category)}


def partial_state_dict(variables: dict) -> dict:
    """Projector + embedding subset save (pointllm_trainer.py:25-49)."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(variables, sep="/")
    keep = {
        k: v for k, v in flat.items()
        if "point_proj" in k or "embed_tokens" in k
    }
    return traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in keep.items()}
    )


def pretrain_config(stage: int, base: Optional[TrainConfig] = None) -> TrainConfig:
    """Stage-specific TrainConfig (train.py hyperparameters)."""
    base = base or TrainConfig()
    return dataclasses.replace(
        base,
        unfreeze_pc_encoder=False,
        unfreeze_language_model=(stage == 2),
        lr=2e-3 if stage == 1 else 2e-5,
    )
