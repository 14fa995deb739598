"""Typed configuration tree for the EgoScaler-TPU framework.

One dataclass tree replaces the reference's three config mechanisms
(static classes in egoscaler/configs/, argparse in every script, and
YAML+EasyDict for PointBERT — see reference egoscaler/configs/__init__.py:1-3,
models/pointllm/train.py:312-348).  Every config serializes to JSON so a run
directory fully records its configuration.
"""
from .camera import AriaCameraConfig, CameraConfig
from .data import DataConfig, PCMConfig
from .dataset import WorkspaceConfig
from .model import PointBertConfig, LlamaConfig, PointLLMConfig, TrajTokenConfig
from .train import TrainConfig, MeshConfig

__all__ = [
    "AriaCameraConfig",
    "CameraConfig",
    "DataConfig",
    "PCMConfig",
    "WorkspaceConfig",
    "PointBertConfig",
    "LlamaConfig",
    "PointLLMConfig",
    "TrajTokenConfig",
    "TrainConfig",
    "MeshConfig",
]
