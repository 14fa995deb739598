"""Model families: point-cloud LLM, perception stack, converters."""
from egoscaler_tpu.models.traj_tokenizer import TrajTokenizer

__all__ = ["TrajTokenizer"]


def __getattr__(name):
    # lazy imports keep `import egoscaler_tpu.models` light; heavyweight
    # model modules load on first attribute access
    import importlib

    _lazy = {
        "TrajPointLLM": "egoscaler_tpu.models.pointllm",
        "GenerateConfig": "egoscaler_tpu.models.pointllm",
        "generate": "egoscaler_tpu.models.pointllm",
        "PointTransformer": "egoscaler_tpu.models.pointbert",
        "pc_norm": "egoscaler_tpu.models.pointbert",
        "LlamaModel": "egoscaler_tpu.models.llama",
        "DepthAnythingV2": "egoscaler_tpu.models.depth_anything",
        "DepthAnything": "egoscaler_tpu.models.depth_wrapper",
        "SamModel": "egoscaler_tpu.models.sam",
        "SamConfig": "egoscaler_tpu.models.sam",
        "GroundedSAM": "egoscaler_tpu.models.grounded_sam",
        "HOD": "egoscaler_tpu.models.hand_object",
        "SpaTracker": "egoscaler_tpu.models.tracker",
        "SpaTrackerPredictor": "egoscaler_tpu.models.tracker",
    }
    if name in _lazy:
        return getattr(importlib.import_module(_lazy[name]), name)
    raise AttributeError(name)
