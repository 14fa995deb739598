"""TPU serving: continuous-batching decode engine (beyond parity —
the reference has only a single-request gradio chat)."""
from egoscaler_tpu.serving.engine import ServingEngine

__all__ = ["ServingEngine"]
