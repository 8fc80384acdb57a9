"""Batched streaming inference: smoothing + FSM sequence matching on device."""

from howl_tpu.inference.config import EngineConfig
from howl_tpu.inference.engine import StreamingEngine, WholeClipEngine

__all__ = ["EngineConfig", "StreamingEngine", "WholeClipEngine"]
