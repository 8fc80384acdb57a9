"""Batched streaming inference: smoothing + FSM sequence matching on device."""

from howl_tpu.inference.config import EngineConfig
from howl_tpu.inference.engine import StreamingEngine, WholeClipEngine
from howl_tpu.inference.online import IncrementalOnlineEngine, OnlineEngine
from howl_tpu.inference.streaming_trunk import FusedStreamingOnlineEngine

__all__ = [
    "EngineConfig",
    "FusedStreamingOnlineEngine",
    "IncrementalOnlineEngine",
    "OnlineEngine",
    "StreamingEngine",
    "WholeClipEngine",
]
