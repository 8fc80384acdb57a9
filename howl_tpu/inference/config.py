"""Engine configuration (ref: howl/settings.py:38-47 InferenceEngineSettings +
the window/stride pair passed to FrameInferenceEngine, inference.py:214-221)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass(frozen=True)
class EngineConfig:
    inference_sequence: Tuple[int, ...] = (0,)
    inference_window_ms: float = 2000.0
    smoothing_window_ms: float = 50.0
    tolerance_window_ms: float = 500.0
    inference_threshold: float = 0.0
    inference_weights: Optional[Tuple[float, ...]] = None
    max_window_size_ms: float = 500.0
    eval_stride_size_ms: float = 62.5
    sample_rate: int = 16000
    negative_label: int = 1
    blank_label: int = -1
    num_labels: int = 2
    # phone mode: dense label -> word-color lookup applied to the smoothed
    # argmax before the FSM (ref inference.py:156-157 coloring.color_map);
    # None for word mode
    label_color_map: Optional[Tuple[int, ...]] = None

    @classmethod
    def from_settings(cls, context=None, **overrides) -> "EngineConfig":
        from howl_tpu.settings import SETTINGS

        eng = SETTINGS.inference_engine
        tr = SETTINGS.training
        kwargs = dict(
            inference_sequence=tuple(eng.inference_sequence),
            inference_window_ms=eng.inference_window_ms,
            smoothing_window_ms=eng.smoothing_window_ms,
            tolerance_window_ms=eng.tolerance_window_ms,
            inference_threshold=eng.inference_threshold,
            inference_weights=tuple(eng.inference_weights) if eng.inference_weights else None,
            max_window_size_ms=tr.max_window_size_seconds * 1000,
            eval_stride_size_ms=tr.eval_stride_size_seconds * 1000,
            sample_rate=SETTINGS.audio.sample_rate,
        )
        if context is not None:
            negative_label = context.negative_label
            coloring = getattr(context, "coloring", None)
            if coloring is not None:
                # phone mode: the reference colors the negative label itself
                # (ref inference.py:49-50) and uses the COLORED value both as
                # the .get default for unmapped labels and as the
                # below-threshold fallback (ref inference.py:156-159)
                negative_label = coloring.color_map[negative_label]
                kwargs["label_color_map"] = tuple(
                    coloring.color_map.get(i, negative_label) for i in range(context.num_labels)
                )
            kwargs.update(
                negative_label=negative_label,
                blank_label=context.blank_label,
                num_labels=context.num_labels,
            )
        kwargs.update(overrides)
        return cls(**kwargs)

    def padded_weights(self):
        """inference_weights padded with ones to num_labels (ref inference.py:41-45)."""
        import numpy as np

        if not self.inference_weights:
            return None
        w = np.ones(self.num_labels, np.float32)
        w[: len(self.inference_weights)] = self.inference_weights
        return w


def hop_geometry(cfg: "EngineConfig", frontend) -> tuple:
    """(window_frames, stride_frames, stride_ms): the window/stride quantized
    to whole mel hops — the single home for the geometry every engine
    (batched, online, incremental, streaming-trunk) must share. stride_ms is
    the HOP-QUANTIZED step (62.5 ms at the 63 ms/12.5 ms defaults); sizing
    smoothing/FSM rings from the raw cfg stride instead would drift the
    engines apart (documented deviation, engine.py module docstring)."""
    hop, sr = frontend.hop_length, cfg.sample_rate
    # honor the frontend's framing convention: with center=True a
    # window_samples window yields samples//hop + 1 frames; with center=False
    # (no reflect padding) only the fully-covered frames exist
    window_frames = frontend.num_frames(int(cfg.max_window_size_ms / 1000 * sr))
    stride_frames = max(1, round(cfg.eval_stride_size_ms / 1000 * sr / hop))
    stride_ms = stride_frames * hop / sr * 1000.0
    return window_frames, stride_frames, stride_ms


def ring_steps(cfg: "EngineConfig", stride_ms: float) -> tuple:
    """(s_steps, w_steps): smoothing/label ring depths for a given step size."""
    stride_ms = max(stride_ms, 1e-6)
    s_steps = max(int(cfg.smoothing_window_ms // stride_ms) + 1, 1)
    w_steps = max(int(cfg.inference_window_ms // stride_ms) + 1, 1)
    return s_steps, w_steps


def serving_dft_precision(compute_dtype, override="auto"):
    """Resolve the DFT precision an engine passes to log_mel_spectrogram.

    ``override="auto"`` (every engine's default): exact HIGHEST for f32
    serving; the 1-pass ``"bf16"`` mode (ops/frontend.py) once bf16 scoring
    was requested — its ~2^-9 DFT error is the grade the bf16 feature cast
    already injects, and decision equivalence is validated on hardware for
    every family AND the per-hop online engines
    (tools/validate_tpu_decisions.py: ALL OK). Measured p50 step gains over
    Precision.HIGH (tools/bench_online_dft_precision.py, v5e): incremental
    64.3->59.0 ms at 65k streams (from over- to under-budget), trunk
    29.7->23.9 ms. Pass ``jax.lax.Precision.HIGH`` (3-pass emulation,
    2.2e-4 log-mel error) or any other ``jax.lax.Precision`` to pin one.
    """
    if override != "auto":
        return override
    return None if compute_dtype is None else "bf16"


def cast_compute_dtype(variables, compute_dtype):
    """Cast every f32 leaf of a variables tree to the serving compute dtype
    (shared by all engines; non-f32 leaves — ints, batch-stat counters — are
    left alone)."""
    if compute_dtype is None:
        return variables
    import jax
    import jax.numpy as jnp

    return jax.tree.map(
        lambda x: x.astype(compute_dtype) if hasattr(x, "astype") and x.dtype == jnp.float32 else x,
        variables,
    )
