"""Model registry + streaming protocol.

Capability parity with the reference's RegisteredModel (ref: howl/model/base.py:11-37)
expressed functionally for JAX:

  * models are flax modules; parameters/batch-stats live in a variables pytree;
  * ``is_sequential`` marks models emitting per-frame logits (CTC objective);
  * recurrent models expose ``initial_state(batch_size)`` and accept/return the
    carried streaming state explicitly (the reference mutates
    ``model.streaming_state``; explicit carry is what `lax.scan` needs).

Canonical model input: features shaped (B, C=3, F, T) exactly as produced by
the frontend (log-mels, deltas, accels). Models slice the channels they use and
transpose to TPU-friendly NHWC internally.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclass
class ModelSpec:
    """Registry entry: constructor + behavioral flags."""

    name: str
    factory: Callable[..., nn.Module]
    is_sequential: bool = False  # emits (T, B, L) per-frame logits
    is_recurrent: bool = False  # carries streaming state
    uses_deltas: bool = False  # consumes delta/accel channels (only LAS does)
    supports_trunk: bool = False  # fully-convolutional trunk + mean head (fused clip scoring)
    defaults: Dict[str, Any] = field(default_factory=dict)


MODEL_REGISTRY: Dict[str, ModelSpec] = {}


def register_model(
    name: str,
    is_sequential: bool = False,
    is_recurrent: bool = False,
    uses_deltas: bool = False,
    supports_trunk: bool = False,
    **defaults,
):
    def wrap(cls):
        MODEL_REGISTRY[name] = ModelSpec(
            name, cls, is_sequential, is_recurrent, uses_deltas, supports_trunk, defaults
        )
        cls.registered_name = name
        return cls

    return wrap


def create_model(name: str, num_labels: int, **kwargs) -> nn.Module:
    try:
        spec = MODEL_REGISTRY[name]
    except KeyError as e:
        raise ValueError(f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}") from e
    merged = {**spec.defaults, **kwargs}
    return spec.factory(num_labels=num_labels, **merged)


def model_spec(name: str) -> ModelSpec:
    return MODEL_REGISTRY[name]


class HowlModel(nn.Module):
    """Shared helpers for howl_tpu models."""

    def compute_length(self, length):
        """Frames of model output per frames of feature input (identity unless
        the model downsamples time; ref base.py:28)."""
        return length

    @staticmethod
    def _mels_only_nhwc(x: jnp.ndarray) -> jnp.ndarray:
        """(B, C, F, T) -> (B, T, F, 1): log-mel channel in NHWC, time as H."""
        return x[:, 0].swapaxes(-1, -2)[..., None]

    @staticmethod
    def _all_channels_nhwc(x: jnp.ndarray) -> jnp.ndarray:
        """(B, C, F, T) -> (B, T, F, C)."""
        return jnp.transpose(x, (0, 3, 2, 1))


class ConvertedStaticModel(nn.Module):
    """Turns a static window classifier into a per-frame sequential model by an
    internal sliding window over the time axis (ref: howl/model/base.py:40-62).

    All windows fold into the batch axis and the inner classifier runs once —
    one fused program instead of the reference's per-window Python sweep. At
    train time this computes BatchNorm statistics over every window jointly
    (the reference normalizes each window position separately); running-stat
    inference is identical.
    """

    inner: nn.Module
    frame_window_size: int = 40
    frame_stride_size: int = 10

    def compute_length(self, length):
        """Output count for ``length`` input frames: every complete stride-
        aligned window, (length - W)//S + 1 — consistent with __call__. (The
        reference emits 1 + (T-W)//S outputs but its FIRST window is the clip
        tail x[..., W:] while compute_length says (T-W)//S — an upstream
        inconsistency we replace with standard full-coverage windows,
        ref base.py:47-62.)"""
        if length is None:
            return None
        return jnp.maximum(1, (length - self.frame_window_size) // self.frame_stride_size + 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths=None, train: bool = False):
        # x: (B, C, F, T)
        total = x.shape[-1]
        if total < self.frame_window_size:
            # fancy indexing would clamp out-of-range frame indices and
            # silently duplicate the last frame
            raise ValueError(
                f"input has {total} frames but the converted model's window is "
                f"{self.frame_window_size}; pad clips to at least one window"
            )
        num_windows = (total - self.frame_window_size) // self.frame_stride_size + 1
        starts = np.arange(num_windows) * self.frame_stride_size
        idx = starts[:, None] + np.arange(self.frame_window_size)[None, :]  # (nw, W)
        windows = x[..., idx]  # (B, C, F, nw, W)
        b = windows.shape[0]
        # fold the window axis into the batch so the inner classifier runs
        # ONCE over all windows (one fused program, full MXU batch) instead of
        # a Python-unrolled per-window sweep
        flat = jnp.moveaxis(windows, 3, 1).reshape(b * num_windows, *x.shape[1:-1], self.frame_window_size)
        logits = self.inner(flat, lengths=None, train=train)  # (B*nw, L)
        return logits.reshape(b, num_windows, -1).swapaxes(0, 1)  # (nw, B, L)
