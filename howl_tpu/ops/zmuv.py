"""Zero-mean unit-variance normalization, fit once over the train set.

(ref: howl/data/transform/operator.py:119-146 — scalar running mean/mean2
buffers persisted to ``zmuv.pt.bin``; here state is a plain dict serialized in
the workspace checkpoint.)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class ZmuvTransform:
    """Accumulates global scalar mean/variance, then normalizes."""

    def __init__(self, mean: float = 0.0, mean2: float = 0.0, total: float = 0.0):
        self.mean = float(mean)
        self.mean2 = float(mean2)
        self.total = float(total)

    def update(self, data, mask=None):
        data = np.asarray(data, dtype=np.float64)
        if mask is not None:
            data = data * np.asarray(mask)
            size = float(np.sum(mask))
        else:
            size = float(data.size)
        self.mean = (data.sum() + self.mean * self.total) / (self.total + size)
        self.mean2 = ((data**2).sum() + self.mean2 * self.total) / (self.total + size)
        self.total += size

    def initialize(self, iterable):
        for ex in iterable:
            self.update(ex)

    @property
    def std(self) -> float:
        return float(np.sqrt(max(self.mean2 - self.mean**2, 1e-12)))

    def __call__(self, x):
        return (x - jnp.float32(self.mean)) / jnp.float32(self.std)

    def state_dict(self) -> dict:
        return {"mean": self.mean, "mean2": self.mean2, "total": self.total}

    @classmethod
    def from_state_dict(cls, state: dict) -> "ZmuvTransform":
        return cls(state["mean"], state["mean2"], state["total"])


def fit_zmuv(audio_batches, frontend_cfg, max_batches: int = None) -> ZmuvTransform:
    """Fit a ZmuvTransform over the log-mel features of host audio batches.

    The single home for the fit procedure (ref pretrain_gsc.py:97-106) —
    train.py, pretrain_gsc, and the sharded seed sweep all sample their own
    batches but must accumulate statistics identically.
    """
    import jax

    from howl_tpu.ops.frontend import log_mel_spectrogram

    zmuv = ZmuvTransform()
    feat_fn = jax.jit(lambda a: log_mel_spectrogram(a, frontend_cfg, stacked=True))
    for idx, audio in enumerate(audio_batches):
        if max_batches is not None and idx >= max_batches:
            break
        zmuv.update(np.asarray(feat_fn(audio)))
    return zmuv
