"""Validate Pallas frontend matmul-precision options on the REAL TPU.

Interpret mode (CPU) computes in exact f32, so the precision knob of
howl_tpu/ops/frontend_pallas.py can only be judged on hardware: this compares
the 6-pass f32 mode, the 3-pass hi/lo bf16 mode, the 2-pass bf16-frames mode,
and the 1-pass all-bf16 serving default against the committed torchaudio-exact
goldens and prints the same error statistics the golden tests gate on
(above-floor max error, global max).

Run (on the axon TPU): python tools/validate_pallas_precision.py
"""

from __future__ import annotations

import _path  # noqa: F401 — repo root on sys.path for howl_tpu

import sys
from pathlib import Path

import jax
import numpy as np

REPO = Path(__file__).resolve().parent.parent
FLOOR = -10.0

def main():
    from howl_tpu.ops.frontend import FrontendConfig
    from howl_tpu.ops.frontend_pallas import log_mel_spectrogram_pallas

    audio = np.load(REPO / "tests/golden/frontend_input.npy")
    for n_mels in (40, 80):
        gold = np.load(REPO / f"tests/golden/frontend_logmel_{n_mels}.npy")
        cfg = FrontendConfig(n_mels=n_mels)
        for prec, name in (
            (jax.lax.Precision.HIGHEST, "f32x6"),
            (None, "bf16x3"),
            ("bf16x2", "bf16x2"),
            ("bf16", "bf16x1"),
        ):
            out = np.asarray(log_mel_spectrogram_pallas(audio, cfg, 0.0, 1.0, precision=prec))
            err = np.abs(out - gold)
            loud = gold > FLOOR
            print(
                f"n_mels={n_mels} precision={name:8s} "
                f"above_floor_max={err[loud].max():.5f} global_max={err.max():.5f} mean={err.mean():.6f}"
            )

if __name__ == "__main__":
    main()
