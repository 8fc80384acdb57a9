"""Pallas fused frontend vs the jnp oracle (interpret mode on CPU)."""

import numpy as np
import pytest


@pytest.mark.parametrize("n_mels,samples", [(40, 16000), (80, 8000), (40, 12345)])
def test_pallas_matches_jnp_oracle(n_mels, samples, rng):
    from howl_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram
    from howl_tpu.ops.frontend_pallas import log_mel_spectrogram_pallas

    cfg = FrontendConfig(n_mels=n_mels)
    audio = (rng.standard_normal((2, samples)) * 0.1).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(audio, cfg))
    mean, std = float(ref.mean()), float(ref.std())
    # the default (HIGHEST) tracks the f32 oracle tightly...
    out = np.asarray(log_mel_spectrogram_pallas(audio, cfg, mean, std, interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, (ref - mean) / std, atol=1e-4)
    # ...and the optional bf16x3 path stays within the bf16-cast noise floor
    fast = np.asarray(log_mel_spectrogram_pallas(audio, cfg, mean, std, interpret=True, precision=None))
    np.testing.assert_allclose(fast, (ref - mean) / std, atol=0.15 / max(std, 1e-6))


def test_pallas_single_clip(rng):
    from howl_tpu.ops.frontend import FrontendConfig
    from howl_tpu.ops.frontend_pallas import log_mel_spectrogram_pallas

    cfg = FrontendConfig(n_mels=40)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)  # 1-D input
    out = np.asarray(log_mel_spectrogram_pallas(audio, cfg, interpret=True))
    assert out.shape == (1, 40, 81)
    assert np.isfinite(out).all()
