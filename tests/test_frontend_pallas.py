"""Pallas fused frontend vs the jnp oracle (interpret mode on CPU)."""

import numpy as np
import pytest


@pytest.mark.parametrize("n_mels,samples", [(40, 16000), (80, 8000), (40, 12345)])
def test_pallas_matches_jnp_oracle(n_mels, samples, rng):
    import jax

    from howl_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram
    from howl_tpu.ops.frontend_pallas import log_mel_spectrogram_pallas

    cfg = FrontendConfig(n_mels=n_mels)
    audio = (rng.standard_normal((2, samples)) * 0.1).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(audio, cfg))
    mean, std = float(ref.mean()), float(ref.std())
    norm = (ref - mean) / std
    # the 6-pass f32 mode tracks the oracle at f32 grade...
    out = np.asarray(
        log_mel_spectrogram_pallas(
            audio, cfg, mean, std, interpret=True, precision=jax.lax.Precision.HIGHEST
        )
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, norm, atol=1e-3 / max(std, 1e-6))
    # ...the default 3-pass hi/lo bf16 mode is the same grade (only the lo*lo
    # cross term is dropped, ~2^-17 relative)...
    fast = np.asarray(log_mel_spectrogram_pallas(audio, cfg, mean, std, interpret=True))
    np.testing.assert_allclose(fast, norm, atol=2e-3 / max(std, 1e-6))
    # ...and the 2-pass mode stays within the serving engines' bf16
    # feature-cast noise (decision equivalence validated separately on TPU)
    x2 = np.asarray(log_mel_spectrogram_pallas(audio, cfg, mean, std, interpret=True, precision="bf16x2"))
    np.testing.assert_allclose(x2, norm, atol=0.5 / max(std, 1e-6))
    # ...and the 1-pass mode (W quantized to bf16 too — half the MXU passes)
    # holds the same error grade: the dropped x_hi@W_lo term is ~2^-9
    # relative, the scale bf16x2 already accepts from the audio lo term
    x1 = np.asarray(log_mel_spectrogram_pallas(audio, cfg, mean, std, interpret=True, precision="bf16"))
    np.testing.assert_allclose(x1, norm, atol=0.5 / max(std, 1e-6))
    assert float(np.abs(x1 - x2).max()) < 0.25 / max(std, 1e-6)


def test_pallas_single_clip(rng):
    from howl_tpu.ops.frontend import FrontendConfig
    from howl_tpu.ops.frontend_pallas import log_mel_spectrogram_pallas

    cfg = FrontendConfig(n_mels=40)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)  # 1-D input
    out = np.asarray(log_mel_spectrogram_pallas(audio, cfg, interpret=True))
    assert out.shape == (1, 40, 81)
    assert np.isfinite(out).all()


def test_pallas_block_multiple_no_audio_pad(rng):
    """A clip whose frame count already lands on a FRAME_BLOCK multiple takes
    the no-pad path (t_pad == n_frames)."""
    import howl_tpu.ops.frontend_pallas as fp
    from howl_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram

    cfg = FrontendConfig(n_mels=40)
    # B*T = 2*128 = 256 = FRAME_BLOCK -> no padding branch
    samples = (128 - 1) * cfg.hop_length  # T = S//hop + 1 = 128
    audio = (rng.standard_normal((2, samples)) * 0.1).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(audio, cfg))
    out = np.asarray(fp.log_mel_spectrogram_pallas(audio, cfg, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_pallas_extreme_overlap_falls_back(rng):
    """ceil(n_fft/hop) > FRAME_BLOCK routes to the jnp chain (guard path)."""
    from howl_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram
    from howl_tpu.ops.frontend_pallas import log_mel_spectrogram_pallas

    cfg = FrontendConfig(n_mels=40, n_fft=512, hop_length=2)  # n_sub = 256
    audio = (rng.standard_normal((1, 2000)) * 0.1).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(audio, cfg))
    out = np.asarray(log_mel_spectrogram_pallas(audio, cfg, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)
