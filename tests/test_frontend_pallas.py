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


@pytest.mark.parametrize("samples,cells", [(64000, 3), (150000, 6)])
def test_pallas_multicell_frame_grid_lookahead(samples, cells, rng):
    """The narrow-tail lookahead block map ``(i+1)*fb_block//tail_rows``
    (frontend_pallas.py) is only exercised for grid index i >= 1 when
    t_pad > FRAME_BLOCK. Clips <= 16,000 samples (81 frames -> one cell)
    never cover it in CI; an off-by-one-block error there corrupts frames
    near EVERY 128-frame boundary. 64,000 samples -> 321 frames -> 3 cells;
    150,000 -> 751 frames -> 6 cells. The 3-pass hi/lo default must track
    the oracle at ~1e-4 — block-boundary corruption is orders louder."""
    from howl_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram
    from howl_tpu.ops.frontend_pallas import FRAME_BLOCK, log_mel_spectrogram_pallas

    cfg = FrontendConfig(n_mels=40)
    n_frames = samples // cfg.hop_length + 1
    assert -(-n_frames // FRAME_BLOCK) == cells  # the grid we claim to test
    audio = (rng.standard_normal((1, samples)) * 0.1).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(audio, cfg))
    out = np.asarray(log_mel_spectrogram_pallas(audio, cfg, interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-4)


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


@pytest.mark.slow
def test_pallas_extreme_overlap_falls_back(rng):
    """ceil(n_fft/hop) > FRAME_BLOCK routes to the jnp chain (guard path)."""
    from howl_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram
    from howl_tpu.ops.frontend_pallas import log_mel_spectrogram_pallas

    cfg = FrontendConfig(n_mels=40, n_fft=512, hop_length=2)  # n_sub = 256
    audio = (rng.standard_normal((1, 2000)) * 0.1).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(audio, cfg))
    out = np.asarray(log_mel_spectrogram_pallas(audio, cfg, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_prepad_bf16_cast_commutes_with_padding(rng):
    """The 1/2-pass modes cast audio to bf16 BEFORE the reflect/zero pad
    (halving the pad copy and kernel input DMA, frontend_pallas.py). Padding
    only duplicates or zeroes values, so cast-then-pad must equal
    pad-then-cast BIT-exactly — this pins the commutation the optimization
    rests on, independent of the kernel."""
    import jax.numpy as jnp
    import numpy as np

    audio = (rng.standard_normal((3, 5000)) * 0.1).astype(np.float32)
    for pad_args in ((((0, 0), (256, 256)), "reflect"), (((0, 0), (0, 777)), "constant")):
        widths, mode = pad_args
        a = jnp.pad(jnp.asarray(audio).astype(jnp.bfloat16), widths, mode=mode)
        b = jnp.pad(jnp.asarray(audio), widths, mode=mode).astype(jnp.bfloat16)
        assert a.dtype == b.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(a, dtype=np.float32), np.asarray(b, dtype=np.float32)
        )


def test_prepad_cast_modes_match_f32_hview_grade(rng):
    """1/2-pass kernels (bf16 hview) track the oracle at the same tolerance
    the pre-round-4 f32-hview implementation was gated on — the pre-pad cast
    changed WHERE the quantization happens, not its grade."""
    import numpy as np

    from howl_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram
    from howl_tpu.ops.frontend_pallas import log_mel_spectrogram_pallas

    cfg = FrontendConfig(n_mels=40)
    audio = (rng.standard_normal((2, 12000)) * 0.1).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(audio, cfg))
    for prec in ("bf16", "bf16x2"):
        out = np.asarray(log_mel_spectrogram_pallas(audio, cfg, 0.0, 1.0, interpret=True, precision=prec))
        np.testing.assert_allclose(out, ref, atol=0.5)
