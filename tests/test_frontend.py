"""Frontend correctness: GEMM-DFT vs FFT oracle, mel filterbank, deltas, VTLP."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def config():
    from howl_tpu.ops.frontend import FrontendConfig

    return FrontendConfig(sample_rate=16000, n_fft=512, hop_length=200, n_mels=40)


def _fft_oracle(audio, config):
    """Independent numpy implementation: reflect pad -> hann -> rfft -> power -> mel -> log."""
    from howl_tpu.ops.frontend import mel_filterbank

    pad = config.n_fft // 2
    audio = np.pad(audio, [(0, 0), (pad, pad)], mode="reflect")
    n_frames = (audio.shape[-1] - config.n_fft) // config.hop_length + 1
    window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(config.n_fft) / config.n_fft)
    frames = np.stack(
        [audio[:, i * config.hop_length : i * config.hop_length + config.n_fft] for i in range(n_frames)], 1
    )
    spec = np.abs(np.fft.rfft(frames * window, axis=-1)) ** 2
    fb = mel_filterbank(config.n_freqs, config.n_mels, config.sample_rate)
    return np.log(spec @ fb + config.log_offset).swapaxes(-1, -2)


def test_log_mel_matches_fft_oracle(config, rng):
    from howl_tpu.ops.frontend import log_mel_spectrogram

    audio = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    ours = np.asarray(log_mel_spectrogram(audio, config))
    oracle = _fft_oracle(audio, config)
    assert ours.shape == (2, 40, 81)
    np.testing.assert_allclose(ours, oracle, atol=2e-3)


def test_frame_count_parity(config):
    from howl_tpu.ops.frontend import log_mel_spectrogram

    # 0.5 s window at 16 kHz -> 41 frames (matches reference center=True framing)
    audio = np.zeros((1, 8000), np.float32)
    assert log_mel_spectrogram(audio, config).shape == (1, 40, 41)


def test_mel_filterbank_properties(config):
    from howl_tpu.ops.frontend import mel_filterbank

    fb = mel_filterbank(257, 40, 16000)
    assert fb.shape == (257, 40)
    assert fb.min() >= 0
    # triangles: each filter has a single peak and unit-free energy > 0
    assert np.all(fb.sum(axis=0) > 0)
    # low filters are narrower than high filters (mel warping)
    low_width = np.count_nonzero(fb[:, 1])
    high_width = np.count_nonzero(fb[:, -2])
    assert low_width < high_width


def test_vtlp_alpha_one_is_identity(config):
    from howl_tpu.ops.frontend import mel_filterbank, vtlp_filterbank

    base = mel_filterbank(257, 40, 16000)
    warped = np.asarray(vtlp_filterbank(257, 40, 16000, 1.0))
    np.testing.assert_allclose(base, warped, atol=1e-4)


def test_vtlp_warp_changes_filters_traceably(config):
    import jax

    from howl_tpu.ops.frontend import vtlp_filterbank

    f = jax.jit(lambda a: vtlp_filterbank(257, 40, 16000, a))
    fb_low = np.asarray(f(0.9))
    fb_high = np.asarray(f(1.1))
    assert not np.allclose(fb_low, fb_high)
    assert np.isfinite(fb_low).all() and np.isfinite(fb_high).all()


def test_compute_deltas_constant_zero():
    from howl_tpu.ops.frontend import compute_deltas

    x = np.ones((1, 4, 10), np.float32) * 3.0
    d = np.asarray(compute_deltas(x))
    np.testing.assert_allclose(d, 0.0, atol=1e-6)


def test_compute_deltas_linear_ramp():
    from howl_tpu.ops.frontend import compute_deltas

    # linear ramp: interior deltas equal the slope
    t = np.arange(20, dtype=np.float32)
    x = np.broadcast_to(t, (1, 3, 20)).copy()
    d = np.asarray(compute_deltas(x))
    np.testing.assert_allclose(d[..., 4:-4], 1.0, atol=1e-5)


def test_stacked_features_shape(config, rng):
    from howl_tpu.ops.frontend import log_mel_spectrogram

    audio = rng.standard_normal((3, 8000)).astype(np.float32)
    feats = np.asarray(log_mel_spectrogram(audio, config, stacked=True))
    assert feats.shape == (3, 3, 40, 41)
    # channel 0 is the raw log-mels
    plain = np.asarray(log_mel_spectrogram(audio, config))
    np.testing.assert_allclose(feats[:, 0], plain, atol=1e-6)


def test_zmuv():
    from howl_tpu.ops.zmuv import ZmuvTransform

    rng = np.random.default_rng(1)
    zmuv = ZmuvTransform()
    chunks = [rng.normal(5.0, 2.0, (100,)).astype(np.float32) for _ in range(20)]
    zmuv.initialize(chunks)
    allv = np.concatenate(chunks)
    assert abs(zmuv.mean - allv.mean()) < 1e-4
    assert abs(zmuv.std - allv.std()) < 1e-3
    out = np.asarray(zmuv(allv))
    assert abs(out.mean()) < 1e-4
    assert abs(out.std() - 1.0) < 1e-3
    # round-trip
    from howl_tpu.ops.zmuv import ZmuvTransform as Z

    z2 = Z.from_state_dict(zmuv.state_dict())
    assert z2.std == zmuv.std


def test_compute_lengths_parity(config):
    # reference formula: (len - win)//hop + 1 (transform.py:291)
    lengths = np.array([8000, 16000])
    out = np.asarray(config.compute_lengths(lengths))
    np.testing.assert_array_equal(out, [(8000 - 512) // 200 + 1, (16000 - 512) // 200 + 1])


def test_nyquist_bin_mel_weight_is_zero(config):
    """The crop in nyquist_crop_bins is exact: for even n_fft the Nyquist
    bin's filterbank weight is identically zero (the top triangle's up-slope
    ends at sr/2), for the default and an 80-mel / restricted-f_max config."""
    from howl_tpu.ops.frontend import mel_filterbank

    for n_mels, f_max in ((40, None), (80, None), (40, 6000.0)):
        fb = mel_filterbank(config.n_freqs, n_mels, config.sample_rate, 0.0, f_max)
        assert np.abs(fb[config.n_fft // 2]).max() < 1e-6


def test_nyquist_crop_matches_full_width(config, rng):
    """Cropped combined-matrix chain == uncropped two-matrix chain, plain and
    VTLP-warped (the warp pins its upper breakpoint at Nyquist, so the crop
    stays exact for every alpha)."""
    import jax.numpy as jnp

    from howl_tpu.ops.frontend import (
        _hann_window,
        dft_matrices,
        frame_signal,
        log_mel_spectrogram,
        log_mel_spectrogram_vtlp,
        mel_filterbank,
        vtlp_filterbank,
    )

    audio = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1

    def full_width(fb):
        frames = frame_signal(jnp.asarray(audio), config) * jnp.asarray(_hann_window(config.n_fft))
        cos_m, sin_m = dft_matrices(config.n_fft)
        re = frames @ jnp.asarray(cos_m)
        im = frames @ jnp.asarray(sin_m)
        mel = (re * re + im * im) @ fb
        return np.asarray(jnp.log(mel + config.log_offset).swapaxes(-1, -2))

    fb = jnp.asarray(mel_filterbank(config.n_freqs, config.n_mels, config.sample_rate))
    np.testing.assert_allclose(np.asarray(log_mel_spectrogram(audio, config)), full_width(fb), atol=1e-4)
    for alpha in (0.9, 1.0, 1.1):
        fb_w = vtlp_filterbank(config.n_freqs, config.n_mels, config.sample_rate, alpha)
        np.testing.assert_allclose(
            np.asarray(log_mel_spectrogram_vtlp(audio, alpha, config)), full_width(fb_w), atol=1e-4
        )


def test_log_mel_bf16_one_pass_mode(config, rng):
    """The jnp "bf16" 1-pass mode (twin of the Pallas serving default) stays
    within the engines' bf16 feature-cast grade, and matches the Pallas
    1-pass kernel's numerics class: explicit bf16 operand casts so this holds
    on CPU too (decision equivalence is validated separately on hardware,
    tools/validate_tpu_decisions.py)."""
    from howl_tpu.ops.frontend import log_mel_spectrogram

    audio = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    exact = np.asarray(log_mel_spectrogram(audio, config))
    fast = np.asarray(log_mel_spectrogram(audio, config, precision="bf16"))
    assert fast.shape == exact.shape
    # same tolerance grade the Pallas bf16 modes are gated on (0.5 log-mel
    # units at unit ZMUV std; typical max ~7.5e-2)
    np.testing.assert_allclose(fast, exact, atol=0.5)
    # it must actually quantize (distinguishes from silently running exact)
    assert float(np.abs(fast - exact).max()) > 1e-4


def test_engines_accept_dft_precision_override():
    """Every serving engine exposes dft_precision and resolves "auto" to the
    documented default (HIGHEST for f32 serving, the hardware-validated
    1-pass "bf16" mode for bf16 serving)."""
    import jax
    import jax.numpy as jnp

    from howl_tpu.inference.config import serving_dft_precision

    assert serving_dft_precision(None) is None
    assert serving_dft_precision(jnp.bfloat16) == "bf16"
    assert serving_dft_precision(jnp.bfloat16, jax.lax.Precision.HIGH) == jax.lax.Precision.HIGH
    assert serving_dft_precision(None, jax.lax.Precision.HIGH) == jax.lax.Precision.HIGH
