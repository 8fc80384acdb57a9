"""Timestretch semantics (ref howl/data/transform/transform.py:146-166)."""

import numpy as np

from howl_tpu.data.common.label import FrameLabelData
from howl_tpu.data.common.metadata import AudioClipMetadata
from howl_tpu.data.common.sample import Sample
from howl_tpu.ops.timestretch import TimestretchSampleAugment, time_stretch

SR = 16000


def _tone(freq, n, sr=SR):
    return (0.5 * np.sin(2 * np.pi * freq * np.arange(n) / sr)).astype(np.float32)


def _peak_freq(audio, sr=SR):
    spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
    return np.argmax(spec) * sr / len(audio)


def test_output_length_is_len_over_rate():
    audio = _tone(440, 16000)
    for rate in (0.5, 0.8, 1.0, 1.3, 1.7):
        out = time_stretch(audio, rate)
        assert out.shape == (int(round(16000 / rate)),), rate


def test_pitch_preserved_duration_changed():
    """A phase vocoder changes duration without shifting pitch (unlike resampling)."""
    audio = _tone(440, 16000)
    for rate in (0.75, 1.4):
        out = time_stretch(audio, rate)
        # measure on the interior (istft edges are window-attenuated)
        interior = out[2048:-2048]
        assert abs(_peak_freq(interior) - 440.0) < 15.0, rate


def test_rate_one_is_near_identity():
    audio = _tone(330, 12000) + 0.1 * _tone(990, 12000)
    out = time_stretch(audio, 1.0)
    assert out.shape == audio.shape
    # interior reconstruction error small relative to signal power
    a, b = audio[2048:-2048], out[2048:-2048]
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 0.05, rel


def test_short_clip_fallback():
    audio = _tone(440, 300)  # shorter than n_fft//2+1
    out = time_stretch(audio, 2.0)
    assert out.shape == (150,)
    assert np.isfinite(out).all()


def _sample(n=16000):
    labels = FrameLabelData({500.0: 0, 800.0: 1}, [(0, 400.0)], [(0, [0, 1, 2])])
    meta = AudioClipMetadata(path="/tmp/x.wav", transcription="hey fire", end_timestamps=[])
    return Sample(meta, _tone(440, n), SR, label_data=labels)


def test_augment_rescales_timestamps():
    aug = TimestretchSampleAugment(magnitude=0.2, prob=1.0, seed=3)
    sample = _sample()
    (out,) = aug([sample])
    rate = 16000 / out.audio_data.shape[-1]
    assert abs(rate - 1.0) > 1e-3  # the draw actually stretched
    for (orig_ts, lab), (new_ts, new_lab) in zip(
        sorted(sample.label_data.timestamp_label_map.items()),
        sorted(out.label_data.timestamp_label_map.items()),
    ):
        assert new_lab == lab
        # timestamps scale by 1/rate (rate>1 speeds up -> timestamps shrink)
        assert abs(new_ts - orig_ts * (16000 / rate) / 16000) < orig_ts * 0.02 + 1e-6


def test_augment_prob_gate_passthrough():
    aug = TimestretchSampleAugment(prob=0.0, seed=0)
    sample = _sample()
    (out,) = aug([sample])
    assert out is sample


def test_rate_clipping_bounds():
    # huge magnitude: every draw must clip into [0.3, 1.7]
    aug = TimestretchSampleAugment(magnitude=50.0, prob=1.0, seed=1)
    for _ in range(5):
        (out,) = aug([_sample(8000)])
        rate = 8000 / out.audio_data.shape[-1]
        assert 0.295 <= rate <= 1.705, rate
