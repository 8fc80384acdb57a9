"""Unit tests: settings env overrides, hashing, registry, audio I/O, striding."""


import numpy as np
import pytest


def test_settings_defaults():
    from howl_tpu.settings import SETTINGS

    assert SETTINGS.audio.sample_rate == 16000
    assert SETTINGS.audio_transform.num_fft == 512
    assert SETTINGS.audio_transform.hop_length == 200
    assert SETTINGS.inference_engine.inference_sequence == [0]
    assert SETTINGS.training.objective == "frame"


def test_settings_env_override(monkeypatch):
    from howl_tpu.settings import SETTINGS

    monkeypatch.setenv("NUM_MELS", "40")
    monkeypatch.setenv("VOCAB", '["hey","fire","fox"]')
    monkeypatch.setenv("INFERENCE_SEQUENCE", "[0,1,2]")
    monkeypatch.setenv("LEARNING_RATE", "0.01")
    monkeypatch.setenv("USE_NOISE_DATASET", "True")
    SETTINGS.reset()
    assert SETTINGS.audio_transform.num_mels == 40
    assert SETTINGS.training.vocab == ["hey", "fire", "fox"]
    assert SETTINGS.inference_engine.inference_sequence == [0, 1, 2]
    assert SETTINGS.training.learning_rate == 0.01
    assert SETTINGS.training.use_noise_dataset is True


def test_settings_roundtrip():
    from howl_tpu.settings import SETTINGS

    snapshot = SETTINGS.to_dict()
    assert snapshot["audio"]["sample_rate"] == 16000
    SETTINGS.load_dict(snapshot)
    assert SETTINGS.audio.sample_rate == 16000


def test_sha256_splitter_stable():
    from howl_tpu.utils.hash_utils import Sha256Splitter, sha256_int

    assert sha256_int("abc") == sha256_int("abc")
    assert sha256_int("abc") != sha256_int("abd")
    split = Sha256Splitter(80)
    picks = [split(f"clip{i}.wav") for i in range(1000)]
    frac = sum(picks) / len(picks)
    assert 0.7 < frac < 0.9  # ~80%
    assert picks == [Sha256Splitter(80)(f"clip{i}.wav") for i in range(1000)]


def test_class_registry():
    from howl_tpu.utils.class_registry import ClassRegistry

    class Base(ClassRegistry):
        registered_map = {}

    class A(Base, name="a"):
        pass

    class B(Base, name="b"):
        pass

    assert Base.find_registered_class("a") is A
    assert Base.find_registered_class("b") is B
    assert Base.registered_names() == ["a", "b"]
    with pytest.raises(ValueError):
        Base.find_registered_class("nope")


def test_wav_roundtrip(tmp_path):
    from howl_tpu.utils import audio_utils

    sr = 16000
    t = np.arange(sr) / sr
    audio = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = tmp_path / "tone.wav"
    audio_utils.write_wav(path, audio, sr)
    loaded = audio_utils.silent_load(path, sr)
    assert loaded.shape == audio.shape
    np.testing.assert_allclose(loaded, audio, atol=1e-3)


def test_silent_load_bad_file(tmp_path):
    from howl_tpu.utils import audio_utils

    path = tmp_path / "junk.wav"
    path.write_bytes(b"not a wav at all")
    out = audio_utils.silent_load(path)
    assert out.shape == (0,)


def test_resample():
    from howl_tpu.utils.audio_utils import resample

    sr = 48000
    t = np.arange(sr) / sr
    audio = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = resample(audio, 48000, 16000)
    assert abs(out.shape[-1] - 16000) <= 1


def test_stride_windows():
    from howl_tpu.utils.audio_utils import stride

    audio = np.arange(16000, dtype=np.float32)  # 1 s at 16 kHz
    windows = list(stride(audio, 500, 250, 16000))
    # reference default drops incomplete tails: full windows only
    assert len(windows) == 3 and all(w.shape[-1] == 8000 for w in windows)
    assert np.all(windows[1][:10] == np.arange(4000, 4010))
    tail = list(stride(audio, 500, 250, 16000, drop_incomplete=False))
    assert len(tail) > 3 and tail[-1].shape[-1] < 8000
    assert list(stride(np.zeros(0, np.float32), 500, 250, 16000)) == []


def test_frame_count():
    from howl_tpu.utils.audio_utils import frame_count

    # 16000 samples, hop 200, center=True -> 81 frames (matches reference frontend)
    assert frame_count(16000) == 81
    assert frame_count(8000) == 41


def test_strtobool_reference_semantics():
    """ref howl/utils/str_utils.py:4 truth-value table, distutils-free."""
    import pytest

    from howl_tpu.utils.args_utils import strtobool

    for v in ("y", "YES", "t", "True", "on", "1"):
        assert strtobool(v) is True
    for v in ("n", "NO", "f", "False", "off", "0"):
        assert strtobool(v) is False
    with pytest.raises(ValueError):
        strtobool("maybe")
