"""Native C++ runtime: ring buffer, PCM conversion, VAD, WAV decode — and
equivalence of the native and fallback paths."""

import numpy as np
import pytest


def test_native_builds_and_loads():
    from howl_tpu import native

    # this environment ships g++, so the native path must actually build
    assert native.available(), "native library failed to build/load"


def test_ring_buffer_window_semantics():
    from howl_tpu.native import NativeRingBuffer

    rb = NativeRingBuffer(capacity=32)
    rb.push_float(np.arange(8, dtype=np.float32))
    # partial fill: left-padded with zeros
    out = rb.latest(16)
    np.testing.assert_array_equal(out[:8], 0.0)
    np.testing.assert_array_equal(out[8:], np.arange(8))
    # wraparound: push 40 more samples (total 48 > capacity 32)
    rb.push_float(np.arange(8, 48, dtype=np.float32))
    out = rb.latest(16)
    np.testing.assert_array_equal(out, np.arange(32, 48))
    assert rb.total_written == 48


def test_ring_buffer_int16_push():
    from howl_tpu.native import NativeRingBuffer

    rb = NativeRingBuffer(capacity=64)
    pcm = np.array([0, 16384, -16384, 32767], dtype="<i2")
    rb.push_int16(pcm.tobytes())
    out = rb.latest(4)
    np.testing.assert_allclose(out, pcm.astype(np.float32) / 32768.0, atol=1e-6)


def test_pcm_conversion_matches_numpy():
    from howl_tpu.native import pcm_int16_to_float

    rng = np.random.default_rng(0)
    pcm = rng.integers(-32768, 32767, 1000, dtype=np.int16)
    out = pcm_int16_to_float(pcm.astype("<i2").tobytes())
    np.testing.assert_allclose(out, pcm.astype(np.float32) / 32768.0, atol=1e-6)


def test_native_vad_matches_python():
    from howl_tpu.native import leading_silence_ms

    audio = np.concatenate(
        [np.zeros(8000, np.float32), 0.3 * np.sin(2 * np.pi * 440 * np.arange(8000) / 16000).astype(np.float32)]
    )
    ms = leading_silence_ms(audio, 16000)
    assert 400 <= ms <= 510  # ~500 ms of silence


def test_native_wav_decode_matches_python(tmp_path):
    from howl_tpu import native
    from howl_tpu.utils.audio_utils import read_wav, write_wav

    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(5000) * 0.1).astype(np.float32)
    path = tmp_path / "t.wav"
    write_wav(path, audio, 16000)
    decoded = native.wav_decode(path.read_bytes())
    assert decoded is not None
    native_audio, sr, ch = decoded
    assert (sr, ch) == (16000, 1)
    py_audio, py_sr = read_wav(path)
    np.testing.assert_allclose(native_audio, py_audio[0], atol=1e-6)


def test_native_wav_decode_rejects_garbage():
    from howl_tpu import native

    assert native.wav_decode(b"definitely not a wav file....") is None


def test_client_ring_cadence():
    """The ring-buffered client scores first at chunk 16, then every 2 chunks."""
    from howl_tpu.client.howl_client import HowlClient

    class CountingEngine:
        cfg = type("C", (), {"inference_sequence": (0,)})()

        def __init__(self):
            self.calls = 0
            self.windows = []

        def ingest(self, window):
            self.calls += 1
            self.windows.append(np.asarray(window))
            return False

    engine = CountingEngine()
    client = HowlClient(engine=engine, context=None)
    chunk = (np.ones(500, dtype="<i2") * 1000).tobytes()
    for i in range(24):
        client.ingest_chunk(chunk)
    # first inference at chunk 16, then chunks 18, 20, 22, 24 -> 5 calls
    assert engine.calls == 5
    assert engine.windows[0].shape == (8000,)


def test_client_soak_long_session():
    """60 s of continuous audio through the client: state stays bounded, the
    cadence holds, nothing drifts or leaks."""
    import jax

    from howl_tpu.client.howl_client import HowlClient
    from howl_tpu.inference import EngineConfig
    from howl_tpu.inference.online import OnlineEngine
    from howl_tpu.models import create_model
    from howl_tpu.models.base import model_spec
    from howl_tpu.ops.frontend import FrontendConfig

    cfg = EngineConfig(
        inference_sequence=(0,), max_window_size_ms=500.0, eval_stride_size_ms=62.5,
        negative_label=1, num_labels=2, inference_threshold=0.99,
    )
    frontend = FrontendConfig(n_mels=40)
    model = create_model("res8", num_labels=2)
    feats0 = np.zeros((1, 3, 40, 41), np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats0, train=False)
    engine = OnlineEngine(model, variables, cfg, frontend, spec=model_spec("res8"))

    client = HowlClient(engine=engine, context=None)
    rng = np.random.default_rng(0)
    n_chunks = 960  # 60 s at 500 samples/chunk
    for i in range(n_chunks):
        chunk = (rng.standard_normal(500) * 1000).astype("<i2").tobytes()
        client.ingest_chunk(chunk)
    # cadence: first inference at chunk 16, then every 2 -> (960-16)//2 + 1
    expected_hops = (n_chunks - 16) // 2 + 1
    assert abs(engine.curr_time / cfg.eval_stride_size_ms - expected_hops) < 2
    assert client._ring.total_written == n_chunks * 500
    # detection state stayed bounded (ring shapes fixed)
    assert engine.state.pred_ring.shape == (1, engine._s_steps, 2)
