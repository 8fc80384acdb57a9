"""Coverage for smaller surfaces: dataset stats, multi-stream online engine,
silence injection, workspace config round-trip, profiling timer."""

import numpy as np
import pytest

from tests.fixtures import SR, make_gsc_corpus, tone


def test_dataset_statistics(tmp_path):
    from howl_tpu.context import InferenceContext
    from howl_tpu.data.common.metadata import AudioClipMetadata
    from howl_tpu.data.dataset.dataset import AudioClipDataset
    from howl_tpu.utils.audio_utils import write_wav

    (tmp_path / "a.wav").touch()
    write_wav(tmp_path / "a.wav", tone(440, 1.0), SR)
    write_wav(tmp_path / "b.wav", tone(600, 2.0), SR)
    ds = AudioClipDataset(
        [
            AudioClipMetadata(path=tmp_path / "a.wav", transcription="hey fire fox now"),
            AudioClipMetadata(path=tmp_path / "b.wav", transcription="fire fire elsewhere"),
        ]
    )
    ctx = InferenceContext(vocab=["hey", "fire", "fox"], token_type="word")
    stats = ds.compute_statistics(word_searcher=ctx.searcher)
    assert stats["num_examples"] == 2
    assert stats["audio_length_seconds"] == pytest.approx(3.0, abs=0.01)
    assert stats["vocab_counts"] == {"hey": 1, "fire": 3, "fox": 1}


def test_online_engine_multi_stream():
    import jax

    from howl_tpu.inference import EngineConfig
    from howl_tpu.inference.online import OnlineEngine
    from howl_tpu.models import create_model
    from howl_tpu.models.base import model_spec
    from howl_tpu.ops.frontend import FrontendConfig

    cfg = EngineConfig(
        inference_sequence=(0,), max_window_size_ms=500.0, eval_stride_size_ms=62.5,
        negative_label=1, num_labels=2,
    )
    frontend = FrontendConfig(n_mels=40)
    model = create_model("res8", num_labels=2)
    feats0 = np.zeros((1, 3, 40, 41), np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats0, train=False)
    engine = OnlineEngine(model, variables, cfg, frontend, spec=model_spec("res8"), num_streams=3)
    rng = np.random.default_rng(0)
    windows = rng.standard_normal((3, 8000)).astype(np.float32) * 0.1
    fired = engine.ingest(windows)
    assert isinstance(fired, bool)
    assert engine.state.pred_ring.shape[0] == 3  # per-stream state
    # per-stream surface of the last ingest (same shape contract as the
    # per-hop engines; the hardware A/B tool reads these)
    assert np.asarray(engine.last_labels).shape == (3,)
    assert np.asarray(engine.last_fired).shape == (3,)
    assert fired == bool(np.asarray(engine.last_fired).any())
    engine.reset()
    assert engine.last_labels is None and engine.last_fired is None
    assert float(np.asarray(engine.state.pred_times).max()) < -1e28  # cleared


def test_gsc_silence_injection(tmp_path, monkeypatch):
    corpus = make_gsc_corpus(tmp_path / "gsc", vocab=("yes", "no"), n_per_class=10)
    from howl_tpu.data.dataset.gsc_loader import GoogleSpeechCommandsDatasetLoader

    train, _, _ = GoogleSpeechCommandsDatasetLoader(["yes", "no"]).load_splits(corpus)
    n_real = len(train)
    train.label_map["__silence__"] = 3
    train.silence_proportion = 0.5
    assert len(train) == n_real + n_real // 2
    silence_sample = train[len(train) - 1]
    assert silence_sample.label == 3
    assert np.abs(silence_sample.audio_data).max() == 0.0


def test_workspace_config_roundtrip(tmp_path):
    from howl_tpu.config import ContextConfig, TrainingConfig
    from howl_tpu.workspace import Workspace

    ws = Workspace(tmp_path / "ws")
    cfg = TrainingConfig(batch_size=5, context_config=ContextConfig(vocab=["a"]))
    ws.save_config(cfg)
    back = ws.load_config()
    assert back.batch_size == 5
    assert back.workspace_path == str(ws.path)
    assert back.context_config.vocab == ["a"]


def test_step_timer():
    import time

    from howl_tpu.utils.profiling import StepTimer

    timer = StepTimer()
    for _ in range(3):
        with timer:
            time.sleep(0.01)
    summary = timer.summary()
    assert summary["steps"] == 3
    assert 5 < summary["mean_ms"] < 100
