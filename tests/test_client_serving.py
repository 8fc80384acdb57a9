"""Serving path: workspace -> hub -> OnlineEngine -> HowlClient over WAV replay."""

import numpy as np
import pytest

from tests.fixtures import make_wakeword_corpus


@pytest.fixture(scope="module")
def trained_workspace(tmp_path_factory):
    """Train a tiny res8 wakeword model once for the serving tests."""
    import os

    tmp = tmp_path_factory.mktemp("serving")
    corpus = make_wakeword_corpus(tmp / "ww", n_positive=12, n_negative=12)
    ws = tmp / "ws"
    env = {
        "VOCAB": '["hey","fire","fox"]',
        "INFERENCE_SEQUENCE": "[0,1,2]",
        "NUM_EPOCHS": "40",
        "BATCH_SIZE": "16",
        "LEARNING_RATE": "0.02",
        "LR_DECAY": "0.98",
        "MAX_WINDOW_SIZE_SECONDS": "0.5",
        "EVAL_STRIDE_SIZE_SECONDS": "0.0625",
        "NUM_MELS": "40",
        "INFERENCE_THRESHOLD": "0",
    }
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()
    from howl_tpu.training.run.train import run

    run(
        ["--model", "res8", "--workspace", str(ws), "-i", str(corpus),
         "--eval-freq", "0", "--steps-per-epoch", "10", "--no-augment"]
    )
    yield ws, corpus, dict(env)
    for k, v in old.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    SETTINGS.reset()


@pytest.mark.slow
def test_client_detects_wakeword_in_wav_replay(trained_workspace, monkeypatch):
    ws, corpus, env = trained_workspace
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()
    from howl_tpu.client.howl_client import FileAudioSource, HowlClient

    pos_wavs = sorted((corpus / "audio").glob("pos_*.wav"))[:3]
    neg_wavs = sorted((corpus / "audio").glob("neg_*.wav"))[:3]

    fired_words = []
    client = HowlClient.from_workspace(ws, "res8", source=FileAudioSource(pos_wavs))
    client.add_listener(lambda words: fired_words.append(words))
    client.start().join()
    assert client.detections >= 2, f"expected detections on positive clips, got {client.detections}"
    assert fired_words[0] == [0, 1, 2]

    # negatives: no detections
    client2 = HowlClient.from_workspace(ws, "res8", source=FileAudioSource(neg_wavs))
    client2.start().join()
    assert client2.detections == 0


@pytest.mark.slow
def test_online_engine_matches_batched(trained_workspace, monkeypatch):
    """The incremental OnlineEngine and the batched StreamingEngine agree on
    detection decisions for the same clips."""
    ws, corpus, env = trained_workspace
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()
    import jax

    from howl_tpu.hub import load_workspace_engine
    from howl_tpu.inference.engine import StreamingEngine
    from howl_tpu.models.base import model_spec
    from howl_tpu.utils import audio_utils

    online, ctx = load_workspace_engine(ws, "res8")
    batched = StreamingEngine(
        online.model, online.variables, online.cfg, online.frontend,
        online.zmuv_mean, online.zmuv_std, spec=model_spec("res8"),
    )
    stride = int(online.cfg.eval_stride_size_ms / 1000 * online.cfg.sample_rate)
    window = online.window_samples

    agree = 0
    total = 0
    for wav in sorted((corpus / "audio").glob("*.wav"))[:8]:
        audio = audio_utils.silent_load(wav)
        batched_detected = bool(np.asarray(batched.infer_batch(audio[None, :])["detected"])[0])
        online.reset()
        online_detected = False
        for start in range(0, len(audio) - window + 1, stride):
            if online.ingest(audio[start : start + window]):
                online_detected = True
                break
        total += 1
        agree += int(batched_detected == online_detected)
    # the two paths see slightly different features (clip-level vs window-level
    # STFT padding) so require agreement on nearly all clips
    assert agree >= total - 1, f"only {agree}/{total} clips agree"


def test_hub_errors(tmp_path):
    from howl_tpu.hub import load_pretrained, load_workspace_engine

    with pytest.raises(ValueError):
        load_pretrained("not_a_model")
    with pytest.raises(ValueError):
        load_pretrained("hey_fire_fox", models_path=None)  # no HOWL_MODELS_PATH
    with pytest.raises(FileNotFoundError):
        load_workspace_engine(tmp_path / "empty_ws", "res8")


@pytest.mark.slow
def test_client_with_incremental_engine(trained_workspace, monkeypatch):
    """HowlClient over the IncrementalOnlineEngine (mel ring + per-hop
    featurization) detects positives and rejects negatives like the
    full-window path."""
    ws, corpus, env = trained_workspace
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()
    from howl_tpu.client.howl_client import FileAudioSource, HowlClient

    pos_wavs = sorted((corpus / "audio").glob("pos_*.wav"))[:3]
    neg_wavs = sorted((corpus / "audio").glob("neg_*.wav"))[:3]

    client = HowlClient.from_workspace(ws, "res8", source=FileAudioSource(pos_wavs), incremental=True)
    assert hasattr(client.engine, "push")
    client.start().join()
    assert client.detections >= 2, f"expected detections on positive clips, got {client.detections}"

    client2 = HowlClient.from_workspace(ws, "res8", source=FileAudioSource(neg_wavs), incremental=True)
    client2.start().join()
    assert client2.detections == 0


@pytest.mark.slow
def test_client_with_streaming_trunk_engine(trained_workspace, monkeypatch):
    """HowlClient over the FusedStreamingOnlineEngine (per-layer trunk caches,
    ~3.3x step-FLOP cut) detects positives and rejects negatives; the fixed
    4-hop decision lag lands well inside each 2 s clip's trailing audio."""
    ws, corpus, env = trained_workspace
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()
    from howl_tpu.client.howl_client import FileAudioSource, HowlClient
    from howl_tpu.inference.streaming_trunk import FusedStreamingOnlineEngine

    pos_wavs = sorted((corpus / "audio").glob("pos_*.wav"))[:3]
    neg_wavs = sorted((corpus / "audio").glob("neg_*.wav"))[:3]

    client = HowlClient.from_workspace(
        ws, "res8", source=FileAudioSource(pos_wavs), streaming_trunk=True
    )
    assert isinstance(client.engine, FusedStreamingOnlineEngine)
    client.start().join()
    assert client.detections >= 2, f"expected detections on positive clips, got {client.detections}"

    client2 = HowlClient.from_workspace(
        ws, "res8", source=FileAudioSource(neg_wavs), streaming_trunk=True
    )
    client2.start().join()
    assert client2.detections == 0


@pytest.mark.slow
def test_hub_hop_block_passthrough(trained_workspace, monkeypatch):
    """load_workspace_engine(hop_block=N) builds a blocked trunk engine; the
    flag is rejected for non-trunk engines."""
    ws, _corpus, env = trained_workspace
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()
    from howl_tpu.hub import load_workspace_engine

    engine, _ctx = load_workspace_engine(ws, "res8", streaming_trunk=True)
    period = engine.schedule.period
    blocked, _ctx = load_workspace_engine(ws, "res8", streaming_trunk=True, hop_block=period)
    assert blocked.hop_block == period
    with pytest.raises(ValueError, match="streaming_trunk"):
        load_workspace_engine(ws, "res8", hop_block=period)
    # the live client serves per-hop: blocked engines rejected at construction
    from howl_tpu.client.howl_client import HowlClient

    with pytest.raises(ValueError, match="hop-blocked"):
        HowlClient(engine=blocked)
