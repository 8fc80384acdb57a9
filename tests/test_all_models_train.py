"""Every model family trains through the full wakeword pipeline (smoke):
las / gru / small-cnn under the frame objective, seq-cnn under CTC."""

import pytest

from tests.fixtures import make_wakeword_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return make_wakeword_corpus(tmp_path_factory.mktemp("allmodels") / "ww", n_positive=6, n_negative=6)


def _run(model, corpus, ws, monkeypatch, objective="frame"):
    env = {
        "VOCAB": '["hey","fire","fox"]',
        "INFERENCE_SEQUENCE": "[0,1,2]",
        "NUM_EPOCHS": "1",
        "BATCH_SIZE": "4",
        "LEARNING_RATE": "0.001",
        "MAX_WINDOW_SIZE_SECONDS": "0.5",
        "EVAL_STRIDE_SIZE_SECONDS": "0.0625",
        "NUM_MELS": "40",
        "OBJECTIVE": objective,
    }
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()
    from howl_tpu.training.run.train import run

    return run(
        ["--model", model, "--workspace", str(ws), "-i", str(corpus),
         "--eval-freq", "0", "--steps-per-epoch", "2", "--no-augment"]
    )


@pytest.mark.slow
@pytest.mark.parametrize("model", ["las", "gru", "small-cnn"])
def test_frame_models_train_and_eval(model, corpus, tmp_path, monkeypatch):
    results = _run(model, corpus, tmp_path / model, monkeypatch)
    # pipeline completes: all eval sets scored, checkpoint saved
    assert set(results) >= {"dev_pos", "dev_neg", "test_pos", "test_neg"}
    assert (tmp_path / model / "model-best.flax").exists()


@pytest.mark.slow
def test_seq_cnn_ctc_trains(corpus, tmp_path, monkeypatch):
    results = _run("seq-cnn", corpus, tmp_path / "seqcnn", monkeypatch, objective="ctc")
    assert "test_pos" in results


@pytest.mark.slow
def test_convert_static_trains(corpus, tmp_path, monkeypatch):
    monkeypatch.setenv("CONVERT_STATIC", "true")
    results = _run("small-cnn", corpus, tmp_path / "conv", monkeypatch, objective="ctc")
    assert "test_pos" in results


@pytest.mark.slow
def test_convert_static_workspace_loads_in_hub(corpus, tmp_path, monkeypatch):
    """A convert_static workspace must be servable: the hub rebuilds the
    ConvertedStaticModel wrapper so the saved (wrapped) param tree matches."""
    monkeypatch.setenv("CONVERT_STATIC", "true")
    ws = tmp_path / "conv_hub"
    _run("small-cnn", corpus, ws, monkeypatch, objective="ctc")

    import numpy as np

    from howl_tpu.hub import load_workspace_engine

    engine, ctx = load_workspace_engine(ws, "small-cnn")
    assert engine.spec.is_sequential
    fired = engine.ingest(np.zeros(engine.window_samples, np.float32))
    assert fired in (True, False)
