"""End-to-end: GSC classification training converges on a synthetic corpus,
checkpoints round-trip, eval mode reproduces accuracy. Exercises the full
loader -> sampler -> jitted step -> workspace path on the 8-device CPU mesh."""

import pytest

from tests.fixtures import make_gsc_corpus


@pytest.mark.slow
def test_pretrain_gsc_end_to_end(tmp_path, monkeypatch):
    corpus = make_gsc_corpus(tmp_path / "gsc", vocab=("yes", "no"), n_per_class=20)
    ws = tmp_path / "ws"
    monkeypatch.setenv("DATASET_PATH", str(corpus))
    monkeypatch.setenv("VOCAB", '["yes","no"]')
    monkeypatch.setenv("NUM_EPOCHS", "5")
    monkeypatch.setenv("BATCH_SIZE", "8")
    monkeypatch.setenv("LEARNING_RATE", "0.01")
    monkeypatch.setenv("MAX_WINDOW_SIZE_SECONDS", "1.0")
    monkeypatch.setenv("NUM_MELS", "40")
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()

    from howl_tpu.training.run.pretrain_gsc import run

    result = run(
        [
            "--model",
            "res8",
            "--workspace",
            str(ws),
            "--num-labels",
            "3",
            "--no-augment",
            "--num-devices",
            "4",
        ]
    )
    # two distinct tones: must be separable nearly perfectly
    assert result["dev_acc"] >= 0.85, result
    assert result["test_acc"] >= 0.85, result

    # checkpoint artifacts exist
    assert (ws / "model-best.flax").exists()
    assert (ws / "zmuv.json").exists()
    assert (ws / "settings.json").exists()
    assert (ws / "train_state.flax").exists()

    # eval mode reloads the best model and reproduces accuracy
    result_eval = run(
        [
            "--model",
            "res8",
            "--workspace",
            str(ws),
            "--num-labels",
            "3",
            "--no-augment",
            "--eval",
        ]
    )
    assert result_eval["test_acc"] >= 0.85


@pytest.mark.slow
def test_pretrain_gsc_bf16(tmp_path, monkeypatch):
    """Mixed-precision res8 training converges on the synthetic corpus."""
    corpus = make_gsc_corpus(tmp_path / "gsc", vocab=("yes", "no"), n_per_class=20)
    monkeypatch.setenv("DATASET_PATH", str(corpus))
    monkeypatch.setenv("VOCAB", '["yes","no"]')
    monkeypatch.setenv("NUM_EPOCHS", "5")
    monkeypatch.setenv("BATCH_SIZE", "8")
    monkeypatch.setenv("LEARNING_RATE", "0.01")
    monkeypatch.setenv("MAX_WINDOW_SIZE_SECONDS", "1.0")
    monkeypatch.setenv("NUM_MELS", "40")
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()
    from howl_tpu.training.run.pretrain_gsc import run

    result = run(
        ["--model", "res8", "--workspace", str(tmp_path / "ws"), "--num-labels", "3",
         "--no-augment", "--bf16"]
    )
    assert result["test_acc"] >= 0.85, result
