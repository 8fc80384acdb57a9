"""End-to-end wakeword training: aligned dataset -> window batchifier -> frame
objective -> batched streaming engine detects positives and rejects negatives."""

import pytest

from tests.fixtures import make_noise_dir, make_wakeword_corpus


@pytest.mark.slow
def test_train_wakeword_end_to_end(tmp_path, monkeypatch):
    corpus = make_wakeword_corpus(tmp_path / "ww", vocab=("hey", "fire", "fox"), n_positive=12, n_negative=12)
    ws = tmp_path / "ws"
    monkeypatch.setenv("VOCAB", '["hey","fire","fox"]')
    monkeypatch.setenv("INFERENCE_SEQUENCE", "[0,1,2]")
    monkeypatch.setenv("NUM_EPOCHS", "40")
    monkeypatch.setenv("BATCH_SIZE", "16")
    monkeypatch.setenv("LEARNING_RATE", "0.02")
    monkeypatch.setenv("LR_DECAY", "0.98")
    monkeypatch.setenv("MAX_WINDOW_SIZE_SECONDS", "0.5")
    monkeypatch.setenv("EVAL_STRIDE_SIZE_SECONDS", "0.063")
    monkeypatch.setenv("NUM_MELS", "40")
    monkeypatch.setenv("INFERENCE_THRESHOLD", "0")
    monkeypatch.setenv("TOLERANCE_WINDOW_MS", "500")
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()

    from howl_tpu.training.run.train import run

    results = run(
        [
            "--model",
            "res8",
            "--workspace",
            str(ws),
            "-i",
            str(corpus),
            "--eval-freq",
            "0",
            "--steps-per-epoch",
            "10",
            "--no-augment",
        ]
    )
    # synthetic tone words are trivially separable: positives detected,
    # negatives (pure noise clips) rejected
    assert results["test_pos"]["tp"] == 3, results
    assert results["dev_pos"]["tp"] == 3, results
    assert results["dev_neg"]["fp"] == 0, results
    assert results["test_neg"]["fp"] == 0, results
    assert (ws / "model-best.flax").exists()
    assert (ws / "errors.tsv").exists()


@pytest.mark.slow
def test_train_wakeword_eval_mode_writes_threshold_csv(tmp_path, monkeypatch):
    corpus = make_wakeword_corpus(tmp_path / "ww", n_positive=6, n_negative=6)
    noise = make_noise_dir(tmp_path / "noise")
    ws = tmp_path / "ws"
    monkeypatch.setenv("VOCAB", '["hey","fire","fox"]')
    monkeypatch.setenv("INFERENCE_SEQUENCE", "[0,1,2]")
    monkeypatch.setenv("NUM_EPOCHS", "1")
    monkeypatch.setenv("BATCH_SIZE", "4")
    monkeypatch.setenv("MAX_WINDOW_SIZE_SECONDS", "0.5")
    monkeypatch.setenv("NUM_MELS", "40")
    monkeypatch.setenv("USE_NOISE_DATASET", "true")
    monkeypatch.setenv("NOISE_DATASET_PATH", str(noise))
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()
    from howl_tpu.training.run.train import run

    run(["--model", "res8", "--workspace", str(ws), "-i", str(corpus), "--eval-freq", "0", "--steps-per-epoch", "2"])

    monkeypatch.setenv("INFERENCE_THRESHOLD", "0.5")
    SETTINGS.reset()
    results = run(["--model", "res8", "--workspace", str(ws), "-i", str(corpus), "--eval"])
    csv = ws / "0.5_results.csv"
    assert csv.exists()
    lines = csv.read_text().strip().splitlines()
    # clean + noisy rows for dev/test pos/neg
    assert len(lines) == 8
    assert "dev_noisy_pos" in results and "test_noisy_neg" in results
