"""SETTINGS.scoped + the commands-recognition harness end-to-end.

The harness applies the reference's GSC protocol (ref: training/run/
eval_commands_recognition.py:66-78) through explicit scoped overrides instead
of per-process env exports; these tests pin the scoping semantics and run the
full models x seeds sweep on a synthetic corpus.
"""

import csv
import json

import pytest

from howl_tpu.settings import SETTINGS
from tests.fixtures import make_gsc_corpus


def test_scoped_overrides_and_restores():
    SETTINGS.reset()
    before_epochs = SETTINGS.training.num_epochs
    before_mels = SETTINGS.audio_transform.num_mels
    with SETTINGS.scoped(training={"num_epochs": 123, "seed": 7}, audio_transform={"num_mels": 40}):
        assert SETTINGS.training.num_epochs == 123
        assert SETTINGS.training.seed == 7
        assert SETTINGS.audio_transform.num_mels == 40
    assert SETTINGS.training.num_epochs == before_epochs
    assert SETTINGS.audio_transform.num_mels == before_mels


def test_scoped_restores_on_error_and_rejects_unknown():
    SETTINGS.reset()
    before = SETTINGS.training.seed
    with pytest.raises(RuntimeError):
        with SETTINGS.scoped(training={"seed": 99}):
            assert SETTINGS.training.seed == 99
            raise RuntimeError("boom")
    assert SETTINGS.training.seed == before
    with pytest.raises(KeyError):
        with SETTINGS.scoped(nonexistent={"x": 1}):
            pass


def test_scoped_nests():
    SETTINGS.reset()
    with SETTINGS.scoped(training={"seed": 1}):
        with SETTINGS.scoped(training={"num_epochs": 5}):
            # inner scope layers on top of the outer override
            assert SETTINGS.training.seed == 1
            assert SETTINGS.training.num_epochs == 5
        assert SETTINGS.training.seed == 1


@pytest.mark.slow
def test_commands_recognition_harness(tmp_path):
    corpus = make_gsc_corpus(tmp_path / "gsc", vocab=("yes", "no"), n_per_class=16)
    base = tmp_path / "exp"
    SETTINGS.reset()

    from howl_tpu.training.run.eval_commands_recognition import run

    results = run(
        [
            "--models", "res8",
            "--workspace", str(base),
            "--dataset-path", str(corpus),
            "--num-models", "2",
            "--num-labels", "3",
            "--vocab", '["yes","no"]',
            "--epochs", "4",
            "--batch-size", "8",
        ]
    )

    assert set(results) == {"res8"}
    stats = results["res8"]
    assert len(stats["accuracies"]) == 2
    assert all(0.0 <= a <= 1.0 for a in stats["accuracies"])

    # protocol overrides must not leak out of the harness
    assert SETTINGS.training.seed == 0
    assert SETTINGS.training.learning_rate != 0.01 or SETTINGS.training.num_epochs != 20

    report = base / "commands_recognition_report.csv"
    assert report.exists()
    rows = list(csv.reader(report.open()))
    assert rows[0] == ["model", "mean", "std", "p90", "p95", "p99"]
    assert rows[1][0] == "res8"
    raw = json.loads((base / "commands_recognition_raw.json").read_text())
    assert raw["res8"]["accuracies"] == stats["accuracies"]
