"""Phone-token training path + exact train-state resume."""


import pytest

from tests.fixtures import make_wakeword_corpus


@pytest.mark.slow
def test_phone_token_training_runs(tmp_path, monkeypatch):
    """token_type=phone: vocab expands to phones via the pronunciation dict,
    phonetic labeler + searcher drive the full train/eval path."""
    corpus = make_wakeword_corpus(tmp_path / "ww", vocab=("hey", "fire"), n_positive=8, n_negative=4)
    pdict = tmp_path / "dict.txt"
    pdict.write_text("hey HH EY1\nfire F AY1 ER0\nsomething S AH1 M TH IH0 NG\nelse EH1 L S\nentirely EH0 N T AY1 ER0 L IY0\n")
    monkeypatch.setenv("VOCAB", '["hey","fire"]')
    monkeypatch.setenv("INFERENCE_SEQUENCE", "[0,1]")
    monkeypatch.setenv("TOKEN_TYPE", "phone")
    monkeypatch.setenv("PHONE_DICTIONARY", str(pdict))
    monkeypatch.setenv("NUM_EPOCHS", "2")
    monkeypatch.setenv("BATCH_SIZE", "4")
    monkeypatch.setenv("MAX_WINDOW_SIZE_SECONDS", "0.5")
    monkeypatch.setenv("NUM_MELS", "40")
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()
    from howl_tpu.training.run.train import run

    results = run(
        ["--model", "res8", "--workspace", str(tmp_path / "ws"), "-i", str(corpus),
         "--eval-freq", "0", "--steps-per-epoch", "2", "--no-augment"]
    )
    # the full phone-mode pipeline (phonetic labeler + searcher + 6-label
    # space: 2+3 phones + [OOV]) runs end to end
    assert "test_pos" in results

    # the phonetic searcher operates on PHONE transcripts (reference
    # semantics: phone-mode datasets are phone-transcribed)
    from howl_tpu.context import InferenceContext

    ctx = InferenceContext(
        vocab=["hey", "fire"], token_type="phone", phone_dictionary_path=str(pdict), sequence=[0, 1]
    )
    assert ctx.num_labels == 6
    assert ctx.searcher.search("hh ey1 f ay1 er0")
    assert not ctx.searcher.search("f ay1 er0 hh ey1")
    # and the labeler maps word transcripts to phone labels via the dictionary
    from howl_tpu.data.common.metadata import AudioClipMetadata

    fld = ctx.labeler.compute_frame_labels(
        AudioClipMetadata(path="x.wav", transcription="hey fire", end_timestamps=[100.0 * i for i in range(1, 11)])
    )
    # every phone of both words gets its own label (hey: hh ey1 -> 0,1;
    # fire: f ay1 er0 -> 2,3,4), matching the reference's per-phone phrases
    assert set(fld.timestamp_label_map.values()) == {0, 1, 2, 3, 4}


@pytest.mark.slow
def test_resume_restores_step_and_continues(tmp_path, monkeypatch):
    corpus = make_wakeword_corpus(tmp_path / "ww", n_positive=8, n_negative=8)
    ws = tmp_path / "ws"
    for k, v in {
        "VOCAB": '["hey","fire","fox"]', "INFERENCE_SEQUENCE": "[0,1,2]",
        "NUM_EPOCHS": "2", "BATCH_SIZE": "8", "LEARNING_RATE": "0.02",
        "MAX_WINDOW_SIZE_SECONDS": "0.5", "NUM_MELS": "40",
    }.items():
        monkeypatch.setenv(k, v)
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()
    from howl_tpu.training.run.train import run

    run(["--model", "res8", "--workspace", str(ws), "-i", str(corpus),
         "--eval-freq", "0", "--steps-per-epoch", "3", "--no-augment"])
    state_file = ws / "train_state.flax"
    assert state_file.exists()
    size_before = state_file.stat().st_size
    metrics_before = len((ws / "metrics.jsonl").read_text().splitlines())

    # resume: steps continue from 6 (2 epochs x 3 steps), metrics not wiped
    run(["--model", "res8", "--workspace", str(ws), "-i", str(corpus),
         "--eval-freq", "0", "--steps-per-epoch", "3", "--no-augment", "--resume"])
    metrics_after = len((ws / "metrics.jsonl").read_text().splitlines())
    assert metrics_after > metrics_before  # appended, not truncated
    assert state_file.stat().st_size == size_before  # same structure persisted
