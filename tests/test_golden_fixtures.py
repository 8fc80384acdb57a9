"""Golden-fixture integration tests (the reference's pattern, SURVEY.md §4):
regenerate the howl dataset from the checked-in mini Common Voice corpus and
compare against the checked-in ground truth byte-for-byte (jsonl) and
sample-for-sample (wav)."""

import json
import random
import shutil
from pathlib import Path

import numpy as np
import pytest

TEST_DATA = Path(__file__).parent / "test_data"


def _read_jsonl(path):
    return [json.loads(l) for l in Path(path).read_text().splitlines() if l.strip()]


@pytest.mark.slow
def test_etl_matches_golden_fixtures(tmp_path, monkeypatch):
    monkeypatch.setenv("VOCAB", '["hey","fire","fox"]')
    monkeypatch.setenv("INFERENCE_SEQUENCE", "[0,1,2]")
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()
    from howl_tpu.utils.random_utils import set_random_seed

    # regenerate from the checked-in corpus into a tempdir
    cv = tmp_path / "common-voice"
    shutil.copytree(TEST_DATA / "common-voice", cv)
    out = tmp_path / "datasets"

    from howl_tpu.training.run.attach_alignment import run as align_run
    from howl_tpu.training.run.generate_raw_audio_dataset import run as gen_run
    from howl_tpu.training.run.stitch_vocab_samples import run as stitch_run

    set_random_seed(0)
    random.seed(0)
    gen_run(["-i", str(cv), "--dataset-type", "common-voice", "-o", str(out)])
    pos = out / "hey_fire_fox" / "positive"
    neg = out / "hey_fire_fox" / "negative"
    align_run(["-i", str(pos), "--alignment-type", "stub"])
    align_run(["-i", str(neg), "--alignment-type", "stub"])
    set_random_seed(0)
    random.seed(0)
    stitch_run(
        ["-i", str(pos), "--max-num-training-samples", "3", "--max-num-dev-samples", "2",
         "--max-num-test-samples", "2", "--disable-detect-keyword"]
    )

    golden_root = TEST_DATA / "hey_fire_fox"
    for sub in ("positive", "negative"):
        for jsonl in sorted((golden_root / sub).glob("*.jsonl")):
            produced = (out / "hey_fire_fox" / sub / jsonl.name)
            assert produced.exists(), f"missing {produced}"
            assert _read_jsonl(produced) == _read_jsonl(jsonl), f"mismatch in {jsonl.name}"

    # audio equality for every ground-truth wav (incl. stitched samples)
    from howl_tpu.utils.audio_utils import read_wav

    for wav in sorted((golden_root / "positive" / "audio").glob("*.wav")):
        produced = out / "hey_fire_fox" / "positive" / "audio" / wav.name
        assert produced.exists(), f"missing {produced}"
        a, _ = read_wav(wav)
        b, _ = read_wav(produced)
        np.testing.assert_array_equal(a, b, err_msg=wav.name)


def test_golden_dataset_loads_and_labels():
    """The checked-in ground truth is itself a valid howl dataset."""
    from howl_tpu.context import InferenceContext
    from howl_tpu.data.dataset.dataset_loader import WakeWordDatasetLoader
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()
    ctx = InferenceContext(vocab=["hey", "fire", "fox"], token_type="word", sequence=[0, 1, 2])
    loader = WakeWordDatasetLoader()
    train, dev, test = loader.load_splits(
        TEST_DATA / "hey_fire_fox" / "positive", frame_labeler=ctx.labeler
    )
    assert len(train) == 3 and len(dev) == 1 and len(test) == 1
    sample = train[0]
    assert sample.audio_data.shape[-1] > 0
    assert sample.label_data.timestamp_label_map  # stub alignment labeled the vocab words
    st_train, _, _ = loader.load_splits(
        TEST_DATA / "hey_fire_fox" / "positive", prefix="stitched-", frame_labeler=ctx.labeler
    )
    assert len(st_train) == 3
    assert st_train[0].metadata.transcription == "hey fire fox"
