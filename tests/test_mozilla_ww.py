"""MozillaWakeWordLoader speaker/sound splits, end-to-end on synthetic fixtures
(the basilisk-*.env recipes' loader; ref common_voice_dataset_loader.py:72-122)."""

import dataclasses

import jax
import numpy as np
import pytest

from howl_tpu.utils.audio_utils import write_wav

SR = 16000


@pytest.fixture()
def ww_corpus(tmp_path):
    """verified/<speaker>/<sound_id>.wav + .txt, rejected/<speaker>/<id>.wav."""
    rng = np.random.default_rng(0)
    root = tmp_path / "mozilla_ww"
    speakers = [f"spk{i:02d}" for i in range(8)]
    n_clip = 0
    for s_idx, speaker in enumerate(speakers):
        for j in range(4):
            d = root / "verified" / speaker
            d.mkdir(parents=True, exist_ok=True)
            sound_id = f"clip_{s_idx:02d}_{j}"
            tone = 0.3 * np.sin(2 * np.pi * (300 + 40 * s_idx) * np.arange(SR) / SR)
            write_wav(d / f"{sound_id}.wav", (tone + 0.01 * rng.standard_normal(SR)).astype(np.float32), SR)
            (d / f"{sound_id}.txt").write_text("hey firefox")
            n_clip += 1
    d = root / "rejected" / "spk99"
    d.mkdir(parents=True)
    write_wav(d / "bad_0.wav", rng.standard_normal(SR).astype(np.float32) * 0.05, SR)
    return root, n_clip


def test_speaker_split_keeps_speakers_disjoint(ww_corpus):
    from howl_tpu.data.dataset.common_voice_loader import SpeakerSplitMozillaWakeWordLoader

    root, n_clip = ww_corpus
    train, dev, test = SpeakerSplitMozillaWakeWordLoader().load_splits(root, sample_rate=SR, mono=True)
    assert len(train) + len(dev) + len(test) == n_clip
    by_split = [{m.path.parent.name for m in ds.metadata_list} for ds in (train, dev, test)]
    # a speaker's clips never straddle splits
    assert not (by_split[0] & by_split[1]) and not (by_split[0] & by_split[2]) and not (by_split[1] & by_split[2])


def test_sound_split_scatters_speakers(ww_corpus):
    from howl_tpu.data.dataset.common_voice_loader import SoundIdSplitMozillaWakeWordLoader

    root, n_clip = ww_corpus
    train, dev, test = SoundIdSplitMozillaWakeWordLoader().load_splits(root, sample_rate=SR, mono=True)
    assert len(train) + len(dev) + len(test) == n_clip
    # sound-id bucketing splits WITHIN speakers: at least one speaker appears
    # in more than one split (the point of the sound-id protocol)
    by_split = [{m.path.parent.name for m in ds.metadata_list} for ds in (train, dev, test)]
    overlaps = (by_split[0] & by_split[1]) | (by_split[0] & by_split[2]) | (by_split[1] & by_split[2])
    assert overlaps, "sound-id split should scatter a speaker across splits"


def test_rejected_split_loads_unknown_transcriptions(ww_corpus):
    from howl_tpu.data.dataset.common_voice_loader import MozillaWakeWordLoader

    root, _ = ww_corpus
    train, dev, test = MozillaWakeWordLoader(split="rejected").load_splits(root, sample_rate=SR, mono=True)
    metas = train.metadata_list + dev.metadata_list + test.metadata_list
    assert len(metas) == 1
    assert metas[0].transcription  # UNKNOWN_TRANSCRIPTION placeholder, not empty


@pytest.mark.slow
def test_mozilla_ww_to_training_end_to_end(ww_corpus):
    """Loader -> stub alignment -> frame labels -> window batch -> train step:
    the basilisk recipe data path with no real corpus."""
    from howl_tpu.align.stub import StubAligner
    from howl_tpu.context import InferenceContext
    from howl_tpu.data.dataset.common_voice_loader import SpeakerSplitMozillaWakeWordLoader
    from howl_tpu.data.dataset.dataset import DatasetSplit, DatasetType, WakeWordDataset
    from howl_tpu.data.transform.batchifier import WakeWordFrameBatchifier
    from howl_tpu.models import create_model
    from howl_tpu.ops.frontend import FrontendConfig
    from howl_tpu.training.state import create_train_state
    from howl_tpu.training.step import StepConfig, featurize, make_classification_train_step

    root, _ = ww_corpus
    train, _, _ = SpeakerSplitMozillaWakeWordLoader().load_splits(root, sample_rate=SR, mono=True)
    ctx = InferenceContext(vocab=["hey", "firefox"], token_type="word")

    aligner = StubAligner()
    aligned_metas = []
    for idx in range(len(train)):
        sample = train[idx]
        aligned = aligner.align(sample)
        aligned_metas.append(
            dataclasses.replace(sample.metadata, end_timestamps=aligned.end_timestamps)
        )
    ds = WakeWordDataset(
        metadata_list=aligned_metas,
        set_type=DatasetType.TRAINING,
        dataset_split=DatasetSplit.TRAINING,
        sample_rate=SR,
        mono=True,
        frame_labeler=ctx.labeler,
    )
    sample = ds[0]
    assert sample.label_data is not None and sample.label_data.timestamp_label_map

    batchifier = WakeWordFrameBatchifier(ctx.negative_label, window_size_ms=500, sample_rate=SR, seed=0)
    batch = batchifier([ds[i] for i in range(min(8, len(ds)))])
    step_cfg = StepConfig(frontend=FrontendConfig(n_mels=40), zmuv_mean=0.0, zmuv_std=1.0, use_vtlp=False)
    model = create_model("res8", num_labels=ctx.num_labels)
    feats0 = featurize(batch.audio_data[:1], step_cfg)
    state = create_train_state(model, jax.random.PRNGKey(0), feats0, learning_rate=1e-3)
    train_step = make_classification_train_step(model, step_cfg)
    state, metrics = train_step(state, batch.audio_data, batch.labels, batch.lengths, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
