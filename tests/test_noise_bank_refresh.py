"""Full-corpus noise fidelity (VERDICT r3 #4): budget-sized noise bank,
fresh whole-corpus draws per refresh, zero-recompile hot swap in the train
step, and the end-to-end refresh path through train.py."""

import jax
import numpy as np
import pytest

from tests.fixtures import SR, make_noise_dir, make_wakeword_corpus


def _noise_ds(tmp_path, **kwargs):
    from howl_tpu.data.dataset.dataset_loader import RecursiveNoiseDatasetLoader

    root = make_noise_dir(tmp_path / "noise", **kwargs)
    return RecursiveNoiseDatasetLoader().load(root, sample_rate=SR, mono=True)


def test_windows_for_budget():
    from howl_tpu.data.noise_bank import windows_for_budget

    # 16 MB of f32 half-second windows at 16 kHz -> 524 windows
    assert windows_for_budget(16.0, 8000) == 524
    assert windows_for_budget(0.001, 8000) == 1  # floor at 1


def test_sampler_draws_differ_per_refresh_and_are_deterministic(tmp_path):
    from howl_tpu.data.noise_bank import NoiseBankSampler

    ds = _noise_ds(tmp_path)
    sampler = NoiseBankSampler(ds, window_samples=4000, num_windows=32, seed=3)
    banks = [sampler.sample(i) for i in range(4)]
    for bank in banks:
        assert bank.shape == (32, 4000) and bank.dtype == np.float32
        assert np.abs(bank).max() > 0
    # every refresh's window set differs (the VERDICT's done-criterion)
    for i in range(4):
        for j in range(i + 1, 4):
            assert not np.array_equal(banks[i], banks[j]), (i, j)
    # deterministic per (seed, refresh_index)
    np.testing.assert_array_equal(sampler.sample(2), banks[2])
    # windows are REAL corpus content: spot-check that the first row is a
    # verbatim contiguous slice of some clip
    clips = [ds.load_audio(m) for m in ds.metadata_list]
    row = banks[0][0]
    found = any(
        len(c) >= len(row)
        and any(np.array_equal(c[o : o + len(row)], row) for o in range(len(c) - len(row) + 1))
        for c in clips
    )
    assert found


def test_short_clips_are_tiled(tmp_path):
    from howl_tpu.data.noise_bank import NoiseBankSampler

    ds = _noise_ds(tmp_path, n=2, seconds=0.1)  # 1600-sample clips
    sampler = NoiseBankSampler(ds, window_samples=4000, num_windows=4, seed=0)
    bank = sampler.sample(0)
    assert bank.shape == (4, 4000)
    # tiled: the first 1600 samples repeat
    np.testing.assert_array_equal(bank[0, :1600], bank[0, 1600:3200])


@pytest.mark.slow
def test_set_bank_swaps_without_recompile(tmp_path):
    from howl_tpu.models import create_model
    from howl_tpu.ops.augment import AugmentConfig
    from howl_tpu.ops.frontend import FrontendConfig
    from howl_tpu.training.state import create_train_state
    from howl_tpu.training.step import (
        NoiseBankTrainStep,
        StepConfig,
        featurize,
        make_classification_train_step,
    )

    window = 2000
    rng = np.random.default_rng(0)
    bank_a = rng.standard_normal((8, window)).astype(np.float32) * 0.05
    bank_b = rng.standard_normal((8, window)).astype(np.float32) * 0.05
    # mixer always applied, full strength: output must reflect bank content
    cfg = StepConfig(
        frontend=FrontendConfig(n_mels=40),
        zmuv_mean=0.0,
        zmuv_std=1.0,
        augment=AugmentConfig(prob=1.0, mixer_strength=1.0),
        use_vtlp=False,
        negative_label=1,
    )
    model = create_model("small-cnn", num_labels=2)
    feats0 = featurize(np.zeros((1, window), np.float32), cfg)
    state = create_train_state(model, jax.random.PRNGKey(0), feats0, learning_rate=1e-3)
    step = make_classification_train_step(model, cfg, bank_a)
    assert isinstance(step, NoiseBankTrainStep)

    audio = rng.standard_normal((4, window)).astype(np.float32) * 0.1
    labels = np.zeros(4, np.int32)
    lengths = np.full(4, window, np.int32)
    key = jax.random.PRNGKey(5)

    _, m_a = step(state, audio, labels, lengths, key)
    compiles_after_first = step._jitted._cache_size()
    step.set_bank(bank_b)
    _, m_b = step(state, audio, labels, lengths, key)
    # same key, different bank content -> different mixed batch -> different loss
    assert float(m_a["loss"]) != float(m_b["loss"])
    # same shapes -> the swap did NOT recompile the step
    assert step._jitted._cache_size() == compiles_after_first
    # swapping back reproduces the original loss exactly
    step.set_bank(bank_a)
    _, m_a2 = step(state, audio, labels, lengths, key)
    assert float(m_a2["loss"]) == float(m_a["loss"])
    assert step._jitted._cache_size() == compiles_after_first


@pytest.mark.slow
def test_train_refresh_end_to_end(tmp_path, monkeypatch):
    """train.py with noise + per-epoch refresh runs and converges on the
    synthetic corpus; the sampler path replaces the old hard-512 bank."""
    corpus = make_wakeword_corpus(tmp_path / "ww", n_positive=6, n_negative=6)
    noise = make_noise_dir(tmp_path / "noise")
    ws = tmp_path / "ws"
    monkeypatch.setenv("VOCAB", '["hey","fire","fox"]')
    monkeypatch.setenv("INFERENCE_SEQUENCE", "[0,1,2]")
    monkeypatch.setenv("NUM_EPOCHS", "3")
    monkeypatch.setenv("BATCH_SIZE", "4")
    monkeypatch.setenv("MAX_WINDOW_SIZE_SECONDS", "0.5")
    monkeypatch.setenv("NUM_MELS", "40")
    monkeypatch.setenv("USE_NOISE_DATASET", "true")
    monkeypatch.setenv("NOISE_DATASET_PATH", str(noise))
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()
    from howl_tpu.training.run.train import run

    results = run(
        [
            "--model", "res8", "--workspace", str(ws), "-i", str(corpus),
            "--eval-freq", "0", "--steps-per-epoch", "2",
            "--noise-bank-mb", "0.5", "--noise-refresh-epochs", "1",
        ]
    )
    assert "dev_noisy_pos" in results  # noisy eval mixers still built


def test_eval_bank_is_full_corpus_and_deterministic(tmp_path):
    """VERDICT round-4 missing #3: the eval mixers' bank must sample the
    WHOLE noise corpus (the reference's seeded DatasetMixer protocol,
    ref training/run/train.py:219-220), not the first max_windows contiguous
    chunks of the first files — and be deterministic per seed so every eval
    pass scores against identical noise."""
    from howl_tpu.training.run.train import build_noise_bank

    # 12 clips x 3 s; the OLD first-files scan filled 16 windows from the
    # first ~2 files. Tag each clip with a distinct DC offset so provenance
    # of every window is readable off its mean.
    from howl_tpu.utils.audio_utils import write_wav

    root = tmp_path / "noise"
    root.mkdir()
    n_clips, sr = 12, SR
    rng = np.random.default_rng(0)
    for i in range(n_clips):
        clip = 0.02 * rng.standard_normal(3 * sr).astype(np.float32) + (i + 1) * 0.03
        write_wav(root / f"clip{i:02d}.wav", clip, sr)
    from howl_tpu.data.dataset.dataset_loader import RecursiveNoiseDatasetLoader

    ds = RecursiveNoiseDatasetLoader().load(root, sample_rate=sr, mono=True)

    bank = build_noise_bank(ds, window_samples=sr // 2, max_windows=64, seed=0)
    assert bank.shape == (64, sr // 2)
    # provenance: which source clip does each window's DC level point at?
    sources = {int(round(float(m) / 0.03)) for m in bank.mean(axis=1)}
    assert len(sources) >= n_clips - 2, (
        f"bank drew from only {len(sources)}/{n_clips} clips — not full-corpus"
    )
    # deterministic per seed (reference eval mixers are seed-pinned)
    np.testing.assert_array_equal(
        bank, build_noise_bank(ds, window_samples=sr // 2, max_windows=64, seed=0)
    )
    assert not np.array_equal(
        bank, build_noise_bank(ds, window_samples=sr // 2, max_windows=64, seed=1)
    )
    # empty dataset contract unchanged
    ds_empty = RecursiveNoiseDatasetLoader().load(root, sample_rate=sr, mono=True)
    ds_empty.metadata_list = []
    assert build_noise_bank(ds_empty, window_samples=sr // 2) is None
