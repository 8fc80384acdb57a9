"""Config tree, config-driven trainer, meyda parity, honkling export, precise
export, vision pretraining smoke, CTC objective."""

import json

import numpy as np
import pytest

from tests.fixtures import make_wakeword_corpus


def test_training_config_roundtrip(tmp_path):
    from howl_tpu.config import ContextConfig, DatasetConfig, ModelConfig, TrainingConfig

    cfg = TrainingConfig(
        batch_size=8,
        learning_rate=0.02,
        num_epochs=3,
        context_config=ContextConfig(vocab=["hey", "fire", "fox"], sequence=[0, 1, 2]),
        model_config=ModelConfig(architecture="res8"),
        train_datasets=[DatasetConfig(path="/data/pos")],
        workspace_path="/tmp/ws",
    )
    path = tmp_path / "cfg.json"
    path.write_text(cfg.json(indent=2))
    back = TrainingConfig.parse_file(path)
    assert back.batch_size == 8
    assert back.context_config.vocab == ["hey", "fire", "fox"]
    assert back.train_datasets[0].path == "/data/pos"
    assert back.model_config.architecture == "res8"


def test_config_applies_to_settings():
    from howl_tpu.config import ContextConfig, InferenceEngineConfig, TrainingConfig
    from howl_tpu.settings import SETTINGS

    cfg = TrainingConfig(
        batch_size=4,
        learning_rate=0.5,
        context_config=ContextConfig(vocab=["a", "b"], sequence=[0, 1]),
        inference_engine_config=InferenceEngineConfig(inference_threshold=0.7),
    )
    cfg.apply_to_settings()
    assert SETTINGS.training.batch_size == 4
    assert SETTINGS.training.vocab == ["a", "b"]
    assert SETTINGS.inference_engine.inference_threshold == 0.7
    assert SETTINGS.inference_engine.inference_sequence == [0, 1]


@pytest.mark.slow
def test_config_driven_trainer(tmp_path, monkeypatch):
    from howl_tpu.config import ContextConfig, ModelConfig, DatasetConfig, TrainingConfig
    from howl_tpu.trainer import Trainer

    corpus = make_wakeword_corpus(tmp_path / "ww", n_positive=8, n_negative=8)
    cfg = TrainingConfig(
        batch_size=8,
        learning_rate=0.02,
        num_epochs=3,
        lr_decay=0.98,
        max_window_size_seconds=0.5,
        eval_stride_size_seconds=0.0625,
        context_config=ContextConfig(vocab=["hey", "fire", "fox"], sequence=[0, 1, 2]),
        model_config=ModelConfig(architecture="res8"),
        train_datasets=[DatasetConfig(path=str(corpus))],
        workspace_path=str(tmp_path / "ws"),
    )
    trainer = Trainer(cfg)
    results = trainer.train(["--no-augment", "--steps-per-epoch", "2"])
    assert "test_pos" in results
    assert (tmp_path / "ws" / "model-best.flax").exists()
    assert (tmp_path / "ws" / "training_config.json").exists()


def test_meyda_spectrogram_matches_fft(rng):
    from howl_tpu.ops.meyda import MeydaMelSpectrogram, cooley_tukey_fft

    x = rng.standard_normal(512)
    np.testing.assert_allclose(cooley_tukey_fft(x), np.fft.fft(x), atol=1e-8)

    audio = (rng.standard_normal((1, 8000)) * 0.1).astype(np.float32)
    meyda = MeydaMelSpectrogram(n_mels=40)
    out = meyda(audio)
    assert out.shape == (1, 40, 41)
    # amplitude^2 mel spectrogram should broadly match the jnp power-spectrum path
    from howl_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram

    ref = np.exp(np.asarray(log_mel_spectrogram(audio, FrontendConfig(n_mels=40, f_max=8000.0))))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_use_meyda_spectrogram_flag_routes_frontend(monkeypatch, rng):
    """USE_MEYDA_SPECTROGRAM switches the device frontend to the browser
    (Meyda.js) mel convention — fixed f_max=8000 instead of Nyquist (ref
    transform.py:241-247) — and the device output matches the host
    MeydaMelSpectrogram at a rate where the two bases genuinely differ."""
    from howl_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram
    from howl_tpu.ops.meyda import MeydaMelSpectrogram
    from howl_tpu.settings import SETTINGS

    assert FrontendConfig.from_settings().f_max is None  # flag off: Nyquist

    monkeypatch.setenv("USE_MEYDA_SPECTROGRAM", "true")
    monkeypatch.setenv("SAMPLE_RATE", "22050")
    monkeypatch.setenv("NUM_MELS", "40")
    SETTINGS.reset()
    cfg = FrontendConfig.from_settings()
    assert cfg.f_max == 8000.0 and cfg.sample_rate == 22050

    audio = (rng.standard_normal((1, 11025)) * 0.1).astype(np.float32)
    meyda = MeydaMelSpectrogram(
        n_fft=cfg.n_fft, n_mels=cfg.n_mels, sample_rate=cfg.sample_rate, hop_length=cfg.hop_length
    )
    host = meyda(audio)
    dev = np.exp(np.asarray(log_mel_spectrogram(audio, cfg)))
    np.testing.assert_allclose(dev, host, rtol=1e-3, atol=1e-4)

    # the meyda basis is NOT the Nyquist basis at this rate
    nyq = np.exp(np.asarray(log_mel_spectrogram(audio, FrontendConfig(
        n_fft=cfg.n_fft, n_mels=cfg.n_mels, sample_rate=cfg.sample_rate, hop_length=cfg.hop_length
    ))))
    assert not np.allclose(dev, nyq, rtol=1e-3, atol=1e-4)


def test_export_honkling_res8(tmp_path):
    import flax
    import jax

    from howl_tpu.models import create_model
    from howl_tpu.training.run.export_honkling import run as export_run

    model = create_model("res8", num_labels=4)
    feats0 = np.zeros((1, 3, 40, 41), np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats0, train=False)
    ckpt = tmp_path / "model.flax"
    ckpt.write_bytes(flax.serialization.to_bytes(jax.device_get(variables)))

    out_file = tmp_path / "weights.js"
    export_run(["-i", str(ckpt), "-o", str(out_file), "--name", "RES8", "--num-labels", "4"])
    text = out_file.read_text()
    assert text.startswith("weights['RES8'] = ")
    weights = json.loads(text.split("= ", 1)[1])
    # torch layout: conv0.weight (O, I, H, W) = (45, 1, 3, 3)
    w = np.asarray(weights["conv0.weight"])
    assert w.shape == (45, 1, 3, 3)
    assert np.asarray(weights["bn1.running_mean"]).shape == (45,)
    assert np.asarray(weights["output.weight"]).shape == (4, 45)
    assert "scale1.scale" in weights


def test_generate_precise_dataset(tmp_path, monkeypatch):
    corpus = make_wakeword_corpus(tmp_path / "ww", n_positive=6, n_negative=6)
    monkeypatch.setenv("VOCAB", '["hey","fire","fox"]')
    monkeypatch.setenv("INFERENCE_SEQUENCE", "[0,1,2]")
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()
    from howl_tpu.training.run.generate_precise_dataset import run as precise_run

    out = tmp_path / "precise"
    precise_run(["-i", str(corpus), "-o", str(out), "--deep-copy"])
    assert len(list((out / "wake-word").glob("*.wav"))) > 0
    assert len(list((out / "not-wake-word").glob("*.wav"))) > 0
    assert (out / "dev" / "wake-word").exists()
    assert (out / "test" / "not-wake-word").exists()


@pytest.mark.slow
def test_generate_precise_dataset_noisy_layout(tmp_path, monkeypatch):
    """Noisy variants land in the reference's sibling layout
    (noisy-dev/wake-word etc. — precise tooling only recognizes the literal
    wake-word/ and not-wake-word/ dir names), dev/test only; symlinks resolve
    even for a relative input path."""
    import os

    from tests.fixtures import make_noise_dir, make_wakeword_corpus

    corpus = make_wakeword_corpus(tmp_path / "ww", n_positive=4, n_negative=4)
    noise = make_noise_dir(tmp_path / "noise", n=4, seconds=2.5)
    monkeypatch.setenv("VOCAB", '["hey","fire","fox"]')
    monkeypatch.setenv("INFERENCE_SEQUENCE", "[0,1,2]")
    monkeypatch.setenv("USE_NOISE_DATASET", "True")
    monkeypatch.setenv("NOISE_DATASET_PATH", str(noise))
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()
    from howl_tpu.training.run.generate_precise_dataset import run as precise_run

    out = tmp_path / "precise_noisy"
    monkeypatch.chdir(tmp_path)  # relative -i exercises symlink resolution
    precise_run(["-i", "ww", "-o", str(out)])
    for split in ("dev", "test"):
        noisy = out / f"noisy-{split}" / "wake-word"
        assert noisy.exists() and len(list(noisy.glob("*.wav"))) > 0
    assert not (out / "noisy-" / "wake-word").exists()  # no noisy training split
    link = next((out / "wake-word").glob("*.wav"))
    assert os.path.islink(link) and os.path.exists(link)  # resolved, not dangling


@pytest.mark.slow
def test_pretrain_vision_synthetic(tmp_path, monkeypatch):
    monkeypatch.setenv("NUM_EPOCHS", "3")
    monkeypatch.setenv("BATCH_SIZE", "32")
    monkeypatch.setenv("LEARNING_RATE", "0.01")
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()
    from howl_tpu.training.run.pretrain import run as pretrain_run

    result = pretrain_run(["--model", "res8", "--workspace", str(tmp_path / "ws"), "--synthetic"])
    assert result["test_acc"] > 0.15  # better than chance on 10 classes
    assert (tmp_path / "ws" / "model-best.flax").exists()


@pytest.mark.slow
def test_ctc_training_step_runs(tmp_path, monkeypatch):
    """seq-lstm + CTC objective: loss is finite and decreases over steps."""
    monkeypatch.setenv("VOCAB", '["hey","fire","fox"]')
    monkeypatch.setenv("INFERENCE_SEQUENCE", "[0,1,2]")
    monkeypatch.setenv("OBJECTIVE", "ctc")
    monkeypatch.setenv("NUM_EPOCHS", "4")
    monkeypatch.setenv("BATCH_SIZE", "4")
    monkeypatch.setenv("LEARNING_RATE", "0.001")
    monkeypatch.setenv("MAX_WINDOW_SIZE_SECONDS", "0.5")
    monkeypatch.setenv("NUM_MELS", "40")
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()
    corpus = make_wakeword_corpus(tmp_path / "ww", n_positive=8, n_negative=4)
    from howl_tpu.training.run.train import run

    results = run(
        ["--model", "seq-lstm", "--workspace", str(tmp_path / "ws"), "-i", str(corpus),
         "--eval-freq", "0", "--steps-per-epoch", "3", "--no-augment"]
    )
    # CTC on a tiny corpus in 12 steps won't detect, but the whole path
    # (blank label, sequence batchifier, whole-clip engine) must run through
    assert "test_pos" in results
    metrics = json.loads((tmp_path / "ws" / "metrics.jsonl").read_text().splitlines()[0])
    assert np.isfinite(metrics["value"])
