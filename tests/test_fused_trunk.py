"""Fused-trunk res8 scoring: exact oracle parity, locality, and end-to-end
train+serve co-design (VERDICT.md round-2 item #1).

The engine runs the res8 conv trunk ONCE over the whole clip and derives each
window's logits by windowed average pooling (cumsum) over the trunk output,
instead of re-convolving 41-frame windows every 5 frames (the ~8x FLOP
redundancy left in ref howl/model/inference.py:214-244's design).
"""

import numpy as np
import pytest

from tests.fixtures import make_wakeword_corpus


def _res8_engine(variables=None, fused=None, clip_samples=8000):
    import jax

    from howl_tpu.inference import EngineConfig, StreamingEngine
    from howl_tpu.models import create_model
    from howl_tpu.models.base import model_spec
    from howl_tpu.ops.frontend import FrontendConfig
    from howl_tpu.training.step import StepConfig, featurize

    cfg = EngineConfig(
        inference_sequence=(0, 1, 2),
        max_window_size_ms=500.0,
        eval_stride_size_ms=62.5,
        negative_label=3,
        num_labels=4,
    )
    frontend = FrontendConfig(n_mels=40)
    model = create_model("res8", num_labels=4)
    if variables is None:
        feats0 = featurize(
            np.zeros((1, clip_samples), np.float32),
            StepConfig(frontend=frontend, zmuv_mean=0.0, zmuv_std=1.0, use_vtlp=False),
        )
        variables = model.init({"params": jax.random.PRNGKey(0)}, feats0, train=False)
    engine = StreamingEngine(model, variables, cfg, frontend, spec=model_spec("res8"), fused_trunk=fused)
    return engine, model, variables


def test_fused_is_default_for_res8():
    engine, _, _ = _res8_engine()
    assert engine.fused_trunk


def test_fused_matches_naive_slice_oracle(rng):
    """Cumsum windowed pooling == naively slicing the trunk per window."""
    import jax

    from howl_tpu.ops.frontend import log_mel_spectrogram

    engine, model, variables = _res8_engine()
    audio = (rng.standard_normal((2, 32000)) * 0.1).astype(np.float32)
    probs = np.asarray(engine.score_batch(audio)["probs"])  # (B, n_win, L)

    feats = np.asarray(log_mel_spectrogram(audio, engine.frontend, stacked=True))
    trunk = np.asarray(model.apply(variables, feats, train=False, method="trunk_features"))
    tfm = trunk.mean(axis=2)  # (B, T', maps)
    span = engine.window_frames // 3
    naive = []
    for i in range(probs.shape[1]):
        s = int(np.clip(round(i * engine.stride_frames / 3), 0, tfm.shape[1] - span))
        naive.append(tfm[:, s : s + span].mean(axis=1))
    logits = np.asarray(model.apply(variables, np.stack(naive, axis=1), method="head"))
    oracle = np.asarray(jax.nn.softmax(logits, -1))
    np.testing.assert_allclose(probs, oracle, atol=1e-5)


def test_fused_windows_remain_local(rng):
    """Perturbing audio far outside a window's receptive field leaves its
    posterior unchanged (trunk context is bounded, not global)."""
    engine, _, _ = _res8_engine()
    audio = (rng.standard_normal((2, 32000)) * 0.1).astype(np.float32)
    p1 = np.asarray(engine.score_batch(audio)["probs"])
    audio2 = audio.copy()
    audio2[:, :4000] += 0.2  # >1.5 s away from the last window + receptive field
    p2 = np.asarray(engine.score_batch(audio2)["probs"])
    np.testing.assert_allclose(p1[:, -1], p2[:, -1], atol=1e-5)


def test_short_clip_smaller_than_window(rng):
    engine, _, _ = _res8_engine()
    audio = (rng.standard_normal((1, 4000)) * 0.1).astype(np.float32)
    out = engine.infer_batch(audio)
    assert np.asarray(out["probs"]).shape[1] == 1
    assert np.isfinite(np.asarray(out["probs"])).all()


@pytest.mark.slow
def test_fused_trunk_train_and_serve_end_to_end(tmp_path, monkeypatch):
    """Train res8 in trunk mode (--fused-trunk context segments) and serve
    fused: perfect detection on the synthetic corpus, AND the fused engine's
    decisions match the legacy per-window engine's on every eval clip."""
    corpus = make_wakeword_corpus(tmp_path / "ww", vocab=("hey", "fire", "fox"), n_positive=12, n_negative=12)
    ws = tmp_path / "ws"
    for k, v in {
        "VOCAB": '["hey","fire","fox"]',
        "INFERENCE_SEQUENCE": "[0,1,2]",
        "NUM_EPOCHS": "40",
        "BATCH_SIZE": "16",
        "LEARNING_RATE": "0.02",
        "LR_DECAY": "0.98",
        "MAX_WINDOW_SIZE_SECONDS": "0.5",
        "EVAL_STRIDE_SIZE_SECONDS": "0.063",
        "NUM_MELS": "40",
        "INFERENCE_THRESHOLD": "0",
        "TOLERANCE_WINDOW_MS": "500",
    }.items():
        monkeypatch.setenv(k, v)
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()
    from howl_tpu.training.run.train import run

    results = run(
        [
            "--model", "res8", "--workspace", str(ws), "-i", str(corpus),
            "--eval-freq", "0", "--steps-per-epoch", "10", "--no-augment", "--fused-trunk",
        ]
    )
    assert results["test_pos"]["tp"] == 3, results
    assert results["dev_pos"]["tp"] == 3, results
    assert results["dev_neg"]["fp"] == 0, results
    assert results["test_neg"]["fp"] == 0, results

    # decision equivalence fused vs legacy on the trained model
    import jax

    from howl_tpu.data.dataset.dataset_loader import WakeWordDatasetLoader
    from howl_tpu.context import InferenceContext
    from howl_tpu.models import create_model
    from howl_tpu.workspace import Workspace

    ctx = InferenceContext(vocab=["hey", "fire", "fox"], token_type="word")
    model = create_model("res8", num_labels=ctx.num_labels)
    feats0 = np.zeros((1, 3, 40, 41), np.float32)
    template = model.init({"params": jax.random.PRNGKey(0)}, feats0, train=False)
    variables = Workspace(ws, delete_existing=False).load_model(template, best=True)

    engine_f, _, _ = _res8_engine(variables=variables, fused=True)
    engine_l, _, _ = _res8_engine(variables=variables, fused=False)
    loader = WakeWordDatasetLoader()
    _, dev, test = loader.load_splits(corpus, sample_rate=16000, mono=True, frame_labeler=ctx.labeler)
    clips = [dev[i].audio_data for i in range(len(dev))] + [test[i].audio_data for i in range(len(test))]
    n = max(len(c) for c in clips)
    batch = np.zeros((len(clips), n), np.float32)
    lengths = np.zeros(len(clips), np.int64)
    for i, c in enumerate(clips):
        batch[i, : len(c)] = c
        lengths[i] = len(c)
    det_f = np.asarray(engine_f.infer_batch(batch, lengths)["detected"])
    det_l = np.asarray(engine_l.infer_batch(batch, lengths)["detected"])
    np.testing.assert_array_equal(det_f, det_l)


@pytest.mark.slow
def test_fused_trunk_with_timestretch_and_noise(tmp_path, monkeypatch):
    """All round-2 train-chain features together: trunk-mode context segments
    + host phase-vocoder timestretch + device noise mixing + noisy eval."""
    from tests.fixtures import make_noise_dir

    corpus = make_wakeword_corpus(tmp_path / "ww", n_positive=6, n_negative=6)
    noise = make_noise_dir(tmp_path / "noise")
    for k, v in {
        "VOCAB": '["hey","fire","fox"]',
        "INFERENCE_SEQUENCE": "[0,1,2]",
        "NUM_EPOCHS": "2",
        "BATCH_SIZE": "4",
        "MAX_WINDOW_SIZE_SECONDS": "0.5",
        "NUM_MELS": "40",
        "USE_NOISE_DATASET": "true",
        "NOISE_DATASET_PATH": str(noise),
    }.items():
        monkeypatch.setenv(k, v)
    from howl_tpu.settings import SETTINGS

    SETTINGS.reset()
    from howl_tpu.training.run.train import run

    results = run(
        [
            "--model", "res8", "--workspace", str(tmp_path / "ws"), "-i", str(corpus),
            "--eval-freq", "0", "--steps-per-epoch", "2", "--fused-trunk", "--use-timestretch",
        ]
    )
    # pipeline completes through every stage: clean + noisy eval sets scored
    assert {"dev_pos", "dev_neg", "test_pos", "test_neg", "dev_noisy_pos", "test_noisy_neg"} <= set(results)
    assert (tmp_path / "ws" / "model-best.flax").exists()


@pytest.mark.slow
def test_fused_infer_batch_matches_two_stage_path():
    """infer_batch runs scoring -> weights -> validity -> smoothing+FSM as ONE
    jitted dispatch; it must agree exactly with the cached-posterior path
    (score_batch + detect_from_scores), including threshold overrides and
    partial-length masking."""
    import numpy as np

    engine, _, _ = _res8_engine(clip_samples=24000)
    rng = np.random.default_rng(7)
    audio = rng.standard_normal((5, 24000)).astype(np.float32) * 0.1
    lengths = np.array([24000, 9000, 24000, 1500, 20000], np.int32)

    for threshold in (None, 0.0, 0.35, 0.9):
        fused = engine.infer_batch(audio, lengths=lengths, threshold=threshold)
        scores = engine.score_batch(audio, lengths=lengths)
        staged = engine.detect_from_scores(scores, threshold=threshold)
        np.testing.assert_array_equal(np.asarray(fused["detected"]), np.asarray(staged["detected"]))
        np.testing.assert_array_equal(np.asarray(fused["labels"]), np.asarray(staged["labels"]))
        np.testing.assert_array_equal(np.asarray(fused["fired"]), np.asarray(staged["fired"]))
        np.testing.assert_array_equal(
            np.asarray(fused["first_fire_step"]), np.asarray(staged["first_fire_step"])
        )
        np.testing.assert_allclose(
            np.asarray(fused["probs"]), np.asarray(staged["probs"]), rtol=1e-6, atol=1e-6
        )
        np.testing.assert_allclose(fused["times_ms"], staged["times_ms"])

    # lengths=None == full-length lengths (the fused mask reduces to all-true)
    full = engine.infer_batch(audio)
    explicit = engine.infer_batch(audio, lengths=np.full((5,), 24000, np.int32))
    np.testing.assert_array_equal(np.asarray(full["detected"]), np.asarray(explicit["detected"]))
    np.testing.assert_array_equal(np.asarray(full["labels"]), np.asarray(explicit["labels"]))


@pytest.mark.slow
def test_threshold_sweep_one_dispatch_matches_loop():
    """infer_sweep_batch (one fused dispatch, thresholds vmapped over the FSM)
    must agree per-threshold with both the detect_from_scores loop and the
    fused single-threshold infer_batch (VERDICT.md round-2 item #4)."""
    import numpy as np

    engine, _, _ = _res8_engine(clip_samples=24000)
    rng = np.random.default_rng(11)
    audio = rng.standard_normal((6, 24000)).astype(np.float32) * 0.1
    lengths = np.array([24000, 9000, 24000, 1500, 20000, 12345], np.int32)
    thresholds = [0.0, 0.05, 0.25, 0.3, 0.5, 0.75, 0.9, 1.0]

    swept = engine.infer_sweep_batch(audio, lengths, thresholds)  # (K, B)
    assert swept.shape == (len(thresholds), 6)

    scores = engine.score_batch(audio, lengths=lengths)
    cached_sweep = engine.detect_sweep_from_scores(scores, thresholds)
    for k, t in enumerate(thresholds):
        loop = np.asarray(engine.detect_from_scores(scores, threshold=t)["detected"])
        np.testing.assert_array_equal(swept[k], loop, err_msg=f"threshold={t}")
        np.testing.assert_array_equal(np.asarray(cached_sweep["detected"])[k], loop)
        fused = np.asarray(engine.infer_batch(audio, lengths=lengths, threshold=t)["detected"])
        np.testing.assert_array_equal(swept[k], fused, err_msg=f"threshold={t}")
