"""StreamingEngine across model families: lstm/gru carry state across windows,
las consumes deltas, seq models run the whole-clip path."""

import jax
import numpy as np
import pytest

from howl_tpu.inference import EngineConfig, StreamingEngine
from howl_tpu.models import create_model
from howl_tpu.models.base import model_spec
from howl_tpu.ops.frontend import FrontendConfig
from howl_tpu.training.step import StepConfig, featurize


def _engine_for(name, num_labels=3, eval_stride_size_ms=125.0, **engine_kwargs):
    cfg = EngineConfig(
        inference_sequence=(0, 1),
        max_window_size_ms=500.0,
        eval_stride_size_ms=eval_stride_size_ms,
        negative_label=2,
        num_labels=num_labels,
    )
    frontend = FrontendConfig(n_mels=40)
    model = create_model(name, num_labels=num_labels)
    feats0 = featurize(
        np.zeros((1, 8000), np.float32),
        StepConfig(frontend=frontend, zmuv_mean=0.0, zmuv_std=1.0, use_vtlp=False),
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats0, train=False)
    return StreamingEngine(model, variables, cfg, frontend, spec=model_spec(name), **engine_kwargs)


@pytest.mark.parametrize(
    "name", ["lstm", pytest.param("gru", marks=pytest.mark.slow)]
)
def test_recurrent_engine_carry_windows_opt_in(name, rng):
    """carry_windows=True threads RNN state across windows (the behavior the
    reference's engine plumbing INTENDS but silently never delivers for
    lstm/gru — their streaming_state property is the base-class no-op, ref
    base.py:31-36). Two non-overlapping windows so the carried state hasn't
    washed out by the end of the second window."""
    engine = _engine_for(name, eval_stride_size_ms=500.0, carry_windows=True)
    audio = (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)
    out = engine.infer_batch(audio)
    assert np.asarray(out["probs"]).shape == (2, 2, 3)
    # state carry means a window's posterior depends on EARLIER audio:
    # change only the first 0.5 s and the second window must shift too
    audio2 = audio.copy()
    audio2[:, :8000] += 1.0
    out2 = engine.infer_batch(audio2)
    p1 = np.asarray(out["probs"])
    p2 = np.asarray(out2["probs"])
    assert np.abs(p1[:, -1] - p2[:, -1]).max() > 1e-5, "no state carried across windows"


@pytest.mark.parametrize("name", ["lstm", "gru"])
def test_recurrent_engine_default_matches_reference_stateless_windows(name, rng):
    """Default (parity): windows are scored with fresh zero RNN state, like
    the reference actually does (streaming_state no-op, empirically pinned
    in test_composed_differential_rnn.py) — a window's posterior must NOT
    depend on earlier audio."""
    engine = _engine_for(name, eval_stride_size_ms=500.0)
    audio = (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)
    out = engine.infer_batch(audio)
    audio2 = audio.copy()
    # guard band: clip-level featurization (center=True) shares frames up to
    # n_fft/2 samples across the window boundary at 8000 (the documented
    # engine deviation #1) — stop the perturbation before frame 40's support
    audio2[:, :7700] += 1.0
    out2 = engine.infer_batch(audio2)
    p1 = np.asarray(out["probs"])
    p2 = np.asarray(out2["probs"])
    np.testing.assert_allclose(p1[:, -1], p2[:, -1], atol=1e-5)


def test_static_engine_windows_independent(rng):
    engine = _engine_for("res8")
    audio = (rng.standard_normal((2, 32000)) * 0.1).astype(np.float32)
    out = engine.infer_batch(audio)
    audio2 = audio.copy()
    audio2[:, :4000] += 0.2  # perturb audio fully outside the last window
    out2 = engine.infer_batch(audio2)
    p1 = np.asarray(out["probs"])
    p2 = np.asarray(out2["probs"])
    np.testing.assert_allclose(p1[:, -1], p2[:, -1], atol=1e-5)


@pytest.mark.slow
def test_las_engine_runs(rng):
    engine = _engine_for("las")
    assert not engine._use_pallas or jax.devices()[0].platform != "cpu"
    audio = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)
    out = engine.infer_batch(audio)
    assert np.isfinite(np.asarray(out["probs"])).all()


def test_seq_lstm_whole_clip_engine(rng):
    engine = _engine_for("seq-lstm")
    audio = (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)
    out = engine.infer_batch(audio, lengths=np.array([16000, 8000]))
    probs = np.asarray(out["probs"])
    # per-frame posteriors over the whole clip (81 frames at 16000 samples)
    assert probs.shape[1] == 81
    # second clip: frames past its true length are masked out of decisions
    labels = np.asarray(out["labels"])
    assert (labels[1, 45:] == -1).all()


def test_short_clip_padded_not_fabricated(rng):
    """Clips shorter than one window are right-padded with silence — the
    window gather must not clamp-duplicate the last frame, and partial
    windows are invalid: like the reference (stride drop_incomplete=True,
    ref inference.py:234 + audio_utils.py:46-47) a short clip never fires."""
    engine = _engine_for("res8")
    short = (rng.standard_normal((2, 4800)) * 0.1).astype(np.float32)  # 0.3 s < 0.5 s window
    out = engine.infer_batch(short)
    probs = np.asarray(out["probs"])
    assert probs.shape[1] == 1  # exactly one (padded) window
    assert np.isfinite(probs).all()
    # the same clip zero-extended by hand scores identically: proves the
    # engine padded rather than fabricated frames
    full = np.zeros((2, (engine.window_frames - 1) * engine.frontend.hop_length), np.float32)
    full[:, :4800] = short
    ref = engine.infer_batch(full, lengths=np.array([4800, 4800]))
    np.testing.assert_allclose(probs, np.asarray(ref["probs"]), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out["detected"]), np.asarray(ref["detected"]))
