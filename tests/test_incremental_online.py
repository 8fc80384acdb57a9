"""IncrementalOnlineEngine: per-hop featurization is bit-compatible with the
batched engine's clip-level centered frames, and window scores match a direct
model application on those frames.

The engine's claim (online.py): its log-mel ring, filled hop by hop from live
audio, equals ``log_mel_spectrogram(stream, center=True)`` frames exactly once
startup frames roll out — so offline train/eval features and live serving
features are the same tensors.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from howl_tpu.inference import EngineConfig, IncrementalOnlineEngine
from howl_tpu.models import create_model
from howl_tpu.models.base import model_spec
from howl_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram
from howl_tpu.training.step import StepConfig, featurize

CFG = EngineConfig(
    inference_sequence=(0, 1, 2),
    max_window_size_ms=500.0,
    eval_stride_size_ms=62.5,
    negative_label=3,
    num_labels=4,
    inference_threshold=0.0,
    sample_rate=16000,
)
FRONTEND = FrontendConfig(n_mels=40)


def _make(model_name="res8", num_streams=1, **engine_kwargs):
    model = create_model(model_name, num_labels=4)
    feats0 = featurize(
        np.zeros((1, 8000), np.float32),
        StepConfig(frontend=FRONTEND, zmuv_mean=0.0, zmuv_std=1.0, use_vtlp=False),
    )
    variables = model.init({"params": jax.random.PRNGKey(3)}, feats0, train=False)
    eng = IncrementalOnlineEngine(
        model, variables, CFG, FRONTEND, spec=model_spec(model_name),
        num_streams=num_streams, **engine_kwargs,
    )
    return eng, model, variables


def test_geometry():
    eng, _, _ = _make()
    n_fft, hop = FRONTEND.n_fft, FRONTEND.hop_length
    assert eng.stride_frames == 5 and eng.hop_samples == 1000
    assert n_fft - hop <= eng.tail_samples < n_fft
    assert eng.tail_samples % hop == (n_fft // 2) % hop
    # exactly stride_frames complete frames per push
    assert (eng.tail_samples + eng.hop_samples - n_fft) // hop + 1 == eng.stride_frames


def test_ring_matches_clip_level_centered_frames():
    eng, _, _ = _make()
    rng = np.random.default_rng(0)
    clip = rng.standard_normal((1, 48000)).astype(np.float32) * 0.1

    n_push = clip.shape[-1] // eng.hop_samples
    for k in range(n_push):
        eng.push(clip[:, k * eng.hop_samples : (k + 1) * eng.hop_samples])

    ring = np.asarray(eng.mel_ring)[0]  # (F, W)
    ref = np.asarray(log_mel_spectrogram(clip, FRONTEND))[0]  # (F, T) centered
    # newest ring frame is centered frame t_end = stride*k - shift (see online.py)
    shift = (eng.tail_samples + FRONTEND.hop_length - FRONTEND.n_fft // 2) // FRONTEND.hop_length
    t_end = eng.stride_frames * n_push - shift
    expected = ref[:, t_end - eng.window_frames + 1 : t_end + 1]
    np.testing.assert_allclose(ring, expected, rtol=1e-5, atol=1e-5)


def test_labels_match_direct_window_scoring():
    eng, model, variables = _make()
    rng = np.random.default_rng(1)
    clip = rng.standard_normal((1, 40000)).astype(np.float32) * 0.1
    ref = np.asarray(log_mel_spectrogram(clip, FRONTEND))[0]  # (F, T)

    shift = (eng.tail_samples + FRONTEND.hop_length - FRONTEND.n_fft // 2) // FRONTEND.hop_length
    n_push = clip.shape[-1] // eng.hop_samples
    got, want = [], []
    for k in range(1, n_push + 1):
        eng.push(clip[:, (k - 1) * eng.hop_samples : k * eng.hop_samples])
        t_end = eng.stride_frames * k - shift
        start = t_end - eng.window_frames + 1
        if start < 2:  # startup: ring still holds silence-init / zero-pad frames
            continue
        got.append(int(np.asarray(eng.last_labels)[0]))
        window = ref[:, start : t_end + 1][None, None]  # (1, 1, F, W)
        logits = model.apply(variables, jnp.asarray(window), train=False)
        probs = np.asarray(jax.nn.softmax(logits, -1))[0]
        # smoothing window (50 ms) < stride (62.5 ms) -> label is the argmax
        # of this step's posterior alone (threshold 0)
        want.append(int(probs.argmax()))
    assert got == want and len(got) >= 25


def test_multistream_and_recurrent_push():
    """Default: recurrent hops score STATELESS windows (fresh zero RNN state
    per hop — offline/reference parity, see OnlineEngine.__init__);
    carry_hops=True opts into threading state across pushes."""
    eng, _, _ = _make("lstm", num_streams=3)
    rng = np.random.default_rng(2)
    for _ in range(6):
        fired = eng.push(rng.standard_normal((3, eng.hop_samples)).astype(np.float32) * 0.05)
        assert isinstance(fired, bool)
    assert eng.carry is None  # stateless default: no state across pushes
    assert np.asarray(eng.last_labels).shape == (3,)

    carry_eng, _, _ = _make("lstm", num_streams=3, carry_hops=True)
    for _ in range(2):
        carry_eng.push(rng.standard_normal((3, eng.hop_samples)).astype(np.float32) * 0.05)
    assert carry_eng.carry is not None  # opt-in state threads across pushes


def test_recurrent_stateless_hops_are_history_independent():
    """The tune/serve seam carry_hops=False exists for: an lstm window pushed
    through the live engine scores from fresh zero RNN state — exactly the
    offline StreamingEngine's stateless-window semantics (ring frames are
    bit-equal to clip-level frames per the tests above, and zero-state
    scoring is then a pure function of the window) — so the label must not
    depend on what audio preceded the window live."""
    eng, model, variables = _make("lstm")
    rng = np.random.default_rng(9)
    # two different live histories, same final window
    histories = [rng.standard_normal(16000).astype(np.float32) * 0.1 for _ in range(2)]
    final_hop = rng.standard_normal(eng.hop_samples).astype(np.float32) * 0.1
    labels = []
    for hist in histories:
        eng.reset()
        clip = np.concatenate([hist, final_hop])
        for i in range(0, len(clip), eng.hop_samples):
            eng.push(clip[None, i : i + eng.hop_samples])
        labels.append(int(np.asarray(eng.last_labels)[0]))
    assert labels[0] == labels[1], "stateless hop label depends on live history"

    # carry_hops=True is the behavioral toggle: posteriors now depend on
    # history, so at least the carry changes (labels may coincide by chance)
    carry_eng, _, _ = _make("lstm", carry_hops=True)
    carry_eng.push(final_hop[None, :])
    assert carry_eng.carry is not None


def test_carry_hops_requires_recurrent_model():
    with pytest.raises(ValueError, match="recurrent"):
        _make("res8", carry_hops=True)


def test_push_shape_validation():
    eng, _, _ = _make(num_streams=2)
    with pytest.raises(ValueError):
        eng.push(np.zeros((2, 999), np.float32))


@pytest.mark.parametrize(
    "stride_ms,n_mels,window_ms",
    [
        (62.5, 40, 500.0),   # defaults
        (12.5, 40, 500.0),   # stride of a single frame
        (62.5, 80, 500.0),   # 80-mel config
        (125.0, 40, 750.0),  # the 0.75 s default window, coarser stride
    ],
)
def test_ring_parity_across_geometries(stride_ms, n_mels, window_ms):
    """The tail/phase math generalizes: ring == clip-level centered frames for
    every (stride, n_mels, window) geometry, not just the flagship one."""
    frontend = FrontendConfig(n_mels=n_mels)
    cfg = EngineConfig(
        inference_sequence=(0, 1),
        max_window_size_ms=window_ms,
        eval_stride_size_ms=stride_ms,
        negative_label=3,
        num_labels=4,
        sample_rate=16000,
    )
    model = create_model("small-cnn", num_labels=4)
    window_samples = int(window_ms / 1000 * 16000)
    feats0 = featurize(
        np.zeros((1, window_samples), np.float32),
        StepConfig(frontend=frontend, zmuv_mean=0.0, zmuv_std=1.0, use_vtlp=False),
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats0, train=False)
    eng = IncrementalOnlineEngine(
        model, variables, cfg, frontend, spec=model_spec("small-cnn"), num_streams=1
    )

    # geometry invariants
    n_fft, hop = frontend.n_fft, frontend.hop_length
    assert n_fft - hop <= eng.tail_samples < n_fft
    assert eng.tail_samples % hop == (n_fft // 2) % hop
    assert (eng.tail_samples + eng.hop_samples - n_fft) // hop + 1 == eng.stride_frames

    rng = np.random.default_rng(10)
    clip = rng.standard_normal((1, 32000)).astype(np.float32) * 0.1
    n_push = clip.shape[-1] // eng.hop_samples
    for k in range(n_push):
        eng.push(clip[:, k * eng.hop_samples : (k + 1) * eng.hop_samples])

    ring = np.asarray(eng.mel_ring)[0]
    ref = np.asarray(log_mel_spectrogram(clip, frontend))[0]
    shift = (eng.tail_samples + hop - n_fft // 2) // hop
    t_end = eng.stride_frames * n_push - shift
    start = t_end - eng.window_frames + 1
    assert start >= 2, "clip too short for a fully-refreshed ring"
    np.testing.assert_allclose(ring, ref[:, start : t_end + 1], rtol=1e-5, atol=1e-5)


def test_clock_rebase_preserves_detections():
    """The f32-timestamp rebase (~70 min uptime) must not change behavior: a
    stream started just below the rebase threshold produces the same label
    sequence and fires at the same steps as a fresh-epoch stream."""
    import howl_tpu.inference.online as online_mod

    eng_a, model, variables = _make(num_streams=1)
    eng_b = online_mod.IncrementalOnlineEngine(
        model, variables, eng_a.cfg, eng_a.frontend, spec=eng_a.spec, num_streams=1
    )
    # push eng_b to the brink of the rebase: advance its host clock only
    # (state rings hold matching pre-epoch timestamps after a few pushes)
    rng = np.random.default_rng(3)
    warm = rng.standard_normal((1, eng_b.hop_samples)).astype(np.float32) * 0.1
    for _ in range(3):
        eng_b.push(warm)
        eng_a.push(warm)
    shift = online_mod._REBASE_AT - eng_b.curr_time - eng_b.stride_ms  # crosses on next push
    eng_b.curr_time += shift
    eng_b.state = eng_b.state._replace(
        pred_times=eng_b.state.pred_times + np.float32(shift),
        label_times=eng_b.state.label_times + np.float32(shift),
    )
    fires_a, fires_b, labels_a, labels_b = [], [], [], []
    for k in range(24):
        chunk = rng.standard_normal((1, eng_b.hop_samples)).astype(np.float32) * 0.1
        fires_a.append(eng_a.push(chunk))
        fires_b.append(eng_b.push(chunk))
        labels_a.append(np.asarray(eng_a.last_labels).tolist())
        labels_b.append(np.asarray(eng_b.last_labels).tolist())
    assert eng_b.curr_time < online_mod._REBASE_AT  # the rebase actually ran
    assert fires_a == fires_b
    assert labels_a == labels_b
