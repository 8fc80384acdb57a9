"""Differential test of the decision logic against the ACTUAL reference
`InferenceEngine` (VERDICT.md round-2 item #3).

Round 2 property-tested the batched FSM only against `inference/oracle.py` — a
hand-written port of ref howl/model/inference.py:91-161. If that oracle
misread the reference, every test passed against the wrong spec. Here the
reference engine itself is imported from /root/reference (torch is available;
torchaudio/librosa/torchvision are stubbed — the engine's smoothing + FSM
never touch them) and driven with precomputed posterior frames through its
injectable time seam (`_append_probability_frame(probs, curr_time)` +
`sequence_present(check_time)`, ref inference.py:80-176), exactly as
`FrameInferenceEngine.infer` does (ref inference.py:235-243).

Compared per step against BOTH howl_tpu paths:
  * OracleEngine (the scalar spec used by the fuzz tests), and
  * the batched device path (`smooth_and_detect`).

Covers word mode, phone mode (LabelColoring incl. the colored negative
label), CTC blank skipping, repeat tolerance, tolerance-window expiry, and
inference-window expiry.
"""

from __future__ import annotations

import random
import sys
import types

import numpy as np
import pytest


def _install_stub(name: str, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
        parent_name, _, child = name.rpartition(".")
        if parent_name:
            parent = sys.modules.get(parent_name)
            if parent is not None:
                setattr(parent, child, mod)
    for key, value in attrs.items():
        if not hasattr(mod, key):
            setattr(mod, key, value)
    return mod


@pytest.fixture(scope="module")
def ref():
    """Reference howl.model.inference + howl.context, imported read-only.

    The engine constructor builds a StandardAudioTransform (torchaudio
    MelSpectrogram/ComputeDeltas) and the module graph pulls librosa and
    torchvision — none of which exist in this image and none of which the
    smoothing/FSM code under test touches. Stub them with just enough
    surface for import + construction.
    """
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    import pydantic

    if "BaseSettings" not in pydantic.__dict__:  # v2 moved it to pydantic-settings
        pydantic.BaseSettings = pydantic.BaseModel
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    _install_stub(
        "coloredlogs",
        install=lambda *a, **k: None,
        ColoredFormatter=type("ColoredFormatter", (), {"__init__": lambda self, *a, **k: None}),
    )
    lib = _install_stub("librosa")
    _install_stub("librosa.effects")
    _install_stub("librosa.filters", get_window=lambda *a, **k: np.ones(1), filters=None)
    _install_stub("librosa.util")
    if not hasattr(lib, "effects"):
        lib.effects = sys.modules["librosa.effects"]
    lib.filters = sys.modules["librosa.filters"]
    lib.util = sys.modules["librosa.util"]

    class _MelSpectrogram(nn.Module):
        def __init__(self, n_mels=80, sample_rate=16000, n_fft=512, hop_length=200,
                     f_min=0.0, f_max=None, **kwargs):
            super().__init__()
            self.n_mels, self.sample_rate = n_mels, sample_rate
            self.n_fft, self.hop_length = n_fft, hop_length
            self.win_length = n_fft
            self.f_min, self.f_max = f_min, f_max

    class _ComputeDeltas(nn.Module):
        pass

    _install_stub("torchaudio")
    _install_stub("torchaudio.transforms", MelSpectrogram=_MelSpectrogram, ComputeDeltas=_ComputeDeltas)
    _install_stub("torchvision")
    _install_stub(
        "torchvision.models",
        MobileNetV2=type("MobileNetV2", (), {}),
        mobilenet_v2=lambda *a, **k: None,
    )

    import howl.context as ref_context
    import howl.model.inference as ref_inference
    from howl.settings import SETTINGS as REF_SETTINGS

    torch_nn = nn

    class Ref:
        inference = ref_inference
        context = ref_context
        settings = REF_SETTINGS
        nn = torch_nn

    return Ref


def make_ref_engine(ref, cfg, ref_ctx):
    """Construct the real reference InferenceEngine for an EngineConfig."""
    s = ref.settings.inference_engine
    s.inference_sequence = list(cfg.inference_sequence)
    s.inference_window_ms = cfg.inference_window_ms
    s.smoothing_window_ms = cfg.smoothing_window_ms
    s.tolerance_window_ms = cfg.tolerance_window_ms
    s.inference_threshold = cfg.inference_threshold
    s.inference_weights = None
    model = types.SimpleNamespace(streaming_state=None)
    zmuv = ref.nn.Identity()
    return ref.inference.InferenceEngine(model, zmuv, ref_ctx, time_provider=lambda: 0.0)


def run_ref_engine(engine, probs_seq: np.ndarray, times, check_offset: float):
    """Drive the reference engine frame by frame, mirroring
    FrameInferenceEngine.infer's cadence (append at t, consult the FSM at
    t + stride; ref inference.py:235-243) — or the whole-clip engine's
    (check at t) when check_offset == 0, incl. its blank skip (:204-207)."""
    t_total = probs_seq.shape[0]
    labels = np.full(t_total, -1, np.int64)
    fired = np.zeros(t_total, bool)
    detected = False
    for i in range(t_total):
        probs = probs_seq[i]
        if engine.blank_idx >= 0 and int(probs.argmax()) == engine.blank_idx:
            continue
        labels[i] = engine._append_probability_frame(probs, curr_time=float(times[i]))
        if not detected and engine.sequence_present(float(times[i]) + check_offset):
            fired[i] = True
            detected = True
    return labels, fired


def _our_paths(cfg, probs_seq: np.ndarray, times, check_offset_is_stride: bool):
    from howl_tpu.inference.detect import smooth_and_detect
    from howl_tpu.inference.oracle import OracleEngine

    oracle = OracleEngine(cfg)
    o_labels, o_fired = oracle.run(probs_seq, times, check_offset_is_stride=check_offset_is_stride)
    valid = np.ones((1, probs_seq.shape[0]), bool)
    out = smooth_and_detect(
        probs_seq[None], times, valid, cfg, check_offset_is_stride=check_offset_is_stride
    )
    d_labels = np.asarray(out["labels"])[0]
    d_fired = np.asarray(out["fired"])[0]
    # device fired is per-step (non-sticky); reduce to first-fire like the ref
    d_first = np.zeros_like(d_fired)
    if d_fired.any():
        d_first[np.argmax(d_fired)] = True
    return (o_labels, o_fired), (d_labels, d_first)


def _segmented_posteriors(rnd: random.Random, t_total: int, num_labels: int, sequence):
    """Posterior sequences with label-dominant segments so the FSM actually
    walks: random spans dominated by sequence labels / negatives / noise."""
    rng = np.random.default_rng(rnd.randrange(2**31))
    probs = rng.dirichlet(np.ones(num_labels) * 0.5, size=t_total).astype(np.float32)
    i = 0
    while i < t_total:
        span = rnd.randint(1, 6)
        choice = rnd.random()
        if choice < 0.55:
            lab = rnd.choice(list(sequence))
        elif choice < 0.75:
            lab = rnd.randrange(num_labels)
        else:
            i += span
            continue
        peak = rnd.uniform(0.4, 0.95)
        for j in range(i, min(i + span, t_total)):
            rest = probs[j] * (1.0 - peak) / max(probs[j].sum(), 1e-9)
            probs[j] = rest
            probs[j, lab] += peak
        i += span
    return probs


def _compare_all(ref_engine, cfg, probs, times, check_offset_is_stride, trial):
    stride = float(times[1] - times[0]) if len(times) > 1 else cfg.eval_stride_size_ms
    check_offset = stride if check_offset_is_stride else 0.0
    r_labels, r_fired = run_ref_engine(ref_engine, probs, times, check_offset)
    (o_labels, o_fired), (d_labels, d_fired) = _our_paths(cfg, probs, times, check_offset_is_stride)
    np.testing.assert_array_equal(o_labels, r_labels, err_msg=f"oracle labels vs reference (trial {trial})")
    np.testing.assert_array_equal(o_fired, r_fired, err_msg=f"oracle fire vs reference (trial {trial})")
    np.testing.assert_array_equal(d_labels, r_labels, err_msg=f"device labels vs reference (trial {trial})")
    np.testing.assert_array_equal(d_fired, r_fired, err_msg=f"device fire vs reference (trial {trial})")


@pytest.mark.slow
def test_word_mode_differential(ref):
    """Random configs x random posterior sequences, word mode: per-step labels
    (_get_prediction semantics incl. smoothing max-pool + threshold) and fire
    decisions (sequence_present FSM) match the actual reference engine."""
    from howl_tpu.inference.config import EngineConfig

    ref_ctx = ref.context.InferenceContext(["hey", "fire", "fox"], token_type="word", use_blank=False)
    rnd = random.Random(1234)
    for trial in range(40):
        k = rnd.choice([1, 2, 3])
        stride = rnd.choice([50.0, 62.5, 125.0])
        cfg = EngineConfig(
            inference_sequence=tuple(range(k)),
            inference_window_ms=rnd.choice([500.0, 1000.0, 2000.0]),
            smoothing_window_ms=rnd.choice([50.0, 150.0, 300.0]),
            tolerance_window_ms=rnd.choice([125.0, 250.0, 500.0]),
            inference_threshold=rnd.choice([0.0, 0.3, 0.5, 0.7]),
            eval_stride_size_ms=stride,
            negative_label=ref_ctx.negative_label,
            num_labels=ref_ctx.num_labels,
        )
        t_total = rnd.randint(1, 60)
        times = np.arange(t_total, dtype=np.float64) * stride
        probs = _segmented_posteriors(rnd, t_total, cfg.num_labels, cfg.inference_sequence)
        engine = make_ref_engine(ref, cfg, ref_ctx)
        _compare_all(engine, cfg, probs, times, check_offset_is_stride=True, trial=trial)


@pytest.mark.slow
def test_word_mode_whole_clip_cadence(ref):
    """The whole-clip engine consults the FSM at t (not t + stride),
    ref inference.py:201-208."""
    from howl_tpu.inference.config import EngineConfig

    ref_ctx = ref.context.InferenceContext(["hey", "fire"], token_type="word", use_blank=False)
    rnd = random.Random(99)
    for trial in range(15):
        cfg = EngineConfig(
            inference_sequence=(0, 1),
            inference_window_ms=1000.0,
            smoothing_window_ms=rnd.choice([50.0, 200.0]),
            tolerance_window_ms=250.0,
            inference_threshold=rnd.choice([0.0, 0.4]),
            eval_stride_size_ms=62.5,
            negative_label=ref_ctx.negative_label,
            num_labels=ref_ctx.num_labels,
        )
        t_total = rnd.randint(2, 50)
        times = (np.arange(t_total, dtype=np.float64) + 1) * 62.5
        probs = _segmented_posteriors(rnd, t_total, cfg.num_labels, cfg.inference_sequence)
        engine = make_ref_engine(ref, cfg, ref_ctx)
        _compare_all(engine, cfg, probs, times, check_offset_is_stride=False, trial=trial)


@pytest.mark.slow
def test_blank_label_skip_differential(ref):
    """CTC mode: frames whose argmax is [BLANK] are skipped without touching
    either history (ref inference.py:204-207)."""
    from howl_tpu.inference.config import EngineConfig

    ref_ctx = ref.context.InferenceContext(["hey", "fire"], token_type="word", use_blank=True)
    assert ref_ctx.blank_label >= 0
    rnd = random.Random(5150)
    for trial in range(15):
        cfg = EngineConfig(
            inference_sequence=(0, 1),
            inference_window_ms=1500.0,
            smoothing_window_ms=100.0,
            tolerance_window_ms=250.0,
            inference_threshold=rnd.choice([0.0, 0.35]),
            eval_stride_size_ms=62.5,
            negative_label=ref_ctx.negative_label,
            blank_label=ref_ctx.blank_label,
            num_labels=ref_ctx.num_labels,
        )
        t_total = rnd.randint(5, 50)
        times = np.arange(t_total, dtype=np.float64) * 62.5
        probs = _segmented_posteriors(rnd, t_total, cfg.num_labels, (0, 1, cfg.blank_label))
        engine = make_ref_engine(ref, cfg, ref_ctx)
        _compare_all(engine, cfg, probs, times, check_offset_is_stride=True, trial=trial)


@pytest.mark.slow
def test_phone_mode_coloring_differential(ref, tmp_path, monkeypatch):
    """Phone mode: the smoothed phone argmax maps through LabelColoring to a
    word color; the negative label itself is COLORED before use as the
    below-threshold fallback (ref inference.py:47-50, 156-159 — the exact
    semantics the round-2 advisor flagged)."""
    from howl_tpu.inference.config import EngineConfig

    pdict = tmp_path / "dict.txt"
    pdict.write_text("hey HH EY1\nfire F AY1 ER0\n")
    monkeypatch.setattr(ref.settings.training, "phone_dictionary", str(pdict))
    ref_ctx = ref.context.InferenceContext(["hey", "fire"], token_type="phone", use_blank=False)
    colored_neg = ref_ctx.coloring.color_map[ref_ctx.negative_label]
    label_color_map = tuple(
        ref_ctx.coloring.color_map.get(i, colored_neg) for i in range(ref_ctx.num_labels)
    )
    rnd = random.Random(777)
    for trial in range(15):
        cfg = EngineConfig(
            inference_sequence=(0, 1),  # word colors
            inference_window_ms=1500.0,
            smoothing_window_ms=rnd.choice([50.0, 150.0]),
            tolerance_window_ms=250.0,
            inference_threshold=rnd.choice([0.0, 0.3, 0.6]),
            eval_stride_size_ms=62.5,
            negative_label=colored_neg,
            num_labels=ref_ctx.num_labels,
            label_color_map=label_color_map,
        )
        t_total = rnd.randint(3, 50)
        times = np.arange(t_total, dtype=np.float64) * 62.5
        probs = _segmented_posteriors(rnd, t_total, cfg.num_labels, tuple(range(ref_ctx.num_labels)))
        engine = make_ref_engine(ref, cfg, ref_ctx)
        assert engine.negative_label == colored_neg  # ref colors it at init
        _compare_all(engine, cfg, probs, times, check_offset_is_stride=True, trial=trial)


def test_repeat_tolerance_and_expiry_edges(ref):
    """Hand-crafted sequences hitting the FSM's three branches at exact
    boundaries: repeats of the last matched label refresh last_valid_timestamp
    (ref :129-131), other labels reset the FSM only strictly AFTER the
    tolerance window (:132-136), and entries leave the inference window at
    strictly > inference_window_ms (:109-111)."""
    from howl_tpu.inference.config import EngineConfig

    ref_ctx = ref.context.InferenceContext(["hey", "fire"], token_type="word", use_blank=False)
    neg = ref_ctx.negative_label

    def one_hot(lab, num_labels=ref_ctx.num_labels, peak=0.9):
        p = np.full(num_labels, (1.0 - peak) / (num_labels - 1), np.float32)
        p[lab] = peak
        return p

    stride = 100.0
    cases = []
    # repeat tolerance: hey, hey, hey, (long negative run), fire
    seq = [0, 0, 0, neg, neg, 0, 1]
    cases.append(("repeats refresh", [one_hot(l) for l in seq], 2000.0, 250.0))
    # tolerance expiry: hey, then negatives spanning > tolerance, then fire
    seq = [0, neg, neg, neg, neg, 1]
    cases.append(("tolerance expiry", [one_hot(l) for l in seq], 2000.0, 250.0))
    # boundary: negative exactly AT the tolerance edge does not reset
    seq = [0, neg, neg, 1]
    cases.append(("tolerance boundary", [one_hot(l) for l in seq], 2000.0, 200.0))
    # inference-window expiry: hey ... (window passes) ... fire
    seq = [0] + [neg] * 12 + [1]
    cases.append(("window expiry", [one_hot(l) for l in seq], 600.0, 10000.0))
    # window boundary: fire arrives exactly at the window edge
    seq = [0, neg, 1]
    cases.append(("window boundary", [one_hot(l) for l in seq], 300.0, 10000.0))

    for name, frames, window_ms, tolerance_ms in cases:
        cfg = EngineConfig(
            inference_sequence=(0, 1),
            inference_window_ms=window_ms,
            smoothing_window_ms=50.0,  # < stride: no cross-frame smoothing
            tolerance_window_ms=tolerance_ms,
            inference_threshold=0.0,
            eval_stride_size_ms=stride,
            negative_label=neg,
            num_labels=ref_ctx.num_labels,
        )
        probs = np.stack(frames)
        times = np.arange(len(frames), dtype=np.float64) * stride
        engine = make_ref_engine(ref, cfg, ref_ctx)
        r_labels, r_fired = run_ref_engine(engine, probs, times, stride)
        (o_labels, o_fired), (d_labels, d_fired) = _our_paths(cfg, probs, times, True)
        np.testing.assert_array_equal(o_labels, r_labels, err_msg=f"oracle labels: {name}")
        np.testing.assert_array_equal(o_fired, r_fired, err_msg=f"oracle fire: {name}")
        np.testing.assert_array_equal(d_labels, r_labels, err_msg=f"device labels: {name}")
        np.testing.assert_array_equal(d_fired, r_fired, err_msg=f"device fire: {name}")
