"""Composed audio→decision differential for the RECURRENT families
(VERDICT r4 missing #1): both reference serving compositions that involve
RNN streaming state, driven end-to-end from real audio with imported weights.

Leg A — windowed lstm. Writing this differential surfaced an upstream
SILENT BUG this suite now pins from both sides: the reference builds every
model ``.streaming()`` (ref training/run/train.py:246) and its engines
plumb ``model.streaming_state`` through every window (ref
howl/model/inference.py:257-261), but SimpleLstm/SimpleGru/LAS never
override the base-class property — whose getter returns None and whose
setter is a NO-OP (ref base.py:31-36; only SequentialLstm overrides it,
rnn.py:52-57). The reference's windowed recurrent scoring is therefore
STATELESS per window in practice. Three tests pin the full picture:

  * default (parity): our stateless mega-batch windows equal the stock
    reference engine exactly — labels, decisions, steps, timestamps;
  * the no-op itself: driving the stock reference with is_streaming
    toggled changes nothing (empirical proof of the upstream bug);
  * carry_windows=True: our cross-window `lax.scan` carry equals the
    reference run with the property FIXED (the behavior its engine code
    intends) — the state-carry x stride seam, pinned end to end.

Legs C/D — windowed gru and las: unlike SimpleLstm, whose forward at least
branches on ``is_streaming`` (ref rnn.py:84-89), SimpleGru and LASClassifier
never touch streaming state at all (ref rnn.py:107-130, 206-222), so the
stateless windowed composition is their ONLY reference behavior. Each gets
the same full audio→decision differential as leg A's default (gru pins the
conv-encoder x packed-GRU x lengths(+4, maxpool-halved) seam; las pins the
3-channel delta stack x biLSTM x length-masked attention seam — las is the
one family whose engine features are the (log-mels, Δ, ΔΔ) stack, so its
leg drives the reference through ``_GoldenStdStacked``) plus one empirical
is_streaming-toggle no-op pin.

Leg B — whole-clip + CTC blank skipping (seq-lstm): the reference pairs
sequential models with ``InferenceEngine.infer`` (ref inference.py:178-212):
one whole-clip forward, per-frame posteriors at the clip_ms/T cadence,
frames whose argmax is the CTC blank label SKIPPED before the FSM. howl_tpu
mirrors that as ``WholeClipEngine`` with ``cfg.blank_label`` masking
(inference/detect.py). This leg pins the blank-skip x cadence composition.

Same injected seam as the res8 test: the reference's torchaudio feature
extractor is replaced by ``_GoldenStd`` (howl_tpu's golden-validated
frontend); everything else on the reference side is the reference's code.
center=False isolates the composition exactly (see the res8 module
docstring for the geometry argument).
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.fixtures import tone
from tests.test_composed_differential import (  # noqa: F401 — ref_stack fixture
    _FRONTEND_KW,
    _ZMUV,
    _base_cfg,
    _calibrate_tone_labels,
    _compare_stacks,
    _drive_ref,
    _make_clips,
    _our_engine,
    _tone_clip,
    _GoldenStd,
    _GoldenStdStacked,
    ref_stack,
)


# ---------------------------------------------------------------- leg A: lstm


@pytest.fixture(scope="module")
def lstm_pair(ref_stack):
    """One reference torch SimpleLstm (streaming mode, as the reference
    trainer builds it) + its converted flax variables + our model."""
    from howl.model.rnn import SimpleLstm as RefSimpleLstm

    from howl_tpu.compat import torch_state_to_variables
    from howl_tpu.models import create_model

    torch = ref_stack.torch
    torch.manual_seed(20260819)
    torch_model = RefSimpleLstm(4).eval().streaming()
    variables = torch_state_to_variables("lstm", torch_model.state_dict())
    model = create_model("lstm", num_labels=4)
    return torch_model, variables, model


@pytest.mark.slow
def test_composed_lstm_stateless_windows_differential(ref_stack, lstm_pair):
    """Default (parity): the full windowed composition for lstm against the
    STOCK reference FrameInferenceEngine — which scores every window with
    fresh zero RNN state (streaming_state no-op, see module docstring) —
    labels/decisions/steps/timestamps all equal."""
    torch_model, variables, model = lstm_pair
    rng = np.random.default_rng(77)
    dominant = _calibrate_tone_labels(model, variables, rng)
    seq_label = next((l for l in dominant.values() if l != 3), None)
    assert seq_label is not None, f"calibration found only negative labels: {dominant}"

    clips = _make_clips(np.random.default_rng(77))
    for threshold in (0.0, 0.35):
        cfg = _base_cfg(inference_sequence=(seq_label,), inference_threshold=threshold)
        fired = _compare_stacks(ref_stack, torch_model, model, variables, cfg, clips)
        if threshold == 0.0:
            assert any(fired), "no clip fired — differential is vacuous"
            assert not all(fired), "every clip fired — differential is vacuous"


@pytest.mark.slow
def test_reference_lstm_streaming_state_is_noop(ref_stack, lstm_pair):
    """Empirical pin of the upstream bug that sets our parity default: the
    stock reference SimpleLstm's streaming_state property is the base-class
    no-op (ref base.py:31-36), so toggling is_streaming changes NOTHING —
    the reference's windowed lstm scoring is stateless in practice."""
    from howl_tpu.ops.frontend import FrontendConfig

    from tests.test_composed_differential import _build_ref_engine

    torch_model, _variables, _model = lstm_pair
    # the setter silently drops the assignment
    torch_model.streaming_state = ("anything", "at all")
    assert torch_model.streaming_state is None

    cfg = _base_cfg(inference_sequence=())  # never fires: score every window
    engine, _ = _build_ref_engine(
        ref_stack, cfg, FrontendConfig(**_FRONTEND_KW), torch_model, *_ZMUV
    )
    clips = _make_clips(np.random.default_rng(77))
    for clip in clips:
        _, rec_streaming = _drive_ref(ref_stack, engine, clip)
        torch_model.is_streaming = False
        try:
            _, rec_stateless = _drive_ref(ref_stack, engine, clip)
        finally:
            torch_model.is_streaming = True
        assert rec_streaming == rec_stateless, (
            "stock reference lstm windows are NOT stateless — the no-op "
            "property assumption (and our parity default) is wrong"
        )


@pytest.fixture(scope="module")
def carry_lstm_pair(ref_stack, lstm_pair):
    """The same weights in a reference SimpleLstm subclass whose
    streaming_state property actually stores state (what the reference's
    engine plumbing intends, mirroring SequentialLstm's override,
    ref rnn.py:52-57)."""
    from howl.model.rnn import SimpleLstm as RefSimpleLstm

    torch_model, variables, model = lstm_pair

    class RefCarryLstm(RefSimpleLstm):
        @property
        def streaming_state(self):
            return self.hc

        @streaming_state.setter
        def streaming_state(self, x):
            self.hc = x

    carry_model = RefCarryLstm(4).eval().streaming()
    carry_model.load_state_dict(torch_model.state_dict())
    return carry_model, variables, model


@pytest.mark.slow
def test_composed_lstm_carry_windows_differential(ref_stack, carry_lstm_pair):
    """carry_windows=True vs the property-FIXED reference: hx threads
    through every window's LSTM on both sides (ref inference.py:257-261 +
    rnn.py:84-89 with a working streaming_state) — the state-carry x stride
    composition, pinned end to end. Includes a non-vacuity check that the
    carry actually changes windows on these clips."""
    from howl_tpu.ops.frontend import FrontendConfig

    from tests.test_composed_differential import _build_ref_engine

    carry_model, variables, model = carry_lstm_pair
    clips = _make_clips(np.random.default_rng(77))

    # non-vacuity: with the property fixed, the per-window POSTERIORS the
    # engine appends must diverge between streaming and stateless runs —
    # the carry demonstrably flows into what the FSM consumes (labels are
    # argmaxes and may coincide; the differential below still asserts full
    # label/decision equality between the two carrying stacks)
    cfg_all = _base_cfg(inference_sequence=())
    engine, _ = _build_ref_engine(
        ref_stack, cfg_all, FrontendConfig(**_FRONTEND_KW), carry_model, *_ZMUV
    )

    def posteriors(clip):
        engine.reset()
        preds = []
        orig = engine._append_probability_frame

        def recording(prediction, curr_time=None):
            preds.append(np.array(prediction, np.float32))
            return orig(prediction, curr_time=curr_time)

        engine._append_probability_frame = recording
        try:
            engine.infer(ref_stack.torch.from_numpy(clip[None, :]))
        finally:
            del engine._append_probability_frame
        return np.stack(preds) if preds else np.zeros((0, 4), np.float32)

    max_gap = 0.0
    for clip in clips:
        p_streaming = posteriors(clip)
        carry_model.is_streaming = False
        try:
            p_stateless = posteriors(clip)
        finally:
            carry_model.is_streaming = True
        if p_streaming.shape == p_stateless.shape and p_streaming.size:
            max_gap = max(max_gap, float(np.abs(p_streaming - p_stateless).max()))
    assert max_gap > 1e-4, (
        f"fixed-property carry shifted posteriors by only {max_gap} — vacuous"
    )

    rng = np.random.default_rng(77)
    dominant = _calibrate_tone_labels(model, variables, rng)
    seq_label = next((l for l in dominant.values() if l != 3), None)
    assert seq_label is not None
    for threshold in (0.0, 0.35):
        cfg = _base_cfg(inference_sequence=(seq_label,), inference_threshold=threshold)
        _compare_stacks(
            ref_stack, carry_model, model, variables, cfg, clips,
            engine_kwargs={"carry_windows": True},
        )
    assert carry_model.streaming_state is not None  # the carry really ran


# ------------------------------------------------------------ leg B: seq-lstm


@pytest.fixture(scope="module")
def seq_lstm_pair(ref_stack):
    """Reference torch SequentialLstm with a CTC blank context (3 words +
    negative + blank = 5 labels) + converted variables + our model."""
    from howl.model.rnn import SequentialLstm as RefSequentialLstm

    from howl_tpu.compat import torch_state_to_variables
    from howl_tpu.models import create_model

    torch = ref_stack.torch
    torch.manual_seed(20260818)
    torch_model = RefSequentialLstm(5).eval().streaming()
    variables = torch_state_to_variables("seq-lstm", torch_model.state_dict())
    model = create_model("seq-lstm", num_labels=5)
    return torch_model, variables, model


def _build_ref_whole_clip_engine(ref, cfg, frontend, torch_model):
    """The reference's whole-clip InferenceEngine with a use_blank context
    (ref context.py:90-93: blank_label appended after the vocab)."""
    s = ref.settings.inference_engine
    s.inference_sequence = list(cfg.inference_sequence)
    s.inference_window_ms = cfg.inference_window_ms
    s.smoothing_window_ms = cfg.smoothing_window_ms
    s.tolerance_window_ms = cfg.tolerance_window_ms
    s.inference_threshold = cfg.inference_threshold
    s.inference_weights = None
    ctx = ref.context.InferenceContext(["hey", "fire", "fox"], token_type="word", use_blank=True)
    zmuv = ref.ZmuvTransform()
    mean, mean2 = _ZMUV
    with ref.torch.no_grad():
        zmuv.total.fill_(1000.0)
        zmuv.mean.fill_(mean)
        zmuv.mean2.fill_(mean2)
    engine = ref.inference.InferenceEngine(torch_model, zmuv, ctx)
    engine.std = _GoldenStd(ref.torch, frontend)
    return engine, ctx


def _drive_ref_whole_clip(ref, engine, clip: np.ndarray):
    """Run the REAL InferenceEngine.infer on one clip, recording every label
    the engine appended (blank-argmax frames are skipped before the append,
    ref inference.py:203-205)."""
    engine.reset()
    records = []
    orig_append = engine._append_probability_frame

    def recording_append(prediction, curr_time=None):
        label = orig_append(prediction, curr_time=curr_time)
        records.append(label)
        return label

    engine._append_probability_frame = recording_append
    try:
        fired = engine.infer(ref.torch.from_numpy(clip))
    finally:
        del engine._append_probability_frame
    return bool(fired), records


@pytest.mark.slow
def test_composed_seq_lstm_blank_skip_differential(ref_stack, seq_lstm_pair):
    """Whole-clip seq-lstm: per-frame posteriors, CTC blank frames skipped,
    clip_ms/T cadence, FSM — our WholeClipEngine equals the real reference
    InferenceEngine frame for frame."""
    import dataclasses

    from howl_tpu.inference.engine import WholeClipEngine
    from howl_tpu.ops.frontend import FrontendConfig

    torch_model, variables, model = seq_lstm_pair
    frontend = FrontendConfig(**_FRONTEND_KW)

    # calibrate: find a label this model emits on some tone (sequence
    # steering only — every assertion still compares both stacks)
    probe = WholeClipEngine(
        model, variables,
        dataclasses.replace(_base_cfg(), num_labels=5, blank_label=4),
        frontend, zmuv_mean=_ZMUV[0], zmuv_std=float(np.sqrt(_ZMUV[1] - _ZMUV[0] ** 2)),
    )
    rng = np.random.default_rng(55)
    probe_clips = [_tone_clip((f, n), 1.0, rng) for f in (200.0, 440.0, 880.0, 1600.0, 3200.0)
                   for n in (0.0, 0.3)]
    seq_label = None
    for c in probe_clips:
        row = np.asarray(probe.infer_batch(c[None, :])["labels"])[0]
        vals = [int(v) for v in np.unique(row) if v not in (-1, 3, 4)]
        if vals:
            seq_label = vals[0]
            break
    assert seq_label is not None, "no tone produced a non-negative, non-blank label"

    clips = _make_clips(np.random.default_rng(55))
    fired_by_thr, any_blank_skipped = {}, False
    for threshold in (0.0, 0.35, 0.6, 0.85):
        cfg = dataclasses.replace(
            _base_cfg(inference_sequence=(seq_label,), inference_threshold=threshold),
            num_labels=5, blank_label=4,
        )
        engine = WholeClipEngine(
            model, variables, cfg, frontend,
            zmuv_mean=_ZMUV[0], zmuv_std=float(np.sqrt(_ZMUV[1] - _ZMUV[0] ** 2)),
        )
        ref_engine, ctx = _build_ref_whole_clip_engine(ref_stack, cfg, frontend, torch_model)
        assert ctx.blank_label == 4 and ctx.num_labels == 5
        fired_all, blank_skipped = _compare_whole_clip(
            ref_stack, ref_engine, engine, clips
        )
        fired_by_thr[threshold] = fired_all
        any_blank_skipped = any_blank_skipped or blank_skipped
    assert any(fired_by_thr[0.0]), "no clip fired at threshold 0 — vacuous"
    assert not all(
        all(f) for f in fired_by_thr.values()
    ), "every clip fired at every threshold — differential is vacuous"
    assert any_blank_skipped, "no frame was blank-skipped — CTC blank seam untested"


def _compare_whole_clip(ref_stack, ref_engine, engine, clips):
    fired_all, any_blank_skipped = [], False
    for i, clip in enumerate(clips):
        ref_fired, records = _drive_ref_whole_clip(ref_stack, ref_engine, clip)
        fired_all.append(ref_fired)
        # our engine on the exact clip (no padding: the reference scores the
        # clip's true frame count; batching is covered by the res8 leg)
        out = engine.infer_batch(clip[None, :])
        ours_fired = bool(np.asarray(out["detected"])[0])
        labels_row = np.asarray(out["labels"])[0]
        first_fire = int(np.asarray(out["first_fire_step"])[0])
        assert ref_fired == ours_fired, f"clip {i}: fire decision diverged"
        t_scored = labels_row.shape[0]
        if ref_fired:
            # the reference breaks right after the frame that fired
            row = labels_row[: first_fire + 1]
        else:
            row = labels_row
        ours_appended = row[row != -1]
        np.testing.assert_array_equal(
            np.asarray(records), ours_appended,
            err_msg=f"clip {i}: appended (non-blank) label streams diverged",
        )
        if len(records) < (first_fire + 1 if ref_fired else t_scored):
            any_blank_skipped = True
        if ref_fired:
            # fire timestamp: curr_time advances int(clip_ms)/T per frame
            # BEFORE the append (ref inference.py:188,201-208 — note the
            # int() truncation of the clip duration, matched in engine.py)
            delta = float(int(clip.shape[0] / 16000 * 1000)) / t_scored
            assert ref_engine.curr_time == pytest.approx((first_fire + 1) * delta, rel=1e-6)
    return fired_all, any_blank_skipped


# ------------------------------------------------------- legs C/D: gru & las


@pytest.fixture(scope="module")
def gru_pair(ref_stack):
    """Reference torch SimpleGru (conv encoder + packed GRU + MLP,
    ref rnn.py:94-130) + converted flax variables + our model."""
    from howl.model.rnn import SimpleGru as RefSimpleGru

    from howl_tpu.compat import torch_state_to_variables
    from howl_tpu.models import create_model

    torch = ref_stack.torch
    torch.manual_seed(20260821)
    torch_model = RefSimpleGru(4).eval().streaming()
    variables = torch_state_to_variables("gru", torch_model.state_dict())
    model = create_model("gru", num_labels=4)
    return torch_model, variables, model


@pytest.fixture(scope="module")
def las_pair(ref_stack):
    """Reference torch LASClassifier (conv+biLSTM encoder, fixed attention,
    ref rnn.py:194-222) + converted flax variables + our model. The only
    family whose features are the 3-channel (log-mels, Δ, ΔΔ) stack."""
    from howl.model.rnn import LASClassifier as RefLAS

    from howl_tpu.compat import torch_state_to_variables
    from howl_tpu.models import create_model

    torch = ref_stack.torch
    torch.manual_seed(20260820)
    torch_model = RefLAS(4).eval().streaming()
    variables = torch_state_to_variables("las", torch_model.state_dict())
    model = create_model("las", num_labels=4)
    return torch_model, variables, model


def _windowed_differential(ref_stack, pair, std_cls=_GoldenStd):
    """Leg-A-shaped differential body shared by gru and las: calibrate a
    steering label, then assert full label/decision/step/timestamp equality
    at two thresholds with fire/no-fire non-vacuity at threshold 0."""
    torch_model, variables, model = pair
    rng = np.random.default_rng(77)
    dominant = _calibrate_tone_labels(model, variables, rng)
    seq_label = next((l for l in dominant.values() if l != 3), None)
    assert seq_label is not None, f"calibration found only negative labels: {dominant}"

    clips = _make_clips(np.random.default_rng(77))
    for threshold in (0.0, 0.35):
        fired = _compare_stacks(
            ref_stack, torch_model, model, variables,
            _base_cfg(inference_sequence=(seq_label,), inference_threshold=threshold),
            clips, std_cls=std_cls,
        )
        if threshold == 0.0:
            assert any(fired), "no clip fired — differential is vacuous"
            assert not all(fired), "every clip fired — differential is vacuous"


@pytest.mark.slow
def test_composed_gru_windowed_differential(ref_stack, gru_pair):
    """Full windowed composition for gru against the stock reference
    FrameInferenceEngine — the conv-encoder x packed-GRU x lengths(+4,
    maxpool-halved, ref rnn.py:117-126) seam, pinned end to end."""
    _windowed_differential(ref_stack, gru_pair)


@pytest.mark.slow
def test_composed_las_windowed_differential(ref_stack, las_pair):
    """Full windowed composition for las against the stock reference
    FrameInferenceEngine, driven through the 3-channel delta stack
    (_GoldenStdStacked — ref transform.py:280 stacks deltas pre-ZMUV):
    the delta-stack x biLSTM x length-masked-attention seam."""
    _windowed_differential(ref_stack, las_pair, std_cls=_GoldenStdStacked)


@pytest.mark.slow
def test_reference_gru_las_streaming_state_is_noop(ref_stack, gru_pair, las_pair):
    """Empirical pin of the stateless default for the remaining windowed
    recurrent families: SimpleGru and LASClassifier never read streaming
    state in forward (ref rnn.py:107-130, 206-222) and inherit the no-op
    streaming_state property (ref base.py:31-36) — toggling is_streaming
    changes nothing, so the stateless parity default applies zoo-wide."""
    from howl_tpu.ops.frontend import FrontendConfig

    from tests.test_composed_differential import _build_ref_engine

    cfg = _base_cfg(inference_sequence=())  # never fires: score every window
    clips = _make_clips(np.random.default_rng(77))[:2]
    for (torch_model, _v, _m), std_cls in (
        (gru_pair, _GoldenStd), (las_pair, _GoldenStdStacked)
    ):
        torch_model.streaming_state = ("anything", "at all")
        assert torch_model.streaming_state is None  # setter is the base no-op
        engine, _ = _build_ref_engine(
            ref_stack, cfg, FrontendConfig(**_FRONTEND_KW), torch_model, *_ZMUV,
            std_cls=std_cls,
        )
        for clip in clips:
            _, rec_streaming = _drive_ref(ref_stack, engine, clip)
            torch_model.is_streaming = False
            try:
                _, rec_stateless = _drive_ref(ref_stack, engine, clip)
            finally:
                torch_model.is_streaming = True
            assert rec_streaming == rec_stateless, (
                f"stock reference {type(torch_model).__name__} windows are NOT "
                "stateless — the no-op property assumption is wrong"
            )
