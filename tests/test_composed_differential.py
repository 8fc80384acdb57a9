"""Composed audio→decision differential against the ACTUAL reference stack
(VERDICT round-3 missing item #1 / next-round item #5).

Every other parity test is piecewise: frontend vs torchaudio-convention
goldens (test_golden_frontend), imported-weight logit parity
(test_torch_import), FSM vs the real reference engine on stubbed posteriors
(test_reference_engine_parity). This test closes the remaining seam — the
windowing / stride / timestamp composition — by running REAL AUDIO through
the actual reference ``FrameInferenceEngine.infer``
(ref howl/model/inference.py:214-244: audio_utils.stride windowing with
drop_incomplete=True, per-window ingest, curr_time cadence, first-fire
break) and asserting identical per-window labels, fire decisions, and fire
steps against ``StreamingEngine.infer_batch`` on the same clips and the same
weights.

The one injected seam is the reference's ``std`` feature transform
(constructor-built torchaudio MelSpectrogram, injectable per VERDICT:
ref inference.py:223-228 ``self.std``): torchaudio does not exist in this
image, so the stub computes features with howl_tpu's own
``log_mel_spectrogram`` — the implementation pinned against
torchaudio-convention goldens in test_golden_frontend.py. Everything else on
the reference side is the reference's code: ``audio_utils.stride``, the real
``ZmuvTransform``, the real torch ``Res8``, smoothing, and the FSM.

Geometry note: the frontend runs center=False here so that per-window
featurization (reference: re-frame each 8000-sample window) and whole-clip
featurization (ours: one frontend pass + strided frame views) are
mathematically identical — window frame j IS clip frame (5i + j) when the
stride is a whole number of hops. That isolates the windowing seam exactly,
with zero tolerance. The center=True edge-frame deviation is separately
documented (engine.py:20-26) and covered by the wakeword eval.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

from tests.fixtures import tone


@pytest.fixture(scope="module")
def ref_stack():
    """The actual reference FrameInferenceEngine + Res8 + ZmuvTransform,
    imported read-only with the same native-lib stubs the other differential
    suites use (none touched by the code under test)."""
    torch = pytest.importorskip("torch")

    from tests.test_reference_engine_parity import _install_stub

    import pydantic

    if "BaseSettings" not in pydantic.__dict__:
        pydantic.BaseSettings = pydantic.BaseModel
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    _install_stub("coloredlogs", install=lambda *a, **k: None,
                  ColoredFormatter=type("CF", (), {"__init__": lambda self, *a, **k: None}))
    _install_stub("torchvision")
    _install_stub("torchvision.models",
                  MobileNetV2=type("MobileNetV2", (), {}),
                  mobilenet_v2=lambda *a, **k: None)
    # torchaudio/librosa stubs (same surface as test_reference_engine_parity.ref)
    import torch.nn as torch_nn

    nn = torch_nn

    lib = _install_stub("librosa")
    _install_stub("librosa.effects")
    _install_stub("librosa.filters", get_window=lambda *a, **k: np.ones(1), filters=None)
    _install_stub("librosa.util")
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

    _install_stub("torchaudio")
    _install_stub("torchaudio.transforms", MelSpectrogram=_MelSpectrogram,
                  ComputeDeltas=type("ComputeDeltas", (nn.Module,), {}))

    import howl.context as ref_context
    import howl.model.inference as ref_inference
    from howl.data.transform.operator import ZmuvTransform as RefZmuv
    from howl.model.cnn import Res8 as RefRes8
    from howl.settings import SETTINGS as REF_SETTINGS

    torch_mod = torch

    class Ref:
        inference = ref_inference
        context = ref_context
        settings = REF_SETTINGS
        nn = torch_nn
        Res8 = RefRes8
        ZmuvTransform = RefZmuv
        torch = torch_mod

    return Ref


class _GoldenStd:
    """Stand-in for the reference's StandardAudioTransform feature extractor
    (the one injectable seam): computes log-mels with howl_tpu's
    golden-validated frontend on the exact window the reference engine cut
    with audio_utils.stride. Mirrors the nn.Module surface ingest_frame
    touches (ref inference.py:257-260: .to, compute_lengths, __call__)."""

    def __init__(self, torch, frontend):
        self.torch = torch
        self.frontend = frontend

    def to(self, device):  # pylint: disable=invalid-name
        return self

    def eval(self):
        return self

    def compute_lengths(self, lengths):
        return self.torch.tensor(
            [self.frontend.num_frames(int(length)) for length in lengths.tolist()]
        )

    def __call__(self, frame):
        from howl_tpu.ops.frontend import log_mel_spectrogram

        audio = np.asarray(frame.detach().cpu().numpy(), np.float32)  # (1, N)
        mels = np.asarray(log_mel_spectrogram(audio, self.frontend))  # (1, F, T)
        return self.torch.from_numpy(mels[:, None].copy())  # (1, 1, F, T)


class _GoldenStdStacked(_GoldenStd):
    """3-channel variant for models that consume the (log-mels, Δ, ΔΔ) stack
    (las — models/rnn.py uses_deltas=True): the reference's
    StandardAudioTransform stacks deltas on the channel dim BEFORE ZMUV
    (ref howl/data/transform/transform.py:280); ``stacked=True`` is
    howl_tpu's golden-validated twin of that stack."""

    def __call__(self, frame):
        from howl_tpu.ops.frontend import log_mel_spectrogram

        audio = np.asarray(frame.detach().cpu().numpy(), np.float32)  # (1, N)
        feats = np.asarray(
            log_mel_spectrogram(audio, self.frontend, stacked=True)
        )  # (1, 3, F, T)
        return self.torch.from_numpy(feats.copy())


def _build_ref_engine(ref, cfg, frontend, torch_model, zmuv_mean, zmuv_mean2,
                      std_cls=_GoldenStd):
    s = ref.settings.inference_engine
    s.inference_sequence = list(cfg.inference_sequence)
    s.inference_window_ms = cfg.inference_window_ms
    s.smoothing_window_ms = cfg.smoothing_window_ms
    s.tolerance_window_ms = cfg.tolerance_window_ms
    s.inference_threshold = cfg.inference_threshold
    s.inference_weights = None
    ctx = ref.context.InferenceContext(["hey", "fire", "fox"], token_type="word", use_blank=False)
    zmuv = ref.ZmuvTransform()
    with ref.torch.no_grad():
        zmuv.total.fill_(1000.0)
        zmuv.mean.fill_(zmuv_mean)
        zmuv.mean2.fill_(zmuv_mean2)
    engine = ref.inference.FrameInferenceEngine(
        cfg.max_window_size_ms, cfg.eval_stride_size_ms, torch_model, zmuv, ctx
    )
    engine.std = std_cls(ref.torch, frontend)
    return engine, ctx


def _drive_ref(ref, engine, clip: np.ndarray):
    """Run the REAL FrameInferenceEngine.infer on one clip, recording each
    ingested window's label through the instance-attribute seam (infer calls
    self.ingest_frame, ref inference.py:239)."""
    engine.reset()
    records = []
    orig_ingest = engine.ingest_frame

    def recording_ingest(frame, curr_time=None):
        label = orig_ingest(frame, curr_time)
        records.append(label)
        return label

    engine.ingest_frame = recording_ingest
    try:
        fired = engine.infer(ref.torch.from_numpy(clip[None, :]))
    finally:
        del engine.ingest_frame  # restore the bound method
    return bool(fired), records


def _make_clips(rng):
    """Varied real-audio clips: tones, noise, silence, mixes; lengths that
    exercise exact-window, off-stride, and shorter-than-window cases."""
    clips = [
        tone(440.0, seconds=1.5, noise=0.05, rng=rng),                     # 24000
        tone(880.0, seconds=0.5, noise=0.0, rng=rng),                      # 8000: one window
        (rng.standard_normal(8999) * 0.2).astype(np.float32),              # 1 valid + 1 partial
        (rng.standard_normal(7900) * 0.2).astype(np.float32),              # < one window: no fire
        np.zeros(20000, np.float32),                                       # silence
        np.concatenate([tone(300.0, seconds=1.0, rng=rng),
                        tone(1200.0, seconds=2.0, rng=rng)]),              # 48000: crosses window expiry
    ]
    return [np.asarray(c, np.float32) for c in clips]


@pytest.fixture(scope="module")
def res8_pair(ref_stack):
    """One torch Res8 (nontrivial BN running stats) + its converted flax
    variables + our model — shared by every leg."""
    from howl_tpu.compat import res8_torch_state_to_variables
    from howl_tpu.models import create_model

    torch = ref_stack.torch
    torch.manual_seed(20260818)
    torch_model = ref_stack.Res8(4)
    torch_model.train()
    with torch.no_grad():
        for _ in range(3):
            torch_model(torch.randn(4, 1, 40, 38), torch.tensor([38] * 4))
    torch_model.eval()
    variables = res8_torch_state_to_variables(torch_model.state_dict())
    model = create_model("res8", num_labels=4)
    return torch_model, variables, model


_FRONTEND_KW = dict(n_mels=40, center=False)
_ZMUV = (-0.5, 1.5)  # mean, mean2 -> std = sqrt(1.25)


def _our_engine(model, variables, cfg, **engine_kwargs):
    from howl_tpu.inference.engine import StreamingEngine
    from howl_tpu.ops.frontend import FrontendConfig

    mean, mean2 = _ZMUV
    return StreamingEngine(
        model, variables, cfg, FrontendConfig(**_FRONTEND_KW),
        zmuv_mean=mean, zmuv_std=float(np.sqrt(mean2 - mean**2)),
        fused_trunk=False,  # per-window scoring: the exact composition under test
        **engine_kwargs,
    )


def _compare_stacks(ref, torch_model, model, variables, cfg, clips, engine_kwargs=None,
                    std_cls=_GoldenStd):
    """The core differential: both stacks on the same clips/weights; asserts
    identical ingest counts, per-window labels, fire decisions, fire steps,
    and fire timestamps. Returns the per-clip fire decisions."""
    from howl_tpu.ops.frontend import FrontendConfig

    engine = _our_engine(model, variables, cfg, **(engine_kwargs or {}))
    ref_engine, _ = _build_ref_engine(
        ref, cfg, FrontendConfig(**_FRONTEND_KW), torch_model, *_ZMUV, std_cls=std_cls
    )

    max_len = max(c.shape[0] for c in clips)
    batch = np.zeros((len(clips), max_len), np.float32)
    lengths = np.zeros(len(clips), np.int32)
    for i, clip in enumerate(clips):
        batch[i, : clip.shape[0]] = clip
        lengths[i] = clip.shape[0]

    out = engine.infer_batch(batch, lengths=lengths)
    detected = np.asarray(out["detected"])
    labels = np.asarray(out["labels"])
    first_fire = np.asarray(out["first_fire_step"])

    fired_all = []
    for i, clip in enumerate(clips):
        fired, records = _drive_ref(ref, ref_engine, clip)
        fired_all.append(fired)
        # window count: the reference ingests full windows until first fire
        n_full = max((clip.shape[0] - engine.window_samples) // 1000 + 1, 0)
        expected_ingests = (np.argmax(np.asarray(out["fired"])[i]) + 1) if fired else n_full
        assert len(records) == expected_ingests, (
            f"clip {i}: reference ingested {len(records)} windows, expected {expected_ingests}"
        )
        assert fired == bool(detected[i]), f"clip {i}: fire decision diverged"
        if fired:
            # the reference breaks right after the fire check at
            # curr_time == (k+1)*stride for window k (ref inference.py:240-243)
            ref_fire_step = len(records) - 1
            assert ref_fire_step == int(first_fire[i]), f"clip {i}: fire step diverged"
            # fire timestamps: the reference's curr_time at break vs our
            # hop-quantized stride grid — identical at a 5-hop stride
            assert ref_engine.curr_time == pytest.approx((int(first_fire[i]) + 1) * engine.stride_ms)
        # per-window labels match exactly for every window the reference scored
        np.testing.assert_array_equal(
            np.asarray(records), labels[i, : len(records)],
            err_msg=f"clip {i}: per-window labels diverged",
        )
    return fired_all


def _base_cfg(**overrides):
    from howl_tpu.inference.config import EngineConfig

    kwargs = dict(
        inference_sequence=(0,),
        inference_window_ms=1500.0,
        smoothing_window_ms=150.0,
        tolerance_window_ms=500.0,
        inference_threshold=0.0,
        eval_stride_size_ms=62.5,  # exactly 5 hops: both stacks stride 1000 samples
        max_window_size_ms=500.0,
        negative_label=3,
        num_labels=4,
    )
    kwargs.update(overrides)
    return EngineConfig(**kwargs)


def _tone_clip(token, seconds, rng):
    freq, noise = token
    return np.asarray(tone(freq, seconds=seconds, noise=noise, rng=rng), np.float32)


def _calibrate_tone_labels(model, variables, rng):
    """Map (freq, noise) audio tokens -> the dominant smoothed label this
    random-weight model assigns, keeping only tokens whose label is
    UNANIMOUS across windows (boundary-stable). Calibration only steers which
    FSM sequences can complete (keeps the differential non-vacuous); every
    assertion still compares both stacks."""
    tokens = [
        (f, noise)
        for f in (200.0, 440.0, 880.0, 1600.0, 3200.0)
        for noise in (0.0, 0.05, 0.3)
    ]
    engine = _our_engine(model, variables, _base_cfg())
    clips = np.stack([_tone_clip(t, 1.0, rng) for t in tokens])
    labels = np.asarray(engine.infer_batch(clips)["labels"])
    dominant = {}
    for t, row in zip(tokens, labels):
        vals = np.unique(row[row >= 0])
        if len(vals) == 1:
            dominant[t] = int(vals[0])
    return dominant


@pytest.mark.slow
def test_composed_single_label_differential(ref_stack, res8_pair):
    """Leg 1: one-label sequence over a varied clip zoo (tones, noise,
    silence, exact-window / off-stride / short lengths) at thresholds 0 and
    0.35 — decisions, labels, steps, timestamps all equal the real
    FrameInferenceEngine's."""
    torch_model, variables, model = res8_pair
    rng = np.random.default_rng(4321)
    dominant = _calibrate_tone_labels(model, variables, rng)
    seq_label = next((l for l in dominant.values() if l != 3), None)
    assert seq_label is not None, f"calibration found only negative labels: {dominant}"

    clips = _make_clips(np.random.default_rng(4321))
    for threshold in (0.0, 0.35):
        cfg = _base_cfg(inference_sequence=(seq_label,), inference_threshold=threshold)
        fired = _compare_stacks(ref_stack, torch_model, model, variables, cfg, clips)
        if threshold == 0.0:
            # non-vacuity: the zoo must produce both outcomes at threshold 0
            assert any(fired), "no clip fired — differential is vacuous"
            assert not all(fired), "every clip fired — differential is vacuous"


@pytest.mark.slow
def test_composed_two_label_fsm_walk_differential(ref_stack, res8_pair):
    """Leg 2: a two-label FSM sequence walked by a composite two-tone clip —
    the full sequence_present state machine (ordering, tolerance, window
    expiry) driven end-to-end from audio through the real reference stack."""
    torch_model, variables, model = res8_pair
    rng = np.random.default_rng(999)
    dominant = _calibrate_tone_labels(model, variables, rng)
    by_label = {}
    for t, l in dominant.items():
        if l != 3:
            by_label.setdefault(l, t)
    assert len(by_label) >= 2, (
        f"model assigns <2 distinct stable non-negative labels to tones: {dominant}"
    )
    (label_a, tok_a), (label_b, tok_b) = list(by_label.items())[:2]

    def mk(ta, tb):
        return np.concatenate([_tone_clip(ta, 1.0, rng), _tone_clip(tb, 1.5, rng)])

    clips = [
        mk(tok_a, tok_b),                       # a then b: should complete the walk
        mk(tok_b, tok_a),                       # b then a: must NOT fire
        _tone_clip(tok_a, 2.0, rng),            # a alone: no fire
        np.zeros(20000, np.float32),
    ]
    cfg = _base_cfg(
        inference_sequence=(label_a, label_b),
        inference_window_ms=2500.0,
        tolerance_window_ms=1000.0,  # covers the tone-boundary ambiguity region
    )
    fired = _compare_stacks(ref_stack, torch_model, model, variables, cfg, clips)
    assert fired[0], "a->b composite clip did not fire — FSM walk untested"
    assert not fired[1] and not fired[2], "order-insensitive fire: FSM sequence broken"


def test_short_clip_scores_zero_windows(ref_stack):
    """A clip shorter than one window: the reference's stride drops the
    incomplete slice (audio_utils.py:46-47) so infer ingests NOTHING and
    returns False; our engine must agree (all windows masked invalid)."""
    from howl_tpu.compat import res8_torch_state_to_variables
    from howl_tpu.inference.config import EngineConfig
    from howl_tpu.inference.engine import StreamingEngine
    from howl_tpu.models import create_model
    from howl_tpu.ops.frontend import FrontendConfig

    ref = ref_stack
    torch = ref.torch
    torch.manual_seed(7)
    torch_model = ref.Res8(4).eval()
    frontend = FrontendConfig(n_mels=40, center=False)
    cfg = EngineConfig(
        inference_sequence=(0,), inference_window_ms=1500.0,
        smoothing_window_ms=150.0, tolerance_window_ms=500.0,
        inference_threshold=0.0, eval_stride_size_ms=62.5,
        max_window_size_ms=500.0, negative_label=3, num_labels=4,
    )
    ref_engine, _ = _build_ref_engine(ref, cfg, frontend, torch_model, -0.5, 1.5)

    clip = (np.random.default_rng(0).standard_normal(7999) * 0.3).astype(np.float32)
    fired, records = _drive_ref(ref, ref_engine, clip)
    assert not fired and records == []

    variables = res8_torch_state_to_variables(torch_model.state_dict())
    model = create_model("res8", num_labels=4)
    engine = StreamingEngine(
        model, variables, cfg, frontend,
        zmuv_mean=-0.5, zmuv_std=float(np.sqrt(1.25)), fused_trunk=False,
    )
    out = engine.infer_batch(clip[None, :], lengths=np.array([7999]))
    assert not np.asarray(out["detected"])[0]
    assert (np.asarray(out["labels"])[0] == -1).all()
