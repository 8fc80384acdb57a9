"""Batched streaming wake-word engines.

Replaces the reference's per-clip, per-window Python loops
(ref: howl/model/inference.py:214-244 FrameInferenceEngine — the primary
throughput bottleneck called out in SURVEY.md §3.1) with device programs that
score B streams concurrently:

  * features are computed ONCE per clip (one fused frontend pass); sliding
    windows become strided views over the frame axis — at the default geometry
    (41-frame windows every 5 frames) this alone removes ~8x redundant STFT
    work the reference re-does per window;
  * trunk-capable models (res8) also run their conv trunk ONCE per clip, with
    per-window logits from cumsum windowed pooling over trunk features —
    removing the matching ~8x conv redundancy too (see fused_trunk below);
  * other static models score ALL windows of ALL streams as one mega-batch
    (B*n_windows, ...) — maximal MXU occupancy;
  * recurrent models scan frames with an explicit carry;
  * smoothing + FSM run as a `lax.scan` over steps (see detect.py).

Deviations from the reference, both documented and quality-checked by the
wakeword eval: (1) windows are cut from clip-level mel frames instead of
re-STFT'ing each window with its own reflect padding (edge frames differ
slightly); (2) the window stride is quantized to whole hops
(62.5 ms instead of 63 ms at defaults) — FSM timestamps use the true quantized
stride so the ms-window semantics stay exact.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from howl_tpu.inference.config import EngineConfig
from howl_tpu.inference.detect import (
    _smooth_and_detect_parallel,
    _smooth_and_detect_sweep,
    apply_inference_weights,
    smooth_and_detect,
    smooth_and_detect_sweep,
)
from howl_tpu.models.base import ModelSpec, model_spec
from howl_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram


class StreamingEngine:
    """FrameInferenceEngine parity: sliding-window scoring + smoothing + FSM."""

    def __init__(
        self,
        model,
        variables,
        cfg: EngineConfig,
        frontend: FrontendConfig,
        zmuv_mean: float = 0.0,
        zmuv_std: float = 1.0,
        spec: Optional[ModelSpec] = None,
        compute_dtype=None,
        fused_trunk: Optional[bool] = None,
        use_pallas_frontend: bool = False,
        pallas_precision="bf16",
        dft_precision="auto",
        carry_windows: bool = False,
        use_pallas_stem: bool = False,
        use_int8_trunk: bool = False,
        int8_calibration_audio=None,
    ):
        """``compute_dtype=jnp.bfloat16`` casts features and model parameters
        for scoring — roughly doubles MXU conv throughput on TPU; posteriors
        and the decision logic stay f32. Detection-equivalence should be
        validated per model (smoothing max-pooling absorbs small logit drift).

        ``fused_trunk`` (default: auto for models with ``supports_trunk``,
        i.e. res8) runs the conv trunk ONCE over the whole clip and derives
        each window's logits by windowed average pooling over the trunk
        output via cumulative sums — an ~8x FLOP cut over re-convolving
        41-frame windows every 5 frames, and it never materializes the
        (B, n_windows, F, wf) window tensor in HBM. Window spans are rounded
        to the trunk's pooled-frame grid (<=1.5 feature frames of start
        jitter) and interior windows see real clip context instead of the
        isolated window's zero padding; train with --fused-trunk (trunk-mode
        context windows) for exact train/serve alignment. Pass
        ``fused_trunk=False`` to force the legacy per-window mega-batch.

        ``carry_windows`` (recurrent models only; default False) threads the
        RNN state across a clip's strided windows via a `lax.scan`. The
        default matches the reference's ACTUAL behavior: although its
        engines plumb ``model.streaming_state`` through every window (ref
        inference.py:257-261) and train.py builds every model
        ``.streaming()`` (ref train.py:246), SimpleLstm/SimpleGru/LAS never
        override the base property, whose getter returns None and whose
        setter is a no-op (ref base.py:31-36; only SequentialLstm overrides
        it, rnn.py:52-57) — so the reference's windowed recurrent scoring is
        stateless per window in practice (empirically pinned:
        tests/test_composed_differential_rnn.py). Stateless windows also
        score as ONE mega-batch instead of a sequential window scan.

        ``use_pallas_stem`` (trunk models only) runs the conv0+relu+avgpool
        stem as the fused Pallas kernel (ops/stem_pallas.py). Standalone the
        kernel measures ~2.25 ms vs ~3.6 for the XLA stem PLUS the Pallas
        path's relayout (batch 512 x 8 s on v5e) — but the same-session
        full-step A/B (tools/ablate_serving_slope.py '+ stem' leg) shows the
        real serving XLA path never pays that relayout: in-step the fused
        stem is worth ~0.1 ms (9.695 -> 9.594 ms full step, ~1%). It stays
        the recommended default because it is never slower and feeds from
        the frontend's native tile layout. Decision equality validated on
        hardware (tools/validate_tpu_decisions.py res8+pallas+stem);
        interpret-mode parity on CPU (tests/test_stem_pallas.py).

        ``use_int8_trunk`` (trunk models only, EXPERIMENTAL) runs the six
        residual convolutions in s8 x s8 -> s32 with static per-layer
        activation scales calibrated from ``int8_calibration_audio`` (a
        (B, samples) f32 array of representative audio, REQUIRED — post-
        training static quantization; ops/int8_trunk.py). Measured 2.16 ->
        1.81 ms standalone at batch 512 x 8 s on v5e
        (tools/bench_trunk_int8.py); validate decisions per deployment and
        check the in-step A/B before production use."""
        from howl_tpu.inference.config import cast_compute_dtype

        self.model = model
        self.variables = cast_compute_dtype(variables, compute_dtype)
        self.compute_dtype = compute_dtype
        self.cfg = cfg
        self.frontend = frontend
        self.zmuv_mean = float(zmuv_mean)
        self.zmuv_std = float(zmuv_std)
        self.spec = spec or model_spec(getattr(model, "registered_name", "res8"))
        # the fused polyphase Pallas kernel is opt-in: at its fast 1-pass
        # bf16 mode (+ pre-pad bf16 cast) it measures ~3.5 ms/iter
        # slope-timed per 512x8 s batch on v5e — ~1.17M x realtime at the
        # frontend alone (tools/bench_frontend_tail_1pass.py), with ~7.5e-2
        # log-mel drift — validate decision equivalence per model before
        # enabling in production (tools/validate_tpu_decisions.py:
        # bf16/bf16x2/None all decision-equal for res8 on hardware)
        self._use_pallas = (
            use_pallas_frontend and not self.spec.uses_deltas and jax.devices()[0].platform == "tpu"
        )
        self._pallas_precision = pallas_precision
        from howl_tpu.inference.config import serving_dft_precision

        self._dft_precision = serving_dft_precision(compute_dtype, dft_precision)
        # window/stride in whole frames (deviation 2 above); single home for
        # the formulas all four engines share
        from howl_tpu.inference.config import hop_geometry

        self.window_frames, self.stride_frames, self.stride_ms = hop_geometry(cfg, frontend)
        # full-window validity (ref parity): FrameInferenceEngine strides with
        # drop_incomplete=True (ref inference.py:234 + audio_utils.py:46-47),
        # so the reference scores ONLY windows with all window_samples real
        # samples — its `< 1000: break` (ref :238) is unreachable. Tail
        # windows with fewer real samples are masked invalid here to match.
        self.window_samples = int(cfg.max_window_size_ms / 1000 * cfg.sample_rate)
        self.fused_trunk = (
            (self.spec.supports_trunk and not self.spec.is_sequential and not self.spec.is_recurrent)
            if fused_trunk is None
            else bool(fused_trunk)
        )
        self.carry_windows = bool(carry_windows)
        # opt-in fused Pallas stem (ops/stem_pallas.py): conv0+relu+avgpool
        # in VMEM. Measured (tools/bench_trunk_kernel_micro.py, v5e,
        # batch 512 x 8 s): the stem is ~3.6 ms of the 5.87 ms XLA trunk at
        # ~1.5% MFU (XLA materializes the ~1.2 GB pre-pool tensor); the
        # fused kernel runs it in ~2.25 ms incl. its XLA im2col prep, and
        # the residual layers stay on XLA's conv emitter (2.28 ms, already
        # near the 45->128 padding floor — fused Pallas residual trunks
        # measured 3-8x slower and were rejected). conv0 weights are folded
        # once at construction; reassigning engine.variables re-folds (and
        # re-quantizes the int8 tensors) via the variables property setter.
        self._use_pallas_stem = False
        self._w0fold = None
        trunk_active = self.fused_trunk and self.spec.supports_trunk
        if (use_pallas_stem or use_int8_trunk) and not trunk_active:
            # never silently serve something other than what was asked for
            raise ValueError(
                "use_pallas_stem/use_int8_trunk apply to the fused-trunk "
                "scorer only (trunk-capable model + fused_trunk enabled); "
                f"got fused_trunk={self.fused_trunk}, "
                f"model={self.spec.name!r} (supports_trunk={self.spec.supports_trunk})"
            )
        if use_pallas_stem:
            self._stem_interpret = jax.devices()[0].platform != "tpu"
            self._use_pallas_stem = True
            self._fold_stem()
        # opt-in int8 residual stack (ops/int8_trunk.py): static post-
        # training quantization — weights per-out-channel at build, per-layer
        # activation scales calibrated from the caller's audio here, once.
        self._int8_params = None
        self._int8_cal = None
        if use_int8_trunk:
            if int8_calibration_audio is None:
                raise ValueError(
                    "use_int8_trunk requires int8_calibration_audio: a "
                    "(B, samples) f32 array of representative audio for "
                    "static activation-scale calibration (ops/int8_trunk.py)"
                )
            self._int8_cal = jnp.asarray(np.asarray(int8_calibration_audio), jnp.float32)
            self._requantize_int8()
        self._score = self._build_scorer()
        self._geom_cache: dict = {}
        self._infer_fn = self._build_infer_fused()

    # ---- baked weights follow variables reassignment ----

    @property
    def variables(self):
        return self._variables

    @variables.setter
    def variables(self, value):
        """The Pallas-stem fold and the int8 weight/scale tensors are DERIVED
        from ``variables``; re-derive them on every reassignment so
        ``engine.variables = ...`` (the replication/sharding pattern, e.g.
        tests/test_int8_trunk.py) can never silently serve a mix of stale
        baked tensors and new parameters. Replication keeps the same values,
        so the re-derivation is a no-op there beyond its (construction-scale)
        cost; a genuinely new checkpoint gets correct folds/scales."""
        self._variables = value
        if getattr(self, "_use_pallas_stem", False):
            self._fold_stem()
        if getattr(self, "_int8_cal", None) is not None:
            self._requantize_int8()

    def _fold_stem(self):
        from howl_tpu.ops.stem_pallas import fold_stem_weights

        kernel = np.asarray(
            jax.device_get(self._variables["params"]["conv0"]["kernel"]), np.float32
        )
        pool = getattr(self.model, "pooling", (3, 4))
        w0 = fold_stem_weights(kernel, n_mels=self.frontend.n_mels, pool_f=pool[1])
        self._w0fold = jnp.asarray(w0, self.compute_dtype or jnp.float32)

    def _requantize_int8(self):
        from howl_tpu.ops.int8_trunk import calibrate_act_scales, quantize_residual_trunk

        s0 = jax.jit(lambda a: self._pooled_stem(self._variables, a))(self._int8_cal)
        act = calibrate_act_scales(s0.astype(jnp.float32), self._variables)
        self._int8_params = quantize_residual_trunk(self._variables, act)

    # ---- scoring ----

    def _featurize(self, audio: jnp.ndarray) -> jnp.ndarray:
        if self.spec.uses_deltas:
            feats = log_mel_spectrogram(audio, self.frontend, stacked=True)  # (B, 3, F, T)
            feats = (feats - self.zmuv_mean) / self.zmuv_std
        elif self._use_pallas:
            # opt-in fused polyphase Pallas kernel: log-mel + ZMUV in one pass
            from howl_tpu.ops.frontend_pallas import log_mel_spectrogram_pallas

            feats = log_mel_spectrogram_pallas(
                audio, self.frontend, self.zmuv_mean, self.zmuv_std,
                precision=self._pallas_precision, out_dtype=self.compute_dtype,
            )[:, None]
        else:
            # models that only read channel 0 skip the delta stack entirely;
            # XLA fuses the ZMUV affine into the log epilogue
            mels = log_mel_spectrogram(audio, self.frontend, precision=self._dft_precision)
            feats = ((mels - self.zmuv_mean) / self.zmuv_std)[:, None]  # (B, 1, F, T)
        if self.compute_dtype is not None:
            feats = feats.astype(self.compute_dtype)
        return feats

    def _featurize_tm(self, audio: jnp.ndarray) -> jnp.ndarray:
        """Time-major (B, T, n_mels) ZMUV'd log-mels for the fused Pallas
        stem — the Pallas frontend's native tile orientation, so the
        (B, F, T) transpose AND the trunk's transpose back both vanish."""
        if self._use_pallas:
            from howl_tpu.ops.frontend_pallas import log_mel_spectrogram_pallas

            return log_mel_spectrogram_pallas(
                audio, self.frontend, self.zmuv_mean, self.zmuv_std,
                precision=self._pallas_precision, out_dtype=self.compute_dtype,
                layout="tm",
            )
        mels = log_mel_spectrogram(audio, self.frontend, precision=self._dft_precision)
        mel_tm = ((mels - self.zmuv_mean) / self.zmuv_std).swapaxes(-1, -2)
        if self.compute_dtype is not None:
            mel_tm = mel_tm.astype(self.compute_dtype)
        return mel_tm

    def _pooled_stem(self, variables, audio: jnp.ndarray) -> jnp.ndarray:
        """(B, samples) audio -> (B, T', F', maps) pooled stem activations,
        via the fused Pallas stem when enabled, else the XLA stem — the
        shared front half of the fused-trunk scorer and the int8 path's
        calibration oracle (both must see the SAME tensor)."""
        if self._use_pallas_stem:
            from howl_tpu.ops.stem_pallas import res8_stem_pallas

            mel_tm = self._featurize_tm(audio)  # (B, T, F)
            return res8_stem_pallas(
                mel_tm, self._w0fold,
                n_mels=self.frontend.n_mels, ch=self.model.num_maps,
                pool_t=self.model.pooling[0], pool_f=self.model.pooling[1],
                interpret=self._stem_interpret,
            )
        feats = self._featurize(audio)  # (B, C, F, T)
        return self.model.apply(variables, feats, method="stem_features")

    def _build_scorer(self):
        model, spec = self.model, self.spec
        wf, sf = self.window_frames, self.stride_frames

        if self.fused_trunk:
            pool_t = getattr(model, "pooling", (3, 4))[0]
            span = max(wf // pool_t, 1)

            @partial(jax.jit, static_argnames=("n_windows",))
            def score_fused(variables, audio, n_windows):
                if self._int8_params is not None:
                    from howl_tpu.ops.int8_trunk import residual_features_int8

                    s0 = self._pooled_stem(variables, audio)
                    trunk = residual_features_int8(
                        s0, self._int8_params, compute_dtype=self.compute_dtype
                    )
                elif self._use_pallas_stem:
                    s0 = self._pooled_stem(variables, audio)
                    trunk = model.apply(variables, s0, train=False, method="residual_features")
                else:
                    feats = self._featurize(audio)  # (B, C, F, T)
                    trunk = model.apply(variables, feats, train=False, method="trunk_features")
                # f32 before the cumsum: bf16 running sums over long clips
                # would leak precision into every window mean
                tf = trunk.astype(jnp.float32).mean(axis=2)  # (B, T', maps)
                tp = tf.shape[1]
                eff = min(span, tp)
                csum = jnp.concatenate([jnp.zeros_like(tf[:, :1]), jnp.cumsum(tf, axis=1)], axis=1)
                starts = np.clip(
                    np.round(np.arange(n_windows) * sf / pool_t).astype(np.int32), 0, tp - eff
                )
                wmean = (csum[:, starts + eff] - csum[:, starts]) / eff  # (B, n_windows, maps)
                logits = model.apply(variables, wmean, method="head")
                return jax.nn.softmax(logits.astype(jnp.float32), -1)  # (B, n_windows, L)

            return score_fused

        @partial(jax.jit, static_argnames=("n_windows",))
        def score(variables, audio, n_windows):
            feats = self._featurize(audio)  # (B, 3, F, T)
            b, c, f, _t = feats.shape
            if spec.is_sequential:
                # per-frame logits over the whole clip in one pass
                out = model.apply(variables, feats, train=False)  # (T', B, L)
                probs = jax.nn.softmax(out.astype(jnp.float32), -1).transpose(1, 0, 2)  # (B, T', L)
                return probs
            # strided window gather -> (B, n_windows, 3, F, wf)
            starts = np.arange(n_windows) * sf
            idx = starts[:, None] + np.arange(wf)[None, :]  # (n_windows, wf)
            windows = feats[:, :, :, idx]  # (B, 3, F, n_windows, wf)
            windows = windows.transpose(0, 3, 1, 2, 4)  # (B, n_windows, 3, F, wf)
            if spec.is_recurrent and self.carry_windows:
                # opt-in: thread the RNN state ACROSS windows — what the
                # reference's engine plumbing INTENDS (model.streaming(),
                # ref inference.py:257-261) but silently never does for
                # lstm/gru/las, whose streaming_state property is the base
                # no-op (ref base.py:31-36; see __init__ docstring). Scan
                # windows chronologically with an explicit carry,
                # vectorized over streams.
                def step(carry, window_feats):
                    logits, new_carry = model.apply(
                        variables, window_feats, train=False, carry=carry, return_carry=True
                    )
                    return new_carry, logits

                logits0, carry0 = model.apply(
                    variables, windows[:, 0], train=False, carry=None, return_carry=True
                )
                if n_windows > 1:
                    _, logits_rest = jax.lax.scan(step, carry0, windows.swapaxes(0, 1)[1:])
                    logits_seq = jnp.concatenate([logits0[None], logits_rest], axis=0)
                else:
                    logits_seq = logits0[None]
                probs = jax.nn.softmax(logits_seq.astype(jnp.float32), -1)  # (n_windows, B, L)
                return probs.swapaxes(0, 1)
            # static models AND (by default) recurrent models: every window
            # scored independently as one mega-batch — the reference's
            # actual windowed behavior for lstm/gru/las (fresh zero RNN
            # state per window: its streaming_state property is a no-op,
            # ref base.py:31-36; pinned by the composed RNN differential)
            flat = windows.reshape(b * n_windows, c, f, wf)
            logits = model.apply(variables, flat, train=False)
            probs = jax.nn.softmax(logits.astype(jnp.float32), -1).reshape(b, n_windows, -1)
            return probs

        return score

    def n_windows(self, num_samples: int) -> int:
        total_frames = self.frontend.num_frames(num_samples)
        return max((total_frames - self.window_frames) // self.stride_frames + 1, 1)

    def _pad_short_clips(self, audio, lengths):
        """Right-pad clips shorter than one window with silence so the strided
        window gather never clamp-duplicates frames (JAX clamps out-of-range
        gather indices, fabricating a window of repeated last frames). The
        returned true lengths keep the full-window validity rule — like the
        reference, a clip shorter than one window yields no scored windows
        and can never fire (ref inference.py:234 + audio_utils.py:46-47).
        Sequential models score per frame and need no padding."""
        if self.spec.is_sequential:
            return audio, lengths
        num = audio.shape[-1]
        min_samples = (self.window_frames - 1) * self.frontend.hop_length
        if num >= min_samples:
            return audio, lengths
        if lengths is None:
            lengths = jnp.full((audio.shape[0],), num, jnp.int32)
        return jnp.pad(audio, ((0, 0), (0, min_samples - num))), lengths

    def _step_geometry(self, batch: int, num_samples: int) -> dict:
        """Host-side step timing + ring geometry for one clip shape (cached).

        Mirrors score_batch's times logic and smooth_and_detect's ring sizing
        so the fully-fused infer path can pass them as static jit args.
        """
        key = (batch, num_samples)
        geom = self._geom_cache.get(key)
        if geom is not None:
            return geom
        cfg = self.cfg
        n_win = self.n_windows(num_samples)
        if self.spec.is_sequential:
            shape = jax.ShapeDtypeStruct((batch, num_samples), jnp.float32)
            t_steps = jax.eval_shape(lambda v, a: self._score(v, a, n_win), self.variables, shape).shape[1]
            # ref truncates the clip duration to whole ms BEFORE dividing by
            # the frame count (delta_ms = int(...)/len, ref inference.py:188)
            clip_ms = float(int(num_samples / cfg.sample_rate * 1000))
            times = np.arange(1, t_steps + 1) * (clip_ms / t_steps)
            check_offset_is_stride = False
        else:
            t_steps = n_win
            times = np.arange(t_steps) * self.stride_ms
            check_offset_is_stride = True
        # one home for the smoothing/FSM ring formulas (detect._ring_geometry)
        # so the fused path and detect_from_scores cannot desynchronize
        from howl_tpu.inference.detect import _ring_geometry

        _, s_steps, w_steps, stride, check_offset = _ring_geometry(times, cfg, check_offset_is_stride)
        geom = {
            "n_win": n_win,
            "times": times.astype(np.float32),
            "stride": stride,
            "check_offset": check_offset,
            "s_steps": s_steps,
            "w_steps": w_steps,
        }
        self._geom_cache[key] = geom
        return geom

    def _score_weight_mask(self, variables, audio, lengths, n_windows):
        """Shared scoring front half of the fused decision programs: model
        posteriors, inference weights, and the per-step validity mask (the
        sequential frame-length clamp vs the reference's full-window stride
        rule, ref inference.py:234 + audio_utils.py:46-47). Single home so
        infer_batch and infer_sweep_batch can never desynchronize."""
        probs = self._score(variables, audio, n_windows)  # (B, T, L)
        t_steps = probs.shape[1]
        probs = apply_inference_weights(probs, self.cfg)
        if self.spec.is_sequential:
            frame_len = self.model.compute_length(lengths // self.frontend.hop_length + 1)
            frame_len = jnp.clip(frame_len, 1, t_steps)
            valid = jnp.arange(t_steps)[None, :] < frame_len[:, None]
        else:
            win_start = jnp.arange(t_steps)[None, :] * self.stride_frames * self.frontend.hop_length
            valid = (lengths[:, None] - win_start) >= self.window_samples
        return probs, valid

    def _build_infer_fused(self):
        """ONE jitted dispatch for the whole decision path: scoring, inference
        weights, validity masking, smoothing + FSM. Keeping every stage in a
        single program matters beyond fusion: each separate device call pays
        fixed dispatch latency (sub-ms over PCIe, ms-scale through remote
        relays), which at this model's size rivals the compute itself."""
        import dataclasses

        static_cfg = dataclasses.replace(self.cfg, inference_threshold=0.0)

        @partial(jax.jit, static_argnames=("n_windows", "s_steps", "w_steps", "stride", "check_offset"))
        def infer_fn(variables, audio, lengths, threshold, n_windows, s_steps, w_steps, stride, check_offset):
            probs, valid = self._score_weight_mask(variables, audio, lengths, n_windows)
            out = _smooth_and_detect_parallel(
                probs, valid, threshold, static_cfg, s_steps, w_steps, stride, check_offset
            )
            out["probs"] = probs
            return out

        return infer_fn

    def _build_infer_sweep_fused(self):
        """Fused scoring + ALL-thresholds detection in one dispatch: the model
        scores once, the (cheap) FSM is vmapped over the thresholds axis.
        One relay round-trip per eval batch instead of 1 + K."""
        import dataclasses

        static_cfg = dataclasses.replace(self.cfg, inference_threshold=0.0)

        @partial(jax.jit, static_argnames=("n_windows", "s_steps", "w_steps", "stride", "check_offset"))
        def sweep_fn(variables, audio, lengths, thresholds, n_windows, s_steps, w_steps, stride, check_offset):
            probs, valid = self._score_weight_mask(variables, audio, lengths, n_windows)
            return _smooth_and_detect_sweep(
                probs, valid, thresholds, static_cfg, s_steps, w_steps, stride, check_offset
            )["detected"]  # (K, B)

        return sweep_fn

    # ---- public API ----

    def score_batch(self, audio, lengths=None) -> dict:
        """Model scoring only: posteriors + step timing + validity.

        Separated from detection so threshold sweeps re-run only the (cheap)
        smoothing+FSM over cached posteriors — the reference re-runs the full
        model per threshold (ref eval_wake_word_detection.py:241-256).
        """
        audio = jnp.asarray(audio)
        audio, lengths = self._pad_short_clips(audio, lengths)
        batch, num_samples = audio.shape
        n_win = self.n_windows(num_samples)
        probs = self._score(self.variables, audio, n_win)  # (B, T, L)
        t_steps = probs.shape[1]
        if self.spec.is_sequential:
            # whole-clip engine cadence: delta = int(clip_ms) / n_frames —
            # the reference truncates to whole ms first (ref inference.py:188)
            clip_ms = float(int(num_samples / self.cfg.sample_rate * 1000))
            delta = clip_ms / t_steps
            times = np.arange(1, t_steps + 1) * delta
            check_offset_is_stride = False
        else:
            times = np.arange(t_steps) * self.stride_ms
            check_offset_is_stride = True
        probs = apply_inference_weights(probs, self.cfg)
        if lengths is not None:
            lengths = jnp.asarray(lengths)
            if self.spec.is_sequential:
                # map true frame counts through the model's time downsampling
                # (seq-cnn pools time; ConvertedStaticModel strides windows)
                frame_len = self.model.compute_length(lengths // self.frontend.hop_length + 1)
                frame_len = jnp.clip(frame_len, 1, t_steps)
                per_step = jnp.arange(t_steps)[None, :] < frame_len[:, None]
            else:
                # window i valid only when FULL (ref strides with
                # drop_incomplete=True, inference.py:234 + audio_utils.py:46-47)
                win_start_samples = jnp.arange(t_steps)[None, :] * self.stride_frames * self.frontend.hop_length
                per_step = (lengths[:, None] - win_start_samples) >= self.window_samples
            valid = per_step
        else:
            valid = jnp.ones((batch, t_steps), bool)
        return {
            "probs": probs,
            "times_ms": times,
            "valid": valid,
            "check_offset_is_stride": check_offset_is_stride,
        }

    def detect_from_scores(self, scores: dict, threshold: Optional[float] = None) -> dict:
        """Smoothing + FSM over cached posteriors, optionally at an overridden
        detection threshold (for sweeps)."""
        import dataclasses

        cfg = self.cfg
        if threshold is not None:
            cfg = dataclasses.replace(cfg, inference_threshold=float(threshold))
        result = smooth_and_detect(
            scores["probs"], scores["times_ms"], scores["valid"], cfg, scores["check_offset_is_stride"]
        )
        result["times_ms"] = scores["times_ms"]
        result["probs"] = scores["probs"]
        return result

    def detect_sweep_from_scores(self, scores: dict, thresholds) -> dict:
        """Smoothing + FSM over cached posteriors at ALL thresholds in ONE
        dispatch (vs one detect_from_scores call per threshold). Outputs carry
        a leading (K,) thresholds axis."""
        return smooth_and_detect_sweep(
            scores["probs"], scores["times_ms"], scores["valid"], thresholds,
            self.cfg, scores["check_offset_is_stride"],
        )

    def infer_sweep_batch(self, audio, lengths=None, thresholds=()) -> np.ndarray:
        """Score B clips and decide at K thresholds, ONE device dispatch total.
        Returns detected (K, B) as a host array."""
        audio = jnp.asarray(audio)
        audio, lengths = self._pad_short_clips(audio, lengths)
        batch, num_samples = audio.shape
        geom = self._step_geometry(batch, num_samples)
        if lengths is None:
            lengths = jnp.full((batch,), num_samples, jnp.int32)
        else:
            lengths = jnp.asarray(lengths)
        if not hasattr(self, "_sweep_fn"):
            self._sweep_fn = self._build_infer_sweep_fused()
        detected = self._sweep_fn(
            self.variables,
            audio,
            lengths,
            jnp.asarray(thresholds, jnp.float32),
            n_windows=geom["n_win"],
            s_steps=geom["s_steps"],
            w_steps=geom["w_steps"],
            stride=geom["stride"],
            check_offset=geom["check_offset"],
        )
        return np.asarray(detected)

    def infer_batch(self, audio, lengths=None, threshold: Optional[float] = None) -> dict:
        """Score B clips; returns detected (B,), first fire step, per-step labels.

        audio: (B, samples) float32 at cfg.sample_rate. lengths: optional true
        sample counts (padding windows are masked out of the decision logic,
        mirroring the reference's partial-window cutoff, inference.py:231-233).

        The whole path (scoring -> weights -> validity -> smoothing+FSM) runs
        as ONE device dispatch; use score_batch + detect_from_scores instead
        when sweeping thresholds over cached posteriors.
        """
        audio = jnp.asarray(audio)
        audio, lengths = self._pad_short_clips(audio, lengths)
        batch, num_samples = audio.shape
        geom = self._step_geometry(batch, num_samples)
        if lengths is None:
            # full-length clips: every window/frame is valid (the masks below
            # reduce to all-true at these lengths, see score_batch)
            lengths = jnp.full((batch,), num_samples, jnp.int32)
        else:
            lengths = jnp.asarray(lengths)
        thr = jnp.float32(self.cfg.inference_threshold if threshold is None else threshold)
        out = dict(
            self._infer_fn(
                self.variables,
                audio,
                lengths,
                thr,
                n_windows=geom["n_win"],
                s_steps=geom["s_steps"],
                w_steps=geom["w_steps"],
                stride=geom["stride"],
                check_offset=geom["check_offset"],
            )
        )
        out["times_ms"] = geom["times"]
        return out

    def infer(self, audio) -> bool:
        """Single-clip convenience (the reference API shape, inference.py:222)."""
        out = self.infer_batch(jnp.asarray(audio)[None, :])
        return bool(np.asarray(out["detected"])[0])


class WholeClipEngine(StreamingEngine):
    """InferenceEngine parity (ref inference.py:19-208): the model consumes the
    whole clip and emits per-frame posteriors (sequential models); blank frames
    are skipped via cfg.blank_label."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        if not self.spec.is_sequential:
            raise ValueError("WholeClipEngine requires a sequential model (seq-lstm / seq-cnn)")
