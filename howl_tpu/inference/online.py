"""Single-stream online engine for live serving.

The batched engines in engine.py score whole clips; the live client instead
feeds one sliding window at a time (ref: FrameInferenceEngine.ingest_frame,
howl/model/inference.py:247-272, driven by HowlClient at a ~62.5 ms hop).
This wraps one jitted step — featurize window -> model -> posteriors ->
detect_step (the same ring-buffer smoothing+FSM the batched path is
property-tested against) — with persistent on-device state between calls.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from howl_tpu.inference.config import EngineConfig, cast_compute_dtype, hop_geometry, ring_steps
from howl_tpu.inference.detect import DetectState, apply_inference_weights, detect_step, init_state
from howl_tpu.models.base import ModelSpec, model_spec
from howl_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram

# Timestamps live in float32 on device; absolute ms since engine start would
# lose sub-stride precision after days of uptime (f32 spacing at 2^28 ms ~
# 3 days is 32 ms > the smoothing tolerances). Engines rebase their clock and
# ring timestamps by _REBASE_DELTA whenever the clock passes _REBASE_AT
# (~70 min, where f32 spacing is still 0.25 ms); the -1e30 empty-slot
# sentinel is unaffected (the subtraction is absorbed in f32).
_REBASE_AT = float(2 ** 22)  # ms
_REBASE_DELTA = float(2 ** 21)  # ms


def _rebase_times(state: DetectState, delta: float) -> DetectState:
    d = jnp.float32(delta)
    return state._replace(pred_times=state.pred_times - d, label_times=state.label_times - d)


def _shard_engine_streams(engine, mesh, state_attrs):
    """Shared shard_streams body: replicate the parameters and split every
    per-stream state array (stream axis 0) over the mesh's ``data`` axis.

    The whole online step is per-stream — frontend rows, model batch rows,
    softmax, and the detect FSM never mix streams — so GSPMD partitions the
    jitted step with ZERO collectives: N chips serve N x the streams at the
    single-chip step latency. Subsequent steps keep the sharding (jit
    propagates it from the operands); no code changes elsewhere.
    """
    from howl_tpu.parallel.mesh import replicate, shard_batch

    n_dev = mesh.shape["data"]
    if engine.num_streams % n_dev:
        raise ValueError(
            f"num_streams={engine.num_streams} must be divisible by the mesh "
            f"data axis size ({n_dev}) for even per-chip stream shards"
        )
    engine.variables = replicate(engine.variables, mesh)
    for attr in state_attrs:
        val = getattr(engine, attr)
        if val is not None:
            setattr(engine, attr, shard_batch(val, mesh))
    return engine


def _score_and_detect(model, spec, cfg, variables, feats, state, t_now, carry, check_offset_ms):
    """Shared step tail: model -> softmax -> inference weights -> detect_step.

    Both online engines funnel through this so smoothing/FSM semantics cannot
    drift between them (they are oracle-tested via the batched path)."""
    if spec.is_recurrent:
        out, new_carry = model.apply(variables, feats, train=False, carry=carry, return_carry=True)
    else:
        out = model.apply(variables, feats, train=False)
        new_carry = carry
    if out.ndim == 3:  # sequential model: use the last frame's logits
        out = out[-1]
    probs = jax.nn.softmax(out.astype(jnp.float32), -1)
    probs = apply_inference_weights(probs, cfg)
    valid = jnp.ones((feats.shape[0],), bool)
    new_state, label, fired_now = detect_step(
        state, probs, t_now, valid, cfg, check_offset_ms=check_offset_ms
    )
    return new_state, label, fired_now, new_carry


class OnlineEngine:
    """Stateful single-stream (or N parallel stream) wakeword scorer."""

    def __init__(
        self,
        model,
        variables,
        cfg: EngineConfig,
        frontend: FrontendConfig,
        zmuv_mean: float = 0.0,
        zmuv_std: float = 1.0,
        spec: Optional[ModelSpec] = None,
        num_streams: int = 1,
        compute_dtype=None,
        use_pallas_frontend: bool = False,
        dft_precision="auto",
        carry_hops: bool = False,
    ):
        """``carry_hops`` (recurrent models only; default False) threads RNN
        state across hops, so each hop's window is scored from the previous
        hop's final hidden state. The default scores every hop's window from
        fresh zero state — the reference's ACTUAL live behavior (its
        streaming_state plumbing is a base-class no-op for lstm/gru/las, ref
        howl/model/base.py:31-36; empirically pinned in
        tests/test_composed_differential_rnn.py) and the same stateless-
        window semantics the offline StreamingEngine default uses, so
        thresholds tuned offline transfer to live serving unchanged. This is
        the per-hop analogue of StreamingEngine's ``carry_windows``."""
        self.model = model
        self.variables = cast_compute_dtype(variables, compute_dtype)
        self.compute_dtype = compute_dtype
        self.cfg = cfg
        self.frontend = frontend
        self.zmuv_mean = float(zmuv_mean)
        self.zmuv_std = float(zmuv_std)
        self.spec = spec or model_spec(getattr(model, "registered_name", "res8"))
        # opt-in, mirroring StreamingEngine: the XLA GEMM chain measured faster
        # than the Mosaic kernel on v5e (see engine.py / tools)
        self._use_pallas = (
            use_pallas_frontend and not self.spec.uses_deltas and jax.devices()[0].platform == "tpu"
        )
        from howl_tpu.inference.config import serving_dft_precision

        self._dft_precision = serving_dft_precision(compute_dtype, dft_precision)
        if carry_hops and not self.spec.is_recurrent:
            raise ValueError(
                f"carry_hops threads RNN state across hops and applies to "
                f"recurrent models only; {self.spec.name!r} is not recurrent"
            )
        self.carry_hops = bool(carry_hops)
        self.num_streams = num_streams
        self.window_samples = int(cfg.max_window_size_ms / 1000 * cfg.sample_rate)
        # hop-quantized step like every other engine (the raw cfg stride
        # would size the rings for 63 ms while the client drives 62.5 ms hops)
        _, _, self.stride_ms = hop_geometry(cfg, frontend)
        self._s_steps, self._w_steps = ring_steps(cfg, self.stride_ms)
        self._step = self._build_step()
        self.reset()

    def reset(self):
        """Clear histories + streaming state (ref inference.py:73-79)."""
        self.state = init_state(self.num_streams, self.cfg.num_labels, self._s_steps, self._w_steps)
        self.carry = None
        self.curr_time = 0.0
        # per-stream results of the LAST ingest, same surface as the per-hop
        # engines (IncrementalOnlineEngine / FusedStreamingOnlineEngine) so
        # serving loops and the hardware A/B tool can read per-stream flags
        self.last_labels = None
        self.last_fired = None

    def shard_streams(self, mesh):
        """Serve the streams SPMD over the mesh's ``data`` axis (see
        _shard_engine_streams). ingest() then feeds all chips in one call."""
        return _shard_engine_streams(self, mesh, ("state", "carry"))

    def _build_step(self):
        model, cfg, frontend, spec = self.model, self.cfg, self.frontend, self.spec
        zmuv_mean, zmuv_std = self.zmuv_mean, self.zmuv_std
        use_pallas, compute_dtype, dft_prec = self._use_pallas, self.compute_dtype, self._dft_precision
        stride_ms = self.stride_ms

        @jax.jit
        def step(variables, audio, state: DetectState, t_now, carry):
            if spec.uses_deltas:
                feats = log_mel_spectrogram(audio, frontend, stacked=True)
                feats = (feats - zmuv_mean) / zmuv_std
            elif use_pallas:
                # fused polyphase mel+ZMUV kernel, same option as StreamingEngine
                from howl_tpu.ops.frontend_pallas import log_mel_spectrogram_pallas

                mels = log_mel_spectrogram_pallas(audio, frontend, zmuv_mean, zmuv_std)
                feats = mels[:, None, :, :]
            else:
                mels = log_mel_spectrogram(audio, frontend, precision=dft_prec)
                feats = ((mels - zmuv_mean) / zmuv_std)[:, None]
            if compute_dtype is not None:
                feats = feats.astype(compute_dtype)
            return _score_and_detect(
                model, spec, cfg, variables, feats, state, t_now, carry,
                check_offset_ms=stride_ms,
            )

        return step

    def ingest(self, window_audio: np.ndarray) -> bool:
        """Feed the current audio window(s); True if the wakeword fired now.

        window_audio: (window_samples,) or (num_streams, window_samples),
        float32 in [-1, 1]. Shorter windows are zero-padded on the left
        (matching how a filling ring buffer presents its content).
        """
        audio = np.asarray(window_audio, np.float32)
        if audio.ndim == 1:
            audio = audio[None, :]
        if audio.shape[0] != self.num_streams:
            raise ValueError(
                f"ingest expects {self.num_streams} stream(s), got {audio.shape[0]} "
                "(a mismatched count would silently broadcast into every stream's state)"
            )
        if audio.shape[-1] < self.window_samples:
            audio = np.pad(audio, ((0, 0), (self.window_samples - audio.shape[-1], 0)))
        audio = audio[:, -self.window_samples :]
        if self.curr_time >= _REBASE_AT:
            self.state = _rebase_times(self.state, _REBASE_DELTA)
            self.curr_time -= _REBASE_DELTA
        self.state, label, fired_now, new_carry = self._step(
            self.variables, audio, self.state, jnp.float32(self.curr_time), self.carry
        )
        if self.carry_hops:
            # stateless default keeps carry None: every hop's window scores
            # from fresh zero RNN state, matching the offline engine (and the
            # reference's actual live behavior — see __init__)
            self.carry = new_carry
        self.curr_time += self.stride_ms
        self.last_labels = np.asarray(label)
        self.last_fired = np.asarray(fired_now)
        return bool(self.last_fired.any())

    def infer(self, window_audio: np.ndarray) -> bool:
        """Reference-API-shaped alias for ingest()."""
        return self.ingest(window_audio)


class IncrementalOnlineEngine:
    """Streaming engine that featurizes ONLY the new audio each step.

    OnlineEngine re-featurizes the whole 0.5 s window every 62.5 ms hop
    (41 frames at defaults, mirroring the reference client handing its full
    ring buffer to ingest_frame — ref howl_client.py:85-94 + inference.py:
    247-272). A stream only gains ``stride_frames`` new frames per hop (5 at
    defaults), so this engine keeps a log-mel frame ring in device state,
    computes just those frames from the newly pushed samples (+ a short audio
    tail), and scores the ring window — an ~8x frontend FLOP cut per step.

    The tail length is chosen so stream frame boundaries land exactly on the
    centered-frame grid of the batched engine's clip-level featurization
    (``tail ≡ n_fft/2 (mod hop)`` with ``n_fft - hop <= tail < n_fft``):
    once the startup frames roll out of the ring, ring contents are bit-exact
    with ``log_mel_spectrogram(stream, center=True)`` frames, so offline
    training/eval features and live serving features match exactly. The
    newest scored frame ends ``tail + hop - n_fft`` samples behind the stream
    head (144 samples = 9 ms at defaults).
    """

    def __init__(
        self,
        model,
        variables,
        cfg: EngineConfig,
        frontend: FrontendConfig,
        zmuv_mean: float = 0.0,
        zmuv_std: float = 1.0,
        spec: Optional[ModelSpec] = None,
        num_streams: int = 1,
        compute_dtype=None,
        dft_precision="auto",
        carry_hops: bool = False,
    ):
        """``carry_hops``: see OnlineEngine — default scores each hop's
        window from fresh zero RNN state (offline/reference parity)."""
        import dataclasses

        self.model = model
        self.variables = cast_compute_dtype(variables, compute_dtype)
        self.compute_dtype = compute_dtype
        self.cfg = cfg
        self.frontend = frontend
        self.zmuv_mean = float(zmuv_mean)
        self.zmuv_std = float(zmuv_std)
        self.spec = spec or model_spec(getattr(model, "registered_name", "res8"))
        if self.spec.uses_deltas:
            raise ValueError(
                "IncrementalOnlineEngine keeps a plain log-mel ring and cannot serve "
                "delta-channel models (las); use OnlineEngine for those"
            )
        from howl_tpu.inference.config import serving_dft_precision

        self._dft_precision = serving_dft_precision(compute_dtype, dft_precision)
        if carry_hops and not self.spec.is_recurrent:
            raise ValueError(
                f"carry_hops threads RNN state across hops and applies to "
                f"recurrent models only; {self.spec.name!r} is not recurrent"
            )
        self.carry_hops = bool(carry_hops)
        self.num_streams = num_streams

        hop, n_fft = frontend.hop_length, frontend.n_fft
        self.window_frames, self.stride_frames, self.stride_ms = hop_geometry(cfg, frontend)
        self.hop_samples = self.stride_frames * hop
        # smallest tail in [n_fft - hop, n_fft) with tail ≡ n_fft//2 (mod hop):
        # exactly stride_frames complete frames per push, on the centered grid
        base = n_fft - hop
        self.tail_samples = base + ((n_fft // 2 - base) % hop)
        self._frontend_nc = dataclasses.replace(frontend, center=False)

        self._s_steps, self._w_steps = ring_steps(cfg, self.stride_ms)
        self._step = self._build_step()
        self.reset()

    def reset(self):
        n, f, w = self.num_streams, self.frontend.n_mels, self.window_frames
        # ring starts as featurized silence (the ZMUV'd log of the offset),
        # matching what a zeroed audio ring buffer would featurize to
        silence = (float(np.log(self.frontend.log_offset)) - self.zmuv_mean) / self.zmuv_std
        self.mel_ring = jnp.full((n, f, w), silence, jnp.float32)
        self.tail = jnp.zeros((n, self.tail_samples), jnp.float32)
        self.state = init_state(n, self.cfg.num_labels, self._s_steps, self._w_steps)
        self.carry = None
        self.curr_time = 0.0
        self.last_labels = None
        self.last_fired = None

    def shard_streams(self, mesh):
        """Serve the streams SPMD over the mesh's ``data`` axis (see
        _shard_engine_streams). push() then feeds all chips in one call."""
        return _shard_engine_streams(self, mesh, ("state", "carry", "tail", "mel_ring"))

    def _build_step(self):
        from howl_tpu.ops.frontend import log_mel_spectrogram as _logmel

        model, cfg, spec = self.model, self.cfg, self.spec
        stride, tail_len, stride_ms = self.stride_frames, self.tail_samples, self.stride_ms
        zmuv_mean, zmuv_std = self.zmuv_mean, self.zmuv_std
        frontend_nc, dft_prec, compute_dtype = self._frontend_nc, self._dft_precision, self.compute_dtype

        @jax.jit
        def step(variables, new_audio, tail, ring, state: DetectState, t_now, carry):
            buf = jnp.concatenate([tail, new_audio], axis=-1)
            mels = _logmel(buf, frontend_nc, precision=dft_prec)  # (N, F, stride)
            mels = (mels - zmuv_mean) / zmuv_std
            ring = jnp.concatenate([ring[..., stride:], mels], axis=-1)  # oldest -> newest
            feats = ring[:, None]
            if compute_dtype is not None:
                feats = feats.astype(compute_dtype)
            new_state, label, fired_now, new_carry = _score_and_detect(
                model, spec, cfg, variables, feats, state, t_now, carry,
                check_offset_ms=stride_ms,
            )
            return buf[..., -tail_len:], ring, new_state, label, fired_now, new_carry

        return step

    def push(self, new_audio: np.ndarray) -> bool:
        """Feed the stream's newest ``hop_samples`` samples per stream; True if
        the wakeword fired this step.

        new_audio: (hop_samples,) or (num_streams, hop_samples) float32.
        """
        audio = np.asarray(new_audio, np.float32)
        if audio.ndim == 1:
            audio = audio[None, :]
        if audio.shape != (self.num_streams, self.hop_samples):
            raise ValueError(f"push expects {(self.num_streams, self.hop_samples)}, got {audio.shape}")
        if self.curr_time >= _REBASE_AT:
            self.state = _rebase_times(self.state, _REBASE_DELTA)
            self.curr_time -= _REBASE_DELTA
        self.tail, self.mel_ring, self.state, label, fired_now, new_carry = self._step(
            self.variables, audio, self.tail, self.mel_ring, self.state,
            jnp.float32(self.curr_time), self.carry,
        )
        if self.carry_hops:
            # stateless default keeps carry None (see OnlineEngine.__init__)
            self.carry = new_carry
        self.curr_time += self.stride_ms
        self.last_labels = label
        # fetch ONCE: the relay charges ~31 ms per device->host fetch, so the
        # serving loop must not pay it again reading last_fired after push()
        self.last_fired = np.asarray(fired_now)  # (num_streams,) fire flags
        return bool(self.last_fired.any())
