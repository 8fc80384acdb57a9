"""Streaming-trunk online engine: per-layer conv caches for live serving.

The per-window online engines (online.py) re-run the res8 trunk over the full
41-frame window every 62.5 ms hop, even though a hop only adds ~1.7 pooled
trunk frames — at 65k concurrent streams that recompute is the compute bound
(docs/PERFORMANCE.md). This engine keeps a 4-frame ring per trunk stage
(the streaming-conv cache) and computes ONLY each hop's newly-final frames of
every layer: a ~3.3x FLOP cut per step.

Semantics: EXACTLY the offline fused-trunk clip-level scoring
(StreamingEngine with fused_trunk=True) applied to the growing stream —
window k's logits pool pooled-trunk frames [round(k*sf/pool_t), +span) of a
trunk computed over all audio seen so far, so interior windows see real
context on BOTH sides (the documented fused-trunk deviation from the
reference's isolated-window scoring, engine.py). The trunk's 3x3 convs look
ahead one frame per layer, so window k's span is final only ``lag`` hops
later (lag=4 at defaults = 250 ms added decision latency); the FSM still
runs on window k's own timestamps, so smoothing/sequence semantics are
untouched (ref howl/model/inference.py:91-161) — only the host observes the
fire ``lag`` steps after the audio that caused it.

The emission schedule (new-frames-per-hop, mel slab offset, span gap) cycles
with period pool_t/gcd(stride_frames, pool_t); one step program is jitted per
phase with the schedule constants static, so there is no traced control flow.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from howl_tpu.inference.config import EngineConfig, cast_compute_dtype, hop_geometry, ring_steps
from howl_tpu.inference.detect import DetectState, apply_inference_weights, detect_step, init_state
from howl_tpu.inference.online import _REBASE_AT, _REBASE_DELTA, _rebase_times
from howl_tpu.models.base import ModelSpec, model_spec
from howl_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram


class TrunkSchedule:
    """Host-side emission schedule for the streaming trunk.

    All quantities follow from (initial mel frames m0, stride_frames S,
    pool_t P, span, layers): after hop j the stream has M_j = m0 + S*j FINAL
    mel frames (m0 < window_frames: the last centered frames of the preroll
    overlap samples that arrive with the first push, so prefill stops at the
    last frame fully inside the preroll), the newest FINAL pooled stem frame
    is p_j = (M_j - 1 - P) // P (conv0 needs one mel frame of right context;
    a pooled frame needs its full P-group), and stage i's frontier is
    p_j - i. Window k's span is final once
    p_{k+lag} - layers >= r(k) + span - 1 with r(k) = round(k*S/P).
    """

    def __init__(self, m0: int, stride_frames: int, pool_t: int, span: int, layers: int = 6):
        self.m0, self.S, self.P = m0, stride_frames, pool_t
        self.span, self.layers = span, layers
        # base period of the mel/pooled-frame phase. r(k) = round(k*S/P) uses
        # round-half-to-even (matching the offline engine's np.round window
        # starts, engine.py:165): when t0 is even, half-integer k*S/P values
        # occur and the frontier advance per t0 hops (S*t0/P, coprime to t0)
        # is odd, so the tie-break parity alternates period to period — the
        # true gap cycle is 2*t0. Odd t0 has no half-integer ties.
        t0 = pool_t // math.gcd(stride_frames, pool_t)
        self.period = 2 * t0 if t0 % 2 == 0 else t0
        self.n_new = max(self._p(j) - self._p(j - 1) for j in range(1, self.period + 1))
        self.slab_frames = self.n_new * pool_t + 2
        # mel cache: large enough for the slab at every phase offset
        tails = [self._slab_tail_off(j) for j in range(1, self.period + 1)]
        assert min(tails) >= 0
        self.mel_cache_len = self.slab_frames + max(tails)
        # decision lag (hops): first j where every window's span is final
        self.lag = next(
            (
                lag
                for lag in range(0, 64)
                if all(self._p(k + lag) - layers >= self._r(k) + span - 1 for k in range(4 * self.period))
            ),
            None,
        )
        if self.lag is None:
            raise ValueError(
                f"no decision lag <= 64 hops exists for geometry (m0={m0}, "
                f"stride_frames={stride_frames}, pool_t={pool_t}, span={span}): "
                "the window/stride combination cannot be served by the streaming trunk"
            )
        gaps = [self._gap(j) for j in range(self.lag, self.lag + self.period)]
        self.s6_ring_len = span + max(gaps)
        # per-phase constants, phase = j % period
        self.by_phase = {}
        for j in range(self.lag + self.period, self.lag + 2 * self.period):
            phase = j % self.period
            entry = {
                "delta": self._p(j) - self._p(j - 1),
                "slab_start": self.mel_cache_len - self.slab_frames - self._slab_tail_off(j),
                "gap": self._gap(j),
            }
            self.by_phase[phase] = entry
        # the schedule must actually be periodic (guards odd geometries)
        for j in range(self.lag, self.lag + 6 * self.period):
            e = self.by_phase[j % self.period]
            assert e["delta"] == self._p(j) - self._p(j - 1), f"aperiodic delta at hop {j}"
            assert e["gap"] == self._gap(j), f"aperiodic gap at hop {j}"
            assert e["slab_start"] == self.mel_cache_len - self.slab_frames - self._slab_tail_off(j)

    def _m(self, j: int) -> int:
        return self.m0 + self.S * j

    def _p(self, j: int) -> int:
        return (self._m(j) - 1 - self.P) // self.P

    def _r(self, k: int) -> int:
        return round(k * self.S / self.P)

    def _slab_tail_off(self, j: int) -> int:
        """Mel frames between the slab's newest frame and the stream's newest:
        the slab covers mel frames [P*(p_j - n_new + 1) - 1, P*(p_j + 1)]."""
        return (self._m(j) - 1) - self.P * (self._p(j) + 1)

    def _gap(self, j: int) -> int:
        k = j - self.lag
        return (self._p(j) - self.layers) - (self._r(k) + self.span - 1)

    def blocked(self, hop_block: int) -> dict:
        """Constants for hop-blocked serving: process ``hop_block`` hops per
        device step. hop_block must be a multiple of ``period`` so every block
        sees the same phase pattern — ONE jitted program, and the full-delta
        ring ingest amortizes the per-hop ring rewrite (the HBM bound measured
        in tools/ablate_trunk_step.py) over the whole block.

        Returns dict with: delta (new pooled frames per block == n_new),
        slab_frames, slab_start, mel_cache_len, gaps (per in-block hop, vs the
        block-end frontier), s6_ring_len. Decision semantics per hop are
        unchanged; the host just observes each hop's fire at its block end
        (worst-case lag + hop_block - 1 hops)."""
        H = int(hop_block)
        if H < 1 or H % self.period:
            raise ValueError(
                f"hop_block={H} must be a positive multiple of the schedule "
                f"period ({self.period}) so every block shares one phase pattern"
            )
        delta = self.S * H // self.P
        slab_frames = delta * self.P + 2
        jE0 = ((self.lag // H) + 2) * H  # steady-state, phase-aligned block end
        tail_off = self._slab_tail_off(jE0)
        gaps = tuple(
            (self._p(jE0) - self.layers) - (self._r(jE0 - H + h - self.lag) + self.span - 1)
            for h in range(1, H + 1)
        )
        mel_cache_len = slab_frames + tail_off
        # the single phase pattern must actually repeat block to block
        for jE in range(jE0 + H, jE0 + 6 * H, H):
            assert self._p(jE) - self._p(jE - H) == delta, f"aperiodic block delta at {jE}"
            assert self._slab_tail_off(jE) == tail_off, f"aperiodic slab offset at {jE}"
            for h in range(1, H + 1):
                g = (self._p(jE) - self.layers) - (self._r(jE - H + h - self.lag) + self.span - 1)
                assert g == gaps[h - 1], f"aperiodic gap at block end {jE}, hop {h}"
        return {
            "hop_block": H,
            "delta": delta,
            "slab_frames": slab_frames,
            "slab_start": 0,  # mel cache is exactly [slab | tail_off newest]
            "mel_cache_len": mel_cache_len,
            "gaps": gaps,
            "s6_ring_len": self.span + max(gaps),
        }


def make_chained_runner(
    engine: "FusedStreamingOnlineEngine", ring_hops: int, super_steps: int, donate: bool = False
):
    """Jitted bulk runner: replay hops through the engine as ONE on-device
    ``lax.scan`` (state-serialized, one fetch) — the honest way to benchmark
    or bulk-replay through a high-latency relay (per-call dispatch costs ~ms
    there; see bench.py methodology).

    Per-hop engines (hop_block=1): one scan iteration = one schedule period,
    so a run pushes ``super_steps * schedule.period`` hops, each reading the
    streams' audio from a (num_streams, ring_hops * hop_samples) device
    buffer at offset ``(j % ring_hops) * hop_samples``; ring_hops must NOT
    be a multiple of the schedule period or the phase cycle makes every
    chunk slice loop-invariant and XLA hoists the frontend out of the
    timing chain. Blocked engines (hop_block=H>1): one scan iteration = one
    BLOCK, so a run pushes ``super_steps * H`` hops from a (num_streams,
    ring_hops * H * hop_samples) buffer, and any ring_hops >= 2 is
    hoist-proof (offsets vary per block).

    Returns (run, init_carry): ``carry, last_fired = run(variables, buf,
    *carry)``; carry is (tail, mel_cache, rings, s6_ring, state). The runner
    assumes a freshly reset() engine and replicates push()'s semantics: hops
    before the decision lag are pushed with valid=False (their window spans
    are not final yet) and the FSM clock runs on the window index k = j - lag.
    It never rebases timestamps, so keep total replayed time under the f32
    rebase point (~70 min, online._REBASE_AT) or call push() instead.

    ``donate=True`` donates the carry buffers to the jitted program (the
    output carry reuses their memory — halves the chain's peak HBM at large
    stream counts). The FIRST call consumes the engine's own state arrays, so
    after a donating run the engine must be reset() before push() is used.
    """
    period = engine.schedule.period
    n_s = engine.num_streams
    lag = engine.schedule.lag
    if engine.hop_block > 1:
        # blocked engine: one scan iteration = one block = hop_block hops
        # (super_steps counts BLOCKS here). Offsets vary per iteration, so any
        # ring_hops >= 2 is hoist-proof.
        if ring_hops < 2:
            raise ValueError("ring_hops must be >= 2 so chunk slices vary per block")
        H = engine.hop_block
        block_samples = H * engine.hop_samples
        step_fn = getattr(engine._block_step, "__wrapped__", engine._block_step)
        jit = jax.jit if not donate else partial(jax.jit, donate_argnums=(2, 3, 4, 5, 6))

        @jit
        def run_blocked(variables, buf, tail, mel_cache, rings, s6_ring, state):
            def body(carry, m):
                tail, mel_cache, rings, s6_ring, state = carry
                off = (m % ring_hops) * block_samples
                chunk = jax.lax.dynamic_slice(buf, (jnp.int32(0), off), (n_s, block_samples))
                k0 = m * H + 1 - lag
                t_base = k0.astype(jnp.float32) * engine.stride_ms
                tail, mel_cache, rings, s6_ring, state, _, fireds, _ = step_fn(
                    variables, chunk, tail, mel_cache, rings, s6_ring, state, k0, t_base,
                )
                return (tail, mel_cache, rings, s6_ring, state), fireds[:, -1]

            carry, fireds = jax.lax.scan(
                body, (tail, mel_cache, rings, s6_ring, state),
                jnp.arange(super_steps, dtype=jnp.int32),
            )
            return carry, fireds[-1]

        init = (engine.tail, engine.mel_cache, engine.rings, engine.s6_ring, engine.state)
        return run_blocked, init

    if ring_hops % period == 0:
        raise ValueError(
            f"ring_hops={ring_hops} is a multiple of the schedule period "
            f"({period}): chunk slices become loop-invariant and XLA hoists "
            "the frontend out of the chain"
        )
    # un-jitted per-phase bodies compose inside the outer jit; push j
    # (1-based) runs phase j % period
    phase_fns = {p: getattr(engine._steps[p], "__wrapped__", engine._steps[p]) for p in engine._steps}
    jit = jax.jit if not donate else partial(jax.jit, donate_argnums=(2, 3, 4, 5, 6))

    @jit
    def run(variables, buf, tail, mel_cache, rings, s6_ring, state):
        def body(carry, m):
            tail, mel_cache, rings, s6_ring, state = carry
            fired = None
            for i in range(period):
                j = m * period + 1 + i
                off = (j % ring_hops) * engine.hop_samples
                chunk = jax.lax.dynamic_slice(buf, (jnp.int32(0), off), (n_s, engine.hop_samples))
                t_now = jnp.maximum(j - lag, 0).astype(jnp.float32) * engine.stride_ms
                valid = jnp.broadcast_to(j >= lag, (n_s,))
                tail, mel_cache, rings, s6_ring, state, _, fired, _ = phase_fns[(1 + i) % period](
                    variables, chunk, tail, mel_cache, rings, s6_ring, state, t_now, valid,
                )
            return (tail, mel_cache, rings, s6_ring, state), fired

        carry, fireds = jax.lax.scan(
            body, (tail, mel_cache, rings, s6_ring, state),
            jnp.arange(super_steps, dtype=jnp.int32),
        )
        return carry, fireds[-1]

    init = (engine.tail, engine.mel_cache, engine.rings, engine.s6_ring, engine.state)
    return run, init


class FusedStreamingOnlineEngine:
    """Live N-stream wakeword scorer with per-layer trunk caches (res8).

    push() accepts each hop's new samples (like IncrementalOnlineEngine) and
    returns the fire flag for the window ``schedule.lag`` hops back. Scoring
    is bit-for-bit the offline fused-trunk path up to f32 summation order
    (tests/test_streaming_trunk.py asserts per-window posterior agreement and
    identical decisions against StreamingEngine.score_batch).

    ``hop_block=H`` (a multiple of ``schedule.period``) switches to blocked
    serving: push() takes H hops of audio and scores all H windows in ONE
    device step — identical per-hop decisions, observed at the block boundary
    (worst case ``lag + H - 1`` hops after the causing audio). Blocking
    amortizes the per-hop stage-ring rewrite (the measured HBM bound,
    tools/ablate_trunk_step.py) over H hops and makes the conv GEMMs H x
    larger, trading bounded extra observation latency for throughput.
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
        prefill_block: int = 8192,
        hop_block: int = 1,
        dft_precision="auto",
    ):
        import dataclasses

        self.model = model
        self.variables = cast_compute_dtype(variables, compute_dtype)
        self.compute_dtype = compute_dtype
        self.cfg = cfg
        self.frontend = frontend
        self.zmuv_mean = float(zmuv_mean)
        self.zmuv_std = float(zmuv_std)
        self.spec = spec or model_spec(getattr(model, "registered_name", "res8"))
        # mirror StreamingEngine's fused-trunk eligibility (engine.py:116-119):
        # convert_static wraps res8 into a sequential model whose spec keeps
        # supports_trunk=True but which has no trunk methods
        if not self.spec.supports_trunk or self.spec.is_sequential or self.spec.is_recurrent:
            raise ValueError(
                "FusedStreamingOnlineEngine requires a trunk-capable non-sequential "
                f"model (res8); got spec={self.spec}"
            )
        from howl_tpu.inference.config import serving_dft_precision

        self._dft_precision = serving_dft_precision(compute_dtype, dft_precision)
        self.num_streams = num_streams
        self.prefill_block = max(int(prefill_block), 1)

        hop, n_fft = frontend.hop_length, frontend.n_fft
        self.window_frames, self.stride_frames, self.stride_ms = hop_geometry(cfg, frontend)
        self.hop_samples = self.stride_frames * hop
        pool_t = getattr(model, "pooling", (3, 4))[0]
        self.span = max(self.window_frames // pool_t, 1)
        # prefill mel frontier: the last centered frame fully inside the
        # preroll (later frames overlap samples that arrive with push #1 —
        # frame i spans [i*hop - n_fft/2, i*hop + n_fft/2))
        self.m0 = (self.window_frames * hop - n_fft // 2) // hop + 1
        self.schedule = TrunkSchedule(self.m0, self.stride_frames, pool_t, self.span)
        self.hop_block = int(hop_block)
        p0 = (self.m0 - 1 - pool_t) // pool_t
        if self.hop_block == 1:
            self._ring_frames = self.schedule.n_new + 2
            self._s6_ring_len = self.schedule.s6_ring_len
            self._mel_cache_len = self.schedule.mel_cache_len
            # prefill needs every stage ring to fit inside the preroll window:
            # the deepest cache reaches back to stem frame p0 - 5 - (n_new + 1)
            if p0 - 5 - (self.schedule.n_new + 1) < 0:
                raise ValueError(
                    f"window too short for the streaming trunk: {self.m0} prefill mel frames "
                    f"give only {p0 + 1} pooled frames; need >= {7 + self.schedule.n_new}"
                )
        else:
            self.block = self.schedule.blocked(self.hop_block)
            self._ring_frames = self.block["delta"] + 2
            self._s6_ring_len = self.block["s6_ring_len"]
            self._mel_cache_len = self.block["mel_cache_len"]
            # every block ingests a full ring of new frames (delta == n_new),
            # so only each stage's 2 newest prefill frames are ever read —
            # deeper ring slots are zero-padded. The deepest real need is
            # stage s5's newest 2 frames (stem frames p0-6, p0-5).
            if p0 - 6 < 0:
                raise ValueError(
                    f"window too short for the streaming trunk: {self.m0} prefill mel "
                    f"frames give only {p0 + 1} pooled frames; need >= 8"
                )
            if self._mel_cache_len > self.m0:
                raise ValueError(
                    f"hop_block={self.hop_block} needs a {self._mel_cache_len}-frame mel "
                    f"cache but the {self.window_frames}-frame window prefills only "
                    f"{self.m0}; use a smaller hop_block or a longer window"
                )
        # same centered-grid audio tail as IncrementalOnlineEngine
        base = n_fft - hop
        self.tail_samples = base + ((n_fft // 2 - base) % hop)
        self._frontend_nc = dataclasses.replace(frontend, center=False)

        self._s_steps, self._w_steps = ring_steps(cfg, self.stride_ms)
        if self.hop_block == 1:
            self._steps = {phase: self._build_step(phase) for phase in self.schedule.by_phase}
        else:
            self._block_step = self._build_block_step()
        self._prefill = self._build_prefill()
        self.reset()

    # ---- state ----

    def reset(self, preroll_audio: Optional[np.ndarray] = None):
        """Reset stream state. The stream is defined to start with a
        window-length preroll (silence by default) exactly like a zeroed ring
        buffer; all trunk caches are prefilled from its clip-level trunk, so
        frame values match the offline trunk of (preroll + pushed audio)."""
        n = self.num_streams
        if preroll_audio is None:
            preroll = np.zeros((n, self.window_frames * self.frontend.hop_length), np.float32)
        else:
            preroll = np.asarray(preroll_audio, np.float32)
            if preroll.ndim == 1:
                preroll = np.tile(preroll[None], (n, 1))
        want = self.window_frames * self.frontend.hop_length
        if preroll.shape != (n, want):
            raise ValueError(f"preroll must be {(n, want)}, got {preroll.shape}")
        # Prefill in stream blocks: trunk_intermediates keeps EVERY stage of
        # the preroll clip alive at once (~100 KB/stream transient — ~7 GB at
        # 65k streams), while the kept rings are only ~30 KB/stream. Blocking
        # caps the transient; one extra compile for a ragged final block.
        blocks = []
        for lo in range(0, n, self.prefill_block):
            blocks.append(self._prefill(self.variables, jnp.asarray(preroll[lo : lo + self.prefill_block])))
        if len(blocks) == 1:
            self.mel_cache, self.rings, self.s6_ring, self.tail = blocks[0]
        else:
            self.mel_cache, self.rings, self.s6_ring, self.tail = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0), *blocks
            )
        self.state = init_state(n, self.cfg.num_labels, self._s_steps, self._w_steps)
        self.carry = None
        self._j = 0  # hops pushed so far
        self.curr_time = 0.0  # window-k clock (k = j - lag)
        # cleared so a post-reset poll can't observe the previous stream's step
        self.last_labels = None
        self.last_probs = None
        self.last_fired = None

    def shard_streams(self, mesh):
        """Serve the streams SPMD over the mesh's ``data`` axis: params
        replicated, every per-stream cache split on stream axis 0 (zero
        collectives — the step is per-stream; see online._shard_engine_streams)."""
        from howl_tpu.inference.online import _shard_engine_streams

        return _shard_engine_streams(
            self, mesh, ("state", "tail", "mel_cache", "rings", "s6_ring")
        )

    def _featurize_clip(self, audio: jnp.ndarray) -> jnp.ndarray:
        mels = log_mel_spectrogram(audio, self.frontend, precision=self._dft_precision)
        return (mels - self.zmuv_mean) / self.zmuv_std  # (B, F, T)

    def _build_prefill(self):
        sched = self.schedule
        model = self.model
        layers = sched.layers
        dtype = self.compute_dtype
        ring_frames, s6_ring_len, mel_cache_len = (
            self._ring_frames, self._s6_ring_len, self._mel_cache_len,
        )

        @jax.jit
        def prefill(variables, preroll):
            feats_ft = self._featurize_clip(preroll)[:, :, : sched.m0]  # final frames only
            feats = feats_ft[:, None]  # (B, 1, F, m0)
            if dtype is not None:
                feats = feats.astype(dtype)
            outs = model.apply(variables, feats, method="trunk_intermediates")
            p0 = (sched.m0 - 1 - sched.P) // sched.P
            rings = {}
            for name, frontier in [("s0", p0)] + [(f"s{i}", p0 - i) for i in range(1, 6)] + [
                ("r2", p0 - 2),
                ("r4", p0 - 4),
            ]:
                lo = frontier - ring_frames + 1
                seg = outs[name][:, max(lo, 0) : frontier + 1]
                if lo < 0:
                    # hop-blocked rings can be deeper than the preroll trunk;
                    # the padded slots are dropped by the first full-delta
                    # ingest before anything reads them (__init__ guards the
                    # 2 genuinely-read newest frames exist)
                    pad = jnp.zeros(seg.shape[:1] + (-lo,) + seg.shape[2:], seg.dtype)
                    seg = jnp.concatenate([pad, seg], axis=1)
                rings[name] = seg
            s6_means = outs["s6"].astype(jnp.float32).mean(axis=2)  # (B, T6, maps)
            newest = p0 - layers
            have = newest + 1
            take = min(have, s6_ring_len)
            s6_ring = jnp.zeros((preroll.shape[0], s6_ring_len, s6_means.shape[-1]), jnp.float32)
            s6_ring = s6_ring.at[:, -take:].set(s6_means[:, newest + 1 - take : newest + 1])
            # mel cache: newest mel_cache_len ZMUV'd frames, time-major
            mel_cache = feats_ft[:, :, -mel_cache_len:].swapaxes(1, 2)  # (B, Tc, F)
            tail = preroll[:, -self.tail_samples :]
            return mel_cache, rings, s6_ring, tail

        return prefill

    def _build_step(self, phase: int):
        from howl_tpu.ops.frontend import log_mel_spectrogram as _logmel

        sched = self.schedule
        e = sched.by_phase[phase]
        delta, slab_start, gap = e["delta"], e["slab_start"], e["gap"]
        model, cfg, spec = self.model, self.cfg, self.spec
        stride_frames, stride_ms = self.stride_frames, self.stride_ms
        zmuv_mean, zmuv_std = self.zmuv_mean, self.zmuv_std
        frontend_nc, dft_prec, dtype = self._frontend_nc, self._dft_precision, self.compute_dtype
        span, ring_len, tail_len = self.span, sched.s6_ring_len, self.tail_samples

        @jax.jit
        def step(variables, new_audio, tail, mel_cache, rings, s6_ring, state: DetectState, t_now, valid):
            buf = jnp.concatenate([tail, new_audio], axis=-1)
            mels = _logmel(buf, frontend_nc, precision=dft_prec)  # (B, F, stride_frames)
            mels = ((mels - zmuv_mean) / zmuv_std).swapaxes(1, 2)  # (B, stride_frames, F)
            mel_cache = jnp.concatenate([mel_cache[:, stride_frames:], mels], axis=1)
            slab = mel_cache[:, slab_start : slab_start + sched.slab_frames][..., None]
            if dtype is not None:
                slab = slab.astype(dtype)
            rings, s6_new = model.apply(variables, slab, rings, delta, method="trunk_stream_step")
            s6_ring = jnp.concatenate(
                [s6_ring[:, delta:], s6_new[:, sched.n_new - delta :]], axis=1
            )
            hi = ring_len - gap
            wmean = s6_ring[:, hi - span : hi].mean(axis=1)  # (B, maps) f32
            logits = model.apply(variables, wmean, method="head")
            probs = jax.nn.softmax(logits.astype(jnp.float32), -1)
            probs = apply_inference_weights(probs, cfg)
            new_state, label, fired_now = detect_step(
                state, probs, t_now, valid, cfg, check_offset_ms=stride_ms
            )
            return buf[..., -tail_len:], mel_cache, rings, s6_ring, new_state, label, fired_now, probs

        return step

    def _build_block_step(self):
        from howl_tpu.ops.frontend import log_mel_spectrogram as _logmel

        blk = self.block
        H = self.hop_block
        delta, slab_start, gaps = blk["delta"], blk["slab_start"], blk["gaps"]
        slab_frames, cache_len = blk["slab_frames"], blk["mel_cache_len"]
        model, cfg = self.model, self.cfg
        stride_ms = self.stride_ms
        zmuv_mean, zmuv_std = self.zmuv_mean, self.zmuv_std
        frontend_nc, dft_prec, dtype = self._frontend_nc, self._dft_precision, self.compute_dtype
        span, ring_len, tail_len = self.span, self._s6_ring_len, self.tail_samples

        @jax.jit
        def step(variables, new_audio, tail, mel_cache, rings, s6_ring, state: DetectState, k0, t_base):
            buf = jnp.concatenate([tail, new_audio], axis=-1)
            mels = _logmel(buf, frontend_nc, precision=dft_prec)  # (B, F, H*stride_frames)
            mels = ((mels - zmuv_mean) / zmuv_std).swapaxes(1, 2)
            # the block's mel shift can exceed the cache length; keep newest
            mel_cache = jnp.concatenate([mel_cache, mels], axis=1)[:, -cache_len:]
            slab = mel_cache[:, slab_start : slab_start + slab_frames][..., None]
            if dtype is not None:
                slab = slab.astype(dtype)
            # ONE trunk call for the whole block: delta == ring capacity, so
            # the per-hop ring rewrite (the measured HBM bound) is paid once
            # per H hops and the conv GEMMs are H x chunkier
            rings, s6_new = model.apply(variables, slab, rings, delta, method="trunk_stream_step")
            s6_ring = jnp.concatenate([s6_ring[:, delta:], s6_new], axis=1)
            wmeans = jnp.stack(
                [s6_ring[:, ring_len - g - span : ring_len - g].mean(axis=1) for g in gaps],
                axis=1,
            )  # (B, H, maps) f32
            logits = model.apply(variables, wmeans, method="head")
            probs = jax.nn.softmax(logits.astype(jnp.float32), -1)
            probs = apply_inference_weights(probs, cfg)
            labels, fireds = [], []
            for h in range(H):  # per-hop FSM, same semantics as per-hop serving
                valid_h = jnp.broadcast_to(k0 + h >= 0, probs.shape[:1])
                state, lab, fired = detect_step(
                    state, probs[:, h], t_base + h * stride_ms, valid_h, cfg,
                    check_offset_ms=stride_ms,
                )
                labels.append(lab)
                fireds.append(fired)
            return (
                buf[..., -tail_len:], mel_cache, rings, s6_ring, state,
                jnp.stack(labels, axis=1), jnp.stack(fireds, axis=1), probs,
            )

        return step

    # ---- public API ----

    def push(self, new_audio: np.ndarray) -> bool:
        """Feed each stream's newest audio; True if the wakeword fired for any
        newly-final window.

        Per-hop mode (hop_block=1): expects (num_streams, hop_samples); the
        returned flag covers the window ``schedule.lag`` hops back. Blocked
        mode: expects (num_streams, hop_block * hop_samples); the flag covers
        the block's ``hop_block`` windows (last_fired is (B, hop_block)) —
        per-hop decisions are identical, just observed at the block boundary
        (worst-case lag + hop_block - 1 hops after the causing audio)."""
        if self.hop_block > 1:
            return self._push_block(new_audio)
        audio = np.asarray(new_audio, np.float32)
        if audio.ndim == 1:
            audio = audio[None, :]
        if audio.shape != (self.num_streams, self.hop_samples):
            raise ValueError(f"push expects {(self.num_streams, self.hop_samples)}, got {audio.shape}")
        self._j += 1
        k = self._j - self.schedule.lag  # the window this step decides
        emitting = k >= 0
        if emitting and self.curr_time >= _REBASE_AT:
            self.state = _rebase_times(self.state, _REBASE_DELTA)
            self.curr_time -= _REBASE_DELTA
        phase = self._j % self.schedule.period
        valid = jnp.full((self.num_streams,), emitting)
        (
            self.tail, self.mel_cache, self.rings, self.s6_ring,
            self.state, self.last_labels, fired_now, self.last_probs,
        ) = self._steps[phase](
            self.variables, audio, self.tail, self.mel_cache, self.rings, self.s6_ring,
            self.state, jnp.float32(self.curr_time), valid,
        )
        # fetch ONCE (the relay charges ~31 ms per device->host fetch; the
        # serving loop reads last_fired right after push())
        self.last_fired = np.asarray(fired_now)
        if emitting:
            self.curr_time += self.stride_ms
        return bool(self.last_fired.any())

    def _push_block(self, new_audio: np.ndarray) -> bool:
        H = self.hop_block
        audio = np.asarray(new_audio, np.float32)
        if audio.ndim == 1:
            audio = audio[None, :]
        want = (self.num_streams, H * self.hop_samples)
        if audio.shape != want:
            raise ValueError(f"push expects {want} (hop_block={H}), got {audio.shape}")
        k0 = self._j + 1 - self.schedule.lag  # window index of this block's first hop
        self._j += H
        if self.curr_time >= _REBASE_AT:
            self.state = _rebase_times(self.state, _REBASE_DELTA)
            self.curr_time -= _REBASE_DELTA
        # hops before the lag are pushed with valid=False; their (negative)
        # timestamps are never recorded. curr_time tracks valid hops only, so
        # the first valid hop's time lines up at curr_time exactly.
        t_base = self.curr_time + min(k0, 0) * self.stride_ms
        (
            self.tail, self.mel_cache, self.rings, self.s6_ring,
            self.state, self.last_labels, fireds, self.last_probs,
        ) = self._block_step(
            self.variables, audio, self.tail, self.mel_cache, self.rings, self.s6_ring,
            self.state, jnp.int32(k0), jnp.float32(t_base),
        )
        self.last_fired = np.asarray(fireds)  # (B, H), hop h decides window k0 + h
        n_valid = max(0, k0 + H) - max(0, k0)
        self.curr_time += n_valid * self.stride_ms
        return bool(self.last_fired.any())
