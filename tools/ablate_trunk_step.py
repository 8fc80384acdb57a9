"""Component timing of the streaming-trunk step at serving concurrency.

Times three state-serialized scan chains at N streams — frontend+mel-cache,
trunk(rings+convs+head), and smoothing/FSM — against the full step, so ring
traffic vs conv compute vs decision logic can be attributed before any
optimization work. Scratch measurement tool; same chained methodology as
bench.py (one dispatch, one fetch).

Usage: python tools/ablate_trunk_step.py [num_streams] [super_steps]
"""

from __future__ import annotations

import time

import numpy as np

from _trunk_setup import trunk_bench_setup


def _time(fn, args, n_steps):
    out = fn(*args)
    _ = np.asarray(out[-1] if isinstance(out, tuple) else out)
    best = float("inf")
    for _rep in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(out[-1] if isinstance(out, tuple) else out)
        best = min(best, (time.perf_counter() - t0) / n_steps * 1000.0)
    return best


def main():
    s = trunk_bench_setup(default_streams_tpu=16384, default_steps_tpu=11)
    import jax
    import jax.numpy as jnp

    from howl_tpu.inference import FusedStreamingOnlineEngine
    from howl_tpu.inference.detect import apply_inference_weights, detect_step
    from howl_tpu.models.base import model_spec
    from howl_tpu.ops.frontend import log_mel_spectrogram

    n_s, k, rng = s.n_streams, s.steps_arg, s.rng
    cfg, frontend, model, variables = s.cfg, s.frontend, s.model, s.variables
    dtype = s.compute_dtype
    eng = FusedStreamingOnlineEngine(
        model, variables, cfg, frontend, spec=model_spec("res8"),
        num_streams=n_s, compute_dtype=dtype,
    )
    period = eng.schedule.period
    n_steps = k * period
    ring_hops = period + 1
    buf = jax.device_put(
        (rng.standard_normal((n_s, ring_hops * eng.hop_samples)) * 0.1).astype(np.float32)
    )
    e = eng.schedule.by_phase[1 % period]
    delta, slab_start, gap = e["delta"], e["slab_start"], e["gap"]
    sched, span, ring_len = eng.schedule, eng.span, eng.schedule.s6_ring_len

    # ---- full step chain (reference point, single phase repeated) ----
    @jax.jit
    def full(variables, buf, tail, mel_cache, rings, s6_ring, state):
        valid = jnp.full((n_s,), True)

        def body(carry, m):
            tail, mel_cache, rings, s6_ring, state = carry
            off = (m % ring_hops) * eng.hop_samples
            chunk = jax.lax.dynamic_slice(buf, (jnp.int32(0), off), (n_s, eng.hop_samples))
            buf2 = jnp.concatenate([tail, chunk], axis=-1)
            mels = log_mel_spectrogram(buf2, eng._frontend_nc, precision=eng._dft_precision)
            mels = ((mels - eng.zmuv_mean) / eng.zmuv_std).swapaxes(1, 2)
            mel_cache = jnp.concatenate([mel_cache[:, eng.stride_frames:], mels], axis=1)
            slab = mel_cache[:, slab_start : slab_start + sched.slab_frames][..., None]
            if dtype is not None:
                slab = slab.astype(dtype)
            rings, s6_new = model.apply(variables, slab, rings, delta, method="trunk_stream_step")
            s6_ring = jnp.concatenate([s6_ring[:, delta:], s6_new[:, sched.n_new - delta:]], axis=1)
            hi = ring_len - gap
            wmean = s6_ring[:, hi - span : hi].mean(axis=1)
            logits = model.apply(variables, wmean, method="head")
            probs = apply_inference_weights(jax.nn.softmax(logits.astype(jnp.float32), -1), cfg)
            state, _, fired = detect_step(state, probs, m.astype(jnp.float32) * 62.5, valid, cfg, 62.5)
            return (buf2[..., -eng.tail_samples:], mel_cache, rings, s6_ring, state), fired

        carry, fireds = jax.lax.scan(
            body, (tail, mel_cache, rings, s6_ring, state), jnp.arange(n_steps, dtype=jnp.int32))
        return carry, fireds[-1]

    # ---- frontend-only chain ----
    @jax.jit
    def fe_only(variables, buf, tail, mel_cache):
        def body(carry, m):
            tail, mel_cache = carry
            off = (m % ring_hops) * eng.hop_samples
            chunk = jax.lax.dynamic_slice(buf, (jnp.int32(0), off), (n_s, eng.hop_samples))
            buf2 = jnp.concatenate([tail, chunk], axis=-1)
            mels = log_mel_spectrogram(buf2, eng._frontend_nc, precision=eng._dft_precision)
            mels = ((mels - eng.zmuv_mean) / eng.zmuv_std).swapaxes(1, 2)
            mel_cache = jnp.concatenate([mel_cache[:, eng.stride_frames:], mels], axis=1)
            return (buf2[..., -eng.tail_samples:], mel_cache), mel_cache[0, 0, 0]

        carry, outs = jax.lax.scan(body, (tail, mel_cache), jnp.arange(n_steps, dtype=jnp.int32))
        return carry, outs[-1]

    # ---- trunk-only chain (rings + convs + head; slab from a fixed cache
    # made iteration-dependent through the ring state) ----
    @jax.jit
    def trunk_only(variables, mel_cache, rings, s6_ring):
        def body(carry, m):
            rings, s6_ring = carry
            # iteration-dependence flows through rings; slab read is the same
            # mel_cache traffic the real step pays
            slab = mel_cache[:, slab_start : slab_start + sched.slab_frames][..., None]
            slab = slab + (s6_ring[:, :1, :1, None] * 1e-30).astype(slab.dtype)
            if dtype is not None:
                slab = slab.astype(dtype)
            rings, s6_new = model.apply(variables, slab, rings, delta, method="trunk_stream_step")
            s6_ring = jnp.concatenate([s6_ring[:, delta:], s6_new[:, sched.n_new - delta:]], axis=1)
            hi = ring_len - gap
            wmean = s6_ring[:, hi - span : hi].mean(axis=1)
            logits = model.apply(variables, wmean, method="head")
            return (rings, s6_ring), logits.astype(jnp.float32).sum()

        carry, outs = jax.lax.scan(body, (rings, s6_ring), jnp.arange(n_steps, dtype=jnp.int32))
        return carry, outs[-1]

    # ---- FSM-only chain ----
    @jax.jit
    def fsm_only(state, probs0):
        valid = jnp.full((n_s,), True)

        def body(carry, m):
            state, probs = carry
            state, label, fired = detect_step(state, probs, m.astype(jnp.float32) * 62.5, valid, cfg, 62.5)
            probs = probs + fired[:, None] * 1e-30
            return (state, probs), fired

        carry, fireds = jax.lax.scan(body, (state, probs0), jnp.arange(n_steps, dtype=jnp.int32))
        return carry, fireds[-1]

    chain = (eng.tail, eng.mel_cache, eng.rings, eng.s6_ring, eng.state)
    t_full = _time(lambda *a: full(eng.variables, buf, *a), chain, n_steps)
    t_fe = _time(lambda *a: fe_only(eng.variables, buf, *a), (eng.tail, eng.mel_cache), n_steps)
    t_trunk = _time(
        lambda *a: trunk_only(eng.variables, eng.mel_cache, *a), (eng.rings, eng.s6_ring), n_steps
    )
    probs0 = jnp.full((n_s, 4), 0.25, jnp.float32)
    t_fsm = _time(lambda *a: fsm_only(*a), (eng.state, probs0), n_steps)

    print(f"streams={n_s} steps={n_steps}")
    print(f"full step       : {t_full:7.3f} ms")
    print(f"frontend+melring: {t_fe:7.3f} ms")
    print(f"trunk+rings+head: {t_trunk:7.3f} ms")
    print(f"smoothing+FSM   : {t_fsm:7.3f} ms")
    print(f"sum of parts    : {t_fe + t_trunk + t_fsm:7.3f} ms")


if __name__ == "__main__":
    main()
