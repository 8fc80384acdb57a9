"""Measure the streaming-trunk online engine vs the incremental engine.

Same methodology as bench.py's online section: all steps chained in ONE
jitted lax.scan, state-serialized, fetched once (per-call dispatch through
the dev relay costs ~ms and block_until_ready does not block through it).
The streaming-trunk step's schedule constants are per-phase static, so the
scan body unrolls one full schedule period (period=3 at defaults).

Usage: python tools/bench_streaming_trunk.py [num_streams] [steps]
"""

from __future__ import annotations

import time

import numpy as np

from _trunk_setup import trunk_bench_setup


def main():
    # total scan steps ([2nd argv]); rounded down to a multiple of the period
    s = trunk_bench_setup(default_streams_tpu=512, default_steps_tpu=258,
                          default_steps_cpu=6)
    import jax
    import jax.numpy as jnp

    from howl_tpu.inference import FusedStreamingOnlineEngine
    from howl_tpu.inference.online import IncrementalOnlineEngine
    from howl_tpu.inference.streaming_trunk import make_chained_runner
    from howl_tpu.models.base import model_spec

    n_streams, steps, rng = s.n_streams, s.steps_arg, s.rng
    cfg, frontend, model, variables = s.cfg, s.frontend, s.model, s.variables
    compute_dtype = s.compute_dtype

    eng = FusedStreamingOnlineEngine(
        model, variables, cfg, frontend, spec=model_spec("res8"),
        num_streams=n_streams, compute_dtype=compute_dtype,
    )
    period = eng.schedule.period
    super_steps = max(steps // period, 1)
    # period+1: non-loop-invariant chunk slices (the runner rejects period
    # multiples) at ~1/3 the audio-buffer HBM of a 4*period ring — 65k
    # streams OOM'd otherwise
    ring_hops = period + 1
    buf = jax.device_put(
        (rng.standard_normal((n_streams, ring_hops * eng.hop_samples)) * 0.1).astype(np.float32)
    )
    run_trunk, carry = make_chained_runner(eng, ring_hops, super_steps)
    out, fired = run_trunk(eng.variables, buf, *carry)  # compile
    _ = np.asarray(fired)
    t0 = time.perf_counter()
    out, fired = run_trunk(eng.variables, buf, *carry)
    _ = np.asarray(fired)
    trunk_elapsed = time.perf_counter() - t0
    n_steps = super_steps * period
    trunk_streams = n_streams * n_steps / trunk_elapsed / (1000.0 / 62.5)
    print(f"streaming-trunk: {n_steps} steps x {n_streams} streams in {trunk_elapsed:.3f}s "
          f"-> {trunk_streams:,.0f} streams/chip @62.5ms")

    # ---- incremental baseline (same harness as bench.py) ----
    del out, carry, eng, run_trunk  # free trunk HBM first
    inc = IncrementalOnlineEngine(
        model, variables, cfg, frontend, 0.0, 1.0, spec=model_spec("res8"),
        num_streams=n_streams, compute_dtype=compute_dtype,
    )

    @jax.jit
    def run_inc(variables, buf, tail, ring, state, carry):
        def body(sc, k):
            tail, ring, st, ca = sc
            off = (k % ring_hops) * inc.hop_samples
            chunk = jax.lax.dynamic_slice(buf, (jnp.int32(0), off), (n_streams, inc.hop_samples))
            tail, ring, st, _, fired, ca = inc._step(
                variables, chunk, tail, ring, st, (k + 1).astype(jnp.float32) * inc.stride_ms, ca
            )
            return (tail, ring, st, ca), fired

        ks = jnp.arange(n_steps, dtype=jnp.int32)
        (tail, ring, st, ca), fireds = jax.lax.scan(body, (tail, ring, state, carry), ks)
        return tail, ring, st, ca, fireds[-1]

    out = run_inc(inc.variables, buf, inc.tail, inc.mel_ring, inc.state, inc.carry)
    _ = np.asarray(out[-1])
    t0 = time.perf_counter()
    out = run_inc(inc.variables, buf, *out[:4])
    _ = np.asarray(out[-1])
    inc_elapsed = time.perf_counter() - t0
    inc_streams = n_streams * n_steps / inc_elapsed / (1000.0 / 62.5)
    print(f"incremental:     {n_steps} steps x {n_streams} streams in {inc_elapsed:.3f}s "
          f"-> {inc_streams:,.0f} streams/chip @62.5ms")
    print(f"speedup: {inc_elapsed / trunk_elapsed:.2f}x")


if __name__ == "__main__":
    main()
