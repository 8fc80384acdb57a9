"""Measure the streaming-trunk online engine vs the incremental engine.

Same methodology as bench.py's online section: all steps chained in ONE
jitted lax.scan, state-serialized, fetched once (per-call dispatch through
the dev relay costs ~ms and block_until_ready does not block through it).
The streaming-trunk step's schedule constants are per-phase static, so the
scan body unrolls one full schedule period (period=3 at defaults).

Usage: python tools/bench_streaming_trunk.py [num_streams] [steps]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    from howl_tpu.utils.platform import ensure_platform

    ensure_platform()  # honor JAX_PLATFORMS=cpu despite the sitecustomize TPU pin

    import jax
    import jax.numpy as jnp

    from howl_tpu.inference import EngineConfig, FusedStreamingOnlineEngine
    from howl_tpu.inference.online import IncrementalOnlineEngine
    from howl_tpu.models import create_model
    from howl_tpu.models.base import model_spec
    from howl_tpu.ops.frontend import FrontendConfig
    from howl_tpu.training.step import StepConfig, featurize

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    n_streams = int(sys.argv[1]) if len(sys.argv) > 1 else (512 if on_tpu else 8)
    # total scan steps; rounded down to a multiple of the schedule period
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else (258 if on_tpu else 6)

    sample_rate = 16000
    frontend = FrontendConfig(n_mels=40)
    cfg = EngineConfig(
        inference_sequence=(0, 1, 2),
        max_window_size_ms=500.0,
        eval_stride_size_ms=62.5,
        negative_label=3,
        num_labels=4,
        sample_rate=sample_rate,
    )
    model = create_model("res8", num_labels=4)
    rng = np.random.default_rng(0)
    feats0 = featurize(
        np.zeros((1, 8000), np.float32),
        StepConfig(frontend=frontend, zmuv_mean=0.0, zmuv_std=1.0, use_vtlp=False),
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats0, train=False)
    compute_dtype = jnp.bfloat16 if on_tpu else None

    from howl_tpu.inference.streaming_trunk import make_chained_runner

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
