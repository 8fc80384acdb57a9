"""A/B the online engines' DFT precision on the REAL TPU: HIGH vs 1-pass bf16.

The hop-incremental engines featurize only each step's new audio through the
jnp frontend (inference/online.py:290, streaming_trunk.py:500); at production
stream counts those per-hop DFT GEMMs are a real slice of the 62.5 ms budget
(docs/PERFORMANCE.md: frontend 9.5 of 39 ms at 65k streams). Precision.HIGH
is XLA's 3-pass bf16 emulation; precision="bf16" (ops/frontend.py) is 1 pass
— this measures the per-step latency delta at serving stream counts so the
auto default (inference/config.py serving_dft_precision) is set from data.
(Post-flip, "auto" resolves to the 1-pass mode, so HIGH is pinned explicitly.)

Each latency sample is one K-step on-device lax.scan chain divided by K,
paired-call slope timed (2 chains minus 1 chain) to cancel the relay's fixed
~31 ms fetch — the same method as bench.py's online_step_latency_ms.

Run (on the axon TPU): python tools/bench_online_dft_precision.py
"""

from __future__ import annotations

import _path  # noqa: F401

import time

import numpy as np


def main():
    from howl_tpu.utils.platform import ensure_platform

    ensure_platform()

    import jax
    import jax.numpy as jnp

    from howl_tpu.inference import EngineConfig
    from howl_tpu.inference.online import IncrementalOnlineEngine
    from howl_tpu.inference.streaming_trunk import FusedStreamingOnlineEngine
    from howl_tpu.models import create_model
    from howl_tpu.models.base import model_spec
    from howl_tpu.ops.frontend import FrontendConfig
    from howl_tpu.training.step import StepConfig, featurize

    on_tpu = jax.devices()[0].platform == "tpu"
    frontend = FrontendConfig(n_mels=40)
    cfg = EngineConfig(num_labels=4)
    model = create_model("res8", num_labels=4)
    rng = np.random.default_rng(0)
    feats0 = featurize(
        np.zeros((1, 8000), np.float32),
        StepConfig(frontend=frontend, zmuv_mean=0.0, zmuv_std=1.0, use_vtlp=False),
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats0, train=False)
    spec = model_spec("res8")

    counts = (16384, 65536) if on_tpu else (8,)
    lat_k = 32 if on_tpu else 2
    lat_m = 8 if on_tpu else 2
    ring_hops = 4

    def measure_inc(n_s, dft_precision):
        eng = IncrementalOnlineEngine(
            model, variables, cfg, frontend, spec=spec, num_streams=n_s,
            compute_dtype=jnp.bfloat16 if on_tpu else None, dft_precision=dft_precision,
        )
        buf = jax.device_put(
            rng.standard_normal((n_s, ring_hops * eng.hop_samples)).astype(np.float32) * 0.1
        )

        @jax.jit
        def run(variables, buf, tail, ring, state, carry):
            def body(sc, k):
                tail, ring, st, ca = sc
                off = (k % ring_hops) * eng.hop_samples
                chunk = jax.lax.dynamic_slice(buf, (jnp.int32(0), off), (n_s, eng.hop_samples))
                tail, ring, st, _, fired, ca = eng._step(
                    variables, chunk, tail, ring, st, (k + 1).astype(jnp.float32) * eng.stride_ms, ca
                )
                return (tail, ring, st, ca), fired

            ks = jnp.arange(lat_k, dtype=jnp.int32)
            (tail, ring, st, ca), fireds = jax.lax.scan(body, (tail, ring, state, carry), ks)
            return tail, ring, st, ca, fireds[-1]

        chain = run(eng.variables, buf, eng.tail, eng.mel_ring, eng.state, eng.carry)
        _ = np.asarray(chain[-1])
        samples = []
        for _rep in range(lat_m):
            t0 = time.perf_counter()
            chain = run(eng.variables, buf, *chain[:4])
            _ = np.asarray(chain[-1])
            t_one = time.perf_counter() - t0
            t0 = time.perf_counter()
            chain = run(eng.variables, buf, *chain[:4])
            chain = run(eng.variables, buf, *chain[:4])
            _ = np.asarray(chain[-1])
            t_two = time.perf_counter() - t0
            samples.append(max(t_two - t_one, 1e-9) / lat_k * 1000.0)
        return float(np.percentile(samples, 50)), float(np.percentile(samples, 99))

    def measure_trunk(n_s, dft_precision):
        from howl_tpu.inference.streaming_trunk import make_chained_runner

        eng = FusedStreamingOnlineEngine(
            model, variables, cfg, frontend, spec=spec, num_streams=n_s,
            compute_dtype=jnp.bfloat16 if on_tpu else None, dft_precision=dft_precision,
        )
        period = eng.schedule.period
        trunk_k = 11 if on_tpu else 2  # super-steps per chain (hops = k * period)
        # period+1 bounds the buffer AND avoids hoistable loop-invariant slices
        r_hops = period + 1
        buf = jax.device_put(
            (rng.standard_normal((n_s, r_hops * eng.hop_samples)) * 0.1).astype(np.float32)
        )
        run, carry = make_chained_runner(eng, r_hops, trunk_k, donate=True)
        carry, fired = run(eng.variables, buf, *carry)
        _ = np.asarray(fired)
        n_steps = trunk_k * period
        samples = []
        for _rep in range(lat_m):
            t0 = time.perf_counter()
            carry, fired = run(eng.variables, buf, *carry)
            _ = np.asarray(fired)
            t_one = time.perf_counter() - t0
            t0 = time.perf_counter()
            carry, fired = run(eng.variables, buf, *carry)
            carry, fired = run(eng.variables, buf, *carry)
            _ = np.asarray(fired)
            t_two = time.perf_counter() - t0
            samples.append(max(t_two - t_one, 1e-9) / n_steps * 1000.0)
        return float(np.percentile(samples, 50)), float(np.percentile(samples, 99))

    for label, fn in (("incremental", measure_inc), ("trunk", measure_trunk)):
        for n_s in counts:
            import jax as _jax
            for prec_label, prec in (("HIGH", _jax.lax.Precision.HIGH), ("bf16x1", "bf16")):
                try:
                    p50, p99 = fn(n_s, prec)
                except Exception as e:  # keep the sweep going on one failure
                    print(f"{label:11s} n={n_s:6d} dft={prec_label:10s}: FAILED {type(e).__name__}: {e}")
                    continue
                print(
                    f"{label:11s} n={n_s:6d} dft={prec_label:10s}: p50 {p50:7.2f} ms  p99 {p99:7.2f} ms"
                    f"  (budget 62.5)",
                    flush=True,
                )


if __name__ == "__main__":
    main()
