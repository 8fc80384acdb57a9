"""Measure hop-blocked streaming-trunk serving vs per-hop at concurrency.

Times the blocked engine's chained runner (one scan iteration = one block of
H hops) at H = period and 2*period against the per-hop trunk engine, at the
bench.py stream counts. Same methodology: state-serialized scan chains, one
dispatch, one fetch, ms normalized PER HOP. Scratch measurement tool.

Usage: python tools/bench_trunk_blocked.py [num_streams] [super_steps]
"""

from __future__ import annotations

import time

import numpy as np

from _trunk_setup import trunk_bench_setup


def _time_runner(run, variables, buf, chain, n_hops, reps):
    # the runner donates its carry: thread the returned chain into each call
    chain, fired = run(variables, buf, *chain)
    _ = np.asarray(fired)  # compile + warmup
    best = float("inf")
    for _rep in range(reps):
        t0 = time.perf_counter()
        chain, fired = run(variables, buf, *chain)
        _ = np.asarray(fired)
        best = min(best, (time.perf_counter() - t0) / n_hops * 1000.0)
    return best


def main():
    s = trunk_bench_setup(default_streams_tpu=16384, default_steps_tpu=11)
    import jax

    from howl_tpu.inference import FusedStreamingOnlineEngine
    from howl_tpu.inference.streaming_trunk import make_chained_runner
    from howl_tpu.models.base import model_spec

    n_s, k, rng = s.n_streams, s.steps_arg, s.rng

    def build(hop_block):
        return FusedStreamingOnlineEngine(
            s.model, s.variables, s.cfg, s.frontend, spec=model_spec("res8"),
            num_streams=n_s, compute_dtype=s.compute_dtype, hop_block=hop_block,
        )

    per = build(1)
    period = per.schedule.period
    print(f"streams={n_s} period={period} super_steps={k}")

    # per-hop reference (bench.py's exact setup)
    ring_hops = period + 1
    buf = jax.device_put(
        (rng.standard_normal((n_s, ring_hops * per.hop_samples)) * 0.1).astype(np.float32)
    )
    run, chain = make_chained_runner(per, ring_hops, k, donate=True)
    t = _time_runner(run, per.variables, buf, chain, k * period, 5)
    print(f"per-hop         : {t:7.3f} ms/hop")
    del per, run, chain, buf

    for mult in (1, 2):
        H = mult * period
        try:
            eng = build(H)
        except ValueError as e:
            print(f"hop_block={H}: rejected ({e})")
            continue
        blocks = max(k * period // H, 2)
        bbuf = jax.device_put(
            (rng.standard_normal((n_s, 2 * H * eng.hop_samples)) * 0.1).astype(np.float32)
        )
        run, chain = make_chained_runner(eng, 2, blocks, donate=True)
        t = _time_runner(run, eng.variables, bbuf, chain, blocks * H, 5)
        print(f"hop_block={H:2d}    : {t:7.3f} ms/hop  (block step {t * H:7.3f} ms, +{(H - 1) * 62.5:.0f} ms max observe lag)")
        del eng, run, chain, bbuf


if __name__ == "__main__":
    main()
