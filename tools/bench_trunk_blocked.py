"""Measure hop-blocked streaming-trunk serving vs per-hop at concurrency.

Times the blocked engine's chained runner (one scan iteration = one block of
H hops) at H = period and 2*period against the per-hop trunk engine, at the
bench.py stream counts. Same methodology: state-serialized scan chains, one
dispatch, one fetch, ms normalized PER HOP. Scratch measurement tool.

Usage: python tools/bench_trunk_blocked.py [num_streams] [super_steps]
"""

from __future__ import annotations

import sys
import time

import numpy as np


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
    from howl_tpu.utils.platform import ensure_platform

    ensure_platform()
    import jax
    import jax.numpy as jnp

    from howl_tpu.inference import EngineConfig, FusedStreamingOnlineEngine
    from howl_tpu.inference.streaming_trunk import make_chained_runner
    from howl_tpu.models import create_model
    from howl_tpu.models.base import model_spec
    from howl_tpu.ops.frontend import FrontendConfig
    from howl_tpu.training.step import StepConfig, featurize

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    n_s = int(sys.argv[1]) if len(sys.argv) > 1 else (16384 if on_tpu else 8)
    k = int(sys.argv[2]) if len(sys.argv) > 2 else (11 if on_tpu else 2)

    frontend = FrontendConfig(n_mels=40)
    cfg = EngineConfig(
        inference_sequence=(0, 1, 2), max_window_size_ms=500.0, eval_stride_size_ms=62.5,
        negative_label=3, num_labels=4,
    )
    model = create_model("res8", num_labels=4)
    feats0 = featurize(
        np.zeros((1, 8000), np.float32),
        StepConfig(frontend=frontend, zmuv_mean=0.0, zmuv_std=1.0, use_vtlp=False),
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats0, train=False)
    dtype = jnp.bfloat16 if on_tpu else None
    rng = np.random.default_rng(0)

    def build(hop_block):
        return FusedStreamingOnlineEngine(
            model, variables, cfg, frontend, spec=model_spec("res8"),
            num_streams=n_s, compute_dtype=dtype, hop_block=hop_block,
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
