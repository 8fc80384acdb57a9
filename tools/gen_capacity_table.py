"""Generate the docs/SERVING.md capacity table from the SAME step-time model
the hub guardrails use (howl_tpu/inference/capacity.py) — the table can't
drift from the code.

    python tools/gen_capacity_table.py            # print the markdown table
    python tools/gen_capacity_table.py --calibrate N1,N2,...
        measure actual step times for the profiled engines at the given
        stream counts on the current device (real TPU recommended) and print
        updated profile points next to the model's predictions.
"""

from __future__ import annotations

try:
    import _path  # noqa: F401 — repo root on sys.path for howl_tpu
except ImportError:  # imported as tools.gen_capacity_table (tests): already on path
    pass

import argparse


def markdown_table() -> str:
    from howl_tpu.inference.capacity import HOP_MS, capacity_table

    lines = [
        "| Engine | Sustainable streams/chip | Measured ceiling | Step @16k streams | Decision lag (hops) |",
        "|---|---|---|---|---|",
    ]
    for row in capacity_table(HOP_MS):
        lines.append(
            f"| `{row['engine']}` | ~{row['sustainable_streams']:,} | {row['ceiling']:,} "
            f"| {row['step_ms_at_16k']} ms | {row['decision_latency_hops']} |"
        )
    return "\n".join(lines)


def calibrate(stream_counts):
    """Measure real per-step times and compare against the model."""
    import time

    import numpy as np

    from howl_tpu.inference.capacity import PROFILES
    from howl_tpu.inference.config import EngineConfig
    from howl_tpu.models import create_model
    from howl_tpu.ops.frontend import FrontendConfig
    from howl_tpu.utils.platform import ensure_platform

    ensure_platform()
    import jax

    cfg = EngineConfig(num_labels=4, negative_label=3)
    frontend = FrontendConfig(n_mels=40)
    model = create_model("res8", num_labels=4)
    feats0 = np.zeros((1, 1, 40, 41), np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats0, train=False)

    from howl_tpu.inference.online import IncrementalOnlineEngine
    from howl_tpu.inference.streaming_trunk import FusedStreamingOnlineEngine

    builds = {
        ("incremental", 1): lambda n: IncrementalOnlineEngine(
            model, variables, cfg, frontend, 0.0, 1.0, num_streams=n),
        ("streaming_trunk", 1): lambda n: FusedStreamingOnlineEngine(
            model, variables, cfg, frontend, 0.0, 1.0, num_streams=n),
        ("streaming_trunk", 3): lambda n: FusedStreamingOnlineEngine(
            model, variables, cfg, frontend, 0.0, 1.0, num_streams=n, hop_block=3),
    }
    rng = np.random.default_rng(0)
    for key, build in builds.items():
        prof = PROFILES[key]
        for n in stream_counts:
            engine = build(n)
            hop = engine.hop_samples * getattr(engine, "hop_block", 1)
            batch = (rng.standard_normal((n, hop)) * 0.1).astype(np.float32)
            engine.push(batch)  # compile + warm
            iters = 12
            start = time.perf_counter()
            for _ in range(iters):
                engine.push(batch)
            dt = (time.perf_counter() - start) / iters * 1e3
            print(
                f"{prof.label:46s} n={n:>7,}: measured {dt:7.2f} ms/step, "
                f"model {prof.predict_step_ms(n):7.2f} ms", flush=True,
            )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--calibrate", type=str, default=None,
                   help="comma-separated stream counts to measure on-device")
    args = p.parse_args(argv)
    print(markdown_table())
    if args.calibrate:
        calibrate([int(x) for x in args.calibrate.split(",")])


if __name__ == "__main__":
    main()
