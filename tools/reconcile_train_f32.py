"""Reconcile the train-throughput history (VERDICT r4 weak #2 / ask #2).

BENCH_r03 train_examples_per_sec = 229,148 vs BENCH_r04
train_examples_per_sec_f32 = 190,913 read as a -17% f32 regression. Code
archaeology says otherwise: the round-3 bench step was ALREADY bf16
(bench.py at de8a989: ``create_model(..., dtype=jnp.bfloat16)`` +
``dft_precision=HIGH`` whenever on_tpu — only the TRAINER lacked a --bf16
flag). The comparable bf16 series is 229,148 (r03) -> 241,212 (r04), +5.3%;
the ``_f32`` key is a new metric first measured in round 4.

This tool re-measures BOTH precisions at the exact BENCH geometry
(batch 1024, 64-iteration chain, 8000-sample windows) on the current tree
so the two series can be confirmed against their recorded values.

Run on the real TPU:  python tools/reconcile_train_f32.py
"""

from __future__ import annotations

import _path  # noqa: F401 — repo root on sys.path

import json


def main():
    from howl_tpu.utils.platform import ensure_platform

    ensure_platform()
    import jax

    import bench

    on_tpu = jax.devices()[0].platform != "cpu"
    bf16, _mfu, _noise, f32 = bench.bench_train_step(on_tpu)
    print(
        json.dumps(
            {
                "train_examples_per_sec_bf16": round(bf16, 1),
                "train_examples_per_sec_f32": round(f32, 1),
                "recorded_r03_bf16": 229148.3,
                "recorded_r04_bf16": 241212.1,
                "recorded_r04_f32": 190913.0,
            }
        )
    )


if __name__ == "__main__":
    main()
