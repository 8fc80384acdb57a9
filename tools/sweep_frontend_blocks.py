"""Block-geometry sweep of the polyphase Pallas frontend on the real chip.

The kernel's grid cell covers (row_block batch rows) x (fb_block frames);
the per-j GEMM flattens them into one M = row_block*fb_block dimension.
Round-3 fixed (4, 128) -> M=512 from a two-point comparison; this sweeps the
full grid with slope timing (see tools/bench_hbm_sweep.py methodology: time
chains of N and 4N iterations, divide the difference by 3N — cancels the
relay's fixed ~31 ms dispatch+fetch cost exactly).

Per-cell math at batch 512 x 8 s, bf16x2: ~0.8 GFLOP -> ~4 us MXU at peak,
~0.8 MB input DMA -> ~1.2 us at the measured streaming envelope; the kernel
should be compute-bound at ~2.9 ms + traffic, yet measures ~6.9 ms — cell
granularity and pipeline occupancy are the levers this sweep probes.

Run on the real TPU:  python tools/sweep_frontend_blocks.py [--batch 512]
"""

from __future__ import annotations

import _path  # noqa: F401

import argparse
import time

import numpy as np


def main(argv=None):
    from howl_tpu.utils.platform import ensure_platform

    ensure_platform()

    import jax
    import jax.numpy as jnp

    from howl_tpu.ops.frontend import FrontendConfig
    from howl_tpu.ops.frontend_pallas import log_mel_spectrogram_pallas

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--clip-seconds", type=float, default=8.0)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--precision", default="bf16x2")
    args = p.parse_args(argv)

    on_tpu = jax.devices()[0].platform != "cpu"
    if not on_tpu:
        args.batch, args.clip_seconds, args.iters = 4, 2.0, 2

    cfg = FrontendConfig(n_mels=40)
    rng = np.random.default_rng(0)
    clip = int(args.clip_seconds * 16000)
    audio = jax.device_put(rng.standard_normal((args.batch, clip)).astype(np.float32) * 0.1)
    audio_s = args.batch * args.clip_seconds
    precision = None if args.precision == "none" else args.precision

    def slope(make_chain):
        lo, hi = args.iters, args.iters * 4
        c_lo, c_hi = make_chain(lo), make_chain(hi)
        _ = float(np.asarray(c_lo(audio)))
        _ = float(np.asarray(c_hi(audio)))
        slopes = []
        for _rep in range(3):
            t0 = time.perf_counter()
            _ = float(np.asarray(c_lo(audio)))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = float(np.asarray(c_hi(audio)))
            t_hi = time.perf_counter() - t0
            slopes.append((t_hi - t_lo) / (hi - lo))
        return float(np.median(slopes))

    def bench(row_block, fb_block):
        def make_chain(length):
            @jax.jit
            def chain(a):
                def body(s, _):
                    out = log_mel_spectrogram_pallas(
                        a + s * 0.0, cfg, 0.0, 1.0,
                        precision=precision, out_dtype=jnp.bfloat16,
                        row_block=row_block, fb_block=fb_block,
                        interpret=not on_tpu,
                    )
                    return out.ravel()[0].astype(jnp.float32) * 1e-30, None

                s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=length)
                return s

            return chain

        try:
            dt = slope(make_chain)
        except Exception as e:  # VMEM overflow etc — report, keep sweeping
            print(f"row_block={row_block:3d} fb_block={fb_block:4d}: FAILED {type(e).__name__}")
            return None
        m = row_block * fb_block
        print(
            f"row_block={row_block:3d} fb_block={fb_block:4d} (M={m:5d}): "
            f"{dt*1e3:7.3f} ms/iter  ({audio_s/dt:,.0f}x realtime)",
            flush=True,
        )
        return dt

    combos = [
        (4, 128),  # round-3 default
        (8, 128), (16, 128), (32, 128),
        (2, 256), (4, 256), (8, 256), (16, 256),
        (1, 512), (2, 512), (4, 512), (8, 512),
        (1, 1024), (2, 1024), (4, 1024),
    ]
    if not on_tpu:
        combos = [(4, 128), (2, 256), (1, 512)]
    results = {}
    for rb, fb in combos:
        if args.batch % rb:
            continue
        dt = bench(rb, fb)
        if dt is not None:
            results[(rb, fb)] = dt
    if not results:
        print("\nno combo succeeded")
        return
    best = min(results, key=results.get)
    print(f"\nbest: row_block={best[0]} fb_block={best[1]} "
          f"({results[best]*1e3:.3f} ms/iter, {audio_s/results[best]:,.0f}x realtime)")


if __name__ == "__main__":
    main()
