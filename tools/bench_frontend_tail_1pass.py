"""Measure the round-4 frontend kernel changes on the REAL TPU.

Two changes under test (ops/frontend_pallas.py):
  1. narrow tail lookahead block (tail_rows = n_sub-1 rounded to a power of
     two, vs the previous full fb_block second read) — cuts input HBM
     traffic ~48%;
  2. precision="bf16" 1-pass mode (drops the x_hi@W_lo correction GEMM) —
     halves the DFT MXU passes, which dominate the step at serving shapes.

Prints slope-timed ms/iter (two-point method, cancels the relay's fixed
~31 ms dispatch cost) for bf16x2 and bf16 at the default and two larger
cell geometries, plus on-device max-abs error of each mode vs the jnp
HIGHEST-precision oracle on the same audio.

Run on the axon TPU:  python tools/bench_frontend_tail_1pass.py
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

    from howl_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram
    from howl_tpu.ops.frontend_pallas import log_mel_spectrogram_pallas

    cfg = FrontendConfig(n_mels=40)
    on_tpu = jax.devices()[0].platform != "cpu"
    batch, clip_s, iters = (512, 8.0, 16) if on_tpu else (4, 2.0, 2)
    rng = np.random.default_rng(0)
    clip = int(clip_s * 16000)
    audio = jax.device_put(rng.standard_normal((batch, clip)).astype(np.float32) * 0.1)
    audio_s = batch * clip_s

    # --- on-device accuracy vs the jnp oracle (small batch, real Mosaic) ---
    small = audio[:8]
    ref = np.asarray(log_mel_spectrogram(small, cfg))
    for prec in ("bf16x2", "bf16"):
        out = np.asarray(
            log_mel_spectrogram_pallas(small, cfg, precision=prec, interpret=not on_tpu)
        )
        err = float(np.abs(out - ref).max())
        print(f"precision={prec:7s} max|err| vs f32 oracle: {err:.4f} (log-mel units)")

    def slope(make_chain):
        lo, hi = iters, iters * 4
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

    def bench(precision, row_block, fb_block):
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
        except Exception as e:
            print(f"{precision:7s} rb={row_block:3d} fb={fb_block:4d}: FAILED {type(e).__name__}: {e}")
            return None
        print(
            f"{precision:7s} rb={row_block:3d} fb={fb_block:4d}: {dt*1e3:7.3f} ms/iter"
            f"  ({audio_s/dt:,.0f}x realtime)",
            flush=True,
        )
        return dt

    combos = [(4, 128), (8, 128), (4, 256)] if on_tpu else [(4, 128)]
    for prec in ("bf16x2", "bf16"):
        for rb, fb in combos:
            bench(prec, rb, fb)


if __name__ == "__main__":
    main()
