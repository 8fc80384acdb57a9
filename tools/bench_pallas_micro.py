"""Micro-benchmarks isolating the cost components of the Pallas frontend.

Times, on the REAL TPU, with scan-chained iterations in one dispatch:

  1. stream-only: read each (FB, 512) frame block from HBM, write a (FB, 128)
     reduction — the pure memory-traffic floor of the kernel.
  2. gemm1-bf16: one single-pass bf16 (FB,512)@(512,512) GEMM per block.
  3. gemm3-bf16: three such GEMMs (the bf16x3 DFT cost).
  4. the XLA framing alone (frame_signal materialization).
  5. full current kernel for reference.

This tells whether kernel time is HBM streaming, MXU passes, or fixed
per-block overhead (vary FRAME_BLOCK to separate the last).

Run (on the axon TPU): python tools/bench_pallas_micro.py
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np


def main():
    from howl_tpu.utils.platform import ensure_platform

    ensure_platform()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import howl_tpu.ops.frontend_pallas as fp
    from howl_tpu.ops.frontend import FrontendConfig, frame_signal

    cfg = FrontendConfig(n_mels=40)
    on_tpu = jax.devices()[0].platform != "cpu"
    batch, clip_s, iters = (512, 8.0, 16) if on_tpu else (4, 2.0, 2)
    rng = np.random.default_rng(0)
    audio = jax.device_put(rng.standard_normal((batch, int(clip_s * 16000))).astype(np.float32) * 0.1)
    jax.block_until_ready(audio)

    n_fft = cfg.n_fft
    w = np.ascontiguousarray(rng.standard_normal((n_fft, n_fft)).astype(np.float32))
    w_bf = jnp.asarray(w, jnp.bfloat16)

    def timed(name, fn, x):
        @jax.jit
        def chain(a):
            def body(a, _):
                s = fn(a).sum().astype(jnp.float32)
                return a * (1.0 + s * 1e-30), s

            a, _ = jax.lax.scan(body, a, None, length=iters)
            return jnp.asarray(a).ravel()[0]

        _ = np.asarray(chain(x))
        start = time.perf_counter()
        _ = float(np.asarray(chain(x)))
        dt = (time.perf_counter() - start) / iters
        print(f"{name:40s}: {dt*1e3:8.2f} ms/iter")

    b, t = batch, cfg.num_frames(int(clip_s * 16000))

    for fb in (256, 1024):
        total = b * t - (b * t) % fb
        # frames stay device-resident: fetching 670 MB through the dev relay
        # (or pushing it back) takes minutes and is not what we measure
        frames = jax.jit(lambda a, total=total: frame_signal(a, cfg).reshape(b * t, n_fft)[:total])(audio)
        jax.block_until_ready(frames)
        n_blocks = total // fb

        def stream_kernel(x_ref, o_ref):
            o_ref[:, :] = x_ref[:, :128] + 1.0

        def gemm_kernel(x_ref, w_ref, o_ref, n_dots):
            x = x_ref[:, :].astype(jnp.bfloat16)
            acc = jnp.dot(x, w_ref[:, :], preferred_element_type=jnp.float32)
            for _ in range(n_dots - 1):
                acc += jnp.dot(x, w_ref[:, :], preferred_element_type=jnp.float32)
            o_ref[:, :] = acc[:, :128]

        def run_stream(x, fb=fb, n_blocks=n_blocks):
            return pl.pallas_call(
                stream_kernel,
                grid=(n_blocks,),
                in_specs=[pl.BlockSpec((fb, n_fft), lambda i: (i, 0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((fb, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((total, 128), jnp.float32),
            )(x)

        def run_gemm(x, n_dots, fb=fb, n_blocks=n_blocks):
            return pl.pallas_call(
                partial(gemm_kernel, n_dots=n_dots),
                grid=(n_blocks,),
                in_specs=[
                    pl.BlockSpec((fb, n_fft), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((n_fft, n_fft), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((fb, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((total, 128), jnp.float32),
            )(x, w_bf)

        timed(f"stream-only FB={fb}", run_stream, frames)
        timed(f"gemm1-bf16  FB={fb}", lambda x: run_gemm(x, 1), frames)
        timed(f"gemm3-bf16  FB={fb}", lambda x: run_gemm(x, 3), frames)

    timed("xla framing only", lambda a: frame_signal(a, cfg), audio)
    timed("full pallas bf16x3", lambda a: fp.log_mel_spectrogram_pallas(a, cfg, 0.0, 1.0), audio)


if __name__ == "__main__":
    main()
