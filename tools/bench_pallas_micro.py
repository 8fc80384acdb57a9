"""Micro-benchmarks isolating the cost components of the Pallas frontend.

Methodology: iterations are chained inside ONE jitted lax.scan, but the large
operand (frames / hop-view) stays LOOP-INVARIANT — the per-iteration data
dependence flows through a tiny scalar fed to the kernel via SMEM, so the
chain adds no elementwise pass over the big tensor (an earlier version
multiplied the 670 MB frames array by a scalar every iteration, which
dominated every measurement).

Measures on the REAL TPU:

  1. stream-only: read each (FB, 512) frame block from HBM, write (FB, 128).
  2. gemm1/gemm3-bf16: add 1 / 3 single-pass bf16 (FB,512)@(512,512) GEMMs.
  3. polyphase: the frame materialization DISAPPEARS — input is the
     hop-blocked audio view (rows of hop samples, a free reshape), and each
     grid cell rebuilds its frames implicitly as sum_j H[i*FB+j : ...] @ W_j
     with the accumulation in VMEM. Reads ~audio-sized data instead of the
     2.56x-expanded frames.
  4. XLA framing alone (what the monolithic kernel pays outside).

Run (on the axon TPU): python tools/bench_pallas_micro.py
"""

from __future__ import annotations

import _path  # noqa: F401 — repo root on sys.path for howl_tpu

import sys

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

    from howl_tpu.ops.frontend import FrontendConfig, frame_signal

    cfg = FrontendConfig(n_mels=40)
    on_tpu = jax.devices()[0].platform != "cpu"
    batch, clip_s, iters = (512, 8.0, 16) if on_tpu else (4, 2.0, 2)
    rng = np.random.default_rng(0)
    audio = jax.device_put(rng.standard_normal((batch, int(clip_s * 16000))).astype(np.float32) * 0.1)
    jax.block_until_ready(audio)

    n_fft, hop = cfg.n_fft, cfg.hop_length
    w_np = np.ascontiguousarray(rng.standard_normal((n_fft, n_fft)).astype(np.float32))
    w_bf = jnp.asarray(w_np, jnp.bfloat16)

    def timed(name, fn, big):
        """fn(big, scalar) -> array; `big` is loop-invariant, scalar chains."""

        @jax.jit
        def chain(big):
            def body(s, _):
                out = fn(big, s)
                return jnp.asarray(out).ravel()[0].astype(jnp.float32) * 1e-30, None

            s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return s

        _ = np.asarray(chain(big))
        start = time.perf_counter()
        _ = float(np.asarray(chain(big)))
        dt = (time.perf_counter() - start) / iters
        print(f"{name:40s}: {dt*1e3:8.2f} ms/iter", flush=True)

    b, t = batch, cfg.num_frames(int(clip_s * 16000))

    FB = 256
    total = b * t - (b * t) % FB
    frames = jax.jit(lambda a: frame_signal(a, cfg).reshape(b * t, n_fft)[:total])(audio)
    jax.block_until_ready(frames)
    n_blocks = total // FB

    def stream_kernel(x_ref, s_ref, o_ref):
        o_ref[:, :] = x_ref[:, :128] + s_ref[0]

    def gemm_kernel(x_ref, w_ref, s_ref, o_ref, n_dots):
        x = (x_ref[:, :] + s_ref[0]).astype(jnp.bfloat16)
        acc = jnp.dot(x, w_ref[:, :], preferred_element_type=jnp.float32)
        for _ in range(n_dots - 1):
            acc += jnp.dot(x, w_ref[:, :], preferred_element_type=jnp.float32)
        o_ref[:, :] = acc[:, :128]

    def run_stream(x, s):
        return pl.pallas_call(
            stream_kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((FB, n_fft), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((FB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((total, 128), jnp.float32),
        )(x, s[None])

    def run_gemm(x, s, n_dots):
        return pl.pallas_call(
            partial(gemm_kernel, n_dots=n_dots),
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((FB, n_fft), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_fft, n_fft), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((FB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((total, 128), jnp.float32),
        )(x, w_bf, s[None])

    timed(f"stream-only FB={FB}", run_stream, frames)
    timed(f"gemm1-bf16  FB={FB}", lambda x, s: run_gemm(x, s, 1), frames)
    timed(f"gemm3-bf16  FB={FB}", lambda x, s: run_gemm(x, s, 3), frames)

    # ---- polyphase: no frame materialization ----
    # hop view H: (b, R, hop); frame t of a row = rows t..t+n_sub-1
    n_sub = -(-n_fft // hop)  # 3 at defaults
    FB = 128  # poly frame block: covers 640/641 frames per row (99.8%)
    t_pad = t - t % FB if t % FB else t  # frames per row, block multiple
    rows = t_pad + FB  # one extra block of rows so in2's last block exists
    need = rows * hop
    audio_p = jax.jit(
        lambda a: jnp.pad(a, ((0, 0), (0, need - a.shape[-1]))).reshape(b, rows, hop)
    )(audio)
    jax.block_until_ready(audio_p)
    # per-j W blocks, zero-padded to full hop width so no lane slicing needed
    w_js = []
    for j in range(n_sub):
        wj = np.zeros((hop, n_fft), np.float32)
        width = min(hop, n_fft - j * hop)
        wj[:width] = w_np[j * hop : j * hop + width]
        w_js.append(jnp.asarray(wj, jnp.bfloat16))

    grid_t = t_pad // FB

    def poly_kernel(h0_ref, h1_ref, *refs, n_dots):
        wrefs, (s_ref, o_ref) = refs[:-2], refs[-2:]
        h = jnp.concatenate([h0_ref[0], h1_ref[0]], axis=0) + s_ref[0]  # (2FB, hop)
        hb = h.astype(jnp.bfloat16)
        for _ in range(n_dots):
            acc = jnp.dot(hb[:FB], wrefs[0][:, :], preferred_element_type=jnp.float32)
            for j in range(1, n_sub):
                acc += jnp.dot(hb[j : j + FB], wrefs[j][:, :], preferred_element_type=jnp.float32)
        o_ref[0] = acc[:, :128]

    def run_poly(x, s, n_dots):
        return pl.pallas_call(
            partial(poly_kernel, n_dots=n_dots),
            grid=(b, grid_t),
            in_specs=[
                pl.BlockSpec((1, FB, hop), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, FB, hop), lambda bi, i: (bi, i + 1, 0), memory_space=pltpu.VMEM),
                *[
                    pl.BlockSpec((hop, n_fft), lambda bi, i: (0, 0), memory_space=pltpu.VMEM)
                    for _ in range(n_sub)
                ],
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, FB, 128), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, t_pad, 128), jnp.float32),
        )(x, x, *w_js, s[None])

    timed("polyphase x1 (1-pass dft)", lambda x, s: run_poly(x, s, 1), audio_p)
    timed("polyphase x3 (3-pass dft)", lambda x, s: run_poly(x, s, 3), audio_p)

    timed("xla framing only", lambda a, s: frame_signal(a + s * 1e-30, cfg), audio)

if __name__ == "__main__":
    main()
