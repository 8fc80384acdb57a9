"""Benchmark log-mel frontend variants on the REAL TPU.

Compares, with scan-chained iterations inside one dispatch (per the bench.py
methodology), the fused Pallas kernel (frontend_pallas.py) at several
FRAME_BLOCK sizes and precision modes against the pure-XLA GEMM chain
(frontend.py) at HIGHEST / HIGH / DEFAULT DFT precision, and prints the
accuracy of the cheaper modes against the HIGHEST chain.

Measured v5e results (2026-08, batch 512 x 8 s clips) that set the engine
defaults in inference/engine.py:

    pallas HIGHEST (any FRAME_BLOCK)   ~21.5 ms/iter
    pallas bf16x3                      ~17.5 ms/iter
    xla chain HIGHEST dft              ~11.8 ms/iter
    xla chain HIGH dft                 ~ 9.8 ms/iter   (2.2e-4 above-floor err)
    xla chain DEFAULT dft              ~ 7.1 ms/iter   (7.4e-2 err — rejected)

XLA's own tiling + epilogue fusion (power, mel GEMM, log folded around the DFT
GEMMs) beats the hand-tiled Mosaic kernel at these shapes, so the engines
default to the XLA chain (HIGH when bf16 scoring is on) and the Pallas kernel
is opt-in via use_pallas_frontend=True.

Run (on the axon TPU): python tools/bench_frontend_variants.py
"""

from __future__ import annotations

import _path  # noqa: F401 — repo root on sys.path for howl_tpu

import sys

import time

import numpy as np

def main():
    from howl_tpu.utils.platform import ensure_platform

    ensure_platform()

    import jax
    import jax.numpy as jnp

    import howl_tpu.ops.frontend_pallas as fp
    from howl_tpu.ops.frontend import (
        FrontendConfig,
        _hann_window,
        dft_matrices,
        frame_signal,
        mel_filterbank,
    )

    cfg = FrontendConfig(n_mels=40)
    on_tpu = jax.devices()[0].platform != "cpu"
    batch, clip_s, iters = (512, 8.0, 16) if on_tpu else (4, 2.0, 2)
    rng = np.random.default_rng(0)
    audio = jax.device_put(rng.standard_normal((batch, int(clip_s * 16000))).astype(np.float32) * 0.1)
    jax.block_until_ready(audio)

    def timed(name, fn):
        @jax.jit
        def chain(a):
            def body(a, _):
                s = fn(a).sum().astype(jnp.float32)
                return a * (1.0 + s * 1e-30), s

            a, _ = jax.lax.scan(body, a, None, length=iters)
            return a[0, 0]

        _ = np.asarray(chain(audio))
        start = time.perf_counter()
        _ = float(np.asarray(chain(audio)))
        dt = (time.perf_counter() - start) / iters
        print(f"{name:42s}: {dt*1e3:8.2f} ms/iter")

    import os

    skip_pallas = os.environ.get("HOWL_BENCH_SKIP_PALLAS", "0") == "1"
    for fb_block in () if skip_pallas else (128, 256, 512):
        fp.FRAME_BLOCK = fb_block
        timed(
            f"pallas f32(6-pass) FRAME_BLOCK={fb_block}",
            lambda a: fp.log_mel_spectrogram_pallas(a, cfg, 0.0, 1.0, precision=jax.lax.Precision.HIGHEST),
        )
        timed(
            f"pallas bf16x3  FRAME_BLOCK={fb_block}",
            lambda a: fp.log_mel_spectrogram_pallas(a, cfg, 0.0, 1.0, precision=None),
        )
        timed(
            f"pallas bf16x2  FRAME_BLOCK={fb_block}",
            lambda a: fp.log_mel_spectrogram_pallas(a, cfg, 0.0, 1.0, precision="bf16x2"),
        )
    fp.FRAME_BLOCK = 256

    n_freqs = cfg.n_freqs
    cos_m, sin_m = dft_matrices(cfg.n_fft)
    win = _hann_window(cfg.n_fft)[:, None]
    cosw, sinw = jnp.asarray(cos_m * win), jnp.asarray(sin_m * win)
    fb = jnp.asarray(mel_filterbank(n_freqs, cfg.n_mels, cfg.sample_rate, cfg.f_min, cfg.f_max))

    def xla_chain(a, precision):
        frames = frame_signal(a, cfg)
        re = jnp.dot(frames, cosw, precision=precision, preferred_element_type=jnp.float32)
        im = jnp.dot(frames, sinw, precision=precision, preferred_element_type=jnp.float32)
        power = re * re + im * im
        mel = jnp.dot(power, fb, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32)
        return jnp.log(mel + 1e-7)

    for name, prec in (
        ("HIGHEST", jax.lax.Precision.HIGHEST),
        ("HIGH", jax.lax.Precision.HIGH),
        ("DEFAULT", jax.lax.Precision.DEFAULT),
    ):
        timed(f"xla chain {name} dft", lambda a, p=prec: xla_chain(a, p))

    # combined (n_fft, n_fft) windowed-DFT matrix with the Nyquist bin cropped
    # (mel weight identically zero): ONE square GEMM, no padded MXU lanes, no
    # separate window pass
    from howl_tpu.ops.frontend import log_mel_spectrogram, nyquist_crop_bins, windowed_dft_matrix

    for name, prec in (
        ("HIGHEST", None),
        ("HIGH", jax.lax.Precision.HIGH),
        ("DEFAULT", jax.lax.Precision.DEFAULT),
    ):
        timed(f"combined512 {name} dft", lambda a, p=prec: log_mel_spectrogram(a, cfg, precision=p))

    # two separate windowed+cropped matrices (512, 256): window folded in, no
    # lane padding, but the GEMM split XLA already schedules well
    n_bins = nyquist_crop_bins(cfg)
    w_all = jnp.asarray(windowed_dft_matrix(cfg.n_fft, n_bins))
    cw, sw = w_all[:, :n_bins], w_all[:, n_bins:]
    fbc = fb[:n_bins]

    def twomat_chain(a, precision):
        frames = frame_signal(a, cfg)
        re = jnp.matmul(frames, cw, precision=precision)
        im = jnp.matmul(frames, sw, precision=precision)
        power = re * re + im * im
        mel = jnp.matmul(power, fbc, precision=jax.lax.Precision.HIGHEST)
        return jnp.log(mel + 1e-7)

    def twomat2d_chain(a, precision):
        frames = frame_signal(a, cfg)
        b2, t2, k2 = frames.shape
        frames = frames.reshape(b2 * t2, k2)
        re = jnp.matmul(frames, cw, precision=precision)
        im = jnp.matmul(frames, sw, precision=precision)
        power = re * re + im * im
        mel = jnp.matmul(power, fbc, precision=jax.lax.Precision.HIGHEST)
        return jnp.log(mel + 1e-7)

    for name, prec in (
        ("HIGHEST", jax.lax.Precision.HIGHEST),
        ("HIGH", jax.lax.Precision.HIGH),
    ):
        timed(f"twomat crop {name} dft", lambda a, p=prec: twomat_chain(a, p))
        timed(f"twomat crop 2d {name} dft", lambda a, p=prec: twomat2d_chain(a, p))

    hi = np.asarray(xla_chain(audio[:8], jax.lax.Precision.HIGHEST))
    for name, prec in (("HIGH", jax.lax.Precision.HIGH), ("DEFAULT", jax.lax.Precision.DEFAULT)):
        v = np.asarray(xla_chain(audio[:8], prec))
        mask = hi > -10.0
        print(
            f"xla {name} vs HIGHEST: above-floor max err {np.abs(v - hi)[mask].max():.2e}, "
            f"global max {np.abs(v - hi).max():.2e}"
        )

if __name__ == "__main__":
    main()
