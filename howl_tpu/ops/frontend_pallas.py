"""Fused log-mel frontend as a Pallas TPU kernel.

The reference's torchaudio chain (MelSpectrogram -> +eps -> log -> ZMUV,
ref: howl/data/transform/transform.py:249-275, operator.py:145) runs as
separate kernels with HBM round-trips between every stage. Here the whole math
pipeline — Hann window, real-DFT as two MXU GEMMs, power spectrum, mel
filterbank GEMM, log, ZMUV normalize — is ONE Pallas kernel: each (128, n_fft)
frame block is read from HBM exactly once and everything else stays in VMEM.

Framing (the overlapping gather audio[i*hop : i*hop+n_fft]) is left to XLA on
purpose: hop=200 isn't lane-aligned, so in-kernel extraction would need
unaligned vector loads Mosaic rejects ("index ... multiple of 1024"); a gather
is pure data movement XLA already emits optimally, and it feeds the kernel a
stride-regular (frames, n_fft) operand.

Operand padding: freq bins 257 -> 384 lanes, mel bins -> 128 lanes; padded
filterbank columns are zero so cropped outputs are exact.

The pure-jnp implementation in frontend.py is the correctness oracle; see
tests/test_frontend_pallas.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from howl_tpu.ops.frontend import FrontendConfig, _hann_window, dft_matrices, mel_filterbank

FRAME_BLOCK = 128
LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(frames_ref, cos_ref, sin_ref, fb_ref, zmuv_ref, out_ref, *, precision):
    # HIGHEST is load-bearing: measured on-device against the torchaudio
    # goldens (tools/validate_pallas_precision.py), DEFAULT single-pass bf16
    # destroys the DFT's cancellation (log-mel error >3.0) while HIGHEST
    # matches to 1.2e-4; Mosaic does not support HIGH in-kernel.
    frames = frames_ref[:, :]  # (FRAME_BLOCK, n_fft); hann folded into DFT mats
    re = jnp.dot(frames, cos_ref[:, :], preferred_element_type=jnp.float32, precision=precision)
    im = jnp.dot(frames, sin_ref[:, :], preferred_element_type=jnp.float32, precision=precision)
    power = re * re + im * im  # (FRAME_BLOCK, n_freqs_pad) — stays in VMEM
    mel = jnp.dot(power, fb_ref[:, :], preferred_element_type=jnp.float32, precision=precision)
    mean = zmuv_ref[0]
    inv_std = zmuv_ref[1]
    out_ref[:, :] = (jnp.log(mel + 1e-7) - mean) * inv_std


@partial(jax.jit, static_argnames=("config", "interpret", "precision"))
def log_mel_spectrogram_pallas(
    audio: jnp.ndarray,
    config: FrontendConfig = FrontendConfig(),
    zmuv_mean=0.0,
    zmuv_std=1.0,
    interpret: bool = False,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """(B, samples) -> ZMUV-normalized (B, n_mels, frames) log-mels.

    Numerically matches ``(log_mel_spectrogram(audio) - mean) / std`` from the
    jnp reference (same center/reflect padding, Hann window, HTK mel).
    """
    if audio.ndim == 1:
        audio = audio[None, :]
    b = audio.shape[0]
    hop, n_fft = config.hop_length, config.n_fft
    n_frames = config.num_frames(audio.shape[-1])

    # XLA-side framing (reshape+slice+concat, no gather) -> (B*T, n_fft)
    from howl_tpu.ops.frontend import frame_signal

    frames = frame_signal(audio, config).reshape(b * n_frames, n_fft)
    total = b * n_frames
    total_pad = _round_up(total, FRAME_BLOCK)
    frames = jnp.pad(frames, ((0, total_pad - total), (0, 0)))

    n_freqs = config.n_freqs
    n_freqs_pad = _round_up(n_freqs, LANE)
    n_mels_pad = _round_up(config.n_mels, LANE)

    cos_m, sin_m = dft_matrices(n_fft)
    window = _hann_window(n_fft)[:, None]
    cos_p = np.zeros((n_fft, n_freqs_pad), np.float32)
    sin_p = np.zeros((n_fft, n_freqs_pad), np.float32)
    cos_p[:, :n_freqs] = cos_m * window  # fold the hann window into the DFT
    sin_p[:, :n_freqs] = sin_m * window
    fb = mel_filterbank(n_freqs, config.n_mels, config.sample_rate, config.f_min, config.f_max)
    fb_p = np.zeros((n_freqs_pad, n_mels_pad), np.float32)
    fb_p[:n_freqs, : config.n_mels] = fb
    zmuv = jnp.stack([jnp.float32(zmuv_mean), 1.0 / jnp.float32(zmuv_std)])

    n_blocks = total_pad // FRAME_BLOCK
    flops_per_block = 2 * FRAME_BLOCK * n_fft * n_freqs_pad * 2 + 2 * FRAME_BLOCK * n_freqs_pad * n_mels_pad

    out = pl.pallas_call(
        partial(_kernel, precision=precision),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((FRAME_BLOCK, n_fft), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_freqs_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_freqs_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_freqs_pad, n_mels_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((FRAME_BLOCK, n_mels_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total_pad, n_mels_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_block * n_blocks,
            bytes_accessed=(total_pad * n_fft + total_pad * n_mels_pad) * 4,
            transcendentals=total_pad * n_mels_pad,
        ),
        interpret=interpret,
    )(frames, jnp.asarray(cos_p), jnp.asarray(sin_p), jnp.asarray(fb_p), zmuv)

    out = out[:total, : config.n_mels].reshape(b, n_frames, config.n_mels)
    return out.swapaxes(-1, -2)  # (B, n_mels, T)
