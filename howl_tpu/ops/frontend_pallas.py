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


def _dot_bf16x3(x, a_hi, a_lo):
    """f32-grade matmul from three single-pass bf16 MXU GEMMs.

    Splits x into hi+lo bf16 halves and drops only the lo*lo cross term
    (~2^-18 relative): x @ A ~ x_hi@A_hi + x_hi@A_lo + x_lo@A_hi. Mosaic has
    no Precision.HIGH in-kernel; this is that 3-pass decomposition by hand.

    Measured on the v5e (tools/validate_pallas_precision.py + bench.py):
    accuracy is fine (log-mel error vs the torchaudio goldens 5e-3 above the
    -10 floor; DEFAULT bf16 alone: >3.0 — the DFT cancellation dies; HIGHEST:
    1.2e-4) but it is ~2.5x SLOWER than precision=HIGHEST through this stack —
    Mosaic's native multi-pass f32 dot beats three separate bf16 dots with
    VPU accumulation. Kept as an option; HIGHEST is the default.
    """
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    kw = dict(preferred_element_type=jnp.float32)
    return jnp.dot(x_hi, a_hi, **kw) + (jnp.dot(x_hi, a_lo, **kw) + jnp.dot(x_lo, a_hi, **kw))


def _kernel(frames_ref, *refs, precision):
    """Operands after frames: bf16x3 mode gets (cos_hi, cos_lo, sin_hi,
    sin_lo); plain-precision mode gets (cos, sin) — no dead zero matrices
    streamed into VMEM. Trailing refs are always (fb, zmuv, out)."""
    mat_refs, (fb_ref, zmuv_ref, out_ref) = refs[:-3], refs[-3:]
    frames = frames_ref[:, :]  # (FRAME_BLOCK, n_fft); hann folded into DFT mats
    if precision is None:  # bf16x3 option (measured slower than HIGHEST on v5e)
        cos_hi_ref, cos_lo_ref, sin_hi_ref, sin_lo_ref = mat_refs
        re = _dot_bf16x3(frames, cos_hi_ref[:, :], cos_lo_ref[:, :])
        im = _dot_bf16x3(frames, sin_hi_ref[:, :], sin_lo_ref[:, :])
    else:  # the default: exact f32 matrices at Mosaic's native multi-pass dot
        cos_ref, sin_ref = mat_refs
        re = jnp.dot(frames, cos_ref[:, :], preferred_element_type=jnp.float32, precision=precision)
        im = jnp.dot(frames, sin_ref[:, :], preferred_element_type=jnp.float32, precision=precision)
    power = re * re + im * im  # (FRAME_BLOCK, n_freqs_pad) — stays in VMEM
    # mel GEMM stays HIGHEST: 1/8 of the DFT MACs, and power's wide dynamic
    # range (no cancellation, but 8 decades) is what the log reads directly
    mel = jnp.dot(power, fb_ref[:, :], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
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
    ``precision=None`` selects the bf16x3 DFT path (f32-grade accuracy but
    measured slower than HIGHEST on v5e — see _dot_bf16x3); the default
    HIGHEST is both the fastest and the most faithful on this hardware.
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
    if precision is None:
        # hi/lo bf16 splits of the DFT matrices (see _dot_bf16x3)
        import ml_dtypes

        def split_bf16(a):
            hi = a.astype(ml_dtypes.bfloat16)
            lo = (a - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
            return hi, lo

        cos_hi, cos_lo = split_bf16(cos_p)
        sin_hi, sin_lo = split_bf16(sin_p)
        dft_mats = [cos_hi, cos_lo, sin_hi, sin_lo]
    else:
        dft_mats = [cos_p, sin_p]
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
            *[
                pl.BlockSpec((n_fft, n_freqs_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
                for _ in dft_mats
            ],
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
    )(frames, *[jnp.asarray(m) for m in dft_mats], jnp.asarray(fb_p), zmuv)

    out = out[:total, : config.n_mels].reshape(b, n_frames, config.n_mels)
    return out.swapaxes(-1, -2)  # (B, n_mels, T)
