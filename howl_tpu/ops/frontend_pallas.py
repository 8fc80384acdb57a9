"""Fused log-mel frontend as a polyphase Pallas TPU kernel.

The reference's torchaudio chain (MelSpectrogram -> +eps -> log -> ZMUV,
ref: howl/data/transform/transform.py:249-275, operator.py:145) runs as
separate kernels with HBM round-trips between every stage. The XLA GEMM chain
in frontend.py collapses the math but still materializes the 2.56x-expanded
overlapping frames tensor in HBM (write + read back: the chain is HBM-bound,
measured ~10 ms per 512x8 s batch on v5e where its MXU work alone is <1 ms).

This kernel removes that tensor entirely with a POLYPHASE decomposition of
the windowed DFT. Frames overlap because hop < n_fft; but frame t is just
hop-rows t..t+n_sub-1 of the hop-blocked audio view H = audio.reshape(-1, hop)
(n_sub = ceil(n_fft/hop), 3 at defaults). So

    frames @ W  ==  sum_j  H[t+j] @ W_j,      W_j = W[j*hop : j*hop + w_j]

and the kernel computes the right-hand side directly: each grid cell loads a
block of hop-rows (plus a narrow n_sub-1-row lookahead tail for the overlap —
a full-block lookahead would read every audio byte twice), rebuilds nothing,
and accumulates the per-j GEMMs in VMEM. HBM traffic drops to ~the audio size.
The power spectrum and mel filterbank GEMM stay fused in VMEM; the output is
written as contiguous PRE-log (frames, mels) tiles (a transposed, mel-narrow
write costs ~6 ms/iter in strided DMAs — measured) and the log + ZMUV fuse
into the XLA transpose+crop pass to (B, n_mels, T) that runs anyway — the
VPU transcendental then touches the 40 real mels, not all 128 padded kernel
lanes, and bf16 tiles quantize better pre-log (see _kernel).

W is the combined [cos|sin] windowed-DFT matrix (Hann folded in, Nyquist bin
cropped — its mel weight is identically zero, see frontend.nyquist_crop_bins):
(512, 512) at defaults, exact 128-lane MXU tiles.

Precision is hand-rolled as single-pass bf16 GEMMs against hi/lo matrix
splits instead of Mosaic's 6-pass f32 emulation:

  * ``precision=None`` (default): 3-pass x_hi@W_hi + x_lo@W_hi + x_hi@W_lo,
    dropping only the lo*lo term (~2^-17 relative) — the Precision.HIGH grade.
  * ``precision="bf16x2"``: 2-pass with bf16 audio rows (~2^-9, below the
    serving engines' bf16 feature-cast floor; validate decisions per model).
  * ``precision="bf16"``: 1-pass — both operands bf16, the x_hi@W_lo
    correction dropped too. The W quantization error (~2^-9 relative, same
    scale as the already-dropped audio lo term) rides through power+mel+log
    at the same grade as ``bf16x2``; it halves the kernel's MXU passes,
    which dominate the step at serving shapes. Validate decisions per model.
  * ``precision=Precision.HIGHEST``: Mosaic native f32 (oracle-grade).

The mel GEMM runs the 3-pass split in HIGH mode (~1/16 of the DFT MACs, and
its operands — power, triangle weights — are non-negative: no cancellation).
In ``bf16x2`` mode it is a single bf16 pass: the all-positive contraction
keeps the relative error at ~2^-8, the same grade as the mode's bf16 output
quantization, while dropping ~10% of the kernel's total MACs.

At serving shapes the DFT GEMM passes DOMINATE the step (~3.1 ms of pure MXU
time for 2 passes at batch 512 x 8 s — dropping one pass saves ~25% measured,
tools/bench_frontend_tail_1pass.py), which is why the pass count is the main
speed/precision dial; the input traffic matters second (the narrow-tail
lookahead saved ~8%), and the per-j K-padding (200 -> 256) rides along free
inside the pass.

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

from howl_tpu.ops.frontend import (
    FrontendConfig,
    mel_filterbank,
    nyquist_crop_bins,
    windowed_dft_matrix,
)

FRAME_BLOCK = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _split_bf16(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """hi/lo bf16 decomposition: a ~ hi + lo with |lo| <= ulp(hi)/2."""
    import ml_dtypes

    hi = a.astype(ml_dtypes.bfloat16)
    lo = (a - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


def _passes_for(precision) -> int:
    """Map a precision request to the pass count. Explicit matching only —
    an unrecognized value raises instead of silently landing on a mode with
    different accuracy (the 2/3/6-pass grades differ by orders of magnitude)."""
    if precision is None:
        return 3
    if precision == "bf16x2":
        return 2
    if precision == "bf16":
        return 1
    if isinstance(precision, jax.lax.Precision):
        # HIGH = 3-pass bf16x2 (drops only the lo*lo term, ~2^-17 relative);
        # HIGHEST = Mosaic native f32 (6-pass oracle grade)
        if precision == jax.lax.Precision.HIGH:
            return 3
        if precision == jax.lax.Precision.HIGHEST:
            return 6
    raise ValueError(
        f"unsupported Pallas frontend precision {precision!r}: expected None, "
        "'bf16', 'bf16x2', Precision.HIGH, or Precision.HIGHEST"
    )


def _kernel(h0_ref, h1_ref, *refs, passes, n_sub, n_bins, fb_block, row_block):
    """Polyphase fused frontend kernel.

    Each grid cell covers ``row_block`` batch rows x ``fb_block`` frames; the
    per-j GEMM flattens (rows, frames) into one M = row_block*fb_block
    dimension — M=512 at defaults, where M=128 cells leave the MXU pipeline
    half-empty (measured: ~1.45 ms/pass-set at M=128 vs ~0.7 at M=512).

    Operands after the two hop-view blocks: 6-pass mode gets
    (w_0..w_{n_sub-1}, fb) in f32; bf16 modes get per-j hi (1-pass) or
    hi/lo pairs (2/3-pass) then fb_hi (+ fb_lo in 3-pass mode only).
    Trailing ref: out. ``h1`` is the lookahead block — only
    ``tail_rows`` hop-rows past the cell (enough for the j offsets), NOT a
    second full block: the full-block form re-reads every audio byte from
    HBM twice (~48% of the kernel's input traffic — measured).
    """
    mat_refs, out_ref = refs[:-1], refs[-1]
    m = row_block * fb_block
    h = jnp.concatenate([h0_ref[...], h1_ref[...]], axis=1)  # (BB, FB+tail, hop)
    kw = dict(preferred_element_type=jnp.float32)

    def xslice(arr, j):
        return arr[:, j : j + fb_block, :].reshape(m, arr.shape[-1])

    if passes == 6:
        ws, fb_ref = mat_refs[:-1], mat_refs[-1]
        acc = None
        for j in range(n_sub):
            term = jnp.dot(xslice(h, j), ws[j][:, :], precision=jax.lax.Precision.HIGHEST, **kw)
            acc = term if acc is None else acc + term
        re_im = acc
    else:
        per_w = 1 if passes == 1 else 2
        w_mats, fb_refs = mat_refs[: per_w * n_sub], mat_refs[per_w * n_sub :]
        # 1/2-pass modes receive bf16 hop rows (cast before the pad copy —
        # see the pad comment in log_mel_spectrogram_pallas); 3-pass needs
        # the f32 rows for the lo residue and casts here
        h_hi = h if h.dtype == jnp.bfloat16 else h.astype(jnp.bfloat16)
        if passes == 3:
            h_lo = (h - h_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = None
        for j in range(n_sub):
            xj_hi = xslice(h_hi, j)
            term = jnp.dot(xj_hi, w_mats[per_w * j][:, :], **kw)
            if passes >= 2:
                term += jnp.dot(xj_hi, w_mats[per_w * j + 1][:, :], **kw)
            if passes == 3:
                term += jnp.dot(xslice(h_lo, j), w_mats[per_w * j][:, :], **kw)
            acc = term if acc is None else acc + term
        re_im = acc
    re = re_im[:, :n_bins]
    im = re_im[:, n_bins:]
    power = re * re + im * im  # (FB, n_bins) — stays in VMEM
    if passes == 6:
        mel = jnp.dot(power, fb_ref[:, :], precision=jax.lax.Precision.HIGHEST, **kw)
    else:
        p_hi = power.astype(jnp.bfloat16)
        mel = jnp.dot(p_hi, fb_refs[0][:, :], **kw)
        if passes == 3:
            p_lo = (power - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            mel += jnp.dot(p_lo, fb_refs[0][:, :], **kw) + jnp.dot(p_hi, fb_refs[1][:, :], **kw)
    # write contiguous PRE-log (BB, FB, mels_pad) tiles: a transposed /
    # mel-narrow block write costs ~6 ms/iter in strided DMAs (measured).
    # log + ZMUV ride the XLA transpose+crop epilogue that already passes
    # over these bytes — in-kernel they ran the slow VPU transcendental on
    # all 128 padded lanes per tile when only n_mels=40 are real (3.2x
    # wasted log work), and bf16 tiles quantize BETTER pre-log: a 2^-9
    # relative mel error is ~2e-3 absolute after the log, vs ~2^-9*|log|
    # when the tile holds the log itself.
    out_ref[...] = mel.reshape(row_block, fb_block, mel.shape[-1]).astype(out_ref.dtype)


@partial(
    jax.jit,
    static_argnames=(
        "config", "interpret", "precision", "out_dtype", "row_block", "fb_block", "layout"
    ),
)
def log_mel_spectrogram_pallas(
    audio: jnp.ndarray,
    config: FrontendConfig = FrontendConfig(),
    zmuv_mean=0.0,
    zmuv_std=1.0,
    interpret: bool = False,
    precision=None,
    out_dtype=None,
    row_block: int | None = None,
    fb_block: int | None = None,
    layout: str = "fm",
) -> jnp.ndarray:
    """(B, samples) -> ZMUV-normalized (B, n_mels, frames) log-mels.

    ``layout="tm"`` returns (B, frames, n_mels) instead — the kernel's
    native tile orientation, skipping the transpose entirely. The fused
    Pallas stem (ops/stem_pallas.py) consumes this directly, removing the
    (B, F, T) -> (B, T, F) round trip the NHWC trunk otherwise pays.

    Numerically matches ``(log_mel_spectrogram(audio) - mean) / std`` from the
    jnp reference (same center/reflect padding, Hann window, HTK mel); see the
    module docstring for the polyphase design and the precision modes.

    ``out_dtype=jnp.bfloat16`` writes the output tiles in bf16 straight from
    the kernel — bf16-serving engines cast the features anyway, so this saves
    half the output write traffic plus the separate XLA cast pass.

    ``row_block``/``fb_block`` are expert knobs; the auto default (up to
    8 x 128) measured within 1% of every working geometry on v5e. Large
    products can exceed the ~16 MB scoped-VMEM budget and fail at compile
    (measured: row_block >= 16 with fb_block 256 OOMs; 4-8 x 128-256 all
    fit).
    """
    if audio.ndim == 1:
        audio = audio[None, :]
    b = audio.shape[0]
    hop, n_fft = config.hop_length, config.n_fft
    n_frames = config.num_frames(audio.shape[-1])
    passes = _passes_for(precision)
    # block geometry: (row_block batch rows) x (fb_block frames) per grid
    # cell. Defaults were swept on hardware (tools/sweep_frontend_blocks.py);
    # explicit values are for experimentation and must keep fb_block a
    # multiple of 128 (MXU sublane tiling of the flattened M dimension).
    fb_block = fb_block or FRAME_BLOCK
    if fb_block % FRAME_BLOCK:
        raise ValueError(f"fb_block must be a multiple of {FRAME_BLOCK}, got {fb_block}")
    n_sub = -(-n_fft // hop)
    if n_sub > fb_block:
        # one lookahead block covers the frame overlap only while
        # ceil(n_fft/hop) <= FRAME_BLOCK (hop >= 4 at n_fft=512); extreme
        # overlap ratios fall back to the jnp chain rather than miscompute
        from howl_tpu.ops.frontend import log_mel_spectrogram

        mels = log_mel_spectrogram(audio, config)
        if layout == "tm":
            mels = mels.swapaxes(-1, -2)
        return ((mels - zmuv_mean) / zmuv_std).astype(out_dtype or jnp.float32)

    # lookahead granularity: frame t of cell i needs hop-rows up to
    # i*fb_block + t + n_sub - 1, i.e. n_sub-1 rows past the cell's own
    # block. Fetch them as a NARROW second block of tail_rows (the smallest
    # power of two >= n_sub-1, floored at 8 — Mosaic requires sublane block
    # dims divisible by 8 — that divides fb_block) instead of the full next
    # block: a full-block lookahead reads every audio byte from HBM twice.
    # Element offset of tail block k is k*tail_rows, so cell i maps to
    # block (i+1)*fb_block//tail_rows — exact while tail_rows | fb_block.
    tail_rows = 8
    while tail_rows < n_sub - 1:
        tail_rows *= 2
    if fb_block % tail_rows:
        tail_rows = fb_block  # degenerate overlap: full-block lookahead
    # center reflect-pad on the true signal, then zero-extend so the hop-view
    # has t_pad + tail_rows rows (the lookahead block of the last cell).
    # jnp.pad is a full-array copy (~0.84 ms at batch 512 x 8 s — it rewrites
    # all 264 MB at streaming bandwidth), so the 1/2-pass bf16 modes cast the
    # audio BEFORE the pad: the kernel quantizes its rows to bf16 anyway, the
    # cast commutes exactly with reflect/zero padding (both only duplicate or
    # zero values), and the pad write + kernel input DMA both halve.
    if passes <= 2:
        audio = audio.astype(jnp.bfloat16)
    if config.center:
        audio = jnp.pad(audio, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    t_pad = _round_up(n_frames, fb_block)
    rows = t_pad + tail_rows
    extra = rows * hop - audio.shape[-1]
    if extra > 0:
        audio = jnp.pad(audio, ((0, 0), (0, extra)))
    hview = audio[:, : rows * hop].reshape(b, rows, hop)

    n_bins = nyquist_crop_bins(config)
    n_mels = config.n_mels

    w = windowed_dft_matrix(n_fft, n_bins)  # (n_fft, 2*n_bins), hann folded in
    w_blocks = []
    for j in range(n_sub):
        wj = np.zeros((hop, 2 * n_bins), np.float32)
        width = min(hop, n_fft - j * hop)
        # rows beyond the block's true width stay zero: the MXU multiplies the
        # next rows' (real) samples by zero weights, keeping the sum exact
        wj[:width] = w[j * hop : j * hop + width]
        w_blocks.append(wj)
    fb = mel_filterbank(config.n_freqs, n_mels, config.sample_rate, config.f_min, config.f_max)
    mels_pad = _round_up(n_mels, 128)
    fb_pad = np.zeros((n_bins, mels_pad), np.float32)
    fb_pad[:, :n_mels] = fb[:n_bins]
    # track each matrix's role positionally: selecting the BlockSpec by a
    # shape test (m.shape[0] == hop) misclassifies the filterbank whenever
    # hop_length == n_bins (e.g. n_fft=400/hop=200, n_fft=512/hop=256) and
    # crashes the kernel
    if passes == 6:
        mats = [*w_blocks, fb_pad]
        mat_kinds = ["w"] * len(w_blocks) + ["fb"]
    else:
        mats, mat_kinds = [], []
        for wj in w_blocks:
            # 1-pass mode drops the W_lo correction matrices entirely
            parts = _split_bf16(wj)[: 1 if passes == 1 else 2]
            mats.extend(parts)
            mat_kinds.extend(["w"] * len(parts))
        # 1/2-pass modes read only fb_hi (single-pass mel; see module docstring)
        parts = _split_bf16(fb_pad)[: 1 if passes <= 2 else 2]
        mats.extend(parts)
        mat_kinds.extend(["fb"] * len(parts))

    if row_block is None:
        # (8, 128) measured best on v5e with the narrow-tail lookahead
        # (tools/bench_frontend_tail_1pass.py: 4.75 vs 4.87 ms at (4, 128));
        # smaller batches fall back to what divides
        row_block = next(bb for bb in (8, 4, 2, 1) if b % bb == 0)
    elif b % row_block:
        raise ValueError(f"row_block {row_block} does not divide batch {b}")
    grid = (b // row_block, t_pad // fb_block)
    w_spec = pl.BlockSpec((hop, 2 * n_bins), lambda bi, i: (0, 0), memory_space=pltpu.VMEM)
    fb_spec = pl.BlockSpec(fb_pad.shape, lambda bi, i: (0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        partial(
            _kernel,
            passes=passes,
            n_sub=n_sub,
            n_bins=n_bins,
            fb_block=fb_block,
            row_block=row_block,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_block, fb_block, hop), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (row_block, tail_rows, hop),
                lambda bi, i, _r=fb_block // tail_rows: (bi, (i + 1) * _r, 0),
                memory_space=pltpu.VMEM,
            ),
            *[w_spec if kind == "w" else fb_spec for kind in mat_kinds],
        ],
        out_specs=pl.BlockSpec(
            (row_block, fb_block, mels_pad), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, mels_pad), out_dtype or jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t_pad * n_sub * hop * 2 * n_bins * min(passes, 3)
            + 2 * b * t_pad * n_bins * mels_pad * 3,
            bytes_accessed=b * rows * hop * (2 if passes <= 2 else 4)
            + b * mels_pad * t_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(hview, hview, *[jnp.asarray(m) for m in mats])

    # log + ZMUV fused into the transpose+crop pass XLA runs anyway (reads
    # the padded tiles once, writes the (B, n_mels, T) result): the log runs
    # on the 40 real mels instead of all 128 padded kernel lanes. The "tm"
    # layout keeps the kernel's native (B, T, n_mels) tile orientation —
    # crop + log only, no transpose.
    mel = out[:, :n_frames, :n_mels].astype(jnp.float32)
    if layout == "fm":
        mel = mel.swapaxes(-1, -2)
    mean = jnp.float32(zmuv_mean)
    inv_std = 1.0 / jnp.float32(zmuv_std)
    res = (jnp.log(mel + config.log_offset) - mean) * inv_std
    return res.astype(out_dtype or jnp.float32)  # (B, n_mels, T) or (B, T, n_mels)
