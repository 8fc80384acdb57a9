"""Pallas TPU kernel for the noise-bank mixer's gather+mix.

The reference's DatasetMixer picks a random noise clip + window per example on
the host (ref: howl/data/transform/transform.py:199-232). On device the pick
is a sparse gather of (1, window) slices from the HBM-resident bank — and XLA
lowers even the friendly one-index-per-row contiguous form of that gather to
~10 GB/s effective bandwidth (2.4 ms for a (1024, 8000) batch from a
(512, 32000) bank on v5e). This kernel instead issues one aligned async DMA
per example from the flat bank into VMEM scratch and fuses the
``(1-a)*audio + a*noise`` mix into the same pass: 0.72 ms measured at the same
config, bitwise identical to the dynamic-slice fallback in augment.py.

Alignment contract: Mosaic requires HBM slice offsets/shapes aligned to the
memref tiling — (8, 128) for a 2D f32 bank, i.e. 1024-sample granularity.
``mix_noise_bank`` therefore draws window starts quantized to
``NOISE_OFFSET_QUANTUM`` samples (64 ms at 16 kHz) on every backend, so CPU
fallback and TPU kernel produce the same windows for the same key. The
multiply-by-8 that proves sublane alignment happens INSIDE the kernel —
Mosaic's divisibility analysis cannot see through a scalar-prefetch operand,
but tracks multiplication by a constant.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Window-start granularity in samples; equals the (8, 128) f32 HBM tile.
NOISE_OFFSET_QUANTUM = 1024
# Examples per grid step = in-flight DMAs; E=8 measured best (0.72 ms) vs
# E=4 (0.81 ms) and E=16 (0.73 ms) at batch 1024, window 8000.
_E = 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _mix_kernel(qm_ref, audio_ref, alpha_ref, bank_ref, out_ref, noise_scr, sems, *, e, blk_rows):
    i = pl.program_id(0)
    for j in range(e):
        q = qm_ref[i * e + j] * 8  # sublane-row index; *8 proves tile alignment
        pltpu.make_async_copy(
            bank_ref.at[pl.ds(q, blk_rows)], noise_scr.at[j], sems.at[j]
        ).start()
    for j in range(e):
        q = qm_ref[i * e + j] * 8
        pltpu.make_async_copy(
            bank_ref.at[pl.ds(q, blk_rows)], noise_scr.at[j], sems.at[j]
        ).wait()
    a = alpha_ref[:]
    out_ref[:] = audio_ref[:] * (1.0 - a) + noise_scr[:] * a


def flatten_bank(extended: jnp.ndarray, n: int):
    """(N, W_cols) wrap-extended bank -> ((rows, 128) tile-aligned flat view,
    w_ext row pitch). Each bank row is zero-padded to ``w_ext`` (a
    NOISE_OFFSET_QUANTUM multiple covering the largest DMA block end) so every
    quantized window start stays tile-aligned in the flat view. Build this
    ONCE per bank (augment.prepare_noise_bank) — rebuilding it inside every
    train-step execution costs ~84 MB of HBM traffic at the recipe
    (512, 32000) bank."""
    q = NOISE_OFFSET_QUANTUM
    _, w_cols = extended.shape
    blk = _round_up(n, q)
    # each row must hold the largest window end (off <= w_cols - n after the
    # caller's wrap extension; the DMA block tail may read the zero pad)
    w_ext = _round_up(max(w_cols, w_cols - n + blk), q)
    return jnp.pad(extended, ((0, 0), (0, w_ext - w_cols))).reshape(-1, 128), w_ext


@partial(jax.jit, static_argnames=("w_ext", "interpret"))
def mix_noise_bank_pallas(
    audio: jnp.ndarray,
    flat: jnp.ndarray,
    w_ext: int,
    rows: jnp.ndarray,
    offs: jnp.ndarray,
    alpha: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused gather+mix: ``audio*(1-alpha) + bank[row, off:off+n]*alpha``.

    audio: (B, n) f32. flat/w_ext: the bank's tile-aligned flat view from
    ``flatten_bank``. rows: (B,) int32 bank rows. offs: (B,) int32 window
    starts, each a multiple of NOISE_OFFSET_QUANTUM. alpha: (B, 1) f32 final
    per-example mix weight (prob/replace masks already folded in).
    """
    q = NOISE_OFFSET_QUANTUM
    b, n = audio.shape
    blk = _round_up(n, q)
    blk_rows = blk // 128
    bank2d = flat
    qm = ((rows * w_ext + offs) // q).astype(jnp.int32)
    b_pad = _round_up(b, _E)
    if b_pad != b:
        audio = jnp.pad(audio, ((0, b_pad - b), (0, 0)))
        alpha = jnp.pad(alpha, ((0, b_pad - b), (0, 0)))
        qm = jnp.pad(qm, (0, b_pad - b))
    audio3 = jnp.pad(audio, ((0, 0), (0, blk - n))).reshape(b_pad, blk_rows, 128)
    out = pl.pallas_call(
        partial(_mix_kernel, e=_E, blk_rows=blk_rows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b_pad // _E,),
            in_specs=[
                pl.BlockSpec((_E, blk_rows, 128), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_E, 1, 1), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (_E, blk_rows, 128), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((_E, blk_rows, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((_E,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, blk_rows, 128), audio.dtype),
        interpret=interpret,
    )(qm, audio3, alpha[:, :, None], bank2d)
    return out.reshape(b_pad, blk)[:b, :n]
