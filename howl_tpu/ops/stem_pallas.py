"""Fused res8 stem — conv0 + ReLU + AvgPool — as a Pallas TPU kernel.

WHY: the stem is the measured hot spot of res8 serving. On v5e (batch 512 x
8 s, two-point slope timing, tools/bench_trunk_kernel_micro.py) the XLA
trunk costs 5.87 ms of which ~3.6 ms is the stem + relayout and only
2.28 ms the six residual conv layers: XLA's conv emitter is near the
45->128 lane-padding floor on the residual layers (~50% MFU), but the stem
— a (3, 3, 1->45) conv at the full 641x40 mel resolution — runs at ~1.5%
MFU because XLA materializes the ~1.2 GB pre-pool activation in HBM. (The
same tool also measured-and-rejected fused Pallas RESIDUAL-trunk kernels:
17.4 ms full / 6.6 ms GEMM-only vs XLA's 2.28 ms — see its docstring.)

This kernel keeps the pre-pool activation in VMEM and writes only the
pooled output. Two structural tricks make every access aligned:

  * t-pool by plane decomposition: mel rows are pre-split (in XLA — pure
    pads/reshapes of the ~33 MB mel tensor) into ``pool_t`` interleaved
    row-planes, banded-fold im2col'd per plane: X_pre[b, r, q, m*(dt+1)+f]
    = mel[b, pool_t*(q-1)+r+dt, f]. The kernel runs ONE GEMM per plane and
    sums the ReLU'd results — the time pool falls out with no strided or
    unaligned access (Mosaic's unaligned sublane slices measured ~15x below
    nominal VPU rate in the rejected trunk kernel).
  * f-pool by j-blocked output layout: the folded weight matrix W0fold
    (pool_t*n_mels, pool_f*jblock) orders columns (j, f_out, ch) with each
    j-block padded to a 128-lane multiple, so the (f = pool_f*f_out + j)
    frequency pool is ``pool_f`` ALIGNED lane-block adds — and the valid
    (f_out, ch)-major output reshapes to the residual layers' NHWC
    (B, T', F', ch) for free.

Measured: 2.25 ms (XLA im2col prep + kernel) vs ~3.6 ms XLA stem; full
trunk 5.18 ms vs 5.87 ms incumbent. Capability parity anchor: the stem is
the first stage of ref howl/model/cnn.py:113-125 (conv0 -> ReLU ->
AvgPool(3, 4)); the jnp/flax stem in models/cnn.py is the correctness
oracle (tests/test_stem_pallas.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def stem_geometry(n_mels: int, ch: int, pool_f: int) -> tuple[int, int]:
    """(f_out, jblock): pooled mel bins and the 128-aligned j-block width."""
    if n_mels % pool_f:
        raise ValueError(f"n_mels {n_mels} not divisible by pool_f {pool_f}")
    f_out = n_mels // pool_f
    return f_out, _round_up(f_out * ch, 128)


def fold_stem_weights(
    kernel: np.ndarray, n_mels: int = 40, pool_f: int = 4, dtype=np.float32
) -> np.ndarray:
    """Fold a (3, 3, 1, ch) HWIO conv0 kernel (H=time taps, W=freq taps)
    into the banded GEMM matrix W0fold (3*n_mels, pool_f*jblock):

        W0fold[(dt+1)*n_mels + f, j*jblock + f_out*ch + co]
            = kernel[dt+1, df+1, 0, co]   where df = f - (pool_f*f_out + j)

    Zero outside the |df| <= 1 band — the dense GEMM multiplies real mel
    values by zero there, which keeps conv SAME's zero f-edge padding exact.
    """
    kernel = np.asarray(kernel, np.float32)
    if kernel.ndim != 4 or kernel.shape[:3] != (3, 3, 1):
        raise ValueError(f"expected a (3, 3, 1, ch) stem kernel, got {kernel.shape}")
    ch = kernel.shape[-1]
    f_out, jblock = stem_geometry(n_mels, ch, pool_f)
    w = np.zeros((3 * n_mels, pool_f * jblock), np.float32)
    for dt in (-1, 0, 1):
        for j in range(pool_f):
            for fo in range(f_out):
                for df in (-1, 0, 1):
                    f = pool_f * fo + j + df
                    if 0 <= f < n_mels:
                        col = j * jblock + fo * ch
                        w[(dt + 1) * n_mels + f, col : col + ch] = kernel[dt + 1, df + 1, 0]
    return w.astype(dtype)


def _stem_kernel(xpre_ref, w_ref, out_ref, *, pool_t, pool_f, jblock, inv_pool):
    acc = None
    for r in range(pool_t):
        xr = xpre_ref[0, r]  # (q_rows, pool_t * n_mels)
        g = jnp.dot(xr, w_ref[:, :], preferred_element_type=jnp.float32)
        g = jnp.maximum(g, 0.0)  # ReLU at full time resolution, in VMEM
        acc = g if acc is None else acc + g  # the 3-row time pool
    pooled = acc[:, 0:jblock]
    for j in range(1, pool_f):
        pooled = pooled + acc[:, j * jblock : (j + 1) * jblock]  # aligned f pool
    out_ref[0] = (pooled * inv_pool).astype(out_ref.dtype)


@partial(
    jax.jit,
    static_argnames=("n_mels", "ch", "pool_t", "pool_f", "interpret", "out_dtype"),
)
def res8_stem_pallas(
    mel_tm: jnp.ndarray,
    w0fold: jnp.ndarray,
    n_mels: int = 40,
    ch: int = 45,
    pool_t: int = 3,
    pool_f: int = 4,
    interpret: bool = False,
    out_dtype=None,
) -> jnp.ndarray:
    """(B, T, n_mels) ZMUV'd log-mels (TIME-major — no (B, F, T) transpose
    needed) -> (B, T', n_mels//pool_f, ch) pooled stem activations, equal to
    ``avg_pool(relu(conv0(mel)), (pool_t, pool_f), VALID)`` of the flax
    trunk (models/cnn.py trunk_features' first two lines).

    ``w0fold`` comes from :func:`fold_stem_weights`; pass it in the compute
    dtype (bf16 for serving). T' = T // pool_t, like flax's VALID pooling.
    """
    if mel_tm.ndim != 3 or mel_tm.shape[-1] != n_mels:
        raise ValueError(f"expected (B, T, {n_mels}) mels, got {mel_tm.shape}")
    b, t, _ = mel_tm.shape
    t_out = t // pool_t
    f_out, jblock = stem_geometry(n_mels, ch, pool_f)
    if w0fold.shape != (pool_t * n_mels, pool_f * jblock):
        raise ValueError(
            f"w0fold shape {w0fold.shape} != {(pool_t * n_mels, pool_f * jblock)}"
        )
    q_rows = _round_up(t_out + 1, 16)  # row q holds pooled frame t' = q - 1

    mel_tm = mel_tm.astype(w0fold.dtype)
    # X_pre[b, r, q, n_mels*(dt+1)+f] = mel[b, pool_t*(q-1)+r+dt, f], zeros
    # outside the clip (conv SAME's zero t-edge padding, exact). Row m of
    # mel sits at row m+4 of mel_big; the dt slice starts at dt+1 >= 0.
    need = pool_t * q_rows + 4
    mel_big = jnp.pad(mel_tm, ((0, 0), (4, max(need - 4 - t, 0)), (0, 0)))
    parts = []
    for dt in (-1, 0, 1):
        bdt = mel_big[:, dt + 1 : dt + 1 + pool_t * q_rows].reshape(b, q_rows, pool_t, n_mels)
        parts.append(jnp.transpose(bdt, (0, 2, 1, 3)))  # (B, pool_t, q_rows, n_mels)
    xpre = jnp.concatenate(parts, axis=-1)  # (B, pool_t, q_rows, 3*n_mels)

    out_dtype = out_dtype or (jnp.bfloat16 if w0fold.dtype == jnp.bfloat16 else jnp.float32)
    pooled = pl.pallas_call(
        partial(
            _stem_kernel,
            pool_t=pool_t,
            pool_f=pool_f,
            jblock=jblock,
            inv_pool=1.0 / (pool_t * pool_f),
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, pool_t, q_rows, 3 * n_mels), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(w0fold.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_rows, jblock), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, q_rows, jblock), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * pool_t * q_rows * (3 * n_mels) * (pool_f * jblock),
            bytes_accessed=b * pool_t * q_rows * 3 * n_mels * mel_tm.dtype.itemsize
            + b * q_rows * jblock * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xpre, w0fold)

    # rows 1..T' hold the valid pooled frames; (f_out, ch)-major lanes make
    # this reshape to the residual layers' NHWC layout free
    return pooled[:, 1 : 1 + t_out, : f_out * ch].reshape(b, t_out, f_out, ch)
