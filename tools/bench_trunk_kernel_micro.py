"""Measured (not estimated) Pallas res8-trunk kernel candidates.

Round-3/4 rejected a fused Pallas trunk on PAPER estimates ("2-5 ms
optimistic", docs/PERFORMANCE.md) while the same repo proved its own round-3
bandwidth "measurement" was an artifact. This tool applies the round-4
standard — two-point slope timing on hardware — to the trunk question.

The candidate: a POSITION-MAJOR fused kernel for the 6 residual conv layers.
Activations live in VMEM as (2176pos, 48ch) tiles (positions = flattened
(t, f), f minor, on SUBLANES; channels on lanes); each 3x3 SAME conv becomes
ONE im2col GEMM

    out (P, 48) = X_im (P, 9*48) @ W' (9*48, 48)

where X_im stacks 9 sublane-OFFSET, f-edge-masked reads of a halo'd
activation scratch (tap offsets dt*10+df in {-11..-9,-1,0,1,9..11} are pure
static slices — no rotates: Mosaic has no bf16 lane rotate, measured, and
this layout needs none). Rationale measured here:

  * K = 9 taps x 48ch = 432 -> 4 MXU K-tiles (the tightest packing of the
    405-wide conv fan-in; per-tap GEMMs would pad K 45->128 per tap, 2.8x).
  * MXU tile-triples per clip-layer: ceil(2176/128) M x 4 K x 1 N = 68 —
    identical to the channel-major orientation, with zero transposes.
  * t-edge zero padding is FREE: out-of-clip tap reads land in the zeroed
    halo/tail rows; only the 6 df!=0 taps need an f-wrap mask (p%10 iota).
  * All 6 layers stay in VMEM between GEMMs — the ~1.2 GB of HBM layer
    round-trips that bound XLA's conv emitter disappear; the only HBM
    traffic is s0 in (123 MB bf16) and the pooled output (~13 MB).
  * The XLA preamble needs NO transpose: stem NHWC output (B, 213, 10, 45)
    -> (B, 2130, 45) is a pure reshape (channels already minor), + pad.
  * The freq-mean AND the per-window time means fold into one trailing
    pooling GEMM poolT (n_win, P) @ r6 (P, 48) — replacing the XLA-side
    f32 freq-mean + cumsum + gather head entirely.

Legs (all two-point slope, batch 512 x 8 s serving geometry):

  1. xla trunk incumbent      — trunk_features + f32 freq-mean (the 5.8 ms)
  2. xla stem+reshape+pad     — the Pallas path's XLA preamble
  3. pallas proto             — full 6-layer fused kernel + pooling GEMM
  4. pallas gemm-only         — im2col built once, not per layer
     (isolates the 9-slice build cost by difference vs leg 3)

MEASURED RESULTS (v5e through the relay, two-point slope, batch 512 x 8 s):

  round 1 (channel-major): XLA incumbent 5.894 ms; stem + channel-major
  TRANSPOSE preamble 3.609 ms; the channel-major kernel never compiled —
  Mosaic rejects bf16 lane rotates (tpu.dynamic_rotate, "Rotate with
  non-32-bit data") — which forced the position-major redesign.

  round 2 (position-major): XLA incumbent 5.869 ms; stem + reshape + pad
  3.690 ms; pallas fused 6-layer proto **17.38 ms**; gemm-only (im2col
  built once) **6.70 ms**. Verdict: REJECTED, with numbers. Two findings:
  (a) Mosaic's unaligned sublane-offset slices (the 9 tap reads) cost
  ~10.7 ms of the 17.4 — ~15x below nominal VPU copy rate; (b) even the
  bare im2col GEMMs (~1.1 ms/layer) lose to XLA's conv emitter, which runs
  all 6 residual layers in ~5.87 - ~3.5 (stem) = ~2.4 ms (~0.4 ms/layer,
  ~50% MFU on 45-channel convs — near the 45->128 padding floor).

  The REAL lever is the STEM: ~3.5 ms for 10.6 GFLOP useful (~1.5% MFU),
  because conv(3x3, 1->45) at full 641x40 resolution materializes a
  ~1.2 GB pre-pool tensor. Hence the stem legs below: a fused Pallas
  conv0+relu+avgpool kernel that never leaves VMEM —

    * t-pool by plane decomposition: mel rows are pre-split into 3
      interleaved planes (row 3q+r -> plane r), the kernel runs one
      banded-fold GEMM per plane and sums the relu'd results — the 3-row
      time pool falls out with no strided access at all;
    * banded fold over f: X_r (216, 120) = [mel(dt=-1)|mel(0)|mel(+1)]
      lanes, W0fold (120, 4*512) with column order (j, f', co) per
      512-aligned j-block — the (f = 4f'+j) pool becomes 3 ALIGNED
      lane-block adds, and the output (213, 450) f-major reshapes to the
      trunk's NHWC (B, 213, 10, 45) for FREE.

Run on the real TPU:  python tools/bench_trunk_kernel_micro.py [--batch 512]
"""

from __future__ import annotations

import _path  # noqa: F401 — repo root on sys.path for howl_tpu

import argparse
import time
from functools import partial

import numpy as np

# trunk geometry at the serving recipe (hey-firefox defaults)
F_OUT = 10  # pooled mel bins (40 mels / pool_f 4)
CH = 45  # res8 num_maps
CH_PAD = 48  # sublane-padded channel rows
TAPS = [(dt, df) for dt in (-1, 0, 1) for df in (-1, 0, 1)]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def main(argv=None):
    from howl_tpu.utils.platform import ensure_platform

    ensure_platform()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from howl_tpu.models import create_model
    from howl_tpu.ops.frontend import FrontendConfig

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--clip-seconds", type=float, default=8.0)
    p.add_argument("--iters", type=int, default=16)
    args = p.parse_args(argv)

    on_tpu = jax.devices()[0].platform != "cpu"
    if not on_tpu:
        args.batch, args.clip_seconds, args.iters = 4, 2.0, 2

    frontend = FrontendConfig(n_mels=40)
    clip_samples = int(args.clip_seconds * 16000)
    n_frames = frontend.num_frames(clip_samples)  # 641 at defaults
    t_out = n_frames // 3  # pooled trunk frames (213)
    pos = t_out * F_OUT  # flattened (t, f) positions (2130)
    pos_pad = _round_up(pos, 128)  # 2176
    b = args.batch
    iters = args.iters

    rng = np.random.default_rng(0)
    feats = jax.device_put(
        rng.standard_normal((b, n_frames, 40, 1)).astype(np.float32) * 0.5
    )
    jax.block_until_ready(feats)

    # ---- slope timing (bench_hbm_sweep methodology) ----
    def slope(make_chain, big):
        lo, hi = iters, iters * 4
        c_lo, c_hi = make_chain(lo), make_chain(hi)
        _ = float(np.asarray(c_lo(big)))
        _ = float(np.asarray(c_hi(big)))
        slopes = []
        for _rep in range(3):
            t0 = time.perf_counter()
            _ = float(np.asarray(c_lo(big)))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = float(np.asarray(c_hi(big)))
            t_hi = time.perf_counter() - t0
            slopes.append((t_hi - t_lo) / (hi - lo))
        return float(np.median(slopes))

    def timed(name, fn, big):
        def make_chain(length):
            @jax.jit
            def chain(big):
                def body(s, _):
                    out = fn((big + s * 0.0).astype(big.dtype), s)
                    return jnp.asarray(out).ravel()[0].astype(jnp.float32) * 1e-30, None

                s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=length)
                return s

            return chain

        dt = slope(make_chain, big)
        print(f"{name:48s}: {dt*1e3:8.3f} ms/iter", flush=True)
        return dt

    # ---- leg 1: XLA trunk incumbent ----
    model = create_model("res8", num_labels=4, dtype=jnp.bfloat16 if on_tpu else None)
    feats0 = np.zeros((1, 1, 40, 41), np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats0, train=False)
    if on_tpu:
        from howl_tpu.inference.config import cast_compute_dtype

        variables = cast_compute_dtype(variables, jnp.bfloat16)

    feats_nchw = jnp.transpose(feats[..., 0], (0, 2, 1))[:, None]  # (B, 1, 40, T)
    feats_nchw = jax.device_put(feats_nchw.astype(jnp.bfloat16 if on_tpu else jnp.float32))
    jax.block_until_ready(feats_nchw)

    timed(
        "xla trunk incumbent (trunk_features + fmean)",
        lambda f, s: model.apply(variables, f, train=False, method="trunk_features")
        .astype(jnp.float32)
        .mean(axis=2),
        feats_nchw,
    )

    # ---- stem + position-major relayout (the Pallas path's XLA preamble;
    # NHWC stem output already has channels minor, so this is reshape + pad,
    # NO transpose) ----
    cdt = jnp.bfloat16 if on_tpu else jnp.float32
    w0 = jnp.asarray(rng.standard_normal((3, 3, 1, CH)).astype(np.float32) * 0.1, cdt)

    def stem_pm(f, s):
        x = f.astype(cdt)  # (B, T, 40, 1) NHWC
        y = jax.lax.conv_general_dilated(
            x, w0, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        y = jnp.maximum(y, 0)
        y = jax.lax.reduce_window(
            y, 0.0 if y.dtype == jnp.float32 else jnp.bfloat16(0), jax.lax.add,
            (1, 3, 4, 1), (1, 3, 4, 1), "VALID",
        ) * (1.0 / 12.0)
        y = y.reshape(b, t_out * F_OUT, CH)  # (B, T', F', C) -> (B, P, C)
        return jnp.pad(y, ((0, 0), (0, pos_pad - pos), (0, CH_PAD - CH))).astype(cdt)

    timed("xla stem + reshape + pad (no transpose)", stem_pm, feats)

    s0_pm = jax.jit(lambda f: stem_pm(f, 0.0))(feats)
    jax.block_until_ready(s0_pm)

    # ---- Pallas fused-trunk proto ----
    n_win = 121  # (641 - 41) // 5 + 1 at the serving geometry
    n_win_pad = _round_up(n_win, 128)
    span = 13  # 41-frame window / pool_t 3

    def build_pool_matrix():
        m = np.zeros((pos_pad, n_win_pad), np.float32)
        starts = np.clip(np.round(np.arange(n_win) * 5 / 3).astype(np.int32), 0, t_out - span)
        for w in range(n_win):
            lo, hi = starts[w] * F_OUT, (starts[w] + span) * F_OUT
            m[lo:hi, w] = 1.0
        return m

    pool_np = build_pool_matrix()

    HALO = 16  # sublane-tile-aligned halo (covers the max |off| = 11)

    def make_proto(full_build: bool):
        k_rows = 9 * CH_PAD  # 432
        ws = [
            jnp.asarray(rng.standard_normal((k_rows, CH_PAD)).astype(np.float32) * 0.05, jnp.bfloat16)
            for _ in range(6)
        ]
        pool_t = jnp.asarray(pool_np[:, :n_win_pad].T.copy(), jnp.bfloat16)  # (n_win_pad, P)
        bn_scale = jnp.asarray(np.full((8, CH_PAD), 0.9, np.float32))
        bn_shift = jnp.asarray(np.full((8, CH_PAD), 0.01, np.float32))

        def kernel(x_ref, *refs):
            w_refs, (pool_ref, sc_ref, sh_ref, out_ref, xh_ref, im_ref) = refs[:6], refs[6:]
            P = pos_pad
            fidx = jax.lax.rem(jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0), F_OUT)
            padmask = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0) < pos
            x = x_ref[0].astype(jnp.bfloat16)  # (P, 48)
            res = x
            zero_halo = jnp.zeros((HALO, CH_PAD), jnp.bfloat16)
            xh_ref[0:HALO, :] = zero_halo
            xh_ref[HALO + P :, :] = zero_halo
            for layer in range(6):
                if full_build or layer == 0:
                    xh_ref[HALO : HALO + P, :] = x
                    for tap, (dt, df) in enumerate(TAPS):
                        off = dt * F_OUT + df
                        # out-of-clip t reads land in the zero halo / zero
                        # tail rows; only f-wraps need a mask
                        src = xh_ref[HALO + off : HALO + off + P, :]
                        if df == -1:
                            src = jnp.where(fidx > 0, src, jnp.bfloat16(0))
                        elif df == 1:
                            src = jnp.where(fidx < F_OUT - 1, src, jnp.bfloat16(0))
                        im_ref[:, tap * CH_PAD : (tap + 1) * CH_PAD] = src
                acc = jnp.dot(im_ref[:, :], w_refs[layer][:, :], preferred_element_type=jnp.float32)
                y = jnp.maximum(acc, 0.0)
                if layer % 2 == 1:  # layers 2, 4, 6 (1-indexed): pre-BN residual
                    r = y + res.astype(jnp.float32)
                else:
                    r = y
                if layer < 5:
                    xa = (r - sh_ref[layer : layer + 1, :]) * sc_ref[layer : layer + 1, :]
                    # re-zero the tail rows: the affine maps 0 -> -m*s there,
                    # which would leak into real positions via the taps
                    x = jnp.where(padmask, xa, 0.0).astype(jnp.bfloat16)
                    if layer % 2 == 1:
                        res = x
                else:
                    r6 = r
            pooled = jnp.dot(
                pool_ref[:, :], r6.astype(jnp.bfloat16), preferred_element_type=jnp.float32
            )
            out_ref[0] = (pooled - sh_ref[6:7, :]) * sc_ref[7:8, :]

        w_spec = pl.BlockSpec((k_rows, CH_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM)

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel,
                grid=(b,),
                in_specs=[
                    pl.BlockSpec((1, pos_pad, CH_PAD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    *[w_spec] * 6,
                    pl.BlockSpec((n_win_pad, pos_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, CH_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, CH_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, n_win_pad, CH_PAD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((b, n_win_pad, CH_PAD), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((pos_pad + 2 * HALO, CH_PAD), jnp.bfloat16),
                    pltpu.VMEM((pos_pad, k_rows), jnp.bfloat16),
                ],
                cost_estimate=pl.CostEstimate(
                    flops=2 * b * (6 * k_rows * CH_PAD + CH_PAD * n_win_pad) * pos_pad,
                    bytes_accessed=b * CH_PAD * pos_pad * 2 + b * n_win_pad * CH_PAD * 4,
                    transcendentals=0,
                ),
                interpret=not on_tpu,
            )(x, *ws, pool_t, bn_scale, bn_shift)

        return run

    proto = make_proto(full_build=True)
    timed("pallas fused 6-layer proto + pool gemm", lambda x, s: proto(x), s0_pm)

    gemm_only = make_proto(full_build=False)
    timed("pallas gemm-only (im2col built once)", lambda x, s: gemm_only(x), s0_pm)

    # ================= stem legs (the measured lever) =================
    # XLA's 6 residual layers alone — the part the fused-trunk candidates
    # tried (and measurably failed) to beat
    wl = [
        jnp.asarray(rng.standard_normal((3, 3, CH, CH)).astype(np.float32) * 0.05, cdt)
        for _ in range(6)
    ]

    def xla_res6(s0, s):
        x = s0
        resv = x
        for i in range(6):
            y = jax.lax.conv_general_dilated(
                x, wl[i], (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            y = jnp.maximum(y, 0)
            r = y + resv if i % 2 == 1 else y
            x = ((r - 0.01) * 0.9).astype(cdt)
            if i % 2 == 1:
                resv = x
        return x.astype(jnp.float32).mean(axis=2)

    s0_nhwc = jax.device_put(
        (rng.standard_normal((b, t_out, F_OUT, CH)) * 0.5).astype(np.float32).astype(cdt)
    )
    jax.block_until_ready(s0_nhwc)
    timed("xla 6 residual layers alone (+ fmean)", xla_res6, s0_nhwc)

    # --- fused Pallas stem: conv0 + relu + avgpool(3,4), never leaving VMEM.
    # XLA preamble builds the 3-plane banded im2col X_pre (B, 3, 224, 120)
    # (pure pads/reshapes/concats of the 33 MB mel tensor); the kernel runs
    # 3 aligned GEMMs (224, 120) @ (120, 4x512), sums the relu'd planes
    # (the 3-row t-pool), then adds the four 512-aligned j-blocks (the f
    # pool). Output (224, 512) holds (t'+1, f'*45+co) f-major — the XLA
    # reshape to the residual layers' NHWC (B, 213, 10, 45) is free.
    mel_tm = jax.device_put(
        (rng.standard_normal((b, n_frames, 40)) * 0.5).astype(np.float32).astype(cdt)
    )
    jax.block_until_ready(mel_tm)
    q_rows = 224  # pooled rows q (t' = q - 1), sublane-tile padded
    w0fold = jnp.asarray(
        rng.standard_normal((120, 4 * 512)).astype(np.float32) * 0.1, jnp.bfloat16
    )

    def stem_prep(mel):
        """(B, 641, 40) -> X_pre (B, 3, 224, 120): X_pre[b, r, q, 40*(dt+1)+f]
        = mel[b, 3*(q-1)+r+dt, f] (zeros outside the clip)."""
        mel_big = jnp.pad(mel, ((0, 0), (4, 676 - 4 - n_frames), (0, 0)))
        parts = []
        for dt in (-1, 0, 1):
            bdt = mel_big[:, dt + 1 : dt + 1 + 3 * q_rows].reshape(b, q_rows, 3, 40)
            parts.append(jnp.transpose(bdt, (0, 2, 1, 3)))  # (B, 3, 224, 40)
        return jnp.concatenate(parts, axis=-1)  # (B, 3, 224, 120)

    def stem_kernel(xpre_ref, w_ref, out_ref):
        acc = None
        for r in range(3):
            xr = xpre_ref[0, r]  # (224, 120)
            g = jnp.dot(xr, w_ref[:, :], preferred_element_type=jnp.float32)
            g = jnp.maximum(g, 0.0)
            acc = g if acc is None else acc + g
        pooled = (
            acc[:, 0:512] + acc[:, 512:1024] + acc[:, 1024:1536] + acc[:, 1536:2048]
        ) * (1.0 / 12.0)
        out_ref[0] = pooled.astype(out_ref.dtype)

    @jax.jit
    def stem_pallas(mel):
        xpre = stem_prep(mel)
        return pl.pallas_call(
            stem_kernel,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, 3, q_rows, 120), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((120, 4 * 512), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, q_rows, 512), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, q_rows, 512), cdt),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * 3 * q_rows * 120 * 4 * 512,
                bytes_accessed=b * 3 * q_rows * 120 * 2 + b * q_rows * 512 * 2,
                transcendentals=0,
            ),
            interpret=not on_tpu,
        )(xpre, w0fold)

    timed("pallas stem (XLA im2col prep + fused kernel)", lambda m, s: stem_pallas(m), mel_tm)

    # the projected new trunk: pallas stem -> free reshape -> XLA residual 6
    def stem_plus_res6(mel, s):
        pooled = stem_pallas(mel)  # (B, 224, 512)
        s0 = pooled[:, 1 : 1 + t_out, :450].reshape(b, t_out, F_OUT, CH)
        return xla_res6(s0, s)

    timed("PROJECTED trunk: pallas stem + xla residual 6", stem_plus_res6, mel_tm)


if __name__ == "__main__":
    main()
