"""Measure (don't estimate) int8 residual-layer candidates for res8 serving.

Round 5 split the trunk: fused Pallas stem 2.25 ms + XLA residual layers
2.28 ms (tools/bench_trunk_kernel_micro.py). The residual stack sits at the
45->128 lane-padding floor in bf16 (~50% MFU on 45-channel convs) — the one
precision lever never measured is int8: the v5e MXU runs s8xs8->s32 at 2x
the bf16 rate (394 vs 197 TOPS), and the padding waste is dtype-independent,
so IF XLA lowers int8 convolutions onto the native int8 MXU path the six
layers could approach ~1.1 ms. The honest candidate must also pay per-layer
requantization (s32 -> scale -> bf16 BN/relu/residual -> s8), which is VPU
work plus an extra (B, P, C) round trip per layer, so the win is not free.

Legs (standalone replicas of models/cnn.py residual_features eval, NHWC
(B, 213, 10, 45) at the batch-512 x 8 s serving geometry; BN folded to
per-channel scale+shift as XLA does in eval):

  1. bf16 residual stack   — ties this harness to the 2.28 ms incumbent
  2. int8 full pipeline    — s8 acts/weights, conv -> s32,
                             dequant+BN+relu+residual in bf16, requant s8
  3. int8 conv rate        — 6 chained s8 convs with a shift-only requant
                             (no bf16 excursion): the pure-throughput bound

MEASURED RESULTS (v5e through the relay, two-point slope, batch 512,
same session as the tools/ablate_serving_slope.py run below):

  bf16 residual stack (incumbent replica)     :    2.157 ms/iter
  int8 full pipeline (dequant/requant bf16)   :    1.812 ms/iter  (-16%)
  int8 conv rate (shift-only requant)         :    1.541 ms/iter  (-29%)

  Verdict: XLA DOES lower s8xs8->s32 `conv_general_dilated` onto a faster
  MXU path — the pure conv rate is 1.40x bf16 (not the 2x nominal int8
  rate: the 45->128 lane padding and tiling overheads eat part of it), and
  the honest pipeline (per-layer dequant -> bf16 BN/relu/residual ->
  requant) keeps a 0.35 ms win at the micro level. CAVEAT from the stem
  episode (same session): standalone micro wins can evaporate in-step —
  the fused Pallas stem measured 3.6 -> 2.25 ms standalone but only
  9.695 -> 9.594 ms in the full fused step. An int8 residual path is a
  candidate worth an IN-STEP measurement plus a decision-equivalence run
  on imported trained weights before adoption; at ~0.35 ms of a ~9.6 ms
  step (~3.6%) it is not adopted on this evidence alone.

Reference capability anchor: /root/reference/howl/model/cnn.py:113-145
(res8's six residual convolutions; the reference serves them in f32 torch).

Run on the real TPU:  python tools/bench_trunk_int8.py [--batch 512]
"""

from __future__ import annotations

import _path  # noqa: F401 — repo root on sys.path for howl_tpu

import argparse
import time

import numpy as np

T_OUT = 213  # pooled trunk frames at 8 s / hey-firefox geometry
F_OUT = 10  # pooled mel bins (40 / pool_f 4)
CH = 45  # res8 num_maps


def main(argv=None):
    from howl_tpu.utils.platform import ensure_platform

    ensure_platform()

    import jax
    import jax.numpy as jnp

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--iters", type=int, default=16)
    args = p.parse_args(argv)

    on_tpu = jax.devices()[0].platform != "cpu"
    if not on_tpu:
        args.batch, args.iters = 4, 2

    b, iters = args.batch, args.iters
    rng = np.random.default_rng(0)

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
                    out = fn((big + s * 0.0).astype(big.dtype))
                    return jnp.asarray(out).ravel()[0].astype(jnp.float32) * 1e-30, None

                s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=length)
                return s

            return chain

        dt = slope(make_chain, big)
        print(f"{name:44s}: {dt*1e3:8.3f} ms/iter", flush=True)
        return dt

    # shared parameters: 6 conv layers + folded BN scale/shift
    ws_f32 = [rng.standard_normal((3, 3, CH, CH)).astype(np.float32) * 0.05 for _ in range(6)]
    bn_scale = [np.full((CH,), 0.9, np.float32) for _ in range(6)]
    bn_shift = [np.full((CH,), 0.01, np.float32) for _ in range(6)]

    def conv(x, w, pet=None):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet,
        )

    x0 = jax.device_put(
        rng.standard_normal((b, T_OUT, F_OUT, CH)).astype(np.float32).astype(jnp.bfloat16)
    )
    jax.block_until_ready(x0)

    # ---- leg 1: bf16 incumbent replica ----
    ws_bf = [jnp.asarray(w, jnp.bfloat16) for w in ws_f32]
    scales = [jnp.asarray(s, jnp.bfloat16) for s in bn_scale]
    shifts = [jnp.asarray(s, jnp.bfloat16) for s in bn_shift]

    def resid_bf16(y):
        x = old_x = y
        for i in range(6):
            y = jnp.maximum(conv(x, ws_bf[i]), 0)
            if (i + 1) % 2 == 0:
                x = y + old_x
                old_x = x
            else:
                x = y
            x = x * scales[i] + shifts[i]
        return x.astype(jnp.float32).mean()

    timed("bf16 residual stack (incumbent replica)", resid_bf16, x0)

    # ---- leg 2: int8 full pipeline ----
    # Per-tensor activation scale, per-layer weight scale (per-channel adds
    # only VPU cost; per-tensor is the FASTEST possible int8 formulation, so
    # a slow result here rejects the whole family).
    w_scales = [np.abs(w).max() / 127.0 for w in ws_f32]
    ws_i8 = [
        jnp.asarray(np.clip(np.round(w / s), -127, 127).astype(np.int8))
        for w, s in zip(ws_f32, w_scales)
    ]
    a_scale = 4.0 / 127.0  # acts clipped to [-4, 4]

    def quant(x):
        return jnp.clip(jnp.round(x.astype(jnp.float32) / a_scale), -127, 127).astype(jnp.int8)

    x0_i8 = jax.jit(quant)(x0)
    jax.block_until_ready(x0_i8)

    def resid_int8(y_i8):
        x = old_x = None
        xq = y_i8
        for i in range(6):
            acc = conv(xq, ws_i8[i], pet=jnp.int32)  # s8 x s8 -> s32
            y = jnp.maximum(acc, 0).astype(jnp.bfloat16) * jnp.bfloat16(
                w_scales[i] * a_scale
            )
            if (i + 1) % 2 == 0:
                x = y + (old_x if old_x is not None else 0)
                old_x = x
            else:
                x = y
            x = x * scales[i] + shifts[i]
            xq = quant(x)
        return x.astype(jnp.float32).mean()

    timed("int8 full pipeline (dequant/requant bf16)", resid_int8, x0_i8)

    # ---- leg 3: int8 conv-rate isolation (shift-only requant) ----
    def resid_int8_rate(y_i8):
        xq = y_i8
        for i in range(6):
            acc = conv(xq, ws_i8[i], pet=jnp.int32)
            # cheapest possible requant: arithmetic shift + clip, stays int
            xq = jnp.clip(acc >> 7, -127, 127).astype(jnp.int8)
        return xq.astype(jnp.float32).mean()

    timed("int8 conv rate (shift-only requant)", resid_int8_rate, x0_i8)

    print("done", flush=True)


if __name__ == "__main__":
    main()
