"""Measure int8 residual convs inside the STREAMING-trunk step geometry.

The offline int8 residual stack measured a real in-step win (9.63 -> 9.43 ms,
tools/ablate_serving_slope.py). The hop-blocked streaming-trunk engine — the
~200k streams/chip capacity headline — runs the SAME six convolutions per
hop over (B, n_new+2, F', 45) ring slabs (models/cnn.py trunk_stream_step);
at 65k streams x hop_block 3 that is the same order of conv work as the
offline batch-512 trunk. This tool answers, with the two-point slope on
hardware, whether s8xs8->s32 convs buy the same ~16% there — BEFORE any
engine surgery (the round-5 stem episode: never adopt on a standalone or
different-geometry number).

Legs (per geometry (B, n_new)):
  1. flax trunk_stream_step (bf16)  — the incumbent the engine dispatches
  2. int8 replica                   — same ring/ingest/BN/residual structure,
                                      convs in s8xs8->s32 with static scales

MEASURED RESULTS (v5e through the relay, two-point slope; the harness scan
carries all 8 rings so absolute numbers sit above the engine's measured
step — the A/B within the harness is apples-to-apples):

  [B=16384 n_new=1] flax trunk_stream_step (bf16):    4.425 ms/iter
  [B=16384 n_new=1] int8 replica                :    6.148 ms/iter
  [B=65536 n_new=3] flax trunk_stream_step (bf16):   34.889 ms/iter
  [B=65536 n_new=3] int8 replica                :   45.931 ms/iter

  Verdict: REJECTED for the streaming-trunk engine. On 3-5-frame ring
  slabs the s8 convs lose ~40% instead of winning 16%: the per-layer
  quantize (round/clip/cast over the whole (B, n_new+2, F', C) slab) is
  pure VPU+HBM overhead at this shape, and XLA's int8 conv lowering pays
  its fixed relayout on a conv whose spatial extent is too small to
  amortize it. The offline win does NOT transfer across geometry — same
  lesson as the stem episode, now in the other direction. The online
  engines keep bf16.

Run on the real TPU:  python tools/bench_stream_step_int8.py
"""

from __future__ import annotations

import _path  # noqa: F401 — repo root on sys.path for howl_tpu

import argparse
import time

import numpy as np

F_OUT = 10
CH = 45


def main(argv=None):
    from howl_tpu.utils.platform import ensure_platform

    ensure_platform()

    import jax
    import jax.numpy as jnp

    from howl_tpu.models import create_model
    from howl_tpu.ops.int8_trunk import quantize_residual_trunk

    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=16)
    args = p.parse_args(argv)

    on_tpu = jax.devices()[0].platform != "cpu"
    geometries = [(16384, 1), (65536, 3)] if on_tpu else [(8, 1)]
    iters = args.iters if on_tpu else 2

    cdt = jnp.bfloat16 if on_tpu else jnp.float32
    model = create_model("res8", num_labels=4, dtype=cdt if on_tpu else None)
    feats0 = np.zeros((1, 1, 40, 41), np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats0, train=False)
    if on_tpu:
        from howl_tpu.inference.config import cast_compute_dtype

        variables = cast_compute_dtype(variables, cdt)

    # static scales: generous fixed ranges are fine for a THROUGHPUT
    # measurement (values saturate, timing is unchanged); fidelity was
    # already gated in tests/test_int8_trunk.py on calibrated scales
    i8 = quantize_residual_trunk(variables, [0.05] * 6)

    def slope(make_chain, *big):
        lo, hi = iters, iters * 4
        c_lo, c_hi = make_chain(lo), make_chain(hi)
        _ = float(np.asarray(c_lo(*big)))
        _ = float(np.asarray(c_hi(*big)))
        slopes = []
        for _rep in range(3):
            t0 = time.perf_counter()
            _ = float(np.asarray(c_lo(*big)))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = float(np.asarray(c_hi(*big)))
            t_hi = time.perf_counter() - t0
            slopes.append((t_hi - t_lo) / (hi - lo))
        return float(np.median(slopes))

    for b, n_new in geometries:
        rng = np.random.default_rng(0)
        slab_t = n_new * 3 + 2
        mel_slab = jax.device_put(
            rng.standard_normal((b, slab_t, 40, 1)).astype(np.float32).astype(cdt) * 0.5
        )
        ring_names = ["s0", "s1", "s2", "s3", "s4", "s5", "r2", "r4"]
        rings0 = {
            k: jax.device_put(
                rng.standard_normal((b, n_new + 2, F_OUT, CH)).astype(np.float32).astype(cdt) * 0.5
            )
            for k in ring_names
        }
        jax.block_until_ready(mel_slab)

        def timed(name, fn):
            def make_chain(length):
                @jax.jit
                def chain(mel, rings):
                    def body(carry, _):
                        s, rings = carry
                        new_rings, s6 = fn((mel + s * 0.0).astype(mel.dtype), rings)
                        return (s6.ravel()[0].astype(jnp.float32) * 1e-30, new_rings), None

                    (s, _), _ = jax.lax.scan(body, (jnp.float32(0.0), rings), None, length=length)
                    return s

                return chain

            dt = slope(make_chain, mel_slab, rings0)
            print(f"[B={b} n_new={n_new}] {name:28s}: {dt*1e3:8.3f} ms/iter", flush=True)
            return dt

        # ---- leg 1: the incumbent flax step ----
        timed(
            "flax trunk_stream_step (bf16)",
            lambda mel, rings: model.apply(variables, mel, rings, n_new, method="trunk_stream_step"),
        )

        # ---- leg 2: int8 replica (same structure, s8 convs) ----
        def stream_step_int8(mel_slab, rings):
            x = mel_slab.astype(cdt)
            w0 = variables["params"]["conv0"]["kernel"].astype(cdt)  # stem stays float
            y = jnp.maximum(
                jax.lax.conv_general_dilated(
                    x, w0, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
                ),
                0,
            )[:, 1 : 1 + n_new * 3]
            y = jax.lax.reduce_window(
                y, jnp.asarray(0, y.dtype), jax.lax.add, (1, 3, 4, 1), (1, 3, 4, 1), "VALID"
            ) * jnp.asarray(1.0 / 12.0, y.dtype)
            rings = dict(rings)
            rings["s0"] = jnp.concatenate([rings["s0"][:, n_new:], y], axis=1)
            s6_mean = None
            for i in range(1, 7):
                slab = rings[f"s{i-1}"][:, -(n_new + 2) :]
                s_a = i8.act_scale[i - 1]
                xq = jnp.clip(
                    jnp.round(slab.astype(jnp.float32) * (1.0 / s_a)), -127, 127
                ).astype(jnp.int8)
                acc = jax.lax.conv_general_dilated(
                    xq, i8.w_i8[i - 1], (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
                dq = (i8.w_scale[i - 1] * s_a).astype(cdt)
                y = (jnp.maximum(acc, 0).astype(cdt) * dq)[:, 1 : 1 + n_new]
                if i % 2 == 0:
                    res_src = "s0" if i == 2 else f"r{i-2}"
                    xx = y + rings[res_src][:, -(n_new + 2) : -2]
                    if i < 6:
                        rings[f"r{i}"] = jnp.concatenate([rings[f"r{i}"][:, n_new:], xx], axis=1)
                else:
                    xx = y
                s = xx * i8.bn_scale[i - 1].astype(cdt) + i8.bn_shift[i - 1].astype(cdt)
                if i < 6:
                    rings[f"s{i}"] = jnp.concatenate([rings[f"s{i}"][:, n_new:], s], axis=1)
                else:
                    s6_mean = s.astype(jnp.float32).mean(axis=2)
            return rings, s6_mean

        timed("int8 replica", stream_step_int8)

    print("done", flush=True)


if __name__ == "__main__":
    main()
