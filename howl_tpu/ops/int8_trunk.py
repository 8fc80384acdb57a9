"""int8 residual trunk for res8 serving (post-training static quantization).

Motivation (measured, tools/bench_trunk_int8.py, v5e batch 512 x 8 s,
two-point slope): XLA lowers ``s8 x s8 -> s32`` ``conv_general_dilated``
onto a faster MXU path — the six residual layers run at 1.54 ms pure conv
rate (1.40x bf16) and 1.81 ms with the full per-layer dequant/requant
pipeline, vs 2.16 ms in bf16. This module makes that pipeline a first-class
opt-in serving mode so its IN-STEP effect and decision fidelity can be
judged on real weights (the round-5 stem episode showed standalone micro
wins can evaporate in-step — adoption requires the full-step A/B in
tools/ablate_serving_slope.py plus decision equality on trained weights).

Scheme — the simplest thing that can be decision-exact enough:

* weights: per-OUT-CHANNEL symmetric int8 (scale = maxabs/127 over the
  (3, 3, C_in) fan-in of each output channel) — free at engine build.
* activations: per-LAYER symmetric int8 with STATIC scales calibrated from
  real audio (max-abs of each layer's input, times a safety margin).
  Static-vs-dynamic is deliberate: a per-batch max-abs reduce over the
  (B, P, C) activation costs ~0.08 ms x 6 layers on v5e — most of the win.
* arithmetic: conv accumulates in s32; relu commutes with the positive
  dequant scale so it runs on the s32 accumulator; the residual adds and
  the affine-less BatchNorm (eval: (x - mean) / sqrt(var + eps), folded to
  one per-channel scale+shift) stay in the float compute dtype, exactly
  mirroring ``Res8.residual_features`` (models/cnn.py:71-88).

The reference serves these six convolutions in f32 torch
(/root/reference/howl/model/cnn.py:113-145); howl_tpu's serving default is
bf16 XLA convs — this mode is the measured next rung down the precision
ladder, gated on the same decision-equivalence standard as bf16 and the
1-pass DFT (tools/validate_tpu_decisions.py).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BN_EPS = 1e-5  # flax nn.BatchNorm default, as used by Res8
N_LAYERS = 6


class Int8TrunkParams(NamedTuple):
    """Quantized residual-stack parameters (all leaves device-ready)."""

    w_i8: Tuple[jnp.ndarray, ...]  # 6 x (3, 3, C, C) int8, HWIO
    w_scale: Tuple[jnp.ndarray, ...]  # 6 x (C,) f32 per-out-channel
    bn_scale: Tuple[jnp.ndarray, ...]  # 6 x (C,) f32  1/sqrt(var+eps)
    bn_shift: Tuple[jnp.ndarray, ...]  # 6 x (C,) f32  -mean*scale
    act_scale: Tuple[float, ...]  # 6 static per-layer input scales


def _residual_layers(variables) -> Tuple[list, list, list]:
    """Pull conv kernels + folded BN affines for conv1..conv6 / bn1..bn6."""
    kernels, scales, shifts = [], [], []
    params = variables["params"]
    stats = variables["batch_stats"]
    for i in range(1, N_LAYERS + 1):
        k = np.asarray(jax.device_get(params[f"conv{i}"]["kernel"]), np.float32)
        mean = np.asarray(jax.device_get(stats[f"bn{i}"]["mean"]), np.float32)
        var = np.asarray(jax.device_get(stats[f"bn{i}"]["var"]), np.float32)
        s = 1.0 / np.sqrt(var + _BN_EPS)
        kernels.append(k)
        scales.append(s)
        shifts.append(-mean * s)
    return kernels, scales, shifts


def float_residual_reference(y: jnp.ndarray, variables, capture: bool = False):
    """f32 replica of ``Res8.residual_features`` built straight from the
    variable tree (no flax apply) — the calibration oracle. With
    ``capture=True`` also returns each layer's conv INPUT (the tensor the
    int8 path quantizes). Equivalence to ``model.apply(...,
    method="residual_features")`` is pinned in tests/test_int8_trunk.py."""
    kernels, scales, shifts = _residual_layers(variables)
    y = y.astype(jnp.float32)
    x = old_x = y
    inputs = []
    for i in range(N_LAYERS):
        if capture:
            inputs.append(x)
        w = jnp.asarray(kernels[i])
        y = jnp.maximum(
            jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            ),
            0,
        )
        if (i + 1) % 2 == 0:
            x = y + old_x
            old_x = x
        else:
            x = y
        x = x * jnp.asarray(scales[i]) + jnp.asarray(shifts[i])
    return (x, inputs) if capture else x


def calibrate_act_scales(
    pooled_stem: jnp.ndarray, variables, margin: float = 1.1
) -> Tuple[float, ...]:
    """Static per-layer activation scales from a calibration batch.

    ``pooled_stem``: (B, T', F', C) float stem output (post conv0+relu+pool)
    for representative audio. Returns maxabs(layer input) * margin / 127
    per layer. The margin absorbs clip-to-clip range drift; values past the
    calibrated range saturate (symmetric clip), which the smoothing +
    max-pool decision logic tolerates far better than wraparound would."""
    _, inputs = float_residual_reference(pooled_stem, variables, capture=True)
    scales = []
    for x in inputs:
        m = float(jnp.max(jnp.abs(x)))
        scales.append(max(m, 1e-6) * float(margin) / 127.0)
    return tuple(scales)


def quantize_residual_trunk(
    variables, act_scales: Sequence[float]
) -> Int8TrunkParams:
    """Per-out-channel symmetric int8 weights + folded BN affines."""
    if len(act_scales) != N_LAYERS:
        raise ValueError(f"need {N_LAYERS} activation scales, got {len(act_scales)}")
    kernels, scales, shifts = _residual_layers(variables)
    w_i8, w_scale = [], []
    for k in kernels:
        s = np.abs(k).max(axis=(0, 1, 2)) / 127.0  # (C_out,)
        s = np.maximum(s, 1e-12)
        q = np.clip(np.round(k / s[None, None, None, :]), -127, 127).astype(np.int8)
        w_i8.append(jnp.asarray(q))
        w_scale.append(jnp.asarray(s, jnp.float32))
    return Int8TrunkParams(
        w_i8=tuple(w_i8),
        w_scale=tuple(w_scale),
        bn_scale=tuple(jnp.asarray(s) for s in scales),
        bn_shift=tuple(jnp.asarray(s) for s in shifts),
        act_scale=tuple(float(s) for s in act_scales),
    )


def residual_features_int8(
    y: jnp.ndarray, p: Int8TrunkParams, compute_dtype=jnp.float32
) -> jnp.ndarray:
    """(B, T', F', C) pooled stem activations -> trunk output, with every
    conv in s8 x s8 -> s32. Structure mirrors ``Res8.residual_features``
    (residual adds on PRE-BatchNorm sums, BN after)."""
    cdt = compute_dtype or jnp.float32
    x = old_x = y.astype(cdt)
    for i in range(N_LAYERS):
        s_a = p.act_scale[i]
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) * (1.0 / s_a)), -127, 127
        ).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            xq, p.w_i8[i], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        # relu on the s32 accumulator (commutes with the positive scale)
        dq = (p.w_scale[i] * s_a).astype(cdt)  # (C,)
        yv = jnp.maximum(acc, 0).astype(cdt) * dq
        if (i + 1) % 2 == 0:
            x = yv + old_x
            old_x = x
        else:
            x = yv
        x = x * p.bn_scale[i].astype(cdt) + p.bn_shift[i].astype(cdt)
    return x
