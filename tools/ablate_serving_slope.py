"""Slope-corrected component attribution of the OFFLINE serving headline.

The round-3 component table (docs/PERFORMANCE.md "Where the serving time
goes") divided single chains by their iteration count, which inflates every
number by ~31ms/iters of fixed relay cost. This re-measures the fused
streaming path's components with the two-point slope (bench_hbm_sweep.py
methodology) to target the real bottleneck:

  * full fused step (featurize + trunk + window head + softmax)
  * frontend alone (Pallas polyphase 1-pass bf16, the serving default)
  * frontend alone (XLA GEMM chain, HIGH)
  * trunk alone (on precomputed features)
  * head alone (cumsum window pooling + dense, on precomputed trunk)

Run on the real TPU:  python tools/ablate_serving_slope.py [--batch 512]
"""

from __future__ import annotations

import _path  # noqa: F401 — repo root on sys.path for howl_tpu

import argparse
import time
from functools import partial

import numpy as np


def main(argv=None):
    from howl_tpu.utils.platform import ensure_platform

    ensure_platform()

    import jax
    import jax.numpy as jnp

    from howl_tpu.inference.config import EngineConfig
    from howl_tpu.inference.engine import StreamingEngine
    from howl_tpu.models import create_model
    from howl_tpu.models.base import model_spec
    from howl_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--clip-seconds", type=float, default=8.0)
    p.add_argument("--iters", type=int, default=16)
    args = p.parse_args(argv)

    on_tpu = jax.devices()[0].platform != "cpu"
    if not on_tpu:
        args.batch, args.clip_seconds, args.iters = 4, 2.0, 2

    frontend = FrontendConfig(n_mels=40)
    cfg = EngineConfig(
        inference_sequence=(0, 1, 2), max_window_size_ms=500.0,
        eval_stride_size_ms=62.5, negative_label=3, num_labels=4,
    )
    model = create_model("res8", num_labels=4)
    rng = np.random.default_rng(0)
    clip_samples = int(args.clip_seconds * 16000)
    audio = jax.device_put(
        rng.standard_normal((args.batch, clip_samples)).astype(np.float32) * 0.1
    )
    feats0 = np.zeros((1, 1, 40, 41), np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats0, train=False)
    compute_dtype = jnp.bfloat16 if on_tpu else None

    engine = StreamingEngine(
        model, variables, cfg, frontend, 0.0, 1.0, spec=model_spec("res8"),
        compute_dtype=compute_dtype, use_pallas_frontend=on_tpu,
    )
    engine_xla = StreamingEngine(
        model, variables, cfg, frontend, 0.0, 1.0, spec=model_spec("res8"),
        compute_dtype=compute_dtype, use_pallas_frontend=False,
    )
    # round-5 serving default: pallas frontend + fused pallas stem — the
    # same-session A/B against `engine` isolates the stem's full-step effect
    # from the ~5-12% day-to-day chip variance that headline reruns carry.
    engine_stem = StreamingEngine(
        model, variables, cfg, frontend, 0.0, 1.0, spec=model_spec("res8"),
        compute_dtype=compute_dtype, use_pallas_frontend=on_tpu,
        use_pallas_stem=on_tpu,
    )
    # int8 residual candidate (ops/int8_trunk.py): standalone it measured
    # 2.16 -> 1.81 ms (tools/bench_trunk_int8.py); this leg answers whether
    # the win survives in-step — the stem episode says never assume it does.
    engine_int8 = StreamingEngine(
        model, variables, cfg, frontend, 0.0, 1.0, spec=model_spec("res8"),
        compute_dtype=compute_dtype, use_pallas_frontend=on_tpu,
        use_pallas_stem=on_tpu, use_int8_trunk=True,
        int8_calibration_audio=np.asarray(jax.device_get(audio)),
    )
    n_win = engine.n_windows(clip_samples)
    iters = args.iters

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
        """fn(big, scalar)->array; big loop-invariant, scalar chains via input."""

        def make_chain(length):
            @jax.jit
            def chain(big):
                def body(s, _):
                    # scalar perturbs the INPUT so nothing hoists out of the
                    # scan; cast back to big's dtype — bf16 + f32 promotes to
                    # f32 and would silently benchmark an f32 trunk (~2x)
                    out = fn((big + s * 0.0).astype(big.dtype), s)
                    return jnp.asarray(out).ravel()[0].astype(jnp.float32) * 1e-30, None

                s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=length)
                return s

            return chain

        dt = slope(make_chain, big)
        audio_s = args.batch * args.clip_seconds
        print(f"{name:52s}: {dt*1e3:8.3f} ms/iter  ({audio_s/dt:,.0f}x realtime)", flush=True)
        return dt

    # full fused decision path (what bench.py's headline chains)
    lengths = jnp.full((args.batch,), clip_samples, jnp.int32)
    geom = engine._step_geometry(args.batch, clip_samples)

    def full_step(a, s, eng):
        out = eng._infer_fn(
            eng.variables, a, lengths, jnp.float32(0.0),
            n_windows=geom["n_win"], s_steps=geom["s_steps"], w_steps=geom["w_steps"],
            stride=geom["stride"], check_offset=geom["check_offset"],
        )
        return out["detected"].astype(jnp.float32)

    timed("full fused step (pallas frontend)", partial(full_step, eng=engine), audio)
    timed("full fused step (pallas frontend + stem)", partial(full_step, eng=engine_stem), audio)
    timed("full fused step (pallas frontend + stem + int8)", partial(full_step, eng=engine_int8), audio)
    timed("full fused step (xla frontend)", partial(full_step, eng=engine_xla), audio)

    # frontend alone
    from howl_tpu.ops.frontend_pallas import log_mel_spectrogram_pallas

    if on_tpu:
        timed(
            "frontend: pallas polyphase bf16x1",
            lambda a, s: log_mel_spectrogram_pallas(
                a, frontend, 0.0, 1.0, precision="bf16", out_dtype=compute_dtype),
            audio,
        )
    timed(
        "frontend: xla gemm chain (HIGH)",
        lambda a, s: log_mel_spectrogram(a, frontend, precision=jax.lax.Precision.HIGH),
        audio,
    )

    # trunk alone on precomputed features
    feats = jax.jit(lambda a: engine._featurize(a))(audio)
    jax.block_until_ready(feats)

    timed(
        "trunk alone (standalone harness; layout may differ)",
        lambda f, s: model.apply(engine.variables, f, train=False, method="trunk_features")
        .astype(jnp.float32).mean(axis=(1, 2)),
        feats,
    )

    # the exact in-step remainder: everything score_fused does after
    # _featurize (trunk -> f32 freq-mean -> cumsum window pooling -> head ->
    # softmax), on precomputed features. full - frontend should match THIS,
    # not the standalone trunk harness above (whose input-perturbation add
    # can change XLA's conv layout assignment).
    pool_t = getattr(model, "pooling", (3, 4))[0]
    sf = engine.stride_frames
    span = max(engine.window_frames // pool_t, 1)

    def post_frontend(f, s):
        trunk = model.apply(engine.variables, f, train=False, method="trunk_features")
        tf = trunk.astype(jnp.float32).mean(axis=2)
        tp = tf.shape[1]
        eff = min(span, tp)
        csum = jnp.concatenate([jnp.zeros_like(tf[:, :1]), jnp.cumsum(tf, axis=1)], axis=1)
        starts = np.clip(np.round(np.arange(n_win) * sf / pool_t).astype(np.int32), 0, tp - eff)
        wmean = (csum[:, starts + eff] - csum[:, starts]) / eff
        logits = model.apply(engine.variables, wmean, method="head")
        return jax.nn.softmax(logits.astype(jnp.float32), -1)

    timed("post-frontend remainder (trunk+pool+head, in-step form)", post_frontend, feats)

    # head alone (cumsum pooling + dense + softmax) on precomputed trunk
    trunk = jax.jit(
        lambda f: model.apply(engine.variables, f, train=False, method="trunk_features")
        .astype(jnp.float32).mean(axis=2)
    )(feats)
    jax.block_until_ready(trunk)

    def head_only(tf, s):
        tp = tf.shape[1]
        eff = min(span, tp)
        csum = jnp.concatenate([jnp.zeros_like(tf[:, :1]), jnp.cumsum(tf, axis=1)], axis=1)
        starts = np.clip(np.round(np.arange(n_win) * sf / pool_t).astype(np.int32), 0, tp - eff)
        wmean = (csum[:, starts + eff] - csum[:, starts]) / eff
        logits = model.apply(engine.variables, wmean, method="head")
        return jax.nn.softmax(logits.astype(jnp.float32), -1)

    timed("head: cumsum window pooling + dense", head_only, trunk)


if __name__ == "__main__":
    main()
