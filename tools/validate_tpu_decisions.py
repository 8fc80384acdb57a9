"""Validate bf16 + Precision.HIGH serving decisions against f32/HIGHEST on the
REAL TPU, for every model family the engine serves.

CPU tests cannot exercise the TPU's matmul-precision modes, so this is the
hardware-side counterpart of tests/test_ctc_sweep_and_bf16.py: for each
family it scores the same clip batch with the exact engine (f32 params,
HIGHEST DFT) and the fast serving engine (bf16 params, HIGH DFT) and compares
detections, first-fire steps, and per-step labels at a mid-scale threshold.

Run (on the axon TPU): python tools/validate_tpu_decisions.py
"""

from __future__ import annotations

import _path  # noqa: F401 — repo root on sys.path for howl_tpu

import sys

import numpy as np

FAMILIES = ["res8", "small-cnn", "lstm", "gru", "las", "mobilenet"]

def main():
    from howl_tpu.utils.platform import ensure_platform

    ensure_platform()

    import jax
    import jax.numpy as jnp

    from howl_tpu.inference import EngineConfig, StreamingEngine
    from howl_tpu.models import create_model
    from howl_tpu.models.base import model_spec
    from howl_tpu.ops.frontend import FrontendConfig
    from howl_tpu.training.step import StepConfig, featurize

    frontend = FrontendConfig(n_mels=40)
    cfg = EngineConfig(
        inference_sequence=(0, 1, 2),
        max_window_size_ms=500.0,
        eval_stride_size_ms=62.5,
        negative_label=3,
        num_labels=4,
        inference_threshold=0.35,
        sample_rate=16000,
    )
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((16, 4 * 16000)).astype(np.float32) * 0.1
    feats0 = featurize(
        audio[:1, :8000], StepConfig(frontend=frontend, zmuv_mean=0.0, zmuv_std=1.0, use_vtlp=False)
    )

    all_ok = True

    def compare(tag, exact_out, fast_out):
        nonlocal all_ok
        det_eq = np.array_equal(np.asarray(exact_out["detected"]), np.asarray(fast_out["detected"]))
        fire_eq = np.array_equal(
            np.asarray(exact_out["first_fire_step"]), np.asarray(fast_out["first_fire_step"])
        )
        lab_frac = (np.asarray(exact_out["labels"]) == np.asarray(fast_out["labels"])).mean()
        ok = det_eq and fire_eq and lab_frac >= 0.99
        all_ok &= ok
        print(
            f"{tag:22s}: detected_eq={det_eq} first_fire_eq={fire_eq} "
            f"label_agreement={lab_frac:.4f} -> {'OK' if ok else 'MISMATCH'}",
            flush=True,
        )

    for name in FAMILIES:
        model = create_model(name, num_labels=4)
        variables = model.init({"params": jax.random.PRNGKey(hash(name) % 2**31)}, feats0, train=False)
        spec = model_spec(name)
        exact = StreamingEngine(model, variables, cfg, frontend, spec=spec)
        fast = StreamingEngine(model, variables, cfg, frontend, spec=spec, compute_dtype=jnp.bfloat16)
        a = exact.infer_batch(audio)
        compare(name, a, fast.infer_batch(audio))
        if not spec.uses_deltas:
            # jnp 1-pass bf16 DFT (the XLA-chain twin of the Pallas "bf16"
            # mode — what the online engines would serve with)
            jb = StreamingEngine(
                model, variables, cfg, frontend, spec=spec, compute_dtype=jnp.bfloat16,
                dft_precision="bf16",
            )
            compare(f"{name}+jnp[bf16]", a, jb.infer_batch(audio))
        if name == "res8":
            # the polyphase Pallas frontend's fast modes against the same oracle
            for prec in ("bf16", "bf16x2", None):
                pall = StreamingEngine(
                    model, variables, cfg, frontend, spec=spec, compute_dtype=jnp.bfloat16,
                    use_pallas_frontend=True, pallas_precision=prec,
                )
                compare(f"res8+pallas[{prec or 'bf16x3'}]", a, pall.infer_batch(audio))
            # the fused Pallas stem (ops/stem_pallas.py) on top of the
            # serving-default frontend — the bench headline configuration
            stem = StreamingEngine(
                model, variables, cfg, frontend, spec=spec, compute_dtype=jnp.bfloat16,
                use_pallas_frontend=True, use_pallas_stem=True,
            )
            compare("res8+pallas+stem", a, stem.infer_batch(audio))
            # the int8 residual-trunk candidate (ops/int8_trunk.py) on top of
            # the headline configuration — static activation scales
            # calibrated on the SAME clips it scores (the best case; a real
            # deployment calibrates on held-out audio and must re-validate)
            i8 = StreamingEngine(
                model, variables, cfg, frontend, spec=spec, compute_dtype=jnp.bfloat16,
                use_pallas_frontend=True, use_pallas_stem=True,
                use_int8_trunk=True, int8_calibration_audio=audio,
            )
            compare("res8+pallas+stem+int8", a, i8.infer_batch(audio))
            # the hop-incremental online engines at their serving precisions:
            # 1-pass bf16 DFT (the auto default since the round-4 flip) vs the
            # SAME engine class pinned to exact HIGHEST. NB: the baseline must
            # be pinned explicitly — since the flip, auto ALSO resolves to
            # "bf16" under a bf16 compute dtype, so an unpinned baseline would
            # compare the fast mode against itself.
            from howl_tpu.inference.online import IncrementalOnlineEngine, OnlineEngine
            from howl_tpu.inference.streaming_trunk import FusedStreamingOnlineEngine

            def run_online(cls, **kw):
                eng = cls(
                    model, variables, cfg, frontend, spec=spec, num_streams=16,
                    compute_dtype=jnp.bfloat16, **kw,
                )
                hop = eng.hop_samples
                fired, labels = [], []
                for t in range(0, (audio.shape[1] // hop) * hop, hop):
                    eng.push(audio[:, t : t + hop])
                    fired.append(np.asarray(eng.last_fired))
                    labels.append(np.asarray(eng.last_labels))
                return np.stack(fired), np.stack(labels)

            def run_full_window(**kw):
                # OnlineEngine re-scores a full window per hop: slide the
                # window over the same clips at the engine's own stride
                eng = OnlineEngine(
                    model, variables, cfg, frontend, spec=spec, num_streams=16,
                    compute_dtype=jnp.bfloat16, **kw,
                )
                hop = int(round(eng.stride_ms / 1000.0 * cfg.sample_rate))
                win = eng.window_samples
                fired, labels = [], []
                for end in range(hop, (audio.shape[1] // hop) * hop + 1, hop):
                    eng.ingest(audio[:, max(0, end - win) : end])
                    fired.append(np.asarray(eng.last_fired))
                    labels.append(np.asarray(eng.last_labels))
                return np.stack(fired), np.stack(labels)

            for runner, tag in (
                (lambda **kw: run_online(IncrementalOnlineEngine, **kw), "online"),
                (lambda **kw: run_online(FusedStreamingOnlineEngine, **kw), "trunk"),
                (run_full_window, "full-window"),
            ):
                f_hi, l_hi = runner(dft_precision=jax.lax.Precision.HIGHEST)
                f_b1, l_b1 = runner(dft_precision="bf16")
                det_eq = bool((f_hi == f_b1).all())
                lab_frac = float((l_hi == l_b1).mean())
                ok = det_eq and lab_frac >= 0.99
                all_ok &= ok
                print(
                    f"res8+{tag}[jnp bf16]   : fired_eq={det_eq} "
                    f"label_agreement={lab_frac:.4f} -> {'OK' if ok else 'MISMATCH'}",
                    flush=True,
                )
    print("ALL OK" if all_ok else "MISMATCHES FOUND")
    return 0 if all_ok else 1

if __name__ == "__main__":

    sys.exit(main())
