"""Benchmark: batched streaming wake-word scoring (fused mel + res8 + FSM).

Measures end-to-end streaming throughput of the full inference path — log-mel
frontend, res8 scoring of every sliding window, posterior smoothing, FSM — on
one chip, expressed as a real-time factor (seconds of audio scored per second
of wall clock).

The reference never measures this (its eval loop is unbatched per-clip Python,
ref training/run/train.py:69-81); its deployed client runs ~1x real time on a
CPU. BASELINE.md's north star is >1000x real time per chip, so
``vs_baseline = realtime_factor / 1000`` (>1 beats the target).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax

    from howl_tpu.inference import EngineConfig, StreamingEngine
    from howl_tpu.models import create_model
    from howl_tpu.models.base import model_spec
    from howl_tpu.ops.frontend import FrontendConfig

    platform = jax.devices()[0].platform
    # scale the workload to the platform: the TPU run is the benchmark; the
    # CPU path exists so the script stays runnable in dev environments
    on_tpu = platform not in ("cpu",)
    batch = 128 if on_tpu else 4
    clip_seconds = 8.0 if on_tpu else 2.0
    iters = 32 if on_tpu else 2

    import jax.numpy as jnp

    sample_rate = 16000
    frontend = FrontendConfig(n_mels=40)
    cfg = EngineConfig(
        inference_sequence=(0, 1, 2),
        max_window_size_ms=500.0,
        eval_stride_size_ms=62.5,
        negative_label=3,
        num_labels=4,
        sample_rate=sample_rate,
    )
    model = create_model("res8", num_labels=4)
    rng = np.random.default_rng(0)
    clip_samples = int(clip_seconds * sample_rate)
    audio = rng.standard_normal((batch, clip_samples)).astype(np.float32) * 0.1

    from howl_tpu.training.step import StepConfig, featurize

    feats0 = featurize(audio[:1, :8000], StepConfig(frontend=frontend, zmuv_mean=0.0, zmuv_std=1.0, use_vtlp=False))
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats0, train=False)
    # bf16 serving config: 3.3x faster scoring with detections AND per-step
    # labels verified identical to f32 on this workload; decision logic stays f32
    engine = StreamingEngine(
        model, variables, cfg, frontend, 0.0, 1.0, spec=model_spec("res8"),
        compute_dtype=jnp.bfloat16 if on_tpu else None,
    )

    # Methodology: audio is device-resident (as in a production ring buffer —
    # the dev-environment host<->TPU tunnel is not representative of PCIe).
    # Iterations are CHAINED (each input depends on the previous detections)
    # and fetched once at the end, so the single host round-trip amortizes
    # over the chain and the device executes the full sequence.
    audio = jax.device_put(audio)
    jax.block_until_ready(audio)

    @jax.jit
    def chain_next(a, detected):
        return a * (1.0 + detected.sum().astype(np.float32) * 1e-30)

    # warmup (compile both steps)
    detected = engine.infer_batch(audio)["detected"]
    _ = np.asarray(chain_next(audio, detected)[0, 0])

    start = time.perf_counter()
    a = audio
    for _ in range(iters):
        detected = engine.infer_batch(a)["detected"]
        a = chain_next(a, detected)
    _ = float(np.asarray(a[0, 0]))  # one fetch drains the whole chain
    elapsed = time.perf_counter() - start

    audio_seconds = batch * clip_seconds * iters
    realtime_factor = audio_seconds / elapsed
    print(
        json.dumps(
            {
                "metric": "mel_res8_streaming_realtime_factor",
                "value": round(realtime_factor, 1),
                "unit": f"x_realtime_per_{platform}_chip",
                "vs_baseline": round(realtime_factor / 1000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
