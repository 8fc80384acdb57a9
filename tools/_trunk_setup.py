"""Shared engine-setup boilerplate for the streaming-trunk measurement tools.

One place for the benchmark geometry (hey-firefox defaults: 500 ms window,
62.5 ms stride, 40 mels, 16 kHz) so bench_streaming_trunk.py,
bench_trunk_blocked.py, and ablate_trunk_step.py can't silently drift onto
different configs. Calls ensure_platform() so JAX_PLATFORMS=cpu is honored
despite the sitecustomize TPU pin.
"""

from __future__ import annotations

import _path  # noqa: F401 — repo root on sys.path for howl_tpu

import sys

from typing import NamedTuple

import numpy as np

class TrunkBenchSetup(NamedTuple):
    on_tpu: bool
    n_streams: int
    steps_arg: int
    cfg: object  # EngineConfig
    frontend: object  # FrontendConfig
    model: object
    variables: dict
    compute_dtype: object  # jnp.bfloat16 on TPU, None on CPU
    rng: np.random.Generator

def trunk_bench_setup(default_streams_tpu: int, default_steps_tpu: int,
                      default_streams_cpu: int = 8, default_steps_cpu: int = 2) -> TrunkBenchSetup:
    """argv: [num_streams] [steps]. Builds the shared res8 + engine config."""
    from howl_tpu.utils.platform import ensure_platform

    ensure_platform()
    import jax
    import jax.numpy as jnp

    from howl_tpu.inference import EngineConfig
    from howl_tpu.models import create_model
    from howl_tpu.ops.frontend import FrontendConfig
    from howl_tpu.training.step import StepConfig, featurize

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    n_streams = int(sys.argv[1]) if len(sys.argv) > 1 else (
        default_streams_tpu if on_tpu else default_streams_cpu)
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else (
        default_steps_tpu if on_tpu else default_steps_cpu)

    frontend = FrontendConfig(n_mels=40)
    cfg = EngineConfig(
        inference_sequence=(0, 1, 2), max_window_size_ms=500.0, eval_stride_size_ms=62.5,
        negative_label=3, num_labels=4, sample_rate=16000,
    )
    model = create_model("res8", num_labels=4)
    feats0 = featurize(
        np.zeros((1, 8000), np.float32),
        StepConfig(frontend=frontend, zmuv_mean=0.0, zmuv_std=1.0, use_vtlp=False),
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats0, train=False)
    compute_dtype = jnp.bfloat16 if on_tpu else None
    return TrunkBenchSetup(
        on_tpu, n_streams, steps, cfg, frontend, model, variables,
        compute_dtype, np.random.default_rng(0),
    )
