"""Multi-device batched inference: the engine program shards over the 'data'
mesh axis via GSPMD — sharded inputs produce identical detections to
single-device execution."""

import jax
import numpy as np
import pytest


@pytest.mark.slow
def test_engine_sharded_over_data_axis(rng):
    from howl_tpu.inference import EngineConfig, StreamingEngine
    from howl_tpu.models import create_model
    from howl_tpu.models.base import model_spec
    from howl_tpu.ops.frontend import FrontendConfig
    from howl_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from howl_tpu.training.step import StepConfig, featurize

    assert len(jax.devices()) >= 8  # conftest's virtual CPU mesh

    cfg = EngineConfig(
        inference_sequence=(0, 1), max_window_size_ms=500.0, eval_stride_size_ms=125.0,
        negative_label=2, num_labels=3,
    )
    frontend = FrontendConfig(n_mels=40)
    model = create_model("res8", num_labels=3)
    feats0 = featurize(
        np.zeros((1, 8000), np.float32),
        StepConfig(frontend=frontend, zmuv_mean=0.0, zmuv_std=1.0, use_vtlp=False),
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats0, train=False)
    engine = StreamingEngine(model, variables, cfg, frontend, spec=model_spec("res8"))

    audio = (rng.standard_normal((16, 16000)) * 0.1).astype(np.float32)

    # single-device baseline
    base = engine.infer_batch(audio)
    base_detected = np.asarray(base["detected"])
    base_probs = np.asarray(base["probs"])

    # shard params (replicated) + batch (split on 'data') over the 8-way mesh
    mesh = make_mesh(data=8)
    engine.variables = replicate(engine.variables, mesh)
    (sharded_audio,) = shard_batch((audio,), mesh)
    out = engine.infer_batch(sharded_audio)
    np.testing.assert_array_equal(np.asarray(out["detected"]), base_detected)
    np.testing.assert_allclose(np.asarray(out["probs"]), base_probs, atol=1e-5)
    # the output actually lives sharded across devices
    assert len(out["probs"].sharding.device_set) == 8
