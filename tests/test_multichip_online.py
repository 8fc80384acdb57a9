"""Multi-device online serving: shard_streams() splits the per-stream state
over the mesh's 'data' axis and every subsequent push()/ingest() runs SPMD
across all chips, producing identical decisions to single-device execution.

The step is per-stream end to end (frontend rows, model batch rows, softmax,
detect FSM), so GSPMD partitions it with zero collectives — N chips serve
N x the streams at single-chip step latency. The reference's serving client
has no multi-device story at all (ref howl/client/howl_client.py)."""

import jax
import numpy as np
import pytest


def _setup(rng, n_labels=3):
    from howl_tpu.inference import EngineConfig
    from howl_tpu.models import create_model
    from howl_tpu.ops.frontend import FrontendConfig
    from howl_tpu.training.step import StepConfig, featurize

    cfg = EngineConfig(
        inference_sequence=(0, 1), max_window_size_ms=500.0, eval_stride_size_ms=62.5,
        negative_label=n_labels - 1, num_labels=n_labels,
    )
    frontend = FrontendConfig(n_mels=40)
    model = create_model("res8", num_labels=n_labels)
    feats0 = featurize(
        np.zeros((1, 8000), np.float32),
        StepConfig(frontend=frontend, zmuv_mean=0.0, zmuv_std=1.0, use_vtlp=False),
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats0, train=False)
    return cfg, frontend, model, variables


def _drive(engine_a, engine_b, audio, hop):
    """Push the same per-stream audio through both engines hop by hop,
    asserting identical fire flags and per-step labels each step."""
    n_hops = audio.shape[1] // hop
    for j in range(n_hops):
        chunk = audio[:, j * hop : (j + 1) * hop]
        fa = engine_a.push(chunk)
        fb = engine_b.push(chunk)
        assert fa == fb, f"hop {j}: sharded fired={fb}, baseline fired={fa}"
        np.testing.assert_array_equal(
            np.asarray(engine_a.state.fired), np.asarray(engine_b.state.fired)
        )


@pytest.mark.slow
def test_incremental_online_sharded_streams(rng):
    from howl_tpu.inference.online import IncrementalOnlineEngine
    from howl_tpu.models.base import model_spec
    from howl_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) >= 8
    cfg, frontend, model, variables = _setup(rng)

    base = IncrementalOnlineEngine(
        model, variables, cfg, frontend, spec=model_spec("res8"), num_streams=16
    )
    sharded = IncrementalOnlineEngine(
        model, variables, cfg, frontend, spec=model_spec("res8"), num_streams=16
    )
    mesh = make_mesh(data=8)
    sharded.shard_streams(mesh)
    # state actually lives split across the 8 devices
    assert len(sharded.mel_ring.sharding.device_set) == 8

    audio = (rng.standard_normal((16, base.hop_samples * 12)) * 0.1).astype(np.float32)
    _drive(base, sharded, audio, base.hop_samples)
    # steps kept the sharding (GSPMD propagated it through the jitted step)
    assert len(sharded.mel_ring.sharding.device_set) == 8
    np.testing.assert_allclose(
        np.asarray(base.mel_ring), np.asarray(sharded.mel_ring), atol=1e-5
    )


@pytest.mark.slow
def test_streaming_trunk_sharded_streams(rng):
    from howl_tpu.inference import FusedStreamingOnlineEngine
    from howl_tpu.models.base import model_spec
    from howl_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) >= 8
    cfg, frontend, model, variables = _setup(rng)

    base = FusedStreamingOnlineEngine(
        model, variables, cfg, frontend, spec=model_spec("res8"), num_streams=16
    )
    sharded = FusedStreamingOnlineEngine(
        model, variables, cfg, frontend, spec=model_spec("res8"), num_streams=16
    )
    mesh = make_mesh(data=8)
    sharded.shard_streams(mesh)
    assert len(sharded.mel_cache.sharding.device_set) == 8

    audio = (rng.standard_normal((16, base.hop_samples * 12)) * 0.1).astype(np.float32)
    _drive(base, sharded, audio, base.hop_samples)
    assert len(sharded.mel_cache.sharding.device_set) == 8
    np.testing.assert_allclose(
        np.asarray(base.last_probs), np.asarray(sharded.last_probs), atol=1e-5
    )


@pytest.mark.slow
def test_hop_blocked_trunk_sharded_streams(rng):
    """shard_streams on a hop-blocked trunk engine: the deeper blocked rings
    shard the same way, and blocked steps keep the placement + match an
    unsharded blocked engine exactly."""
    from howl_tpu.inference import FusedStreamingOnlineEngine
    from howl_tpu.models.base import model_spec
    from howl_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) >= 8
    cfg, frontend, model, variables = _setup(rng)

    mk = lambda: FusedStreamingOnlineEngine(  # noqa: E731
        model, variables, cfg, frontend, spec=model_spec("res8"), num_streams=16, hop_block=3
    )
    base, sharded = mk(), mk()
    H = base.hop_block
    mesh = make_mesh(data=8)
    sharded.shard_streams(mesh)
    assert len(sharded.mel_cache.sharding.device_set) == 8

    audio = (rng.standard_normal((16, base.hop_samples * 4 * H)) * 0.1).astype(np.float32)
    block = H * base.hop_samples
    for b in range(4):
        chunk = audio[:, b * block : (b + 1) * block]
        fa = base.push(chunk)
        fb = sharded.push(chunk)
        assert fa == fb
        np.testing.assert_array_equal(
            np.asarray(base.last_fired), np.asarray(sharded.last_fired)
        )
    assert len(sharded.mel_cache.sharding.device_set) == 8
    np.testing.assert_allclose(
        np.asarray(base.last_probs), np.asarray(sharded.last_probs), atol=1e-5
    )


def test_shard_streams_uneven_count_rejected(rng):
    from howl_tpu.inference.online import OnlineEngine
    from howl_tpu.models.base import model_spec
    from howl_tpu.parallel.mesh import make_mesh

    cfg, frontend, model, variables = _setup(rng)
    eng = OnlineEngine(
        model, variables, cfg, frontend, spec=model_spec("res8"), num_streams=3
    )
    with pytest.raises(ValueError, match="divisible"):
        eng.shard_streams(make_mesh(data=8))
