"""Data-parallel training/eval equivalence (VERDICT.md round-2 items #1-2).

Proves the flagship DP story gives THE SAME ANSWER as single-device execution,
not just finite losses:

  * one train step on an 8-device data mesh matches the identical step on one
    device — loss, updated params, and (crucially) BatchNorm batch_stats.
    res8's affine-less BatchNorm with batch 16 is the quality risk SURVEY.md
    §7 flags; GSPMD must produce GLOBAL batch statistics, and this asserts it.
  * the mesh-sharded BatchedEvaluator (ragged batches padded onto the data
    axis) produces identical confusion matrices and threshold sweeps.
"""

import jax
import numpy as np
import pytest

from tests.fixtures import make_wakeword_corpus


def _make_step_inputs(augment: bool, batch: int = 16, window_samples: int = 8000):
    from howl_tpu.models import create_model
    from howl_tpu.ops.augment import AugmentConfig
    from howl_tpu.ops.frontend import FrontendConfig
    from howl_tpu.training.step import StepConfig, featurize, make_classification_train_step

    import flax
    import optax

    from howl_tpu.training.state import TrainState

    frontend = FrontendConfig(n_mels=40)
    step_cfg = StepConfig(
        frontend=frontend,
        zmuv_mean=0.0,
        zmuv_std=1.0,
        augment=AugmentConfig(sample_rate=16000) if augment else None,
        use_vtlp=augment,
        negative_label=3,
    )
    model = create_model("res8", num_labels=4)
    feats0 = featurize(np.zeros((1, window_samples), np.float32), step_cfg)
    # plain SGD: the post-step param delta is exactly -lr * grad, so the param
    # comparison below is a DIRECT gradient comparison (AdamW at step 1 is
    # ~sign descent and amplifies f32 reduction-order noise in near-zero
    # gradients to O(lr), masking what we want to measure)
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats0, train=False)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=optax.sgd(1e-2),
        batch_stats=variables.get("batch_stats", flax.core.freeze({})),
    )
    train_step = make_classification_train_step(model, step_cfg)
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal((batch, window_samples)) * 0.1).astype(np.float32)
    labels = rng.integers(0, 4, (batch,)).astype(np.int32)
    lengths = np.full((batch,), window_samples, np.int32)
    return state, train_step, audio, labels, lengths


@pytest.mark.slow
@pytest.mark.parametrize("augment", [False, True])
def test_dp_step_matches_single_device(augment):
    """Same batch, 1 vs 8 devices: loss, params, AND BatchNorm stats agree
    (global batch statistics under GSPMD, SURVEY.md §7 risk)."""
    from howl_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    assert len(jax.devices()) >= 8
    key = jax.random.PRNGKey(7)

    state, train_step, audio, labels, lengths = _make_step_inputs(augment)
    ref_state, ref_metrics = train_step(state, audio, labels, lengths, key)

    state2, train_step2, *_ = _make_step_inputs(augment)
    mesh = make_mesh(data=8)
    state2 = replicate(state2, mesh)
    s_audio, s_labels, s_lengths = shard_batch((audio, labels, lengths), mesh)
    dp_state, dp_metrics = train_step2(state2, s_audio, s_labels, s_lengths, key)

    np.testing.assert_allclose(
        float(dp_metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5, atol=1e-6
    )
    # SGD params: delta is exactly -lr * grad, so this IS the grad comparison
    for path, ref_leaf in jax.tree_util.tree_leaves_with_path(jax.device_get(ref_state.params)):
        dp_leaf = jax.device_get(dp_state.params)
        for k in path:
            dp_leaf = dp_leaf[k.key]
        np.testing.assert_allclose(
            np.asarray(dp_leaf), np.asarray(ref_leaf), rtol=1e-3, atol=1e-5,
            err_msg=f"param/grad {jax.tree_util.keystr(path)} diverged under DP",
        )
    # BatchNorm running stats must reflect the GLOBAL batch, not per-shard stats
    for path, ref_leaf in jax.tree_util.tree_leaves_with_path(jax.device_get(ref_state.batch_stats)):
        dp_leaf = jax.device_get(dp_state.batch_stats)
        for k in path:
            dp_leaf = dp_leaf[k.key]
        np.testing.assert_allclose(
            np.asarray(dp_leaf), np.asarray(ref_leaf), rtol=2e-4, atol=1e-6,
            err_msg=f"batch_stat {jax.tree_util.keystr(path)} diverged under DP",
        )


def _build_eval_pieces(tmp_path):
    from howl_tpu.context import InferenceContext
    from howl_tpu.data.dataset.dataset_loader import WakeWordDatasetLoader
    from howl_tpu.inference import EngineConfig, StreamingEngine
    from howl_tpu.models import create_model
    from howl_tpu.models.base import model_spec
    from howl_tpu.ops.frontend import FrontendConfig
    from howl_tpu.training.step import StepConfig, featurize

    corpus = tmp_path / "corpus"
    make_wakeword_corpus(corpus, n_positive=6, n_negative=7)
    ctx = InferenceContext(vocab=["hey", "fire", "fox"], token_type="word", use_blank=False)
    loader = WakeWordDatasetLoader()
    _, dev, test = loader.load_splits(corpus, sample_rate=16000, mono=True, frame_labeler=ctx.labeler)
    dev.extend(test)  # one pool, mixed lengths

    cfg = EngineConfig(
        inference_sequence=(0, 1, 2), max_window_size_ms=500.0, eval_stride_size_ms=62.5,
        negative_label=ctx.negative_label, num_labels=ctx.num_labels,
    )
    frontend = FrontendConfig(n_mels=40)
    model = create_model("res8", num_labels=ctx.num_labels)
    feats0 = featurize(
        np.zeros((1, 8000), np.float32),
        StepConfig(frontend=frontend, zmuv_mean=0.0, zmuv_std=1.0, use_vtlp=False),
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats0, train=False)

    def make_engine():
        return StreamingEngine(model, variables, cfg, frontend, spec=model_spec("res8"))

    return dev, make_engine


@pytest.mark.slow
def test_mesh_sharded_evaluator_matches_single_device(tmp_path):
    """BatchedEvaluator(mesh=...) pads ragged batches onto the data axis and
    must produce identical confusion matrices + threshold sweeps."""
    from howl_tpu.parallel.mesh import make_mesh
    from howl_tpu.training.run.train import BatchedEvaluator

    dataset, make_engine = _build_eval_pieces(tmp_path)
    # max_batch=4 with 13 clips across buckets forces padded final batches
    base = BatchedEvaluator(make_engine(), max_batch=4)
    conf_base, errors_base, ms_base = base.evaluate(dataset, positive_set=True)

    mesh = make_mesh(data=8)
    sharded = BatchedEvaluator(make_engine(), max_batch=4, mesh=mesh)
    conf_dp, errors_dp, ms_dp = sharded.evaluate(dataset, positive_set=True)

    assert (conf_dp.tp, conf_dp.tn, conf_dp.fp, conf_dp.fn) == (
        conf_base.tp, conf_base.tn, conf_base.fp, conf_base.fn
    )
    assert errors_dp == errors_base
    assert ms_dp == ms_base

    thresholds = [0.0, 0.3, 0.6, 0.9]
    sweep_base, _ = base.evaluate_sweep(dataset, True, thresholds)
    sweep_dp, _ = sharded.evaluate_sweep(dataset, True, thresholds)
    for t in thresholds:
        b, d = sweep_base[t], sweep_dp[t]
        assert (d.tp, d.tn, d.fp, d.fn) == (b.tp, b.tn, b.fp, b.fn), f"threshold {t}"


def test_train_num_devices_must_divide_batch(tmp_path, monkeypatch):
    """CLI validation: an explicit --num-devices that doesn't divide the batch
    size fails loudly instead of mis-sharding."""
    from howl_tpu.training.run.train import run

    corpus = tmp_path / "corpus"
    make_wakeword_corpus(corpus, n_positive=4, n_negative=4)
    monkeypatch.setenv("BATCH_SIZE", "16")
    with pytest.raises(SystemExit):
        run(
            ["--model", "res8", "--workspace", str(tmp_path / "ws"), "-i", str(corpus),
             "--num-devices", "5", "--eval-freq", "0", "--steps-per-epoch", "1"]
        )
