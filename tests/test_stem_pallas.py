"""Fused Pallas res8 stem (ops/stem_pallas.py) vs the flax oracle.

The flax trunk (models/cnn.py trunk_features / trunk_intermediates "s0") is
the correctness oracle: conv0 SAME + ReLU + AvgPool(3, 4) VALID. Runs in
interpret mode on the CPU mesh; decision equivalence on real hardware is
covered by tools/validate_tpu_decisions.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from howl_tpu.models import create_model
from howl_tpu.ops.frontend import FrontendConfig
from howl_tpu.ops.stem_pallas import fold_stem_weights, res8_stem_pallas
from howl_tpu.training.step import StepConfig, featurize


@pytest.fixture(scope="module")
def res8_setup():
    frontend = FrontendConfig(n_mels=40)
    model = create_model("res8", num_labels=4)
    feats0 = featurize(
        np.zeros((1, 8000), np.float32),
        StepConfig(frontend=frontend, zmuv_mean=0.0, zmuv_std=1.0, use_vtlp=False),
    )
    variables = model.init({"params": jax.random.PRNGKey(3)}, feats0, train=False)
    return frontend, model, variables


@pytest.mark.parametrize("t_frames", [41, 100, 161])
def test_stem_kernel_matches_flax_stem(res8_setup, rng, t_frames):
    """res8_stem_pallas == the flax stem (trunk_intermediates' s0) on f32,
    including non-multiple-of-3 frame counts (VALID pooling drops the tail)
    and the SAME zero edge padding in both time and frequency."""
    _, model, variables = res8_setup
    feats = (rng.standard_normal((2, 1, 40, t_frames)) * 0.7).astype(np.float32)
    s0_expected = model.apply(variables, jnp.asarray(feats), method="trunk_intermediates")["s0"]

    kernel = np.asarray(variables["params"]["conv0"]["kernel"], np.float32)
    w0fold = jnp.asarray(fold_stem_weights(kernel, n_mels=40, pool_f=4))
    mel_tm = jnp.asarray(feats[:, 0].swapaxes(-1, -2))  # (B, T, F)
    s0 = res8_stem_pallas(mel_tm, w0fold, interpret=True)

    assert s0.shape == s0_expected.shape == (2, t_frames // 3, 10, 45)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s0_expected), atol=1e-5)


def test_residual_features_composition(res8_setup, rng):
    """trunk_features == residual_features(stem) exactly — the split the
    Pallas-stem serving path relies on."""
    _, model, variables = res8_setup
    feats = jnp.asarray((rng.standard_normal((2, 1, 40, 80)) * 0.5).astype(np.float32))
    full = model.apply(variables, feats, train=False, method="trunk_features")
    s0 = model.apply(variables, feats, method="trunk_intermediates")["s0"]
    composed = model.apply(variables, s0, train=False, method="residual_features")
    np.testing.assert_array_equal(np.asarray(full), np.asarray(composed))


def test_engine_pallas_stem_decision_equality(res8_setup, rng):
    """StreamingEngine(use_pallas_stem=True) produces the same posteriors and
    decisions as the default fused-trunk engine (f32, interpret mode)."""
    from howl_tpu.inference import EngineConfig, StreamingEngine
    from howl_tpu.models.base import model_spec

    frontend, model, variables = res8_setup
    cfg = EngineConfig(
        inference_sequence=(0, 1), max_window_size_ms=500.0, eval_stride_size_ms=125.0,
        negative_label=3, num_labels=4,
    )
    base = StreamingEngine(
        model, variables, cfg, frontend, zmuv_mean=-0.2, zmuv_std=1.3,
        spec=model_spec("res8"),
    )
    stem = StreamingEngine(
        model, variables, cfg, frontend, zmuv_mean=-0.2, zmuv_std=1.3,
        spec=model_spec("res8"), use_pallas_stem=True,
    )
    assert stem._use_pallas_stem

    audio = (rng.standard_normal((3, 16000)) * 0.2).astype(np.float32)
    out_a = base.infer_batch(audio)
    out_b = stem.infer_batch(audio)
    np.testing.assert_allclose(
        np.asarray(out_a["probs"]), np.asarray(out_b["probs"]), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out_a["detected"]), np.asarray(out_b["detected"])
    )
    np.testing.assert_array_equal(np.asarray(out_a["labels"]), np.asarray(out_b["labels"]))


def test_fold_rejects_bad_geometry():
    k = np.zeros((3, 3, 1, 45), np.float32)
    with pytest.raises(ValueError, match="divisible"):
        fold_stem_weights(k, n_mels=41, pool_f=4)
    with pytest.raises(ValueError, match="stem kernel"):
        fold_stem_weights(np.zeros((3, 3, 2, 45), np.float32))


def test_stem_kernel_bf16_grade(res8_setup, rng):
    """bf16-folded weights stay within the serving engines' bf16 feature
    noise (the same grade as the validated 1-pass DFT drift)."""
    _, model, variables = res8_setup
    feats = (rng.standard_normal((1, 1, 40, 65)) * 0.7).astype(np.float32)
    s0_expected = np.asarray(
        model.apply(variables, jnp.asarray(feats), method="trunk_intermediates")["s0"]
    )
    kernel = np.asarray(variables["params"]["conv0"]["kernel"], np.float32)
    w0fold = jnp.asarray(fold_stem_weights(kernel, n_mels=40, pool_f=4), jnp.bfloat16)
    mel_tm = jnp.asarray(feats[:, 0].swapaxes(-1, -2))
    s0 = np.asarray(res8_stem_pallas(mel_tm, w0fold, interpret=True), np.float32)
    scale = max(np.abs(s0_expected).max(), 1e-3)
    assert np.abs(s0 - s0_expected).max() / scale < 3e-2
