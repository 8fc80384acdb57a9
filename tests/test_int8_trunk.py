"""int8 residual-trunk serving mode (ops/int8_trunk.py).

Pins (a) the f32 calibration oracle against the flax model exactly, (b)
decision equality of the int8 path against f32 on a QUICKLY-TRAINED firing
model (random-init decisions flap with any perturbation; trained decisions
are the thing the mode must preserve), and (c) the API contract (explicit
calibration required). The reference serves these convolutions in f32 torch
(/root/reference/howl/model/cnn.py:113-145) — this mode sits one rung below
howl_tpu's bf16 serving default on the measured precision ladder
(tools/bench_trunk_int8.py) and is gated on the same decision-equivalence
standard as bf16 and the 1-pass DFT."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from howl_tpu.inference import EngineConfig, StreamingEngine
from howl_tpu.models import create_model
from howl_tpu.models.base import model_spec
from howl_tpu.ops.frontend import FrontendConfig
from howl_tpu.ops.int8_trunk import (
    calibrate_act_scales,
    float_residual_reference,
    quantize_residual_trunk,
    residual_features_int8,
)

SR = 16000


def _init_model(n_labels=3):
    model = create_model("res8", num_labels=n_labels)
    feats0 = np.zeros((1, 1, 40, 41), np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats0, train=False)
    return model, variables


def test_float_reference_matches_flax_residual_features():
    """The calibration oracle must be the EXACT residual stack (same op
    order, f32), or the captured ranges calibrate the wrong tensors."""
    model, variables = _init_model()
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.standard_normal((2, 31, 10, 45)).astype(np.float32))
    ours = float_residual_reference(y, variables)
    flax_out = model.apply(variables, y, train=False, method="residual_features")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(flax_out), rtol=0, atol=2e-5)


def test_int8_trunk_close_to_f32():
    model, variables = _init_model()
    rng = np.random.default_rng(2)
    y = jnp.asarray(rng.standard_normal((2, 31, 10, 45)).astype(np.float32) * 0.5)
    scales = calibrate_act_scales(y, variables)
    params = quantize_residual_trunk(variables, scales)
    q = np.asarray(residual_features_int8(y, params))
    f = np.asarray(float_residual_reference(y, variables))
    # int8 noise is bounded by the per-layer quantization steps; trained
    # decision equality is the real gate (below) — this pins the magnitude
    err = np.abs(q - f).max() / max(np.abs(f).max(), 1e-6)
    assert err < 0.05, f"relative error {err}"


def test_engine_requires_calibration_audio():
    model, variables = _init_model()
    cfg = EngineConfig(
        inference_sequence=(0, 1), max_window_size_ms=500.0,
        eval_stride_size_ms=62.5, negative_label=2, num_labels=3,
    )
    with pytest.raises(ValueError, match="int8_calibration_audio"):
        StreamingEngine(
            model, variables, cfg, FrontendConfig(n_mels=40), 0.0, 1.0,
            spec=model_spec("res8"), use_int8_trunk=True,
        )


def test_trunk_kernel_flags_refuse_non_trunk_configs():
    """use_int8_trunk / use_pallas_stem only exist on the fused-trunk
    scorer; asking for them anywhere else must raise, never silently serve
    the float path (the config-consumption rule the AST tripwire enforces
    for CLI flags, applied to engine kwargs)."""
    model, variables = _init_model()
    cfg = EngineConfig(
        inference_sequence=(0, 1), max_window_size_ms=500.0,
        eval_stride_size_ms=62.5, negative_label=2, num_labels=3,
    )
    for kwargs in (
        {"use_int8_trunk": True, "int8_calibration_audio": np.zeros((1, 8000), np.float32)},
        {"use_pallas_stem": True},
    ):
        with pytest.raises(ValueError, match="fused-trunk"):
            StreamingEngine(
                model, variables, cfg, FrontendConfig(n_mels=40), 0.0, 1.0,
                spec=model_spec("res8"), fused_trunk=False, **kwargs,
            )


def _tone(freq, n, key):
    t = np.arange(n) / SR
    j = np.random.default_rng(key)
    sig = 0.3 * np.sin(2 * np.pi * freq * (1.0 + 0.02 * j.standard_normal()) * t)
    return (sig + 0.02 * j.standard_normal(n)).astype(np.float32)


@pytest.mark.slow
def test_int8_decisions_equal_f32_on_trained_model():
    """Train a tiny res8 on separable tones until it actually fires, then
    assert the int8 engine's decisions — detected, first-fire steps, labels
    — are IDENTICAL to the f32 engine's on firing AND non-firing clips."""
    from howl_tpu.ops.augment import AugmentConfig
    from howl_tpu.training.state import create_train_state
    from howl_tpu.training.step import StepConfig, featurize, make_classification_train_step

    frontend = FrontendConfig(n_mels=40)
    model = create_model("res8", num_labels=4)
    # augmentation (timeshift et al.) matters: it trains the translation
    # robustness the fused-trunk engine's in-context windows rely on — the
    # same recipe that makes __graft_entry__.dryrun_multichip's model fire
    step_cfg = StepConfig(
        frontend=frontend, zmuv_mean=0.0, zmuv_std=1.0,
        augment=AugmentConfig(sample_rate=SR), use_vtlp=True, negative_label=3,
    )
    window_samples = int(0.1 * SR)
    feats0 = featurize(np.zeros((1, window_samples), np.float32), step_cfg)
    state = create_train_state(
        model, jax.random.PRNGKey(2), feats0,
        learning_rate=5e-3, lr_decay=1.0, steps_per_epoch=1,
    )
    train_step = make_classification_train_step(model, step_cfg)
    freqs = {0: 400.0, 1: 800.0}
    batch = 16
    for step in range(48):
        audio, labels = [], []
        for j in range(batch):
            label = (step * batch + j) % 3
            if label < 2:
                audio.append(_tone(freqs[label], window_samples, step * 97 + j))
                labels.append(label)
            else:
                nr = np.random.default_rng(step * 131 + j)
                audio.append(0.05 * nr.standard_normal(window_samples).astype(np.float32))
                labels.append(3)
        state, metrics = train_step(
            state,
            np.stack(audio),
            np.asarray(labels, np.int32),
            np.full((batch,), window_samples, np.int32),
            jax.random.PRNGKey(100 + step),
        )
    assert np.isfinite(float(np.asarray(metrics["loss"])))
    trained = jax.device_get({"params": state.params, "batch_stats": state.batch_stats})

    cfg = EngineConfig(
        inference_sequence=(0, 1), max_window_size_ms=100.0,
        eval_stride_size_ms=50.0, negative_label=3, num_labels=4,
    )
    hop = int(cfg.eval_stride_size_ms / 1000 * SR)
    clips = np.zeros((8, 6 * hop), np.float32)
    for j in range(8):
        if j % 2 == 0:
            clips[j, : 3 * hop] = _tone(400.0, 3 * hop, 900 + j)
            clips[j, 3 * hop :] = _tone(800.0, 3 * hop, 1900 + j)
        else:
            clips[j] = 0.05 * np.random.default_rng(2900 + j).standard_normal(6 * hop)

    f32_eng = StreamingEngine(model, trained, cfg, frontend, spec=model_spec("res8"))
    i8_eng = StreamingEngine(
        model, trained, cfg, frontend, spec=model_spec("res8"),
        use_int8_trunk=True, int8_calibration_audio=clips,
    )
    a = f32_eng.infer_batch(clips)
    b = i8_eng.infer_batch(clips)
    detected = np.asarray(a["detected"])
    assert detected.sum() >= 3, f"f32 baseline barely fires: {detected}"
    assert not detected[1::2].any(), "noise clips must not fire"
    np.testing.assert_array_equal(detected, np.asarray(b["detected"]))
    np.testing.assert_array_equal(
        np.asarray(a["first_fire_step"]), np.asarray(b["first_fire_step"])
    )
    np.testing.assert_array_equal(np.asarray(a["labels"]), np.asarray(b["labels"]))


@pytest.mark.slow
def test_int8_engine_sharded_over_data_axis(rng):
    """int8 trunk params are replicated constants inside the jitted scorer —
    GSPMD-sharded batches must produce identical decisions to single-device
    (mirrors tests/test_multichip_inference.py for the int8 mode)."""
    from howl_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    assert len(jax.devices()) >= 8  # conftest's virtual CPU mesh
    model, variables = _init_model()
    cfg = EngineConfig(
        inference_sequence=(0, 1), max_window_size_ms=500.0,
        eval_stride_size_ms=125.0, negative_label=2, num_labels=3,
    )
    frontend = FrontendConfig(n_mels=40)
    audio = (rng.standard_normal((16, 16000)) * 0.1).astype(np.float32)
    engine = StreamingEngine(
        model, variables, cfg, frontend, spec=model_spec("res8"),
        use_int8_trunk=True, int8_calibration_audio=audio,
    )
    base = engine.infer_batch(audio)
    base_detected = np.asarray(base["detected"])
    base_probs = np.asarray(base["probs"])

    mesh = make_mesh(data=8)
    engine.variables = replicate(engine.variables, mesh)
    (sharded_audio,) = shard_batch((audio,), mesh)
    out = engine.infer_batch(sharded_audio)
    np.testing.assert_array_equal(np.asarray(out["detected"]), base_detected)
    np.testing.assert_allclose(np.asarray(out["probs"]), base_probs, atol=1e-5)
    assert len(out["probs"].sharding.device_set) == 8
