"""Wider property fuzzing of the parallel smoothing+FSM against the scalar
oracle: random engine geometries, strides, sequences, thresholds, blanks."""

import numpy as np
import pytest

from howl_tpu.inference.config import EngineConfig
from howl_tpu.inference.detect import apply_inference_weights, smooth_and_detect
from howl_tpu.inference.oracle import OracleEngine


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_random_configs_match_oracle(seed):
    rng = np.random.default_rng(100 + seed)
    num_labels = int(rng.integers(2, 6))
    seq_len = int(rng.integers(1, min(num_labels, 3) + 1))
    sequence = tuple(rng.permutation(num_labels - 1)[:seq_len].tolist())
    stride = float(rng.choice([31.25, 62.5, 100.0, 125.0]))
    use_blank = bool(rng.random() < 0.3)
    cfg = EngineConfig(
        inference_sequence=sequence,
        inference_window_ms=float(rng.choice([250.0, 500.0, 1000.0, 2000.0])),
        smoothing_window_ms=float(rng.choice([0.0, 50.0, 125.0, 300.0])),
        tolerance_window_ms=float(rng.choice([100.0, 250.0, 500.0])),
        inference_threshold=float(rng.choice([0.0, 0.3, 0.6, 0.9])),
        negative_label=num_labels - 1,
        blank_label=num_labels - 1 if use_blank else -1,
        num_labels=num_labels,
    )
    b, t = int(rng.integers(1, 5)), int(rng.integers(5, 60))
    x = rng.gamma(0.3, size=(b, t, num_labels))
    probs = (x / x.sum(-1, keepdims=True)).astype(np.float32)
    valid = rng.random((b, t)) > 0.15
    times = np.arange(t, dtype=np.float32) * stride
    check_offset = bool(rng.random() < 0.5)

    out = smooth_and_detect(probs, times, valid, cfg, check_offset_is_stride=check_offset)
    for i in range(b):
        oracle = OracleEngine(cfg)
        o_labels, o_fired = oracle.run(probs[i], times, valid[i], check_offset)
        np.testing.assert_array_equal(
            np.asarray(out["labels"])[i], o_labels, err_msg=f"seed={seed} stream={i} cfg={cfg}"
        )
        assert bool(np.asarray(out["detected"])[i]) == o_fired.any(), f"seed={seed} stream={i} cfg={cfg}"


def test_inference_weights_applied_and_renormalized():
    cfg = EngineConfig(
        inference_sequence=(0,), num_labels=3, negative_label=2, inference_weights=(2.0,)
    )
    probs = np.array([[[0.2, 0.4, 0.4]]], np.float32)
    out = np.asarray(apply_inference_weights(probs, cfg))
    # weight 2 on label 0, padded ones elsewhere, renormalized (ref :199-201)
    expected = np.array([0.4, 0.4, 0.4]) / 1.2
    np.testing.assert_allclose(out[0, 0], expected, atol=1e-6)
