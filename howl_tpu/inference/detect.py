"""Vectorized posterior smoothing + FSM sequence matching.

Re-expresses the reference's per-stream scalar logic
(ref: howl/model/inference.py:91-161 — `_get_prediction` max-pools posteriors
over the trailing smoothing window then thresholds; `sequence_present` re-scans
the label history inside the inference window with a 3-branch FSM) as a single
`lax.scan` over time steps carrying fixed-size ring buffers, fully vectorized
over B concurrent streams:

  * pred ring (B, S, L): last S posterior frames; smoothing = masked max.
  * label ring (B, W): last W emitted labels + timestamps; each step the FSM
    re-scans the ring exactly like the reference re-scans label_history (W is
    small: inference_window / stride ≈ 32).

Ring sizes are static (stride is constant), so time windows in ms map to fixed
step counts and everything jits once.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from howl_tpu.inference.config import EngineConfig


class DetectState(NamedTuple):
    pred_ring: jnp.ndarray  # (B, S, L) posterior history (most recent last)
    pred_times: jnp.ndarray  # (B, S) timestamps; -inf = empty slot
    label_ring: jnp.ndarray  # (B, W) label history (most recent last)
    label_times: jnp.ndarray  # (B, W) timestamps; -inf = empty slot
    fired: jnp.ndarray  # (B,) sticky detection flag


def init_state(batch: int, num_labels: int, s_steps: int, w_steps: int) -> DetectState:
    neg_inf = jnp.float32(-1e30)
    return DetectState(
        pred_ring=jnp.zeros((batch, s_steps, num_labels), jnp.float32),
        pred_times=jnp.full((batch, s_steps), neg_inf),
        label_ring=jnp.full((batch, w_steps), -1, jnp.int32),
        label_times=jnp.full((batch, w_steps), neg_inf),
        fired=jnp.zeros((batch,), bool),
    )


def fsm_scan(
    label_ring: jnp.ndarray,
    label_times: jnp.ndarray,
    check_time: jnp.ndarray,
    sequence: Tuple[int, ...],
    tolerance_ms: float,
    inference_window_ms: float,
) -> jnp.ndarray:
    """Run the sequence FSM over the (chronological) label ring.

    Per stream: walk entries newer than ``check_time - inference_window_ms``;
    advance on the next expected label, tolerate repeats of the last matched
    label, reset after ``tolerance_ms`` of other labels. Returns fired (B,).
    (Semantics of ref inference.py:109-137.)
    """
    seq = jnp.asarray(sequence, jnp.int32)
    k = len(sequence)
    batch, w = label_ring.shape
    check_time = jnp.broadcast_to(jnp.asarray(check_time, jnp.float32), (batch,))

    def body(j, carry):
        target, curr_label, last_valid, fired = carry
        lab = label_ring[:, j]
        t = label_times[:, j]
        valid = (t > -1e29) & (check_time - t <= inference_window_ms)
        target_label = seq[jnp.clip(target, 0, k - 1)]
        advance = valid & ~fired & (lab == target_label)
        same = valid & ~fired & ~advance & (lab == curr_label)
        expire = valid & ~fired & ~advance & ~same & (last_valid + tolerance_ms < t)
        new_target = jnp.where(advance, target + 1, jnp.where(expire, 0, target))
        fired = fired | (new_target >= k)
        curr_label = jnp.where(advance, target_label, jnp.where(expire, -1, curr_label))
        last_valid = jnp.where(advance | same, t, jnp.where(expire, 0.0, last_valid))
        return new_target, curr_label, last_valid, fired

    init = (
        jnp.zeros((batch,), jnp.int32),
        jnp.full((batch,), -1, jnp.int32),
        jnp.zeros((batch,), jnp.float32),
        jnp.zeros((batch,), bool),
    )
    if k == 0:
        return init[3]
    _, _, _, fired = jax.lax.fori_loop(0, w, body, init)
    return fired


def detect_step(
    state: DetectState,
    probs: jnp.ndarray,
    t_now: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: EngineConfig,
    check_offset_ms: float,
) -> Tuple[DetectState, jnp.ndarray, jnp.ndarray]:
    """Ingest one posterior frame per stream; returns (state, label, fired_now).

    ``valid`` (B,) masks streams that actually produced a frame this step
    (padding windows / CTC blank frames are skipped exactly like the
    reference's ``continue``, inference.py:205-207).
    """
    batch = probs.shape[0]
    t_now = jnp.broadcast_to(jnp.asarray(t_now, jnp.float32), (batch,))

    if cfg.blank_label >= 0:
        valid = valid & (probs.argmax(-1) != cfg.blank_label)

    # --- push posterior frame into the smoothing ring (only where valid)
    pred_ring = jnp.roll(state.pred_ring, -1, axis=1).at[:, -1].set(probs)
    pred_times = jnp.roll(state.pred_times, -1, axis=1).at[:, -1].set(t_now)
    pred_ring = jnp.where(valid[:, None, None], pred_ring, state.pred_ring)
    pred_times = jnp.where(valid[:, None], pred_times, state.pred_times)

    # --- smoothing: max over frames within the smoothing window (ref :139-161)
    in_window = (t_now[:, None] - pred_times <= cfg.smoothing_window_ms) & (pred_times > -1e29)
    lattice = jnp.where(in_window[:, :, None], pred_ring, -jnp.inf)
    lattice_max = lattice.max(axis=1)  # (B, L)
    max_label = lattice_max.argmax(-1).astype(jnp.int32)
    if cfg.label_color_map is not None:
        # phone mode: group the phone argmax into its word color before the
        # FSM (ref inference.py:156-157)
        max_label = jnp.asarray(cfg.label_color_map, jnp.int32)[max_label]
    max_prob = lattice_max.max(-1)
    label = jnp.where(max_prob < cfg.inference_threshold, cfg.negative_label, max_label)

    # --- push label into the FSM ring (only where valid)
    label_ring = jnp.roll(state.label_ring, -1, axis=1).at[:, -1].set(label)
    label_times = jnp.roll(state.label_times, -1, axis=1).at[:, -1].set(t_now)
    label_ring = jnp.where(valid[:, None], label_ring, state.label_ring)
    label_times = jnp.where(valid[:, None], label_times, state.label_times)

    fired_now = fsm_scan(
        label_ring,
        label_times,
        t_now + check_offset_ms,
        cfg.inference_sequence,
        cfg.tolerance_window_ms,
        cfg.inference_window_ms,
    )
    fired_now = fired_now & valid
    fired = state.fired | fired_now
    new_state = DetectState(pred_ring, pred_times, label_ring, label_times, fired)
    return new_state, jnp.where(valid, label, -1), fired_now


def smooth_and_detect(
    probs_seq: jnp.ndarray,
    times,
    valid_seq: jnp.ndarray,
    cfg: EngineConfig,
    check_offset_is_stride: bool = True,
) -> dict:
    """Smoothing + FSM over posterior frames (B, T, L), ALL STEPS IN PARALLEL.

    Semantically identical to scanning `detect_step` over time (property-tested
    against the scalar oracle) but reformulated for TPU: the smoothing max and
    the per-step FSM window re-scan both only look at a bounded trailing window,
    so every step's decision is computed simultaneously — one gather to
    (B, T, W) plus a single W-deep fori_loop over (B, T) state vectors.
    Sequential depth drops from T*W to W (~33 at defaults).

    times: (T,) uniform-stride frame timestamps in ms (host values).
    valid_seq: (B, T) frame validity (padding windows / CTC blank frames).
    check_offset_is_stride mirrors FrameInferenceEngine (the FSM is consulted at
    t + stride, inference.py:235-243) vs InferenceEngine (at t, :201-208).

    Returns dict with per-step labels (B, T), fired mask (B, T), detected (B,),
    first fire step (B,) (= T when never fired).
    """
    # the detection threshold is passed as a TRACED operand so threshold sweeps
    # reuse one compiled program (cfg is a static jit arg; baking the threshold
    # into it would recompile per threshold)
    static_cfg, s_steps, w_steps, stride, check_offset = _ring_geometry(
        times, cfg, check_offset_is_stride
    )
    threshold = jnp.float32(cfg.inference_threshold)
    return _smooth_and_detect_parallel(
        probs_seq, valid_seq, threshold, static_cfg, s_steps, w_steps, stride, check_offset
    )


def _ring_geometry(times, cfg: EngineConfig, check_offset_is_stride: bool):
    """Shared smoothing/FSM ring geometry for the single-threshold and sweep
    entry points — these formulas MUST stay identical for detect_from_scores
    and detect_sweep_from_scores to agree (tests/test_fused_trunk.py)."""
    import dataclasses

    times = np.asarray(times, np.float32)
    stride = float(times[1] - times[0]) if times.shape[0] > 1 else cfg.eval_stride_size_ms
    stride = max(stride, 1e-6)
    s_steps = max(int(cfg.smoothing_window_ms // stride) + 1, 1)
    check_offset = stride if check_offset_is_stride else 0.0
    # shifts k where an entry at t-k is still inside the inference window when
    # checked at t + check_offset: k*stride + check_offset <= window
    w_steps = max(int((cfg.inference_window_ms - check_offset) // stride) + 1, 1)
    static_cfg = dataclasses.replace(cfg, inference_threshold=0.0)
    return static_cfg, s_steps, w_steps, float(stride), float(check_offset)


def _smooth_parallel(probs_seq, valid_seq, cfg: EngineConfig, s_steps: int):
    """Threshold-independent half: masked-max smoothing over s_steps shifts
    plus the phone->color remap. Returns (max_label, max_prob, valid_seq)."""
    t_total = probs_seq.shape[1]
    valid_seq = valid_seq.astype(bool)
    if cfg.blank_label >= 0:
        valid_seq = valid_seq & (probs_seq.argmax(-1) != cfg.blank_label)

    lattice = jnp.where(valid_seq[:, :, None], probs_seq, -jnp.inf)
    smoothed = lattice
    for k in range(1, s_steps):
        shifted = jnp.pad(lattice, ((0, 0), (k, 0), (0, 0)), constant_values=-jnp.inf)[:, :t_total]
        smoothed = jnp.maximum(smoothed, shifted)
    max_label = smoothed.argmax(-1).astype(jnp.int32)
    if cfg.label_color_map is not None:
        # phone mode: phone argmax -> word color (ref inference.py:156-157)
        max_label = jnp.asarray(cfg.label_color_map, jnp.int32)[max_label]
    max_prob = smoothed.max(-1)
    return max_label, max_prob, valid_seq


def _fsm_parallel(labels, valid_seq, cfg: EngineConfig, w_steps: int, stride: float, check_offset: float):
    """FSM for all steps at once over trailing label windows; thresholded
    labels in, per-step fire decisions out. vmap-safe over a leading
    thresholds axis (all ops are elementwise over the (B, T) state)."""
    batch, t_total = labels.shape
    seq = jnp.asarray(cfg.inference_sequence, jnp.int32)
    k_len = len(cfg.inference_sequence)
    # padded[:, t + j] = entry at step t - (w_steps-1-j), oldest first
    pad_lab = jnp.pad(labels, ((0, 0), (w_steps - 1, 0)), constant_values=-1)
    pad_val = jnp.pad(valid_seq, ((0, 0), (w_steps - 1, 0)), constant_values=False)

    def body(j, carry):
        target, curr_label, last_valid, fired = carry  # each (B, T)
        back = w_steps - 1 - j  # how many steps back this entry is (traced)
        lab = jax.lax.dynamic_slice_in_dim(pad_lab, j, t_total, axis=1)
        val = jax.lax.dynamic_slice_in_dim(pad_val, j, t_total, axis=1)
        rel_t = -back.astype(jnp.float32) * stride  # entry time relative to step t
        # entry must be inside the inference window at check time
        in_window = (back * stride + check_offset) <= cfg.inference_window_ms
        val = val & in_window
        target_label = seq[jnp.clip(target, 0, k_len - 1)]
        advance = val & ~fired & (lab == target_label)
        same = val & ~fired & ~advance & (lab == curr_label)
        expire = val & ~fired & ~advance & ~same & (last_valid + cfg.tolerance_window_ms < rel_t)
        new_target = jnp.where(advance, target + 1, jnp.where(expire, 0, target))
        fired = fired | (new_target >= k_len)
        curr_label = jnp.where(advance, target_label, jnp.where(expire, -1, curr_label))
        last_valid = jnp.where(advance | same, rel_t, jnp.where(expire, -1e30, last_valid))
        return new_target, curr_label, last_valid, fired

    init = (
        jnp.zeros((batch, t_total), jnp.int32),
        jnp.full((batch, t_total), -1, jnp.int32),
        jnp.full((batch, t_total), -1e30, jnp.float32),
        jnp.zeros((batch, t_total), bool),
    )
    if k_len == 0:
        fired_at = init[3]
    else:
        _, _, _, fired_at = jax.lax.fori_loop(0, w_steps, body, init)
    fired_steps = fired_at & valid_seq  # a step with no appended frame can't fire
    detected = fired_steps.any(axis=1)
    first_fire = jnp.where(detected, jnp.argmax(fired_steps, axis=1), jnp.full((batch,), t_total))
    return {
        "labels": jnp.where(valid_seq, labels, -1),
        "fired": fired_steps,
        "detected": detected,
        "first_fire_step": first_fire,
    }


@partial(jax.jit, static_argnames=("cfg", "s_steps", "w_steps", "stride", "check_offset"))
def _smooth_and_detect_parallel(
    probs_seq: jnp.ndarray,
    valid_seq: jnp.ndarray,
    threshold: jnp.ndarray,
    cfg: EngineConfig,
    s_steps: int,
    w_steps: int,
    stride: float,
    check_offset: float,
) -> dict:
    max_label, max_prob, valid_seq = _smooth_parallel(probs_seq, valid_seq, cfg, s_steps)
    labels = jnp.where(max_prob < threshold, cfg.negative_label, max_label)
    return _fsm_parallel(labels, valid_seq, cfg, w_steps, stride, check_offset)


@partial(jax.jit, static_argnames=("cfg", "s_steps", "w_steps", "stride", "check_offset"))
def _smooth_and_detect_sweep(
    probs_seq: jnp.ndarray,
    valid_seq: jnp.ndarray,
    thresholds: jnp.ndarray,
    cfg: EngineConfig,
    s_steps: int,
    w_steps: int,
    stride: float,
    check_offset: float,
) -> dict:
    """All thresholds in ONE dispatch: the (expensive, threshold-independent)
    smoothing runs once, then the FSM is vmapped over the thresholds axis —
    every output gains a leading (K,) dim. Replaces K sequential
    detect_from_scores dispatches (each paying 0.4-2 ms relay latency,
    CLAUDE.md) with one."""
    max_label, max_prob, valid_seq = _smooth_parallel(probs_seq, valid_seq, cfg, s_steps)

    def per_threshold(threshold):
        labels = jnp.where(max_prob < threshold, cfg.negative_label, max_label)
        return _fsm_parallel(labels, valid_seq, cfg, w_steps, stride, check_offset)

    return jax.vmap(per_threshold)(jnp.asarray(thresholds, jnp.float32))


def smooth_and_detect_sweep(probs_seq, times, valid_seq, thresholds, cfg: EngineConfig, check_offset_is_stride: bool = True) -> dict:
    """Threshold-sweep variant of smooth_and_detect: one device dispatch for
    all thresholds; outputs carry a leading (K,) thresholds axis."""
    static_cfg, s_steps, w_steps, stride, check_offset = _ring_geometry(
        times, cfg, check_offset_is_stride
    )
    return _smooth_and_detect_sweep(
        probs_seq, valid_seq, jnp.asarray(thresholds, jnp.float32), static_cfg,
        s_steps, w_steps, stride, check_offset
    )


def apply_inference_weights(probs: jnp.ndarray, cfg: EngineConfig) -> jnp.ndarray:
    """probs * weights, renormalized (ref inference.py:199-201)."""
    w = cfg.padded_weights()
    if w is None:
        return probs
    weighted = probs * jnp.asarray(w)
    return weighted / weighted.sum(-1, keepdims=True)
