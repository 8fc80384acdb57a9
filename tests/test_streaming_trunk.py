"""FusedStreamingOnlineEngine: the per-layer streaming-conv cache must
reproduce the offline fused-trunk clip-level scoring EXACTLY (up to f32
summation order) while computing only each hop's new trunk frames.

Strategy: push a clip hop by hop; the engine's decision at hop j covers
window k = j - lag of the clip (preroll + pushed audio). Compare per-window
posteriors, labels, and fire decisions against StreamingEngine
(fused_trunk=True) scoring the very same clip in one batch call.
"""

import dataclasses

import jax
import numpy as np
import pytest


def _build(cfg_overrides=None, n_mels=40, compute_dtype=None, num_streams=2):
    from howl_tpu.inference import EngineConfig, StreamingEngine
    from howl_tpu.inference.streaming_trunk import FusedStreamingOnlineEngine
    from howl_tpu.models import create_model
    from howl_tpu.models.base import model_spec
    from howl_tpu.ops.frontend import FrontendConfig
    from howl_tpu.training.step import StepConfig, featurize

    cfg = EngineConfig(
        inference_sequence=(0, 1, 2),
        max_window_size_ms=500.0,
        eval_stride_size_ms=62.5,
        smoothing_window_ms=50.0,
        inference_window_ms=2000.0,
        tolerance_window_ms=500.0,
        inference_threshold=0.0,
        negative_label=3,
        num_labels=4,
    )
    if cfg_overrides:
        cfg = dataclasses.replace(cfg, **cfg_overrides)
    frontend = FrontendConfig(n_mels=n_mels)
    model = create_model("res8", num_labels=cfg.num_labels)
    feats0 = featurize(
        np.zeros((1, 8000), np.float32),
        StepConfig(frontend=frontend, zmuv_mean=0.0, zmuv_std=1.0, use_vtlp=False),
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats0, train=False)
    offline = StreamingEngine(
        model, variables, cfg, frontend, spec=model_spec("res8"),
        fused_trunk=True, compute_dtype=compute_dtype,
    )
    streaming = FusedStreamingOnlineEngine(
        model, variables, cfg, frontend, spec=model_spec("res8"),
        num_streams=num_streams, compute_dtype=compute_dtype,
    )
    return cfg, frontend, offline, streaming


def _run_both(offline, streaming, rng, n_hops=24, amp=0.3):
    """Returns (offline probs/labels/fired for the clip, streaming per-window
    probs/labels/fired collected from push)."""
    n = streaming.num_streams
    hop = streaming.hop_samples
    preroll = np.zeros((n, streaming.window_frames * streaming.frontend.hop_length), np.float32)
    hops = (rng.standard_normal((n_hops, n, hop)) * amp).astype(np.float32)

    clip = np.concatenate([preroll] + [hops[j] for j in range(n_hops)], axis=1)
    out = offline.infer_batch(clip)
    off_probs = np.asarray(out["probs"])  # (n, n_win, L)
    off_labels = np.asarray(out["labels"])
    off_fired = np.asarray(out["fired"])

    lag = streaming.schedule.lag
    st_probs, st_labels, st_fired = {}, {}, {}
    for j in range(1, n_hops + 1):
        streaming.push(hops[j - 1])
        k = j - lag
        if k >= 0:
            st_probs[k] = np.asarray(streaming.last_probs)
            st_labels[k] = np.asarray(streaming.last_labels)
            st_fired[k] = np.asarray(streaming.last_fired)
    return (off_probs, off_labels, off_fired), (st_probs, st_labels, st_fired)


def _compare(off, st, n_compare, atol=1e-5):
    off_probs, off_labels, off_fired = off
    st_probs, st_labels, st_fired = st
    for k in range(n_compare):
        assert k in st_probs, f"window {k} never emitted"
        np.testing.assert_allclose(
            st_probs[k], off_probs[:, k], rtol=1e-5, atol=atol, err_msg=f"window {k} posteriors"
        )
        np.testing.assert_array_equal(st_labels[k], off_labels[:, k], err_msg=f"window {k} labels")
        np.testing.assert_array_equal(st_fired[k], off_fired[:, k], err_msg=f"window {k} fire")


def test_streaming_trunk_matches_offline_fused(rng):
    cfg, frontend, offline, streaming = _build()
    assert streaming.schedule.lag == 4  # 250 ms decision lag at defaults
    n_hops = 24
    off, st = _run_both(offline, streaming, rng, n_hops=n_hops)
    # offline's final windows clamp their spans at the clip edge; exclude them
    _compare(off, st, n_compare=n_hops - streaming.schedule.lag - 2)


def test_streaming_trunk_detects_like_offline(rng):
    """A stream engineered to fire: per-window fire decisions line up (the
    host just OBSERVES them lag hops later)."""
    from howl_tpu.inference.detect import smooth_and_detect  # noqa: F401 (sanity import)

    cfg, frontend, offline, streaming = _build(
        cfg_overrides={"inference_sequence": (0,), "inference_threshold": 0.0}
    )
    off, st = _run_both(offline, streaming, rng, n_hops=20, amp=0.5)
    # with a length-1 sequence and threshold 0 at random init, some window fires
    assert np.asarray(off[2]).any()
    _compare(off, st, n_compare=20 - streaming.schedule.lag - 2)


@pytest.mark.slow
def test_streaming_trunk_other_geometry(rng):
    """125 ms stride / 750 ms window: different period, n_new, lag."""
    cfg, frontend, offline, streaming = _build(
        cfg_overrides={"max_window_size_ms": 750.0, "eval_stride_size_ms": 125.0}
    )
    sched = streaming.schedule
    assert sched.n_new >= 2 and sched.period >= 1
    n_hops = 18
    off, st = _run_both(offline, streaming, rng, n_hops=n_hops)
    _compare(off, st, n_compare=n_hops - sched.lag - 2)


@pytest.mark.slow
def test_streaming_trunk_bf16(rng):
    """bf16 trunk compute: same values as the offline bf16 fused engine."""
    import jax.numpy as jnp

    cfg, frontend, offline, streaming = _build(compute_dtype=jnp.bfloat16)
    n_hops = 16
    off, st = _run_both(offline, streaming, rng, n_hops=n_hops)
    _compare(off, st, n_compare=n_hops - streaming.schedule.lag - 2, atol=1e-4)


def test_streaming_trunk_rejects_short_window():
    with pytest.raises(ValueError):
        _build(cfg_overrides={"max_window_size_ms": 250.0})


def test_trunk_schedule_fuzz():
    """TrunkSchedule invariants over a grid of geometries: the per-phase
    deltas advance the pooled frontier by exactly stride*period/pool per
    period, gaps stay inside the s6 ring, and the slab always fits the mel
    cache (the constructor also self-checks periodicity over 6 periods)."""
    from howl_tpu.inference.streaming_trunk import TrunkSchedule

    built = 0
    for pool_t in (2, 3, 4):
        for stride in (2, 3, 4, 5, 6, 8, 10):
            for span in (8, 13, 21):
                m0 = 40 + pool_t * (span + 10)  # enough prefill for the span
                try:
                    s = TrunkSchedule(m0, stride, pool_t, span)
                except ValueError:
                    continue  # no lag <= 64 exists for this geometry
                built += 1
                period_advance = sum(s.by_phase[p]["delta"] for p in range(s.period))
                assert period_advance == stride * s.period // pool_t
                assert s.n_new == max(s.by_phase[p]["delta"] for p in range(s.period))
                for p in range(s.period):
                    e = s.by_phase[p]
                    assert 0 <= e["gap"] <= s.s6_ring_len - span
                    assert 0 <= e["slab_start"] <= s.mel_cache_len - s.slab_frames
                assert sorted(s.by_phase) == list(range(s.period))
    assert built >= 50, f"fuzz grid mostly failed to build ({built})"


@pytest.mark.slow
def test_blocked_prefill_matches_single_block(rng):
    """prefill_block < num_streams must produce the same caches (prefill is
    per-stream; blocking only caps the trunk_intermediates transient — XLA
    kernel blocking differs across batch shapes, so tolerance is float-eps
    scale, not bit-exact)."""
    import jax.numpy as jnp
    from howl_tpu.inference.streaming_trunk import FusedStreamingOnlineEngine

    cfg, frontend, offline, one = _build(num_streams=5)
    blocked = FusedStreamingOnlineEngine(
        one.model, one.variables, cfg, frontend, spec=one.spec,
        num_streams=5, prefill_block=2,
    )
    preroll = (rng.standard_normal((5, one.window_frames * frontend.hop_length)) * 0.1).astype(np.float32)
    one.reset(preroll)
    blocked.reset(preroll)
    np.testing.assert_allclose(
        np.asarray(one.mel_cache), np.asarray(blocked.mel_cache), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(one.s6_ring), np.asarray(blocked.s6_ring), rtol=1e-4, atol=1e-5
    )
    for name in one.rings:
        np.testing.assert_allclose(
            np.asarray(one.rings[name]), np.asarray(blocked.rings[name]),
            rtol=1e-4, atol=1e-5, err_msg=name,
        )
    # and both engines step identically afterwards
    hop = one.hop_samples
    audio = (rng.standard_normal((5, hop * 8)) * 0.1).astype(np.float32)
    for j in range(8):
        one.push(audio[:, j * hop : (j + 1) * hop])
        blocked.push(audio[:, j * hop : (j + 1) * hop])
    np.testing.assert_allclose(
        np.asarray(one.last_probs), np.asarray(blocked.last_probs), rtol=1e-4, atol=1e-5
    )


def _run_blocked(offline, blocked, rng, n_hops, amp=0.3):
    """Offline clip scoring vs hop-blocked streaming pushes of the same audio."""
    n = blocked.num_streams
    hop = blocked.hop_samples
    H = blocked.hop_block
    assert n_hops % H == 0
    preroll = np.zeros((n, blocked.window_frames * blocked.frontend.hop_length), np.float32)
    hops = (rng.standard_normal((n_hops, n, hop)) * amp).astype(np.float32)

    clip = np.concatenate([preroll] + [hops[j] for j in range(n_hops)], axis=1)
    out = offline.infer_batch(clip)
    off = (np.asarray(out["probs"]), np.asarray(out["labels"]), np.asarray(out["fired"]))

    lag = blocked.schedule.lag
    st_probs, st_labels, st_fired = {}, {}, {}
    for b in range(n_hops // H):
        block_audio = np.concatenate([hops[b * H + i] for i in range(H)], axis=1)
        blocked.push(block_audio)
        probs = np.asarray(blocked.last_probs)  # (n, H, L)
        labels = np.asarray(blocked.last_labels)  # (n, H)
        fireds = np.asarray(blocked.last_fired)  # (n, H)
        k0 = b * H + 1 - lag
        for h in range(H):
            k = k0 + h
            if k >= 0:
                st_probs[k] = probs[:, h]
                st_labels[k] = labels[:, h]
                st_fired[k] = fireds[:, h]
    return off, (st_probs, st_labels, st_fired)


@pytest.mark.parametrize("blocks_of_period", [1, 2])
def test_hop_blocked_matches_offline(rng, blocks_of_period):
    """hop_block = period and 2*period: per-window posteriors, labels, and
    fire decisions identical to the offline fused-trunk clip scoring (and
    hence to per-hop streaming, which is tested against the same oracle)."""
    from howl_tpu.inference.streaming_trunk import FusedStreamingOnlineEngine

    cfg, frontend, offline, perhop = _build()
    H = perhop.schedule.period * blocks_of_period
    blocked = FusedStreamingOnlineEngine(
        perhop.model, perhop.variables, cfg, frontend, spec=perhop.spec,
        num_streams=perhop.num_streams, hop_block=H,
    )
    n_hops = 24
    off, st = _run_blocked(offline, blocked, rng, n_hops=n_hops)
    _compare(off, st, n_compare=n_hops - blocked.schedule.lag - 2)


@pytest.mark.slow
def test_hop_blocked_bf16(rng):
    """bf16 blocked serving matches the offline bf16 fused engine."""
    import jax.numpy as jnp
    from howl_tpu.inference.streaming_trunk import FusedStreamingOnlineEngine

    cfg, frontend, offline, perhop = _build(compute_dtype=jnp.bfloat16)
    H = 2 * perhop.schedule.period
    blocked = FusedStreamingOnlineEngine(
        perhop.model, perhop.variables, cfg, frontend, spec=perhop.spec,
        num_streams=perhop.num_streams, compute_dtype=jnp.bfloat16, hop_block=H,
    )
    n_hops = 18
    off, st = _run_blocked(offline, blocked, rng, n_hops=n_hops)
    _compare(off, st, n_compare=n_hops - blocked.schedule.lag - 2, atol=1e-4)


def test_hop_blocked_fires_like_offline(rng):
    """A firing stream: blocked decisions line up hop for hop."""
    from howl_tpu.inference.streaming_trunk import FusedStreamingOnlineEngine

    cfg, frontend, offline, perhop = _build(
        cfg_overrides={"inference_sequence": (0,), "inference_threshold": 0.0}
    )
    H = perhop.schedule.period
    blocked = FusedStreamingOnlineEngine(
        perhop.model, perhop.variables, cfg, frontend, spec=perhop.spec,
        num_streams=perhop.num_streams, hop_block=H,
    )
    n_hops = 21
    off, st = _run_blocked(offline, blocked, rng, n_hops=n_hops, amp=0.5)
    assert np.asarray(off[2]).any()
    _compare(off, st, n_compare=n_hops - blocked.schedule.lag - 2)


def test_hop_blocked_validation():
    """Non-multiple-of-period hop_block and cache-overflowing hop_block raise."""
    from howl_tpu.inference.streaming_trunk import FusedStreamingOnlineEngine

    cfg, frontend, _, perhop = _build()
    period = perhop.schedule.period
    with pytest.raises(ValueError, match="multiple of the schedule period"):
        FusedStreamingOnlineEngine(
            perhop.model, perhop.variables, cfg, frontend, spec=perhop.spec,
            hop_block=period + 1,
        )
    with pytest.raises(ValueError, match="mel"):
        FusedStreamingOnlineEngine(
            perhop.model, perhop.variables, cfg, frontend, spec=perhop.spec,
            hop_block=period * 4,
        )


@pytest.mark.slow
def test_hop_blocked_chained_runner_matches_push(rng):
    """make_chained_runner on a blocked engine reproduces push() exactly."""
    from howl_tpu.inference.streaming_trunk import FusedStreamingOnlineEngine, make_chained_runner

    cfg, frontend, _, perhop = _build(
        cfg_overrides={"inference_sequence": (0,), "inference_threshold": 0.0}
    )
    H = perhop.schedule.period
    mk = lambda: FusedStreamingOnlineEngine(  # noqa: E731
        perhop.model, perhop.variables, cfg, frontend, spec=perhop.spec,
        num_streams=2, hop_block=H,
    )
    eng_push, eng_run = mk(), mk()
    ring_hops, n_blocks = 5, 10
    block_samples = H * eng_push.hop_samples
    buf = (rng.standard_normal((2, ring_hops * block_samples)) * 0.4).astype(np.float32)

    run, chain = make_chained_runner(eng_run, ring_hops, n_blocks)
    _, last_fired = run(eng_run.variables, jax.numpy.asarray(buf), *chain)

    fired = None
    for b in range(n_blocks):
        off = (b % ring_hops) * block_samples
        eng_push.push(buf[:, off : off + block_samples])
        fired = np.asarray(eng_push.last_fired)[:, -1]
    np.testing.assert_array_equal(np.asarray(last_fired), fired)
