"""Serving capacity guardrails (VERDICT round-3 weak item #1 / next item #3):
the measured step-time model, hub auto-selection + warnings, and the
MultiStreamServer sustained-cadence alarm.

Evidence of the guarded trap: BENCH_r03 online_step_latency_ms["65536"]
p99 = 104 ms against the 62.5 ms hop budget — round 3 built that
configuration without a whisper."""

from __future__ import annotations

import time
import types
import warnings

import numpy as np
import pytest

from howl_tpu.inference.capacity import (
    HOP_MS,
    PROFILES,
    CapacityError,
    CapacityWarning,
    EngineProfile,
    capacity_table,
    check_capacity,
    recommend,
)

# make the reference-workspace fixture available for the hub integration test
from tests.test_torch_import import _make_reference_workspace, ref_res8  # noqa: F401


def test_step_time_model_matches_bench_points():
    """The fits reproduce the measurements they were built from (round-4
    1-pass bf16 DFT points, tools/bench_online_dft_precision.py)."""
    inc = PROFILES[("incremental", 1)]
    for n, ms in inc.points:
        assert inc.predict_step_ms(n) == pytest.approx(ms, rel=0.06)
    # the round-3 trap, round-4 edition: 65,536 incremental streams now fit
    # the RAW 62.5 ms budget (58.98 ms) but not the 0.85-headroom sustainable
    # line, so the guardrail still flags them
    report = check_capacity("incremental", 65536)
    assert not report.ok
    assert report.predicted_step_ms < HOP_MS  # under budget...
    assert 65536 > report.sustainable_streams  # ...but past the headroom line
    assert "shard_streams" in report.message
    # and a sane configuration passes
    assert check_capacity("incremental", 16384).ok
    assert check_capacity("streaming_trunk", 65536).ok
    assert check_capacity("streaming_trunk", 65536, hop_block=3).ok


def test_sustainable_monotonic_in_engine_cost():
    """Cheaper per-hop engines sustain more streams; ceilings are respected.

    The latency-fit engines (incremental/trunk/blocked) are compared on the
    headroom-scaled sustainable count; the full-window OnlineEngine profile
    is a throughput anchor (bench.py captures no latency series for it), so
    it is only comparable on the measured ceiling."""
    inc = PROFILES[("incremental", 1)].sustainable_streams()
    trunk = PROFILES[("streaming_trunk", 1)].sustainable_streams()
    blocked = PROFILES[("streaming_trunk", 3)].sustainable_streams()
    assert inc < trunk < blocked
    assert PROFILES[("online", 1)].ceiling < PROFILES[("incremental", 1)].ceiling
    assert blocked <= PROFILES[("streaming_trunk", 3)].ceiling


def test_ceilings_conservative_vs_driver_measured():
    """VERDICT round-4 weak #4: the baked calibration ceilings must not
    over-advise a slower chip. The driver's independent round-4 re-run of the
    identical tree (BENCH_r04.json) measured these sustainable stream counts;
    the margined ``sustainable_streams()`` must never exceed them — i.e. the
    auto-selector stays conservative under the worst observed same-code
    chip/relay swing."""
    driver_measured = {
        ("online", 1): 73_755,            # online_streams_full_window
        ("incremental", 1): 95_118,       # online_streams_per_chip
        ("streaming_trunk", 1): 172_038,  # online_streams_per_chip_trunk
        ("streaming_trunk", 3): 200_528,  # online_streams_per_chip_trunk_blocked
    }
    for key, measured in driver_measured.items():
        sustainable = PROFILES[key].sustainable_streams()
        assert sustainable <= measured, (
            f"{key}: advises {sustainable} > driver-measured {measured}"
        )


def test_unmeasured_hop_block_scales_from_measured():
    """hop_block values without a measured profile get a scaled model, not a
    silent pass."""
    r6 = check_capacity("streaming_trunk", 65536, hop_block=6)
    r3 = check_capacity("streaming_trunk", 65536, hop_block=3)
    assert r6.predicted_step_ms == pytest.approx(2 * r3.predicted_step_ms, rel=1e-6)
    assert r6.budget_ms == pytest.approx(2 * r3.budget_ms)


def test_recommend_prefers_lowest_latency_that_fits():
    assert recommend(10_000) == {"incremental": True}
    assert recommend(100_000) == {"streaming_trunk": True}
    assert recommend(160_000) == {"streaming_trunk": True, "hop_block": 3}
    # without trunk support, only incremental is available
    assert recommend(10_000, supports_trunk=False) == {"incremental": True}
    with pytest.raises(CapacityError, match="shard"):
        recommend(100_000, supports_trunk=False)
    with pytest.raises(CapacityError, match="chips"):
        recommend(1_000_000)


def test_capacity_table_covers_all_profiles():
    rows = capacity_table()
    assert len(rows) == len(PROFILES)
    assert all(r["sustainable_streams"] > 0 for r in rows)
    # generated markdown renders without touching a device
    from tools.gen_capacity_table import markdown_table

    md = markdown_table()
    assert md.count("\n") == len(PROFILES) + 1  # header + rule + one row each


# ---------------- hub integration ----------------


def _tiny_profiles():
    """Profiles with tiny ceilings so guardrails trip at toy stream counts."""
    return {
        ("online", 1): EngineProfile("online", "online", ((0, 0.0), (4, HOP_MS)), 4),
        ("incremental", 1): EngineProfile("incremental", "inc", ((0, 0.0), (8, HOP_MS)), 8),
        ("streaming_trunk", 1): EngineProfile("streaming_trunk", "trunk", ((0, 0.0), (16, HOP_MS)), 16),
        ("streaming_trunk", 3): EngineProfile(
            "streaming_trunk", "blocked", ((0, 0.0), (32, 3 * HOP_MS)), 32, hops_per_step=3),
    }


@pytest.mark.slow
def test_hub_warns_on_unsustainable_config(tmp_path, ref_res8, monkeypatch):
    torch, Res8 = ref_res8
    from howl_tpu import hub
    from howl_tpu.inference import capacity

    src, _ = _make_reference_workspace(tmp_path, torch, Res8)
    monkeypatch.setattr(capacity, "PROFILES", _tiny_profiles())

    with pytest.warns(CapacityWarning, match="cannot sustain"):
        hub.load_workspace_engine(src, num_streams=12, incremental=True)

    with pytest.raises(CapacityError, match="cannot sustain"):
        hub.load_workspace_engine(src, num_streams=12, incremental=True, strict_capacity=True)

    # sustainable configs stay silent
    with warnings.catch_warnings():
        warnings.simplefilter("error", CapacityWarning)
        hub.load_workspace_engine(src, num_streams=4, incremental=True)


@pytest.mark.slow
def test_hub_auto_selects_engine(tmp_path, ref_res8, monkeypatch):
    torch, Res8 = ref_res8
    from howl_tpu import hub
    from howl_tpu.inference import capacity
    from howl_tpu.inference.online import IncrementalOnlineEngine
    from howl_tpu.inference.streaming_trunk import FusedStreamingOnlineEngine

    src, _ = _make_reference_workspace(tmp_path, torch, Res8)
    monkeypatch.setattr(capacity, "PROFILES", _tiny_profiles())

    engine, _ = hub.load_workspace_engine(src, num_streams=4, auto=True)
    assert isinstance(engine, IncrementalOnlineEngine)

    engine, _ = hub.load_workspace_engine(src, num_streams=12, auto=True)
    assert isinstance(engine, FusedStreamingOnlineEngine)
    assert engine.hop_block == 1

    engine, _ = hub.load_workspace_engine(src, num_streams=20, auto=True)
    assert isinstance(engine, FusedStreamingOnlineEngine)
    assert engine.hop_block == 3

    # nothing fits: fail BEFORE any device allocation
    with pytest.raises(CapacityError, match="shard"):
        hub.load_workspace_engine(src, num_streams=1000, auto=True)

    with pytest.raises(ValueError, match="auto"):
        hub.load_workspace_engine(src, num_streams=4, auto=True, incremental=True)


# ---------------- server cadence alarm ----------------


class _SlowEngine:
    """Push-based engine stub whose step time is controllable."""

    def __init__(self, num_streams=4, step_seconds=0.0):
        self.num_streams = num_streams
        self.hop_samples = 1000
        self.cfg = types.SimpleNamespace(sample_rate=16000)
        self.last_fired = np.zeros(num_streams, bool)
        self.step_seconds = step_seconds

    def push(self, batch):
        if self.step_seconds:
            time.sleep(self.step_seconds)
        return False


def test_server_alarms_on_sustained_cadence_breach():
    from howl_tpu.client.stream_server import MultiStreamServer

    engine = _SlowEngine(step_seconds=0.075)  # > 62.5 ms budget
    server = MultiStreamServer(engine, alarm_after=3)
    alarms = []
    server.add_alarm_listener(alarms.append)

    server.run_ticks(5)
    assert server.late_ticks == 5
    assert server.alarms == 1, "one alarm per breach episode"
    assert len(alarms) == 1
    assert alarms[0].consecutive == 3
    assert alarms[0].step_seconds > alarms[0].tick_seconds

    # recovery re-arms; a second sustained breach alarms again
    engine.step_seconds = 0.0
    server.run_ticks(2)
    assert server.consecutive_late == 0
    engine.step_seconds = 0.075
    server.run_ticks(3)
    assert server.alarms == 2 and len(alarms) == 2


def test_server_no_alarm_for_transient_jitter():
    from howl_tpu.client.stream_server import MultiStreamServer

    engine = _SlowEngine(step_seconds=0.0)
    server = MultiStreamServer(engine, alarm_after=3)
    alarms = []
    server.add_alarm_listener(alarms.append)
    for slow in (True, False, True, False, True, False):
        engine.step_seconds = 0.075 if slow else 0.0
        server.run_ticks(1)
    assert server.late_ticks == 3
    assert server.alarms == 0 and alarms == []
