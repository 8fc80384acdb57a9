"""Serving-capacity model: can this engine configuration hold the cadence?

Round 3 shipped engines that are happy to be configured past their
sustainable concurrency (BENCH_r03: IncrementalOnlineEngine at 65,536
streams steps in p50 65.3 / p99 104 ms against the 62.5 ms hop budget —
the server just accumulates underruns). This module is the single home for
the measured step-time models so `hub.load_workspace_engine` can warn/fail
on unsustainable configurations, auto-select an engine, and generate the
docs/SERVING.md capacity table from the same numbers (no prose drift).

The reference has no equivalent (it serves ONE microphone,
ref howl/client/howl_client.py:14); this guards a concurrency axis that
only exists here.

Step-time model: ms_per_step(n) = a + b*n, fit from the round-4 device p50
latency points (one real v5e chip, res8, bf16, post-1-pass-DFT-flip run —
the serving default since inference/config.py's ``serving_dft_precision``
flip), clamped to a >= 0. Sustainable concurrency additionally respects the
measured capacity ceiling (streams/chip at the cadence from the same run —
it encodes host-gather and HBM-state bounds the latency fit can't see),
discounted by ``VARIANCE_MARGIN`` so a slower chip than the calibration one
is not silently over-advised (the round-4 driver re-run measured 95,118
sustainable incremental streams against the builder calibration's 100,410 —
a 5.3% same-code swing). The 0.85 headroom in ``sustainable_streams`` is
the fit-side margin; the ceiling margin is separate because the ceiling is
a hard measured capacity, not a prediction. Re-measure with
tools/gen_capacity_table.py --calibrate after hardware or model changes.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

HOP_MS = 62.5  # engine cadence at the default 16 kHz / 1000-sample hop

# Chip/relay run-to-run variance margin applied to measured ceilings.
# Largest observed same-code swing between the builder's calibration run and
# the driver's independent re-run of the identical tree: 5.3% (incremental
# ceiling 100,410 calibrated vs 95,118 driver-measured, round 4); full-window
# showed 2.0% (75,210 vs 73,755), trunk/blocked <1%. Rounded up to 6%.
# tests/test_capacity.py pins every margined ceiling at or below the
# driver-measured round-4 numbers.
VARIANCE_MARGIN = 0.06


class CapacityWarning(UserWarning):
    """An engine configuration predicted to miss its serving cadence."""


class CapacityError(ValueError):
    """No single-chip engine configuration can sustain the requested load."""


@dataclass(frozen=True)
class EngineProfile:
    kind: str                                 # hub flag spelling
    label: str                                # human name for tables
    points: Tuple[Tuple[int, float], ...]     # (num_streams, ms per device STEP)
    ceiling: int                              # measured streams/chip at cadence
    hops_per_step: int = 1                    # hop_block: hops scored per step
    extra_latency_hops: int = 0               # decision lag (trunk lookahead + blocking)

    def fit(self) -> Tuple[float, float]:
        """(a, b) of ms_per_step = a + b*n from the first/last measured points."""
        (n0, t0), (n1, t1) = self.points[0], self.points[-1]
        b = (t1 - t0) / float(n1 - n0)
        a = t0 - b * n0
        if a < 0.0:  # dispatch floor can't be negative; re-anchor on the big point
            a, b = 0.0, t1 / n1
        return a, b

    def predict_step_ms(self, num_streams: int) -> float:
        a, b = self.fit()
        return a + b * num_streams

    def budget_ms(self, hop_ms: float = HOP_MS) -> float:
        return hop_ms * self.hops_per_step

    def sustainable_streams(self, hop_ms: float = HOP_MS, headroom: float = 0.85) -> int:
        """Max streams whose predicted step fits in headroom * budget, capped
        at the measured ceiling (host gather / HBM stream-state bounds)
        discounted by the observed chip-to-chip variance margin."""
        a, b = self.fit()
        n = (self.budget_ms(hop_ms) * headroom - a) / b
        return int(min(max(n, 0), self.ceiling * (1.0 - VARIANCE_MARGIN)))


# Round-4 post-flip calibration (one v5e chip, res8 bf16, hop=62.5 ms,
# 1-pass bf16 serving DFT): online_step_latency_ms* p50 points +
# *_streams_per_chip ceilings.
PROFILES: Dict[Tuple[str, int], EngineProfile] = {
    ("online", 1): EngineProfile(
        kind="online", label="OnlineEngine (full-window re-score)",
        # no direct latency series was captured; anchor on the measured
        # cadence capacity (75,210 streams fill the 62.5 ms budget)
        points=((0, 0.0), (75210, HOP_MS)),
        ceiling=75210,
    ),
    ("incremental", 1): EngineProfile(
        kind="incremental", label="IncrementalOnlineEngine",
        # 1-pass bf16 DFT points (bench.py post-flip run, the serving
        # default since the round-4 flip)
        points=((1024, 1.04), (16384, 14.185), (65536, 59.018)),
        ceiling=100410,
    ),
    ("streaming_trunk", 1): EngineProfile(
        kind="streaming_trunk", label="FusedStreamingOnlineEngine",
        points=((16384, 5.999), (65536, 24.765)),
        ceiling=170703,
        extra_latency_hops=4,  # trunk lookahead (schedule.lag)
    ),
    ("streaming_trunk", 3): EngineProfile(
        kind="streaming_trunk", label="FusedStreamingOnlineEngine hop_block=3",
        points=((16384, 5.301), (65536, 20.377)),
        ceiling=201012,
        hops_per_step=3,
        extra_latency_hops=4 + 2,  # lookahead + up to hop_block-1 observation delay
    ),
}


@dataclass(frozen=True)
class CapacityReport:
    ok: bool
    kind: str
    hop_block: int
    num_streams: int
    predicted_step_ms: float
    budget_ms: float
    sustainable_streams: int
    message: str


def _profile(kind: str, hop_block: int) -> Optional[EngineProfile]:
    prof = PROFILES.get((kind, hop_block))
    if prof is None and kind == "streaming_trunk":
        # unmeasured hop_block: scale the measured block profile's per-stream
        # cost by hops (per-step work is ~linear in hops scored)
        base = PROFILES[("streaming_trunk", 3)]
        a, b = base.fit()
        scale = hop_block / base.hops_per_step
        prof = EngineProfile(
            kind=kind, label=f"FusedStreamingOnlineEngine hop_block={hop_block}",
            points=((16384, (a + b * 16384) * scale), (65536, (a + b * 65536) * scale)),
            ceiling=base.ceiling,
            hops_per_step=hop_block,
            extra_latency_hops=4 + hop_block - 1,
        )
    return prof


def check_capacity(
    kind: str, num_streams: int, hop_block: int = 1, hop_ms: float = HOP_MS
) -> CapacityReport:
    """Predict whether (engine, num_streams) holds the cadence on one chip."""
    prof = _profile(kind, hop_block)
    if prof is None:
        return CapacityReport(True, kind, hop_block, num_streams, 0.0, hop_ms,
                              num_streams, f"no capacity profile for {kind!r}; unchecked")
    predicted = prof.predict_step_ms(num_streams)
    budget = prof.budget_ms(hop_ms)
    sustainable = prof.sustainable_streams(hop_ms)
    ok = num_streams <= sustainable
    if ok:
        msg = (f"{prof.label}: {num_streams} streams -> ~{predicted:.1f} ms/step "
               f"in a {budget:.1f} ms budget")
    else:
        n_chips = max(math.ceil(num_streams / max(sustainable, 1)), 2)
        msg = (
            f"{prof.label} cannot sustain {num_streams} streams on one chip: "
            f"predicted ~{predicted:.1f} ms/step against a {budget:.1f} ms budget "
            f"(sustainable ~{sustainable}). Use hub.load_workspace_engine(auto=True) "
            f"to pick a cheaper engine, raise hop_block, or shard across ~{n_chips} "
            f"chips via engine.shard_streams(make_mesh(data={n_chips}))."
        )
    return CapacityReport(ok, kind, hop_block, num_streams, predicted, budget, sustainable, msg)


def recommend(
    num_streams: int, supports_trunk: bool = True, hop_ms: float = HOP_MS
) -> Dict[str, object]:
    """Pick the lowest-decision-latency engine that sustains ``num_streams``
    on one chip (the auto mode behind hub.load_workspace_engine(auto=True)).
    Returns hub kwargs ({} = plain OnlineEngine is never chosen: incremental
    dominates it at every size). Raises CapacityError when no single-chip
    configuration fits."""
    candidates = [({"incremental": True}, ("incremental", 1))]
    if supports_trunk:
        candidates += [
            ({"streaming_trunk": True}, ("streaming_trunk", 1)),
            ({"streaming_trunk": True, "hop_block": 3}, ("streaming_trunk", 3)),
        ]
    for kwargs, (kind, hop_block) in candidates:
        prof = PROFILES[(kind, hop_block)]
        if num_streams <= prof.sustainable_streams(hop_ms):
            return kwargs
    best_kind, best_block = (("streaming_trunk", 3) if supports_trunk else ("incremental", 1))
    sustainable = PROFILES[(best_kind, best_block)].sustainable_streams(hop_ms)
    n_chips = math.ceil(num_streams / max(sustainable, 1))
    raise CapacityError(
        f"no single-chip engine sustains {num_streams} streams "
        f"(best: {best_kind} hop_block={best_block} at ~{sustainable}); shard across "
        f"~{n_chips} chips: engine.shard_streams(make_mesh(data={n_chips}))"
    )


def capacity_table(hop_ms: float = HOP_MS) -> list:
    """Rows for the docs/SERVING.md engine table — generated from the same
    model the hub guardrails use (tools/gen_capacity_table.py)."""
    rows = []
    for (kind, hop_block), prof in sorted(PROFILES.items()):
        rows.append({
            "engine": prof.label,
            "kind": kind,
            "hop_block": hop_block,
            "sustainable_streams": prof.sustainable_streams(hop_ms),
            "ceiling": prof.ceiling,
            "step_ms_at_16k": round(prof.predict_step_ms(16384), 2),
            "decision_latency_hops": prof.extra_latency_hops,
        })
    return rows
