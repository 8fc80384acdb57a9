"""Host-side throughput of the multi-stream ingest mux (NativeStreamMux).

The serving tick budget is 62.5 ms: every tick the consumer must gather
(N, hop) from N rings while producers keep pushing. This measures gather and
push rates at serving stream counts on this host so the host-side headroom
(or the point where producers need their own cores / multiple mux shards) is
known. Scratch measurement tool.

Usage: python tools/bench_stream_mux.py [n_streams] [hop_samples]
"""

from __future__ import annotations

import _path  # noqa: F401 — repo root on sys.path for howl_tpu

import sys

import time

import numpy as np

from howl_tpu.native import NativeStreamMux, available

def main():
    n_streams = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    hop = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    print(f"native={available()} streams={n_streams} hop={hop}")
    mux = NativeStreamMux(n_streams, capacity=8 * hop)

    chunk = (np.random.default_rng(0).standard_normal(hop) * 0.1).astype(np.float32)
    # push one tick of audio for every stream (per-stream call granularity,
    # as real producers would)
    reps = 3
    push_best = gather_best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for s in range(n_streams):
            mux.push(s, chunk)
        push_best = min(push_best, time.perf_counter() - t0)
        t0 = time.perf_counter()
        batch, status = mux.gather(hop)
        gather_best = min(gather_best, time.perf_counter() - t0)
        assert int((status == 1).sum()) == n_streams
    mb = n_streams * hop * 4 / 1e6
    print(f"push  : {push_best * 1e3:8.2f} ms/tick ({mb / push_best / 1e3:.2f} GB/s, {n_streams / push_best:,.0f} streams/s)")
    print(f"gather: {gather_best * 1e3:8.2f} ms/tick ({mb / gather_best / 1e3:.2f} GB/s)")
    print(f"tick budget: 62.5 ms -> gather headroom {62.5 / (gather_best * 1e3):.1f}x")

if __name__ == "__main__":
    main()
