"""HBM bandwidth sweep: settle the ~264 GB/s "practical floor" question.

docs/PERFORMANCE.md round-3 accepted ~264 GB/s effective HBM bandwidth from a
single read-only Pallas measurement (tools/bench_pallas_micro.py stream-only)
and built the serving-MFU argument on it. This sweeps the axes that single
point left unexplored:

  * access mode: read-only (block -> small reduce), write-only (small ->
    block fill), copy (read+write), whole-array HBM->HBM DMA;
  * pipelining: pallas_call's automatic grid double-buffering at several
    block heights vs MANUAL K-deep DMA pipelines (2/3/4 buffers,
    make_async_copy into rotating VMEM slots);
  * dtype: f32 vs bf16 at equal byte volume;
  * plus pure-XLA baselines (fused copy, full reduce) for calibration.

Methodology (CLAUDE.md relay rules): iterations chained inside ONE jitted
lax.scan with the big operand loop-invariant and a scalar carried through
SMEM so nothing is hoisted; one host fetch per measurement; bandwidth =
bytes-touched / wall-time. Reports one line per config plus a JSON summary.

Run on the real TPU:  python tools/bench_hbm_sweep.py [--mb 256] [--iters 8]
                      [--quick]
"""

from __future__ import annotations

import _path  # noqa: F401 — repo root on sys.path for howl_tpu

import argparse
import json
import time
from functools import partial

import numpy as np


def main(argv=None):
    from howl_tpu.utils.platform import ensure_platform

    ensure_platform()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p = argparse.ArgumentParser()
    p.add_argument("--mb", type=int, default=256, help="array size in MB")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--quick", action="store_true", help="coarse subset only")
    p.add_argument("--json", type=str, default=None, help="write results JSON here")
    args = p.parse_args(argv)

    on_tpu = jax.devices()[0].platform != "cpu"
    if not on_tpu:
        args.mb, args.iters = 16, 2

    COLS = 512
    bytes_total = args.mb * (1 << 20)
    rows_f32 = bytes_total // (COLS * 4)
    rows_f32 -= rows_f32 % 4096
    rows_bf16 = rows_f32 * 2  # same bytes
    iters = args.iters

    rng = np.random.default_rng(0)
    x32 = jax.device_put(rng.standard_normal((rows_f32, COLS)).astype(np.float32))
    # same BYTE volume in bf16: twice the rows
    x16 = jax.jit(lambda a: jnp.concatenate([a, a], 0).astype(jnp.bfloat16))(x32)
    jax.block_until_ready((x32, x16))

    results = []

    def _slope_time(make_chain, big, repeats=3):
        """Seconds per iteration via the TWO-POINT slope: the relay's fixed
        dispatch+fetch cost (~31 ms/call, CLAUDE.md) swamps sub-ms kernels at
        small iteration counts — time chains of N and 4N iterations and take
        (t_hi - t_lo) / (4N - N), which cancels the fixed cost exactly.
        Median of ``repeats`` slopes damps relay jitter (the jitter is
        comparable to the per-config deltas being resolved)."""
        lo, hi = iters, iters * 4
        chain_lo, chain_hi = make_chain(lo), make_chain(hi)
        _ = float(np.asarray(chain_lo(big)))  # compile + warm
        _ = float(np.asarray(chain_hi(big)))
        slopes = []
        for _rep in range(repeats):
            start = time.perf_counter()
            _ = float(np.asarray(chain_lo(big)))
            t_lo = time.perf_counter() - start
            start = time.perf_counter()
            _ = float(np.asarray(chain_hi(big)))
            t_hi = time.perf_counter() - start
            slopes.append((t_hi - t_lo) / (hi - lo))
        return float(np.median(slopes))

    def timed(name, fn, big, gb_per_iter):
        """fn(big, scalar)->array with big loop-invariant; scalar chains."""

        def make_chain(length):
            @jax.jit
            def chain(big):
                def body(s, _):
                    out = fn(big, s)
                    return jnp.asarray(out).ravel()[0].astype(jnp.float32) * 1e-30, None

                s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=length)
                return s

            return chain

        try:
            dt = _slope_time(make_chain, big)
        except Exception as exc:  # noqa: BLE001 — a failing config shouldn't kill the sweep
            print(f"{name:44s}: FAILED ({type(exc).__name__}: {exc})", flush=True)
            return
        gbps = gb_per_iter / dt
        print(f"{name:44s}: {dt*1e3:8.3f} ms/iter  {gbps:7.1f} GB/s", flush=True)
        results.append({"config": name, "ms_per_iter": dt * 1e3, "gbps": gbps})

    # ---------------- XLA baselines ----------------
    gb = bytes_total / 1e9

    def timed_xla_copy(name, x):
        """True elementwise pass per iteration: the scan CARRIES the array, so
        XLA cannot dead-code-eliminate the copy (a sliced output would let it
        compute just the slice)."""

        def make_chain(length):
            @jax.jit
            def chain(big):
                def body(carry, _):
                    acc, i = carry
                    # multiplier must differ from 1.0f in f32 or XLA folds
                    # the whole scan to a no-op (1 + 1e-30 == 1.0!); and must
                    # vary per step or the iterations get CSE'd
                    return (acc * (1.0 + 1e-7 * (i % 2)), i + 1), None

                (acc, _), _ = jax.lax.scan(body, (big, jnp.int32(0)), None, length=length)
                return acc.ravel()[0]

            return chain

        dt = _slope_time(make_chain, x)
        gbps = 2 * gb / dt
        print(f"{name:44s}: {dt*1e3:8.3f} ms/iter  {gbps:7.1f} GB/s", flush=True)
        results.append({"config": name, "ms_per_iter": dt * 1e3, "gbps": gbps})

    timed_xla_copy("xla copy f32 (r+w)", x32)
    # the scalar perturbation keeps x.sum() loop-VARIANT (else XLA hoists the
    # reduce out of the scan); the multiply fuses into the reduction, so HBM
    # traffic is one read of x per iteration
    timed("xla reduce f32 (r)", lambda x, s: ((x * (1.0 + s)).sum())[None], x32, gb)

    # ---------------- auto-pipelined pallas_call ----------------
    def make_auto_read(x, bn):
        """Read bandwidth: the BlockSpec DMAs the full (bn, cols) block into
        VMEM regardless of what the kernel touches; the body copies only a
        corner (no cross-lane reduction — a scalar .sum() per block caps the
        whole pipeline on the VPU, not HBM)."""
        n_blocks = x.shape[0] // bn

        def kernel(x_ref, s_ref, o_ref):
            o_ref[:, :] = x_ref[:8, :128] + s_ref[0]

        def run(xx, s):
            return pl.pallas_call(
                kernel,
                grid=(n_blocks,),
                in_specs=[
                    pl.BlockSpec((bn, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n_blocks * 8, 128), xx.dtype),
            )(xx, s[None].astype(xx.dtype))

        return run

    def make_auto_copy(x, bn):
        n_blocks = x.shape[0] // bn

        def kernel(x_ref, s_ref, o_ref):
            o_ref[:, :] = x_ref[:, :] + s_ref[0]

        def run(xx, s):
            return pl.pallas_call(
                kernel,
                grid=(n_blocks,),
                in_specs=[
                    pl.BlockSpec((bn, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                out_specs=pl.BlockSpec((bn, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(x.shape, xx.dtype),
            )(xx, s[None].astype(xx.dtype))

        return run

    def make_stream_repro(x, bn):
        """Exact bench_pallas_micro stream-only shape (the ~264 GB/s source):
        read (bn,512) f32 blocks, write (bn,128) slices. GB accounting here is
        read+write (1.25x the read bytes), where the original counted reads."""
        n_blocks = x.shape[0] // bn

        def kernel(x_ref, s_ref, o_ref):
            o_ref[:, :] = x_ref[:, :128] + s_ref[0]

        def run(xx, s):
            return pl.pallas_call(
                kernel,
                grid=(n_blocks,),
                in_specs=[
                    pl.BlockSpec((bn, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                out_specs=pl.BlockSpec((bn, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((x.shape[0], 128), xx.dtype),
            )(xx, s[None].astype(xx.dtype))

        return run

    timed("stream-264-repro f32 bn=256 (r+w/4)", make_stream_repro(x32, 256), x32, 1.25 * gb)

    bns = (512, 2048) if args.quick else (256, 512, 1024, 2048, 4096)
    for bn in bns:
        timed(f"auto read  f32 bn={bn}", make_auto_read(x32, bn), x32, gb)
    for bn in bns:
        timed(f"auto copy  f32 bn={bn}", make_auto_copy(x32, bn), x32, 2 * gb)
    if not args.quick:
        for bn in (1024, 4096):
            timed(f"auto read  bf16 bn={bn}", make_auto_read(x16, bn), x16, gb)
            timed(f"auto copy  bf16 bn={bn}", make_auto_copy(x16, bn), x16, 2 * gb)

    # ---------------- manual K-deep DMA pipelines ----------------
    def make_manual_read(x, k, cb):
        n_chunks = x.shape[0] // cb
        cols = x.shape[1]

        def kernel(s_ref, x_hbm, o_ref, scratch, sems):
            def get_dma(slot, idx):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(idx * cb, cb)], scratch.at[slot], sems.at[slot]
                )

            for j in range(k - 1):
                get_dma(j, j).start()

            o_ref[:, :] = jnp.full((8, 128), s_ref[0], jnp.float32)

            def body(i, _):
                slot = i % k

                @pl.when(i + k - 1 < n_chunks)
                def _():
                    get_dma((i + k - 1) % k, i + k - 1).start()

                get_dma(slot, i).wait()
                # corner touch only: the DMA already moved the whole chunk;
                # a full reduction would bottleneck on the VPU
                o_ref[:, :] += scratch[slot][:8, :128].astype(jnp.float32)
                return 0

            jax.lax.fori_loop(0, n_chunks, body, 0)

        def run(xx, s):
            return pl.pallas_call(
                kernel,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((k, cb, cols), xx.dtype),
                    pltpu.SemaphoreType.DMA((k,)),
                ],
            )(s[None].astype(jnp.float32), xx)

        return run

    def make_manual_write(x, k, cb):
        n_chunks = x.shape[0] // cb
        cols = x.shape[1]

        def kernel(s_ref, o_hbm, o_done, scratch, sems):
            def get_dma(slot, idx):
                return pltpu.make_async_copy(
                    scratch.at[slot], o_hbm.at[pl.ds(idx * cb, cb)], sems.at[slot]
                )

            def body(i, _):
                slot = i % k

                @pl.when(i >= k)
                def _():
                    get_dma(slot, i - k).wait()

                scratch[slot] = jnp.full((cb, cols), s_ref[0] + i, scratch.dtype)
                get_dma(slot, i).start()
                return 0

            jax.lax.fori_loop(0, n_chunks, body, 0)
            for j in range(min(k, n_chunks)):
                idx = n_chunks - min(k, n_chunks) + j
                get_dma(idx % k, idx).wait()
            o_done[:, :] = jnp.full((8, 128), s_ref[0], jnp.float32)

        def run(xx, s):
            _, done = pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct(x.shape, xx.dtype),
                    jax.ShapeDtypeStruct((8, 128), jnp.float32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((k, cb, cols), xx.dtype),
                    pltpu.SemaphoreType.DMA((k,)),
                ],
            )(s[None].astype(jnp.float32))
            return done

        return run

    def make_manual_copy(x, k, cb):
        n_chunks = x.shape[0] // cb
        cols = x.shape[1]

        def kernel(s_ref, x_hbm, o_hbm, o_done, scratch, in_sems, out_sems):
            def in_dma(slot, idx):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(idx * cb, cb)], scratch.at[slot], in_sems.at[slot]
                )

            def out_dma(slot, idx):
                return pltpu.make_async_copy(
                    scratch.at[slot], o_hbm.at[pl.ds(idx * cb, cb)], out_sems.at[slot]
                )

            # k independent per-slot chains (read -> write -> read ...): the
            # next read into a slot may start only after its write completed
            # (write-while-read hazard), so each chain is serial but the k
            # chains overlap in the DMA engines.
            for j in range(min(k, n_chunks)):
                in_dma(j, j).start()

            def body(i, _):
                slot = i % k
                in_dma(slot, i).wait()
                out_dma(slot, i).start()
                out_dma(slot, i).wait()

                @pl.when(i + k < n_chunks)
                def _():
                    in_dma(slot, i + k).start()

                return 0

            jax.lax.fori_loop(0, n_chunks, body, 0)
            o_done[:, :] = jnp.full((8, 128), s_ref[0], jnp.float32)

        def run(xx, s):
            _, done = pl.pallas_call(
                kernel,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct(x.shape, xx.dtype),
                    jax.ShapeDtypeStruct((8, 128), jnp.float32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((k, cb, cols), xx.dtype),
                    pltpu.SemaphoreType.DMA((k,)),
                    pltpu.SemaphoreType.DMA((k,)),
                ],
            )(s[None].astype(jnp.float32), xx)
            return done

        return run

    ks = (2, 4) if args.quick else (2, 3, 4)
    cbs = (1024,) if args.quick else (512, 1024)
    for k in ks:
        for cb in cbs:
            timed(f"manual read  f32 k={k} cb={cb}", make_manual_read(x32, k, cb), x32, gb)
    for k in ks:
        for cb in cbs:
            timed(f"manual write f32 k={k} cb={cb}", make_manual_write(x32, k, cb), x32, gb)
    for k in ks:
        for cb in cbs:
            timed(f"manual copy  f32 k={k} cb={cb}", make_manual_copy(x32, k, cb), x32, 2 * gb)
    if not args.quick:
        # VMEM cap: k*cb*cols*4 <= ~12 MB
        timed("manual read  f32 k=2 cb=2048", make_manual_read(x32, 2, 2048), x32, gb)
        timed("manual read  f32 k=6 cb=512", make_manual_read(x32, 6, 512), x32, gb)
        timed("manual read  f32 k=8 cb=512", make_manual_read(x32, 8, 512), x32, gb)
        timed("manual read  f32 k=8 cb=1024", make_manual_read(x32, 8, 1024), x32, gb)
        timed("manual read  bf16 k=3 cb=1024", make_manual_read(x16, 3, 1024), x16, gb)
        timed("manual copy  bf16 k=3 cb=1024", make_manual_copy(x16, 3, 1024), x16, 2 * gb)
        timed("manual copy  f32 k=8 cb=512", make_manual_copy(x32, 8, 512), x32, 2 * gb)

    # ---------------- whole-array HBM->HBM DMA ----------------
    def hbm2hbm(x):
        def kernel(s_ref, x_hbm, o_hbm, o_done, sem):
            dma = pltpu.make_async_copy(x_hbm, o_hbm, sem)
            dma.start()
            dma.wait()
            o_done[:, :] = jnp.full((8, 128), s_ref[0], jnp.float32)

        def run(xx, s):
            _, done = pl.pallas_call(
                kernel,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct(x.shape, x.dtype),
                    jax.ShapeDtypeStruct((8, 128), jnp.float32),
                ],
                scratch_shapes=[pltpu.SemaphoreType.DMA],
            )(s[None].astype(jnp.float32), xx)
            return done

        return run

    timed("hbm->hbm whole-array DMA (r+w)", hbm2hbm(x32), x32, 2 * gb)

    if results:
        best = max(results, key=lambda r: r["gbps"])
        print(f"\nbest: {best['config']}  {best['gbps']:.1f} GB/s")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
