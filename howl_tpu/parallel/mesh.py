"""Mesh construction + sharding helpers.

The reference had no in-process parallelism at all — multi-GPU use was one OS
process per device (ref: training/run/eval_wake_word_detection.py:23-63).
Here scale-out is a single jitted program over a `jax.sharding.Mesh`:

  * axis ``data``: batch data-parallelism. Params replicated, batch split;
    under GSPMD jit the gradient all-reduce and cross-replica BatchNorm stats
    fall out of the partitioner automatically and ride ICI.
  * axis ``seed``: the N-seeds experiment harness (one model per seed) runs as
    one program with params *sharded* on ``seed`` — replacing the reference's
    process job-farm.

Multi-host (DCN) would extend these same axes via jax.distributed.initialize;
single-program semantics are unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: str = None, num_processes: int = None, process_id: int = None):
    """Join a multi-host deployment over DCN (jax.distributed). After this,
    jax.devices() spans all hosts and make_mesh() lays the same (seed, data)
    axes across them — program semantics are unchanged (SURVEY.md §5: the
    reference has no distributed backend at all)."""
    import jax

    kwargs = {
        k: v
        for k, v in (
            ("coordinator_address", coordinator_address),
            ("num_processes", num_processes),
            ("process_id", process_id),
        )
        if v is not None
    }
    jax.distributed.initialize(**kwargs)


def make_mesh(data: int = None, seed: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """Mesh over available devices: (seed, data) axes; data fills what's left."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = max(len(devices) // seed, 1)
    if data * seed > len(devices):
        raise ValueError(
            f"mesh {seed}x{data} needs {seed * data} devices but only "
            f"{len(devices)} available ({devices[0].platform}); "
            "set JAX_PLATFORMS=cpu with --xla_force_host_platform_device_count "
            "for a virtual mesh, or lower --num-devices"
        )
    devices = devices[: data * seed]
    arr = np.array(devices).reshape(seed, data)
    return Mesh(arr, axis_names=("seed", "data"))


def batch_sharding(mesh: Mesh, ndim: int = 2, axis: str = "data") -> NamedSharding:
    """First array dim split over the data axis, rest replicated."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch_arrays, mesh: Mesh, axis: str = "data"):
    """Place host arrays onto the mesh with dim0 split over ``axis``."""

    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))))

    return jax.tree.map(put, batch_arrays)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicate_sharding(mesh))
