"""N-seed experiment sweep as ONE sharded program.

The reference trains N seeds as N OS processes pinned to GPUs by env var,
scheduled by polling `ps aux` (ref: training/run/eval_wake_word_detection.py:23-63).
Here the seed dimension is a mesh axis: model parameters are STACKED over a
leading seed dim and sharded on the ``seed`` axis; each seed's batch is sharded
over ``data``. One jitted vmapped train step drives all seeds concurrently —
the TPU-native replacement for the job farm (SURVEY.md §2.9).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from howl_tpu.training.state import create_train_state


def create_seed_states(model, seeds, example_feats, mesh: Mesh = None, **opt_kwargs):
    """Stacked TrainState: every leaf gains a leading (num_seeds,) dim."""

    def make(seed):
        return create_train_state(model, jax.random.PRNGKey(int(seed)), example_feats, **opt_kwargs)

    states = [make(s) for s in np.asarray(seeds)]
    # stack leaves against the first state's treedef: static fields (apply_fn,
    # tx, schedule closures) differ by identity across instances, which would
    # trip jax.tree.map's structure equality
    treedef = jax.tree.structure(states[0])
    leaves = [jax.tree.leaves(s) for s in states]
    stacked = jax.tree.unflatten(treedef, [jnp.stack(group) for group in zip(*leaves)])
    if mesh is not None:
        stacked = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P("seed", *([None] * (x.ndim - 1))))),
            stacked,
        )
    return stacked


def make_seed_sweep_step(train_step: Callable) -> Callable:
    """vmap a per-model train step over the leading seed dim.

    train_step: (state, audio, labels, lengths, key) -> (state, metrics).
    Returns (stacked_state, audio (S,B,N), labels (S,B), lengths (S,B),
    keys (S,2)) -> (stacked_state, metrics).
    """
    return jax.jit(jax.vmap(train_step))


def shard_seed_batch(batch_arrays, mesh: Mesh):
    """Place (S, B, ...) host arrays split over (seed, data)."""

    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, NamedSharding(mesh, P("seed", "data", *([None] * (x.ndim - 2)))))

    return jax.tree.map(put, batch_arrays)
