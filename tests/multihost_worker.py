"""Worker for the 2-process jax.distributed test (run by test_multihost.py).

Usage: python tests/multihost_worker.py <port> <process_id>

Each process exposes 2 virtual CPU devices; after initialize_multihost the
global device count is 4 and a (seed=2, data=2) mesh spans both processes, so
the data-parallel gradient psum of the toy train step rides the distributed
backend (the DCN story of SURVEY.md §5 / parallel/mesh.py:27).
"""

import os
import sys

port, process_id = sys.argv[1], int(sys.argv[2])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from howl_tpu.parallel.mesh import initialize_multihost, make_mesh  # noqa: E402

initialize_multihost(f"localhost:{port}", num_processes=2, process_id=process_id)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

mesh = make_mesh(seed=2, data=2)

# global batch sharded over BOTH axes and hosts: the mesh rows are
# [[d0, d1], [d2, d3]] so each process owns one full seed row; the jitted
# mean below is a cross-host collective
local = np.full((1, 4, 8), float(process_id + 1), np.float32)  # (seed, data, feat)
global_batch = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("seed", "data", None)), local, global_shape=(2, 4, 8)
)

# toy DP train step: grad of mean-squared output, psum'd over data by GSPMD
w = jax.device_put(np.ones((8,), np.float32), NamedSharding(mesh, P()))


@jax.jit
def step(w, x):
    def loss(w):
        return jnp.mean((x @ w) ** 2)

    return jax.grad(loss)(w), loss(w)


grad, loss_val = step(w, global_batch.reshape(8, 8))
loss_host = float(jax.device_get(loss_val))
# halves are all-1s and all-2s: mean((x@w)^2) = mean of (8^2, 16^2) = 160
assert abs(loss_host - 160.0) < 1e-4, loss_host
grad_host = np.asarray(jax.device_get(grad))
assert np.isfinite(grad_host).all()
print(f"MULTIHOST_OK process={process_id} loss={loss_host}")
