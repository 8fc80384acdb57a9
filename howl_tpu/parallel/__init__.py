"""Device-mesh parallelism: DP over 'data', experiment sweeps over 'seed'."""

from howl_tpu.parallel.mesh import batch_sharding, make_mesh, replicate_sharding, shard_batch

__all__ = ["batch_sharding", "make_mesh", "replicate_sharding", "shard_batch"]
