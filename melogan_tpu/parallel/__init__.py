"""Distributed substrate: device meshes, shardings, and collective helpers.

The reference is single-GPU with no distributed backend (SURVEY.md §2.11); the
TPU framework's first-class equivalents are ``jax.sharding.Mesh`` + jit
shardings, with XLA inserting ICI collectives. Data parallelism shards the
batch axis; tensor parallelism shards wide parameter matrices via pattern
rules.
"""

from melogan_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    partition_params,
    shard_pytree_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "partition_params",
    "shard_pytree_batch",
]
