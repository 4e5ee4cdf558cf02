"""Multi-host (multi-process) mesh substrate.

The single-host story lives in ``parallel.mesh``; this module extends it
across hosts/slices. Design (the standard TPU-pod recipe):

- **data axis spans DCN** (the slow inter-host network): pure-DP gradient
  all-reduce is the only cross-host collective, one psum per step
- **model axis stays inside a host/slice** (ICI): tensor-parallel
  all-gathers never leave the fast fabric
- processes feed **process-local batch shards**; JAX assembles the logical
  global batch (``jax.make_array_from_process_local_data``) and the SPMD
  partitioner places the collectives

The same jitted train step serves 1 chip, 1 host × N chips, and M hosts ×
N chips — only the mesh construction differs. Verified in CI by a real
2-process CPU integration test (tests/test_multihost.py) and by
``__graft_entry__.dryrun_multihost``. See docs/multihost.md for usage.

The reference has no distributed substrate at all (SURVEY.md §2.11).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` with env-var fallbacks.

    Env vars (when args are None): ``MELOGAN_COORDINATOR`` (host:port),
    ``MELOGAN_NUM_PROCESSES``, ``MELOGAN_PROCESS_ID``. On TPU pods all three
    are auto-detected by JAX from the runtime and may stay None.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("MELOGAN_COORDINATOR")
    if num_processes is None and os.environ.get("MELOGAN_NUM_PROCESSES"):
        num_processes = int(os.environ["MELOGAN_NUM_PROCESSES"])
    if process_id is None and os.environ.get("MELOGAN_PROCESS_ID"):
        process_id = int(os.environ["MELOGAN_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_multihost_mesh(
    model_parallel: int = 1,
    axis_names: Tuple[str, str] = ("data", "model"),
):
    """(data, model) mesh over every process's devices, DCN-aware.

    Layout: data axis = (hosts × per-host-DP) with hosts OUTERMOST (so the
    data-parallel all-reduce decomposes into an intra-host ICI reduce-scatter
    + one DCN all-reduce of the partial sums); model axis never crosses a
    host. Single-process falls back to ``parallel.mesh.make_mesh``.
    """
    import jax
    from jax.sharding import Mesh

    from melogan_tpu.parallel.mesh import make_mesh

    if jax.process_count() == 1:
        return make_mesh(model_parallel=model_parallel, axis_names=axis_names)

    n_local = len(jax.local_devices())
    if n_local % model_parallel != 0:
        raise ValueError(
            f"model_parallel={model_parallel} must divide the per-host device "
            f"count {n_local} (the model axis may not cross DCN)"
        )
    local_dp = n_local // model_parallel
    try:
        from jax.experimental import mesh_utils

        grid = mesh_utils.create_hybrid_device_mesh(
            ici_mesh_shape=(local_dp, model_parallel),
            dcn_mesh_shape=(jax.process_count(), 1),
        )
    except Exception:  # noqa: BLE001 — e.g. CPU backend without slice attrs
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        grid = np.asarray(devs).reshape(
            jax.process_count() * local_dp, model_parallel
        )
    return Mesh(grid, axis_names)


def global_batch_from_local(mesh, local_batch, batch_axis: int = 0):
    """Assemble a logically-global, data-sharded array pytree from each
    process's local batch shard (the multi-host data-loading path)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        x = np.asarray(x)
        spec = [None] * x.ndim
        spec[batch_axis] = "data"
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(*spec)), x
        )

    return jax.tree_util.tree_map(put, local_batch)


def process_count() -> int:
    import jax

    return jax.process_count()
