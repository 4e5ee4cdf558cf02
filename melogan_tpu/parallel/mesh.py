"""Mesh construction and sharding rules.

Axes:
- ``data``  — batch dimension (pure DP; gradient all-reduce rides ICI psum
  inserted by the SPMD partitioner inside the jitted step)
- ``model`` — optional tensor-parallel axis for wide parameter matrices
  (the generator/VAE pre-net linears are the only weights big enough to care)

All sharded programs are ordinary ``jnp`` code jitted with NamedSharding
in/out specs — no explicit collectives in model code; XLA chooses and places
psum/all-gather on ICI.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    ``model_parallel`` devices along the model axis; the rest along data.
    On a single chip this degenerates to a 1×1 mesh and all shardings become
    no-ops, so the same jitted program serves both cases.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"asked for {n_devices} devices, have {len(devices)}")
    if n_devices % model_parallel != 0:
        raise ValueError("n_devices must be divisible by model_parallel")
    grid = np.asarray(devices[:n_devices]).reshape(
        n_devices // model_parallel, model_parallel
    )
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh, ndim: int = 1, batch_axis: int = 0) -> NamedSharding:
    """Shard ``batch_axis`` over 'data', replicate the rest."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pytree_batch(tree, mesh: Mesh, batch_axis: int = 0):
    """Device-put a host pytree with its leading axis sharded over 'data'."""

    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, batch_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(put, tree)


def microbatch_constrainer(mesh: Optional[Mesh]):
    """Build ``f(tree) -> tree`` that pins each leaf's leading (batch) axis to
    the 'data' mesh axis via ``with_sharding_constraint``.

    This is how the production train steps go SPMD: the step functions are
    ordinary single-device programs; with a mesh, every microbatch entering a
    loss/update is constrained batch-over-'data' and GSPMD propagates the
    sharding through the whole program — gradient all-reduces and global
    batch-norm statistics become ICI psums chosen by XLA, with semantics
    identical (up to reduction order) to the single-device program.

    Leaves whose batch dim doesn't divide the data-axis size (or scalars) are
    left unconstrained. ``mesh=None`` returns the identity, so the same step
    code serves both cases.
    """
    if mesh is None:
        return lambda tree: tree
    n_data = mesh.shape.get("data", 1)
    if n_data <= 1:
        return lambda tree: tree

    def constrain(x):
        if getattr(x, "ndim", 0) == 0 or x.shape[0] % n_data != 0:
            return x
        spec = [None] * x.ndim
        spec[0] = "data"
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))

    return lambda tree: jax.tree_util.tree_map(constrain, tree)


def put_replicated(tree, mesh: Optional[Mesh]):
    """Device-put a pytree fully replicated over the mesh (identity without
    one). Used for the device-resident epoch arrays: the corpus is small
    (~7 MB at reference scale), so replicating it and sharding only the
    gathered microbatches avoids cross-device gathers on the index path."""
    if mesh is None:
        return tree
    return jax.device_put(tree, replicated_sharding(mesh))


# ---------------------------------------------------------------------------
# Tensor-parallel parameter partitioning
# ---------------------------------------------------------------------------


def _default_rule(path: str, shape: Tuple[int, ...], min_dim: int) -> P:
    """Shard the widest dimension of large matrices over 'model'."""
    if len(shape) >= 2 and max(shape) >= min_dim:
        widest = int(np.argmax(shape))
        spec = [None] * len(shape)
        spec[widest] = "model"
        return P(*spec)
    return P()


def partition_params(
    params,
    mesh: Mesh,
    min_dim: int = 2048,
    rules: Optional[Dict[str, P]] = None,
):
    """Build a NamedSharding pytree for a param tree.

    ``rules`` maps path substrings to explicit PartitionSpecs; unmatched params
    fall back to sharding the widest dim of any matrix with a dimension
    ≥ ``min_dim`` over the 'model' axis (replicated if the mesh has no model
    axis or the dim doesn't divide).
    """
    model_size = mesh.shape.get("model", 1)

    def assign(path, leaf):
        pathstr = jax.tree_util.keystr(path)
        spec = None
        if rules:
            for frag, p in rules.items():
                if frag in pathstr:
                    spec = p
                    break
        if spec is None:
            spec = _default_rule(pathstr, np.shape(leaf), min_dim)
        # drop specs that don't divide evenly
        if model_size > 1:
            dims = np.shape(leaf)
            ok = all(
                s is None or (dims[i] % model_size == 0)
                for i, s in enumerate(spec)
                if i < len(dims)
            )
            if not ok:
                spec = P()
        else:
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, params)
