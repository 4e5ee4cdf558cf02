"""Checkpointing with real resume support.

The reference saves torch ``state_dict`` blobs with no resume logic (SURVEY.md
§5: optimizers saved but never reloaded). Here checkpoints are msgpack-encoded
pytrees (flax.serialization) carrying params, optimizer state, mutable model
state (batch stats) and step metadata, with atomic writes and a real
``restore`` path. Artifact names mirror the reference layout
(``ae_best``, ``ed_best``, ``gan_final``, periodic ``gan_epochNNNN``).
"""
from __future__ import annotations

import os
import tempfile
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, tree: Dict[str, Any]) -> str:
    """Atomically serialize a pytree dict to ``path`` (msgpack)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    # to_state_dict first: optax states are (named)tuples, which msgpack
    # cannot serialize directly
    data = serialization.msgpack_serialize(
        serialization.to_state_dict(_to_host(tree))
    )
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path)), suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Load a checkpoint; with ``target`` given, restores into its structure
    (validating shapes), else returns the raw pytree of numpy arrays."""
    with open(path, "rb") as f:
        data = f.read()
    tree = serialization.msgpack_restore(data)
    if target is not None:
        return serialization.from_state_dict(target, tree)
    return tree


def latest_checkpoint(directory: str, prefix: str) -> Optional[str]:
    """Newest ``<prefix>*.ckpt`` in ``directory`` by trailing number, if any."""
    if not os.path.isdir(directory):
        return None
    cands = [f for f in os.listdir(directory) if f.startswith(prefix) and f.endswith(".ckpt")]
    if not cands:
        return None

    def keyfn(name: str):
        digits = "".join(c for c in name if c.isdigit())
        return int(digits) if digits else -1

    return os.path.join(directory, max(cands, key=keyfn))
