"""Atomic file writes (temp file + ``os.replace``).

Data-stage outputs double as completion markers for ``melogan pipeline
--resume``: a stage is skipped when its outputs exist. That contract only
holds if a killed write can never leave a partial file behind — a truncated
``data_manifest.csv`` that still parses as fewer rows would silently resume
a smaller corpus. The train loops already write checkpoints this way
(utils/checkpoint.py:25-40); this is the same pattern for everything else.
"""
from __future__ import annotations

import os
import tempfile
from typing import Callable


def atomic_write(path: str, write_fn: Callable, mode: str = "w", **open_kw) -> str:
    """Call ``write_fn(file_object)`` on a temp file in ``path``'s directory,
    then ``os.replace`` it into place. Readers (and existence checks) see
    either the old state or the complete new file, never a partial write."""
    dirname = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(dirname, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=dirname, suffix=".tmp")
    try:
        with os.fdopen(fd, mode, **open_kw) as f:
            write_fn(f)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path
