"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests never require TPU hardware; multi-chip sharding paths are exercised on
XLA's host-platform virtual devices. The platform override must go through
``jax.config`` because the environment's TPU plugin hook overrides
``JAX_PLATFORMS`` at interpreter startup.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


REFERENCE_DIR = "/root/reference"


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference artifacts not available")
    return REFERENCE_DIR
