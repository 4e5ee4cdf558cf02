"""Sharded execution on the virtual 8-device CPU mesh: dp batch sharding,
tp param partitioning, and the full multichip dryrun."""
import numpy as np

import jax
import jax.numpy as jnp
import pytest

from melogan_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    partition_params,
    replicated_sharding,
)


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


@needs_8
def test_mesh_shapes():
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh1 = make_mesh(8)
    assert mesh1.shape == {"data": 8, "model": 1}


@needs_8
def test_dp_mean_matches_single_device(rng):
    """A jitted global-batch reduction over sharded data must equal the
    single-device result (XLA inserts the cross-device psum)."""
    mesh = make_mesh(8)
    x = rng.normal(size=(16, 64)).astype(np.float32)

    def f(v):
        return jnp.mean(v * v, axis=0)

    expected = np.asarray(jax.jit(f)(jnp.asarray(x)))
    xs = jax.device_put(jnp.asarray(x), batch_sharding(mesh, 2))
    got = np.asarray(jax.jit(f)(xs))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


@needs_8
def test_partition_params_rules(rng):
    mesh = make_mesh(8, model_parallel=2)
    params = {
        "big": np.zeros((128, 4096), np.float32),
        "small": np.zeros((16, 16), np.float32),
        "odd": np.zeros((3, 4097), np.float32),
        "scalar": np.zeros((), np.float32),
    }
    sh = partition_params(params, mesh, min_dim=2048)
    assert sh["big"].spec == jax.sharding.PartitionSpec(None, "model")
    assert sh["small"].spec == jax.sharding.PartitionSpec()
    assert sh["odd"].spec == jax.sharding.PartitionSpec()  # 4097 doesn't divide
    assert sh["scalar"].spec == jax.sharding.PartitionSpec()

    # sharded matmul result matches replicated matmul
    w = rng.normal(size=(128, 4096)).astype(np.float32)
    x = rng.normal(size=(8, 128)).astype(np.float32)
    expected = x @ w
    ws = jax.device_put(jnp.asarray(w), sh["big"])
    xs = jax.device_put(jnp.asarray(x), replicated_sharding(mesh))
    got = np.asarray(jax.jit(jnp.matmul)(xs, ws))
    np.testing.assert_allclose(got, expected, rtol=2e-2, atol=2e-3)


@needs_8
def test_dryrun_multichip():
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "_graft_entry",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_entry_compiles_single_chip():
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "_graft_entry2",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 512, 4)
    assert np.isfinite(np.asarray(out)).all()
