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


@needs_8
def test_sharded_sampling_matches_single_device(rng):
    """Batch-sharded generator inference over the mesh must produce exactly
    the same samples as single-device execution (same rng, same params)."""
    from melogan_tpu.config import GANConfig
    from melogan_tpu.sampling import Sampler

    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    sampler = Sampler(cfg, seed=0)
    idx = jnp.zeros((16,), jnp.int32)
    key = jax.random.PRNGKey(3)

    single = np.asarray(
        sampler._step(sampler.gen_variables, sampler.fe_variables, key, idx, batch=16)
    )

    mesh = make_mesh(8)
    gen_sharded = jax.device_put(sampler.gen_variables, replicated_sharding(mesh))
    fe_sharded = jax.device_put(sampler.fe_variables, replicated_sharding(mesh))
    idx_sharded = jax.device_put(idx, batch_sharding(mesh, 1))
    sharded = np.asarray(
        sampler._step(gen_sharded, fe_sharded, key, idx_sharded, batch=16)
    )
    np.testing.assert_allclose(sharded, single, atol=1e-5)
