"""Multi-host substrate: 2-process CPU integration (real jax.distributed
processes over localhost gRPC — the DCN analog) + single-process fallbacks."""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from melogan_tpu.parallel import distributed
from melogan_tpu.parallel.mesh import make_mesh


def test_make_multihost_mesh_single_process_fallback():
    mesh = distributed.make_multihost_mesh(model_parallel=2)
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["model"] == 2
    assert mesh.shape["data"] * 2 == len(jax.devices())


def test_global_batch_from_local_single_process():
    mesh = make_mesh(model_parallel=1)
    x = np.arange(16, dtype=np.float32).reshape(8, 2)
    g = distributed.global_batch_from_local(mesh, {"x": x})["x"]
    assert g.shape == (8, 2)
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(g)
    assert float(total) == float(x.sum())


def test_initialize_env_fallbacks(monkeypatch):
    """initialize() pulls coordinator/process config from env vars."""
    calls = {}

    def fake_init(coordinator_address=None, num_processes=None, process_id=None):
        calls.update(
            addr=coordinator_address, n=num_processes, pid=process_id
        )

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.setenv("MELOGAN_COORDINATOR", "10.0.0.1:1234")
    monkeypatch.setenv("MELOGAN_NUM_PROCESSES", "4")
    monkeypatch.setenv("MELOGAN_PROCESS_ID", "3")
    distributed.initialize()
    assert calls == {"addr": "10.0.0.1:1234", "n": 4, "pid": 3}


def test_two_process_gan_group_step():
    """The full fused WGAN-GP group step over a REAL 2-process mesh: two OS
    processes, each with 2 CPU devices, joined via jax.distributed; the data
    axis spans processes (the DCN dimension), model axis stays process-local.
    Workers assert finite metrics; any failure propagates here."""
    import __graft_entry__ as ge

    ge.dryrun_multihost(n_processes=2, local_devices=2, timeout=600)
