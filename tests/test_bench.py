"""bench.py's multi-chip dp measurement paths on the virtual 8-device mesh.

The driver's TPU exposes one chip, so `bench.py`'s dp section is inert there
(``n_devices == 1``); these tests prove the plumbing it would run on real
multi-chip hardware — the SAME SPMD programs as ``melogan sample/train-gan
--dp N`` — compiles and produces finite rates on the 8-device CPU mesh.
"""
import sys

import pytest

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

from melogan_tpu.config import GANConfig  # noqa: E402
from melogan_tpu.parallel.mesh import make_mesh  # noqa: E402
from melogan_tpu.sampling import Sampler  # noqa: E402


def test_bench_sampling_over_dp_mesh():
    mesh = make_mesh()  # all 8 virtual devices on the data axis
    assert mesh.shape["data"] == 8
    sampler = Sampler(GANConfig(), seed=0, mesh=mesh)
    rates = bench._bench_sampling(sampler, batch=64, iters=2, warmup=1)
    assert len(rates) == 1 and rates[0] > 0


@pytest.mark.slow
def test_bench_train_over_dp_mesh():
    # full reference shapes (512×4, batch 32, k=5) — the exact program the
    # bench would time on multi-chip hardware, one group per epoch
    mesh = make_mesh()
    rates, flops_per_step = bench._bench_train(
        iters=1, warmup=1, epochs_per_dispatch=1, groups=1, mesh=mesh
    )
    assert rates[0] > 0
    assert flops_per_step > 1e9  # ~21.8 GFLOPs analytically
