#!/usr/bin/env python3
"""Sampling-throughput batch sweep on the current device.

Finds the throughput-optimal batch for the jitted generator pipeline —
the per-dispatch overhead (remote-device tunnel RTT) amortizes with batch, so
peak samples/sec/chip sits at large batches."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(REPO, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from melogan_tpu.config import GANConfig
    from melogan_tpu.sampling import Sampler

    sampler = Sampler(GANConfig(), seed=0)
    for batch in (128, 512, 2048, 8192, 16384, 32768):
        idx = jnp.zeros((batch,), jnp.int32)
        step = sampler._step
        for i in range(2):
            jax.block_until_ready(
                step(sampler.gen_variables, sampler.fe_variables,
                     jax.random.PRNGKey(i), idx, batch=batch)
            )
        iters = max(3, 2048 // batch)
        t0 = time.perf_counter()
        for i in range(iters):
            out = step(sampler.gen_variables, sampler.fe_variables,
                       jax.random.PRNGKey(100 + i), idx, batch=batch)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"batch {batch:5d}: {batch * iters / dt:12.1f} samples/s "
              f"({dt / iters * 1e3:7.2f} ms/batch)", flush=True)


if __name__ == "__main__":
    main()
