"""A/B: population (vmapped) WGAN-GP training vs solo, full reference shapes.

Measures what `melogan sweep` buys on real hardware: K independent runs as
one vmapped program (train/sweep.py) against K sequential solo dispatches of
the same fused multi-epoch run step. At the reference batch size (32,
config/gan_config.yaml:43) a single member underfills the MXU; the
population multiplies arithmetic intensity without touching semantics
(member trajectories match solo runs — tests/test_sweep.py).

Run on the TPU (default platform): python scripts/sweep_ab.py [--bf16]
[--hyper] [K ...].  --hyper builds the population with traced per-member
hyperparameters (gan_step.HyperParams — the `sweep --hyper` path) instead of
config constants baked into the executable, to measure whether runtime
lr/λ scalars cost anything. Prints one JSON line per configuration plus a
summary.

Measured (v5e, 2026-08-19, f32 HIGHEST): K=1 800.6 agg steps/s, K=2 881.0,
K=4 953.3, K=8 972.8 — the fused solo program already nearly saturates the
chip at these shapes, so the population buys 1.22x aggregate throughput at
K=8 (plus ONE compile instead of K), not Kx. See docs/performance.md.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from melogan_tpu.config import EDConfig, GANConfig
from melogan_tpu.data.datasets import epoch_group_indices
from melogan_tpu.train import gan_step

EPOCHS_PER_CHUNK = 5
N_TRAIN = 897  # reference train split rows (data/splits/train_split.csv)


def _epoch_idx(cfg, rng, e):
    gs, ts = [], []
    for _ in range(e):
        gi, ti = epoch_group_indices(N_TRAIN, cfg.batch_size, cfg.critic_iters, rng)
        gs.append(gi)
        ts.append(ti)
    g = jnp.asarray(np.stack(gs), jnp.int32)
    t = jnp.asarray(np.stack(ts), jnp.int32) if ts[0] is not None else None
    return g, t


def main():
    argv = sys.argv[1:]
    precision = "bf16" if "--bf16" in argv else None
    hyper = "--hyper" in argv
    ks = [int(a) for a in argv if not a.startswith("--")] or [1, 2, 4, 8]
    cfg = GANConfig()  # full reference shapes: 512×4 notes, batch 32, 5:1
    ed_cfg = EDConfig()
    models = gan_step.build_models(cfg, ed_cfg)
    if hyper:
        # the traced-hyperparameter program (sweep --hyper): lr/λ are runtime
        # scalars, numerically identical at config values (tests/test_sweep.py)
        def _hyper_run(si, hi, data, gi, ti, live):
            return gan_step.make_train_steps(cfg, models, hyper=hi).run(
                si, data, gi, ti, live)
    steps = gan_step.make_train_steps(cfg, models)
    rng = np.random.default_rng(0)
    notes = rng.normal(size=(N_TRAIN, cfg.max_notes, 4)).astype(np.float32)
    data = (
        jnp.asarray(notes),
        jnp.asarray(rng.integers(0, 4, N_TRAIN).astype(np.int32)),
        jnp.zeros((N_TRAIN, cfg.latent_dim), jnp.float32),
        jnp.asarray(rng.normal(size=(N_TRAIN, 6)).astype(np.float32)),
    )
    live = jnp.ones((EPOCHS_PER_CHUNK,), bool)
    n_groups = (N_TRAIN // cfg.batch_size) // cfg.critic_iters
    steps_per_epoch = N_TRAIN // cfg.batch_size

    from melogan_tpu.train.harness import jit_with_precision

    results = {}
    for k in ks:
        states = [gan_step.init_state(cfg, models, seed=s) for s in range(k)]
        hp = None
        if hyper:
            hp = gan_step.HyperParams(*(
                jnp.full((k,), float(getattr(cfg, f)), jnp.float32)
                for f in gan_step.HyperParams._fields))
        if k == 1 and not hyper:
            st = states[0]
            fn = jit_with_precision(steps.run, precision)
            g, t = _epoch_idx(cfg, np.random.default_rng(1), EPOCHS_PER_CHUNK)
            args = (g, t)
        elif k == 1:
            st = states[0]
            fn = jit_with_precision(
                lambda s, h, gg, tt: _hyper_run(s, h, data, gg, tt, live),
                precision,
            )
            g, t = _epoch_idx(cfg, np.random.default_rng(1), EPOCHS_PER_CHUNK)
            args = (jax.tree_util.tree_map(lambda x: x[0], hp), g, t)
        else:
            st = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
            if hyper:
                fn = jit_with_precision(
                    lambda s, h, gg, tt: jax.vmap(
                        lambda si, hi, gi, ti: _hyper_run(si, hi, data, gi, ti, live),
                        in_axes=(0, 0, 0, 0),
                    )(s, h, gg, tt),
                    precision,
                )
            else:
                fn = jit_with_precision(
                    lambda s, gg, tt: jax.vmap(
                        lambda si, gi, ti: steps.run(si, data, gi, ti, live),
                        in_axes=(0, 0, 0),
                    )(s, gg, tt),
                    precision,
                )
            pairs = [_epoch_idx(cfg, np.random.default_rng(1 + i), EPOCHS_PER_CHUNK)
                     for i in range(k)]
            idx_args = (jnp.stack([p[0] for p in pairs]),
                        jnp.stack([p[1] for p in pairs]))
            args = ((hp,) + idx_args) if hyper else idx_args

        def call(st):
            if k == 1 and not hyper:
                out, m = fn(st, data, args[0], args[1], live)
            else:
                out, m = fn(st, *args)
            # force a device->host transfer of a metric: block_until_ready
            # alone has under-reported through this environment's remote
            # device tunnel; a materialized value cannot lie
            float(np.asarray(m["loss_d_sum"]).sum())
            return out

        t0 = time.perf_counter()
        st = call(st)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            st = call(st)
            times.append(time.perf_counter() - t0)
        wall = min(times)
        member_epochs = EPOCHS_PER_CHUNK * k
        row = {
            "k": k,
            "precision": precision or "f32",
            "hyper": hyper,
            "compile_s": round(compile_s, 1),
            "chunk_wall_s": round(wall, 4),
            "member_epochs_per_s": round(member_epochs / wall, 2),
            "agg_steps_per_s": round(member_epochs * steps_per_epoch / wall, 1),
        }
        results[k] = row
        print(json.dumps(row), flush=True)

    if 1 in results:
        base = results[1]["agg_steps_per_s"]
        for k, row in results.items():
            print(f"K={k}: {row['agg_steps_per_s']} agg steps/s "
                  f"({row['agg_steps_per_s'] / base:.2f}x solo throughput, "
                  f"{row['agg_steps_per_s'] / base / k:.2f} efficiency)")


if __name__ == "__main__":
    main()
