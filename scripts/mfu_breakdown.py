#!/usr/bin/env python3
"""Per-op device-time attribution for the fused WGAN-GP group step
(VERDICT-r3 item 6: the train-MFU ceiling was asserted, not proven).

Method: time each component of the group step as its OWN jitted program at
the exact production shapes (median of N timed calls after warm-up, device-
synchronized), and attribute the full fused step's wall against the sum.
Components:
  - critic forward (batch B and the fused 3B real/fake/interp batch)
  - gradient-penalty double-backward (the grad-of-grad program alone)
  - full critic update (loss + both backward passes + Adam)
  - generator forward (train mode, BN mutation)
  - ED forward (frozen, eval mode)
  - generator+FE update (G loss + backward + Adam)
Also measures the fused-critic-batch optimization A/B: group step with
cfg.fused_critic_batch on vs off, f32 and bf16.

Run on the TPU (default platform); CPU works for plumbing smoke only.
Usage: python scripts/mfu_breakdown.py [--quick] [--out PATH]
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def med_time(fn, *args, n=20, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main(quick=False, out_path=None):
    import jax

    cache = os.path.join(REPO, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from melogan_tpu.config import EDConfig, GANConfig
    from melogan_tpu.train import gan_step
    from melogan_tpu.train.harness import jit_with_precision

    dev = jax.devices()[0]
    print(f"[mfu] device: {dev.platform} {getattr(dev, 'device_kind', '')}")

    cfg = GANConfig() if not quick else GANConfig(
        max_notes=64, gen_hidden=64, noise_dim=32)
    ed_cfg = EDConfig() if not quick else EDConfig(
        max_notes=64, notes_blocks=2, notes_hidden=64, mlp_hidden=(32,))
    models = gan_step.build_models(cfg, ed_cfg)
    state = gan_step.init_state(cfg, models, seed=0)
    gen, critic, fe, ed = models

    rng = np.random.default_rng(0)
    b = cfg.batch_size
    real = jnp.asarray(rng.normal(size=(b, cfg.max_notes, 4)), jnp.float32)
    fake = jnp.asarray(rng.normal(size=(b, cfg.max_notes, 4)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(b, cfg.encoder_out_dim)), jnp.float32)
    emb3 = jnp.concatenate([emb, emb, emb], axis=0)
    x3 = jnp.concatenate([real, fake, real], axis=0)
    alpha = jnp.asarray(rng.uniform(size=(b, 1, 1)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=(b, cfg.noise_dim)), jnp.float32)
    numeric = jnp.asarray(rng.normal(size=(b, cfg.numeric_input_dim)), jnp.float32)
    emot = jnp.asarray(rng.integers(0, 4, size=(b,)), jnp.int32)

    report = {"device": f"{dev.platform}:{getattr(dev, 'device_kind', '')}",
              "batch": b, "critic_iters": cfg.critic_iters, "components_ms": {}}

    # -- isolated components ------------------------------------------------
    cparams = state.critic_params

    comp = {}
    comp["critic_fwd_B"] = med_time(
        jax.jit(lambda p, x, e: critic.apply({"params": p}, x, e)),
        cparams, real, emb)
    comp["critic_fwd_3B"] = med_time(
        jax.jit(lambda p, x, e: critic.apply({"params": p}, x, e)),
        cparams, x3, emb3)

    def gp_loss(p, r, f, e, a):
        return gan_step._gradient_penalty(critic, p, r, f, e, a)

    comp["gp_value"] = med_time(jax.jit(gp_loss), cparams, real, fake, emb, alpha)
    comp["gp_double_backward"] = med_time(
        jax.jit(jax.grad(gp_loss)), cparams, real, fake, emb, alpha)

    def gen_fwd(p, s, z, e):
        return gen.apply({"params": p, "batch_stats": s}, z, None, e,
                         train=True, mutable=["batch_stats"])

    comp["gen_fwd_train"] = med_time(
        jax.jit(gen_fwd), state.gen_params, state.gen_stats, noise, emb)

    ed_vars = {"params": state.ed_params}
    if state.ed_stats:
        ed_vars["batch_stats"] = state.ed_stats
    comp["ed_fwd"] = med_time(
        jax.jit(lambda v, x: ed.apply(v, x, train=False)), ed_vars, real)

    # -- fused steps: fused-critic-batch A/B at f32 and bf16 ----------------
    k = cfg.critic_iters
    batches = tuple(
        jnp.asarray(v) for v in (
            rng.normal(size=(k, b, cfg.max_notes, 4)).astype(np.float32),
            rng.integers(0, 4, size=(k, b)).astype(np.int32),
            rng.normal(size=(k, b, cfg.latent_dim)).astype(np.float32),
            rng.normal(size=(k, b, cfg.numeric_input_dim)).astype(np.float32),
        )
    )
    ab = {}
    for fused in (True, False):
        cfg_v = dataclasses.replace(cfg, fused_critic_batch=fused)
        models_v = gan_step.build_models(cfg_v, ed_cfg)
        for prec in (None, "bf16"):
            label = f"group_{'fused' if fused else 'ref'}_{prec or 'f32'}"
            step = jit_with_precision(
                gan_step.make_train_steps(cfg_v, models_v).group, prec)
            ab[label] = med_time(step, state, batches)
            print(f"[mfu] {label}: {ab[label] * 1e3:.2f} ms")

    report["components_ms"] = {n: round(v * 1e3, 3) for n, v in comp.items()}
    report["group_step_ms"] = {n: round(v * 1e3, 3) for n, v in ab.items()}
    # attribution: one group step = k critic updates + 1 G update.
    # critic update ≈ fused fwd(3B) + double-backward(GP+loss) ≈ measured
    # gp_double_backward (dominant) + critic_fwd; G update ≈ gen_fwd +
    # critic_fwd_B + ed_fwd + backward (≈ 2× fwd).
    est = (cfg.critic_iters * (comp["critic_fwd_3B"] + comp["gp_double_backward"])
           + comp["gen_fwd_train"] + comp["critic_fwd_B"] + comp["ed_fwd"])
    report["attribution"] = {
        "k_x_(critic_fwd_3B+gp_double_backward)_ms": round(
            cfg.critic_iters * (comp["critic_fwd_3B"] + comp["gp_double_backward"]) * 1e3, 3),
        "g_update_fwd_parts_ms": round(
            (comp["gen_fwd_train"] + comp["critic_fwd_B"] + comp["ed_fwd"]) * 1e3, 3),
        "sum_of_parts_ms": round(est * 1e3, 3),
        "measured_group_fused_f32_ms": report["group_step_ms"]["group_fused_f32"],
        "parts_over_whole": round(est / ab["group_fused_f32"], 3),
    }
    speed = ab["group_ref_f32"] / ab["group_fused_f32"]
    speed_bf = ab["group_ref_bf16"] / ab["group_fused_bf16"]
    report["fused_critic_speedup"] = {"f32": round(speed, 4), "bf16": round(speed_bf, 4)}
    print(f"[mfu] fused-critic-batch speedup: f32 {speed:.3f}x, bf16 {speed_bf:.3f}x")

    out_path = out_path or os.path.join(REPO, "experiments", "mfu_breakdown.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[mfu] wrote {out_path}")
    return report


if __name__ == "__main__":
    main(quick="--quick" in sys.argv,
         out_path=next((sys.argv[i + 1] for i, a in enumerate(sys.argv)
                        if a == "--out"), None))
