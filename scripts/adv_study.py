#!/usr/bin/env python3
"""Adversarial-trajectory study (VERDICT-r3 item 3).

Round-3 observation: over the 50-epoch demo run ``loss_g_adv`` climbed
0.0075 → +95.6 while the reference's fell 0.004 → −14.4 (BASELINE.md:13-15).
This script measures WHY, using the per-component tracking added in round 4:

- ``loss_g_adv = −E[D(fake)]`` is NOT gauge-invariant: a WGAN critic is only
  defined up to an additive constant (the loss ``mean(fake) − mean(real) +
  λ·GP`` and the penalty are both offset-invariant), so the absolute value of
  E[D(fake)] says nothing by itself. The invariant quantity is the
  Wasserstein estimate ``W = E[D(real)] − E[D(fake)]``.
- The generator has no final activation (reference models.py:57-62 contract),
  so fakes can sit OUTSIDE the [−1,1] data cube; the critic separates them by
  norm, W grows toward (and past) the cube diameter 2·sqrt(2048) ≈ 90, and
  the renderer's decode clamps (utils.py:139-146) hide it from the quality
  gate.

Variants isolate the drivers: λ_emo=0 (pure adversarial game), balanced LRs,
1:1 critic schedule. Each runs the standard gan_loop at full reference
hyperparameters otherwise. Results append to RESULTS.md and print a table.

Usage: python scripts/adv_study.py WORKDIR [EPOCHS] [--quick]
  WORKDIR: a finished demo-run workdir (corpus + splits + ED checkpoint).
  --quick: tiny epochs for smoke-testing the harness on CPU.
"""
import dataclasses
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_variant(name, cfg, ed_cfg, train_data, latents, ed_variables, workdir, epochs):
    import numpy as np

    from melogan_tpu.sampling import Sampler
    from melogan_tpu.train import gan_loop

    vdir = os.path.join(workdir, "adv_study", name)
    state, metrics = gan_loop.train(
        cfg, ed_cfg, train_data, latents=latents, ed_variables=ed_variables,
        workdir=vdir, verbose=False, epochs=epochs,
    )
    # trajectory from the metrics log (one row per tag per step)
    log = os.path.join(vdir, cfg.log_dir, "metrics.jsonl")
    rows = [json.loads(l) for l in open(log)] if os.path.exists(log) else []
    w_rows = [r for r in rows if r.get("tag") == "Critic/Wasserstein"]
    first = {"Critic/Wasserstein": w_rows[0]["value"]} if w_rows else {}
    last = metrics

    # generated-notes geometry vs the real data cube
    sampler = Sampler(
        cfg,
        gen_variables={"params": state.gen_params, "batch_stats": state.gen_stats},
        fe_variables={"params": state.fe_params},
        seed=0,
    )
    notes = sampler.sample_notes(
        [e for e in ("happy", "sad", "angry", "calm") for _ in range(8)], seed=5
    )
    out_frac = float((np.abs(notes) > 1.0).mean())
    out_max = float(np.abs(notes).max())
    return {
        "variant": name,
        "W_first": first.get("Critic/Wasserstein"),
        "W_last": last.get("Critic/Wasserstein"),
        "d_real_last": last.get("Critic/d_real"),
        "d_fake_last": last.get("Critic/d_fake"),
        "loss_g_adv_last": last.get("Loss/Generator_Adv"),
        "loss_g_emo_last": last.get("Loss/Generator_Emo"),
        "gp_last": last.get("Critic/gp"),
        "fake_outside_cube_frac": out_frac,
        "fake_abs_max": out_max,
    }


def main(workdir, epochs=50, quick=False, gan_config=None, ed_config=None):
    import jax

    cache = os.path.join(REPO, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from melogan_tpu.config import EDConfig, GANConfig
    from melogan_tpu.data.datasets import load_split
    from melogan_tpu.utils.checkpoint import load_checkpoint

    splits_dir = os.path.join(workdir, "data/splits")
    processed = os.path.join(workdir, "data/processed")
    train_data = load_split(
        os.path.join(splits_dir, "train_split.csv"), processed, verbose=False
    )
    latents = None
    feats = os.path.join(splits_dir, "train", "encoder_feats.npy")
    if os.path.exists(feats):
        latents = np.load(feats)

    base = GANConfig.from_yaml(gan_config or os.path.join(REPO, "configs/gan.yaml"))
    ed_cfg = EDConfig.from_yaml(ed_config or os.path.join(REPO, "configs/ed.yaml"))
    ed_ckpt = os.path.join(workdir, ed_cfg.checkpoint_dir, "ed_best.ckpt")
    ed_variables = None
    if os.path.exists(ed_ckpt):
        raw = load_checkpoint(ed_ckpt)
        ed_variables = {"params": raw["params"],
                        "batch_stats": raw.get("batch_stats", {})}
    else:
        print(f"[WARN] no ED checkpoint at {ed_ckpt}; emotion loss uses a RANDOM ED")

    if quick:
        base = dataclasses.replace(
            base, gen_hidden=64, noise_dim=32, save_freq=2,
            batch_size=min(base.batch_size, max(2, train_data.n // 4)),
        )
        epochs = min(epochs, 4)

    variants = {
        "baseline": base,
        "no_emo_loss": dataclasses.replace(base, lambda_emotion=0.0),
        "balanced_lr": dataclasses.replace(base, lr_d=2e-4, lr_g=2e-4),
        "critic_1to1": dataclasses.replace(base, critic_iters=1),
    }
    results = []
    for name, cfg in variants.items():
        print(f"[study] training variant {name} ({epochs} epochs)...")
        results.append(
            run_variant(name, cfg, ed_cfg, train_data, latents, ed_variables,
                        workdir, epochs)
        )
        r = results[-1]

        def _f(v):
            return "n/a" if v is None else f"{v:.3f}"

        print(f"[study] {name}: W {_f(r['W_first'])} -> {_f(r['W_last'])}"
              f" | d_fake {_f(r['d_fake_last'])}"
              f" | g_adv {_f(r['loss_g_adv_last'])}"
              f" | fakes outside cube {r['fake_outside_cube_frac']:.1%}"
              f" (|x|max {r['fake_abs_max']:.2f})")

    out = os.path.join(workdir, "adv_study", "results.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"[study] wrote {out}")
    return results


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(
        args[0],
        epochs=int(args[1]) if len(args) > 1 else 50,
        quick="--quick" in sys.argv,
    )
