#!/usr/bin/env python3
"""Real-MIDI end-to-end micro-corpus run (VERDICT-r3 item 4).

The reference trained on 1282 real MIDI files that are not shipped; the only
real musical artifacts in the repo are its 16 golden generations
(good_gens1/ + generated_tests/, 2 per emotion each). This script runs them
through the ENTIRE pipeline as a micro-corpus — preprocess → splits → VAE →
encode → ED → WGAN-GP → sample → analyze/gate — so every stage is exercised
on real reference-produced MIDI, not just the synthetic corpus.

Batch sizes are adapted to the corpus size (11 train rows can't fill the
reference batch 32; documented below), everything else keeps reference
hyperparameters. Appends a summary section to RESULTS.md.

Usage: python scripts/real_midi_run.py [WORKDIR] [--reference DIR]
"""
import csv
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_manifest(reference_dir: str, out_csv: str) -> int:
    paths = sorted(
        glob.glob(os.path.join(reference_dir, "good_gens1", "*.mid"))
        + glob.glob(os.path.join(reference_dir, "generated_tests", "*.mid"))
    )
    if len(paths) < 16:
        raise SystemExit(f"expected 16 golden artifacts, found {len(paths)}")
    os.makedirs(os.path.dirname(out_csv), exist_ok=True)
    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["file_key", "emotion", "source", "full_path"])
        w.writeheader()
        for p in paths:
            emotion = os.path.basename(p).split("_")[1]
            key = (os.path.basename(os.path.dirname(p)) + "_"
                   + os.path.splitext(os.path.basename(p))[0])
            w.writerow(dict(file_key=key, emotion=emotion,
                            source=os.path.basename(os.path.dirname(p)),
                            full_path=p))
    return len(paths)


def main_augmented(workdir=None, reference_dir="/root/reference",
                   per_song=40, use_tpu=True, gan_fm=None):
    """Augmentation-expanded REAL-MIDI regime (VERDICT-r4 item 3): the 16
    reference artifacts × (1 + per_song) variants each → a few-hundred-song
    real-derived corpus, trained at REFERENCE hyperparameters (batch 32,
    critic 5, the full epoch counts), then gated + latent-structure-checked +
    judge-ED-evaluated. Appends a summary section to RESULTS.md."""
    import jax

    if not use_tpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        cache = os.path.join(REPO, ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from melogan_tpu.cli import main as cli

    workdir = workdir or os.path.join(REPO, "experiments", "real_midi_aug")
    os.makedirs(workdir, exist_ok=True)
    manifest = os.path.join(workdir, "data", "manifest.csv")
    n_src = build_manifest(reference_dir, manifest)
    data_root = os.path.join(workdir, "data")
    cli(["augment-corpus", "--manifest", manifest, "--out", data_root,
         "--per-song", str(per_song), "--ratios", "0.5/0.25/0.25",
         "--seed", "42"])
    cli(["split-arrays", "--splits-dir", os.path.join(data_root, "splits"),
         "--processed-dir", os.path.join(data_root, "processed")])

    # REFERENCE hyperparameters; AE gets the free-bits floor (the documented
    # anti-collapse deviation the synthetic full-scale demo also uses)
    args = ["pipeline", "--workdir", workdir, "--manifest", manifest,
            "--resume",
            "--ae-config", os.path.join(REPO, "configs/ae_freebits.yaml"),
            "--ed-config", os.path.join(REPO, "configs/ed.yaml"),
            "--gan-config", os.path.join(REPO, "configs/gan.yaml"),
            "--skip-quality-gate"]
    if gan_fm is not None:
        args += ["--gan-fm", str(gan_fm)]
    cli(args)

    gen_dir = os.path.join(workdir, "generated_tests")
    from melogan_tpu.diagnostics.quality import gate_directory

    gate = gate_directory(gen_dir)
    n_pass = sum(1 for e in gate.get("files", {}).values() if not e["violations"])
    n_tot = len(gate.get("files", {}))

    import numpy as np

    from melogan_tpu.data.datasets import load_split
    from melogan_tpu.diagnostics.diagnose import latent_emotion_structure

    feats = np.load(os.path.join(workdir, "data/splits/train/encoder_feats.npy"))
    td = load_split(os.path.join(workdir, "data/splits/train_split.csv"),
                    os.path.join(workdir, "data/processed"), verbose=False)
    m = min(feats.shape[0], td.n)
    struct = latent_emotion_structure(feats[:m], td.emotion_idx[:m])
    stds = feats.std(axis=0)

    # judge-ED on fresh samples (judge trains on the held-out val split)
    cli(["eval-gen", "--workdir", workdir,
         "--config", os.path.join(REPO, "configs/gan.yaml"),
         "--ed-config", os.path.join(REPO, "configs/ed.yaml"),
         "--splits-dir", os.path.join(data_root, "splits"),
         "--processed-dir", os.path.join(data_root, "processed"),
         "--samples", "8"])
    judge = json.load(open(os.path.join(workdir, "eval_gen.json")))

    summary = {
        "n_sources": n_src, "per_song": per_song, "train_rows": td.n,
        "gate": f"{n_pass}/{n_tot}",
        "mu_std_min": float(stds.min()), "mu_std_max": float(stds.max()),
        "knn": struct["knn_accuracy"], "chance": struct["chance"],
        "silhouette": struct["silhouette"],
        "judge_overall": judge["accuracy"],
        "judge_per_emotion": {e: v["accuracy"]
                              for e, v in judge["per_emotion"].items()},
        "judge_real_overall": (judge.get("judge_real") or {}).get("accuracy"),
        "gan_fm": gan_fm,
    }
    with open(os.path.join(workdir, "real_midi_aug_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(f"[real-midi-aug] {summary}")

    lines = [
        "",
        "## Real-MIDI augmentation-expanded run "
        f"(16 reference artifacts x (1+{per_song}) variants)",
        "",
        f"The 16 reference-produced artifacts expanded through the "
        f"reference's own 5 augmentations (`melogan augment-corpus`, "
        f"grouped-by-source splits — no variant of an eval song appears in "
        f"training in any form) into {td.n} train rows; full pipeline at "
        f"REFERENCE hyperparameters (batch 32, critic_iters 5"
        + (f", λ_fm={gan_fm}" if gan_fm is not None else "") + ").",
        f"Latent µ space: std {stds.min():.3f}-{stds.max():.3f}, "
        f"LOO {struct['k']}-NN emotion accuracy "
        f"**{struct['knn_accuracy']:.0%}** over {struct['n']} latents "
        f"(chance {struct['chance']:.0%}), "
        f"silhouette {struct['silhouette']:.2f}.",
        f"Golden-band gate on fresh samples: **{n_pass}/{n_tot}**; "
        f"judge-ED {judge['accuracy']:.1%} overall ("
        + " / ".join(f"{e} {v['accuracy']:.0%}"
                     for e, v in judge["per_emotion"].items()) + ")"
        + (f"; judge calibration on REAL held-out test rows: "
           f"{judge['judge_real']['accuracy']:.0%} over "
           f"{judge['judge_real']['n']} rows — the generated-sample number "
           f"is bounded by what this judge can resolve"
           if judge.get("judge_real") else "") + ".",
    ]
    with open(os.path.join(REPO, "RESULTS.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    return summary


def main(workdir=None, reference_dir="/root/reference"):
    import jax

    jax.config.update("jax_platforms", "cpu")  # tiny corpus: CPU is fine and
    # keeps the single-client TPU free

    from melogan_tpu.cli import main as cli

    workdir = workdir or os.path.join(REPO, "experiments", "real_midi_run")
    os.makedirs(workdir, exist_ok=True)
    manifest = os.path.join(workdir, "data", "manifest.csv")
    n = build_manifest(reference_dir, manifest)
    print(f"[real-midi] manifest: {n} reference artifacts")

    # micro-corpus adaptations (documented deviation — 11 train rows):
    # batch sizes shrink so the GAN actually performs generator updates
    # (11 rows at the reference batch 32 would yield zero batches); all
    # other hyperparameters are the reference values.
    cfgs = {}
    cfg_dir = os.path.join(workdir, "configs")
    os.makedirs(cfg_dir, exist_ok=True)
    with open(os.path.join(cfg_dir, "ae.yaml"), "w") as f:
        f.write("BATCH_SIZE: 8\nEPOCHS: 60\nFREE_BITS: 0.25\nRECON_SAVE_COUNT: 2\n")
    with open(os.path.join(cfg_dir, "ed.yaml"), "w") as f:
        f.write("input_mode: notes\nbatch_size: 4\nnum_epochs: 30\n")
    with open(os.path.join(cfg_dir, "gan.yaml"), "w") as f:
        f.write("INTEGRATION_MODE: warm_start\nBATCH_SIZE: 4\nCRITIC_ITERS: 2\n"
                "EPOCHS: 40\nSAVE_FREQ: 5\n")
    cfgs = {k: os.path.join(cfg_dir, f"{k}.yaml") for k in ("ae", "ed", "gan")}

    # data stages by hand first: 16 files at the default 70/15/15 stratified
    # cut leave the test split EMPTY (0.6 files/emotion rounds to zero), so
    # the micro-corpus uses 0.5/0.25/0.25 (make-splits --ratios). The
    # pipeline then runs with --resume and skips the existing data stages.
    data_root = os.path.join(workdir, "data")
    cli(["preprocess", "--manifest", manifest,
         "--out", os.path.join(data_root, "processed")])
    cli(["make-splits", "--manifest", manifest,
         "--out", os.path.join(data_root, "splits"),
         "--ratios", "0.5/0.25/0.25", "--seed", "42"])
    cli(["split-arrays", "--splits-dir", os.path.join(data_root, "splits"),
         "--processed-dir", os.path.join(data_root, "processed")])
    cli(["pipeline", "--workdir", workdir, "--manifest", manifest, "--resume",
         "--ae-config", cfgs["ae"], "--ed-config", cfgs["ed"],
         "--gan-config", cfgs["gan"], "--skip-quality-gate"])

    # gate + analyze the fresh samples (recorded, not fatal: 11 training
    # songs is far below any regime where the gate is a fair bar)
    gen_dir = os.path.join(workdir, "generated_tests")
    from melogan_tpu.diagnostics.quality import gate_directory

    gate = gate_directory(gen_dir)
    n_pass = sum(1 for e in gate.get("files", {}).values() if not e["violations"])
    n_tot = len(gate.get("files", {}))

    # latent structure on the real-MIDI corpus
    import numpy as np

    from melogan_tpu.data.datasets import load_split
    from melogan_tpu.diagnostics.diagnose import latent_emotion_structure

    feats = np.load(os.path.join(workdir, "data/splits/train/encoder_feats.npy"))
    td = load_split(os.path.join(workdir, "data/splits/train_split.csv"),
                    os.path.join(workdir, "data/processed"), verbose=False)
    m = min(feats.shape[0], td.n)
    struct = latent_emotion_structure(feats[:m], td.emotion_idx[:m], k=3)
    stds = feats.std(axis=0)

    summary = {
        "n_files": n, "train_rows": td.n,
        "gate": f"{n_pass}/{n_tot}",
        "mu_std_min": float(stds.min()), "mu_std_max": float(stds.max()),
        "knn": struct["knn_accuracy"], "silhouette": struct["silhouette"],
    }
    with open(os.path.join(workdir, "real_midi_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(f"[real-midi] {summary}")

    lines = [
        "",
        "## Real-MIDI end-to-end run (the 16 reference artifacts as a micro-corpus)",
        "",
        f"All 16 reference-produced `.mid` artifacts (good_gens1 + "
        f"generated_tests) ran the FULL pipeline as real input data "
        f"(`scripts/real_midi_run.py`): preprocess → splits "
        f"({td.n} train rows) → free-bits VAE (60 ep) → encode → ED (30 ep) "
        f"→ WGAN-GP (40 ep, batch 4 / critic 2 — the documented micro-corpus "
        f"batch adaptation) → sample → gate, on CPU.",
        f"Latent space on real MIDI: µ std {stds.min():.3f}–{stds.max():.3f}, "
        f"LOO {struct['k']}-NN emotion accuracy {struct['knn_accuracy']:.0%} "
        f"over {struct['n']} latents (chance {struct['chance']:.0%}), "
        f"silhouette {struct['silhouette']:.2f}.",
        f"Golden-band gate on the micro-corpus generator: {n_pass}/{n_tot} "
        f"(recorded honestly — {td.n} training songs is far below the regime "
        "where the gate is a fair bar; the full-scale run above is the "
        "gate's real target).",
    ]
    with open(os.path.join(REPO, "RESULTS.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    return summary


if __name__ == "__main__":
    argv = sys.argv[1:]
    ref = "/root/reference"
    if "--reference" in argv:
        i = argv.index("--reference")
        ref = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    aug = fm = None
    cpu = False
    for a in list(argv):
        if a.startswith("--augment"):
            aug = int(a.split("=", 1)[1]) if "=" in a else 40
            argv.remove(a)
        elif a.startswith("--gan-fm="):
            fm = float(a.split("=", 1)[1])
            argv.remove(a)
        elif a == "--cpu":
            cpu = True
            argv.remove(a)
    pos = [a for a in argv if not a.startswith("--")]
    if aug is not None:
        main_augmented(pos[0] if pos else None, reference_dir=ref,
                       per_song=aug, use_tpu=not cpu, gan_fm=fm)
    else:
        main(pos[0] if pos else None, reference_dir=ref)
