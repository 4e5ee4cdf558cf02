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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    ref = "/root/reference"
    if "--reference" in sys.argv:
        ref = sys.argv[sys.argv.index("--reference") + 1]
    main(args[0] if args else None, reference_dir=ref)
