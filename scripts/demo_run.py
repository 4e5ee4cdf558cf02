#!/usr/bin/env python3
"""Full-scale end-to-end demo run on TPU.

Mirrors the reference's training regime on a synthetic corpus of the same
size (320 songs/emotion ≈ the reference's 1282): preprocess → splits → VAE
(100 epochs) → latent export → ED (50 epochs) → WGAN-GP (50 epochs) → sampling
→ diagnostics. Writes artifacts under the workdir and a RESULTS.md summary at
the repo root.

Usage:
    python scripts/demo_run.py [WORKDIR] [PER_EMOTION] [EPOCHS]
    python scripts/demo_run.py WORKDIR --summarize   # re-summarize an existing
                                                     # run without retraining
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def summarize(workdir: str, per_emotion: int, total: float,
              track_best: bool = False):
    """Regenerate RESULTS.md from a completed demo-run workdir."""
    import numpy as np

    from melogan_tpu.utils.metrics import read_tfevents

    # summarize — only the NEWEST events file (a reused workdir accumulates
    # one file per run; merging them double-counts epochs)
    def last_scalars(log_dir, tags):
        files = sorted(
            (f for f in os.listdir(log_dir) if f.startswith("events.out")),
            key=lambda f: os.path.getmtime(os.path.join(log_dir, f)),
        )
        out = {}
        if files:
            for tag, v, s in read_tfevents(os.path.join(log_dir, files[-1])):
                if tag in tags:
                    out.setdefault(tag, []).append((s, v))
        return {t: sorted(vs) for t, vs in out.items()}

    gan_logs = last_scalars(
        os.path.join(workdir, "experiments/gan/logs"),
        ("Loss/Critic", "Loss/Generator_Adv", "Loss/Generator_Emo",
         "Critic/Wasserstein", "Critic/d_fake", "epoch_seconds"),
    )
    ae_logs = last_scalars(
        os.path.join(workdir, "experiments/ae"), ("loss/val_total", "epoch_seconds")
    )
    ed_logs = last_scalars(
        os.path.join(workdir, "data/experiments/ed"), ("acc/val", "loss/val", "epoch_seconds")
    )

    # golden-band quality gate over the fresh samples (the pipeline already
    # ran it strict on its own sample dir; record the verdict for this dir).
    # gate_directory's per-file entries carry the analyze-midi stats, so one
    # analysis pass serves both the gate and the stats table below.
    from melogan_tpu.diagnostics.quality import gate_directory

    gen_dir = os.path.join(workdir, "generated_tests")
    gate = gate_directory(gen_dir)
    n_pass = sum(1 for e in gate.get("files", {}).values() if not e["violations"])
    stats = dict(sorted(gate.get("files", {}).items()))

    def curve(tag, logs):
        vs = logs.get(tag, [])
        if not vs:
            return "n/a"
        return f"{vs[0][1]:.4f} → {vs[-1][1]:.4f} ({len(vs)} epochs)"

    def epoch_s(logs):
        # Median, not mean: every epoch in a fused chunk shares the chunk's
        # wall/len(chunk), so a cold-cache first chunk (XLA compile, minutes
        # through the remote compiler) contaminates its whole chunk. The
        # median over all epochs lands on the steady-state value.
        vs = [v for _, v in logs.get("epoch_seconds", [])]
        return f"{np.median(vs):.3f}s" if vs else "n/a"

    # per-stage wall (written by `melogan pipeline`); compile-heavy stages
    # carry the remote-compiler cold-cache variance, so show the split
    timings = None
    tpath = os.path.join(workdir, "pipeline_timings.json")
    if os.path.exists(tpath):
        timings = json.load(open(tpath))

    # latent-space verdict: collapse status + the quantitative emotion-
    # structure metrics (VERDICT-r3 item 1). The demo trains with
    # configs/ae_freebits.yaml (documented deviation), so the healthy
    # paragraph is the expected outcome; a collapse is still reported
    # honestly if it happens.
    diag_para = []
    feats = os.path.join(workdir, "data/splits/train/encoder_feats.npy")
    if os.path.exists(feats):
        mu = np.load(feats)
        stds = mu.std(axis=0)
        collapsed = bool((stds < 0.1).all())
        struct = None
        try:
            from melogan_tpu.data.datasets import load_split
            from melogan_tpu.diagnostics.diagnose import latent_emotion_structure

            td = load_split(os.path.join(workdir, "data/splits/train_split.csv"),
                            os.path.join(workdir, "data/processed"), verbose=False)
            m = min(mu.shape[0], td.n)
            struct = latent_emotion_structure(mu[:m], td.emotion_idx[:m])
        except Exception as e:  # noqa: BLE001
            print(f"[WARN] latent structure metric failed: {e}")
        if collapsed:
            diag_para = [
                "",
                "`melogan diagnose` on the trained run flags `latent_collapse` "
                f"(all {mu.shape[1]} µ dims std < 0.1) — the posterior "
                "collapsed despite the free-bits floor; reported honestly.",
            ]
        else:
            n_dead = int((stds < 0.1).sum())
            para = (
                "Latent space: NO posterior collapse — per-dim µ std "
                f"{stds.min():.3f}–{stds.max():.3f} ({n_dead}/{mu.shape[1]} dims "
                "below 0.1). The reference-exact β=10 (configs/ae.yaml) "
                "measurably collapses the posterior on this corpus (all 8 dims "
                "std < 0.1, round-3 run); the demo trains with the documented "
                "FREE_BITS=0.25 deviation (configs/ae_freebits.yaml, "
                "models/vae.py::vae_loss) which keeps the reference loss "
                "everywhere above the floor."
            )
            if struct:
                para += (
                    f" Quantitative emotion structure (melogan diagnose): "
                    f"leave-one-out {struct['k']}-NN emotion accuracy "
                    f"**{struct['knn_accuracy']:.1%}** over {struct['n']} µ "
                    f"latents (chance {struct['chance']:.0%}, pass threshold "
                    f"2x chance), silhouette {struct['silhouette']:.3f}."
                )
            diag_para = ["", para]

    # judge-ED: independent emotion accuracy of fresh samples (eval_gen.json
    # written by `melogan eval-gen`; judge trained on the held-out val split
    # with a different seed, never inside G's loss)
    judge_para = []
    ev = os.path.join(workdir, "eval_gen.json")
    if os.path.exists(ev):
        rep = json.load(open(ev))
        per = " / ".join(
            f"{e} {v['accuracy']:.0%}" if v["accuracy"] is not None else f"{e} n/a"
            for e, v in rep["per_emotion"].items()
        )
        # the judge's own competence on REAL held-out data, so the generated-
        # sample number reads as a statement about G, not about the judge
        judge_real = None
        try:
            from types import SimpleNamespace

            from melogan_tpu.config import EDConfig
            from melogan_tpu.data.datasets import load_split
            from melogan_tpu.diagnostics import judge as jm
            from melogan_tpu.utils.checkpoint import load_checkpoint

            ed_cfg = EDConfig.from_yaml(os.path.join(REPO, "configs/ed.yaml"))
            jcfg = jm.judge_config(ed_cfg)
            raw = load_checkpoint(
                os.path.join(workdir, jcfg.checkpoint_dir, "ed_best.ckpt"))
            st = SimpleNamespace(params=raw["params"],
                                 batch_stats=raw.get("batch_stats", {}))
            td = load_split(os.path.join(workdir, "data/splits/test_split.csv"),
                            os.path.join(workdir, "data/processed"), verbose=False)
            judge_real = jm.judge_notes(jcfg, st, td.notes_gan(), td.emotion_idx)
        except Exception as e:  # noqa: BLE001
            print(f"[WARN] judge real-data accuracy failed: {e}")
        real_str = (f" The judge itself scores **{judge_real['accuracy']:.0%}** "
                    f"on real held-out test data (n={judge_real['n']}), so the "
                    "generated-sample number is a statement about the "
                    "generator, not the judge." if judge_real else "")
        meta_path = os.path.join(workdir, "run_meta.json")
        run_meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}
        fm = run_meta.get("gan_fm")
        if rep["accuracy"] >= 0.5:
            context = (
                " The emotion is carried in raw NOTE SPACE, not just rendered "
                "statistics — the round-5 result (docs/emotion_study_r5.md): "
                "feature matching against per-emotion note-space/multi-scale "
                "frozen-ED centroids"
                + (f" (λ_fm={fm:g}, a documented deviation; LAMBDA_FM: 0 keeps "
                   "the exact reference loss)" if fm else "")
                + ", corpus-calibrated conditioning (checkpoints carry the "
                "train corpus's per-emotion feature centroids), and a "
                "tonal-anchored corpus. For scale: the reference's own "
                "in-loss emotion CE plateaued at 1.414 ≈ chance ln 4 — its "
                "generator never demonstrably carried emotion through its ED."
            )
        else:
            context = (
                " Context: the generator's samples carry real emotion signal "
                "in their rendered statistics (the gate above) but sit off "
                "the real-data manifold in raw note space, where the judge's "
                "confidence lives. The reference never measured this: its own "
                "in-loss emotion CE plateaued at 1.414 ≈ chance ln 4 = 1.386 "
                "(BASELINE.md)."
            )
        judge_para = [
            "",
            f"Independent judge-ED evaluation (`melogan eval-gen`): a second "
            f"emotion discriminator trained on the held-out val split (different "
            f"seed, never inside G's loss) classifies {rep['n']} fresh samples "
            f"at **{rep['accuracy']:.1%}** overall (chance {rep['chance']:.0%}); "
            f"per emotion: {per}.{real_str}{context}",
        ]

    # strict-tier gate (raw golden envelopes, no margins)
    strict_para = []
    try:
        from melogan_tpu.diagnostics.quality import gate_directory as _gd

        strict = _gd(gen_dir, tier="strict")
        sp = sum(1 for e in strict.get("files", {}).values() if not e["violations"])
        strict_para = [
            "",
            f"Strict-tier gate (raw golden envelopes, no safety margins): "
            f"{sp}/{len(strict.get('files', {}))} samples pass "
            f"(`melogan quality-gate --tier strict`; the default tier above "
            "keeps the derivation-rule margins).",
        ]
    except Exception as e:  # noqa: BLE001
        print(f"[WARN] strict gate summary failed: {e}")

    # --track-best: the pipeline sampled from the gate-tracked best
    # checkpoint rather than the final epoch; surface its provenance
    best_para = []
    best_path = os.path.join(workdir, "experiments/gan/checkpoints/gan_best.ckpt")
    if track_best and os.path.exists(best_path):
        from melogan_tpu.utils.checkpoint import load_checkpoint

        best = load_checkpoint(best_path)
        g = best.get("gate", {})
        best_para = [
            "",
            "Checkpoint selection: `--gan-track-best` gated every checkpoint "
            "cadence with fresh samples against the golden bands and kept the "
            f"winner — `gan_best.ckpt` from epoch {int(best.get('epoch', -1))} "
            f"(gate {int(g.get('passed', -1))}/{int(g.get('total', -1))}, "
            f"{int(g.get('violations', -1))} violations at selection time). "
            "The sample/serve stages consume this checkpoint instead of "
            "`gan_final.ckpt`.",
        ]

    wall = f"**{total:.1f}s**" if total else "(see git history)"
    lines = [
        "# RESULTS — end-to-end demo training run (single TPU v5e chip)",
        "",
        f"Corpus: {per_emotion * 4} synthetic emotion-labelled songs "
        "(reference regime: 1282 songs, same split ratios, same hyperparameters).",
        f"Total wall-clock for the full pipeline: {wall} "
        "(the reference trains for hours on a laptop GPU). Epoch times below "
        "are steady-state medians; the first fused chunk additionally pays "
        "one-time XLA compilation (cached across runs in `.jax_cache/`).",
        "",
        "## Training curves",
        "",
        f"- VAE val total loss: {curve('loss/val_total', ae_logs)}; "
        f"epoch time {epoch_s(ae_logs)}",
        f"- ED val accuracy: {curve('acc/val', ed_logs)}; "
        f"epoch time {epoch_s(ed_logs)}",
        f"- GAN critic loss: {curve('Loss/Critic', gan_logs)}",
        f"- GAN generator adversarial: {curve('Loss/Generator_Adv', gan_logs)}",
        f"- GAN Wasserstein estimate W = E[D(real)] − E[D(fake)]: "
        f"{curve('Critic/Wasserstein', gan_logs)} (the gauge-invariant "
        f"adversarial-balance metric; see the study paragraph)",
        f"- GAN generator emotion CE: {curve('Loss/Generator_Emo', gan_logs)} "
        f"(reference: 2.004 → 1.414 over 50 epochs)",
        f"- GAN epoch time: {epoch_s(gan_logs)} "
        "(reference: 50 epochs ≈ hours on laptop GPU)",
        "",
        "## Generated sample statistics (melogan analyze-midi)",
        "",
        "| file | bpm | notes | avg pitch | uniq pitches | avg vel | notes/s |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, s in stats.items():
        if "error" in s:
            continue
        lines.append(
            f"| {name} | {s['tempo_bpm']} | {s['n_notes']} | {s['avg_pitch']} | "
            f"{s['unique_pitches']} | {s['avg_velocity']} | {s['notes_per_sec']} |"
        )
    lines += [
        "",
        f"**Golden-band quality gate: {n_pass}/{len(gate.get('files', {}))} samples "
        f"within the per-emotion bands derived from the reference's shipped "
        f"good_gens1 artifacts** (`melogan quality-gate`, also run strict at the "
        "end of `melogan pipeline`). Re-running the pipeline reproduces these "
        "sample statistics bit-for-bit (deterministic training + sampling "
        "given the seeds).",
        "",
        "The alternative `INTEGRATION_MODE=conditioning` (AE µ-latent "
        "concatenated into the generator input, `configs/gan_conditioning.yaml`) "
        "trains at the same scale on the now-DECOLLAPSED µ latents (round-4 "
        "run: free-bits AE, kNN-100% latent space feeding the generator) and "
        "passes the same gate 8/8 (424.7 s pipeline wall; judge-ED on its "
        "samples is ≈ chance at 25.0%, same reading as warm-start mode).",
        "",
        "Serving/bench headline numbers are measured by `bench.py` and "
        "tracked in `docs/performance.md` and the `BENCH_r*.json` records "
        "(this script does not re-measure them).",
    ]
    if timings:
        stage_str = " | ".join(
            f"{s['name']} {s['seconds']:.1f}s" for s in timings["stages"]
        )
        lines += [
            "",
            f"Per-stage wall: {stage_str}. Training-stage wall is dominated "
            "by one-time XLA compilation on a cold cache (the remote "
            "compile helper's run-to-run spread is large — see "
            "docs/performance.md); the steady-state epoch medians above are "
            "the trained-throughput numbers.",
        ]
    lines += best_para
    lines += diag_para
    lines += judge_para
    lines += strict_para
    study_md = os.path.join(workdir, "adv_study", "summary.md")
    if os.path.exists(study_md):
        lines += ["", open(study_md).read().rstrip()]
    rel = os.path.relpath(workdir, REPO)
    lines += [
        "",
        f"t-SNE latent visualization: `{rel}/train_latent_tsne_visualization.png`",
        "",
        f"_All artifacts under `{rel}/` (gitignored); this file is the summary._",
    ]
    with open(os.path.join(REPO, "RESULTS.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


def main(workdir: str = None, per_emotion: int = 320, epochs: int = None,
         track_best: bool = False, gan_fm: float = None):
    import jax

    cache_dir = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from melogan_tpu.cli import main as cli

    workdir = workdir or os.path.join(REPO, "experiments", "demo_run")
    os.makedirs(workdir, exist_ok=True)
    t0 = time.time()

    # ae_freebits: the reference-exact β=10 (configs/ae.yaml) measurably
    # collapses the posterior on this corpus; the demo trains with the
    # documented FREE_BITS deviation so the latent space carries signal
    # (see configs/ae_freebits.yaml header + RESULTS.md latent paragraph)
    args = ["pipeline", "--workdir", workdir, "--synthetic",
            "--per-emotion", str(per_emotion),
            "--ae-config", os.path.join(REPO, "configs/ae_freebits.yaml"),
            "--ed-config", os.path.join(REPO, "configs/ed.yaml"),
            "--gan-config", os.path.join(REPO, "configs/gan.yaml")]
    if epochs:
        args += ["--epochs", str(epochs)]
    if track_best:
        args += ["--gan-track-best"]
    if gan_fm is not None:
        args += ["--gan-fm", str(gan_fm)]
    cli(args)

    total = time.time() - t0

    # extra samples for stats — from the same checkpoint the pipeline's own
    # sample stage used (the gate-tracked best under --track-best)
    gen_dir = os.path.join(workdir, "generated_tests")
    sample_args = ["sample", "--emotion", "all", "--samples", "2",
                   "--seed", "123",
                   "--config", os.path.join(REPO, "configs/gan.yaml"),
                   "--workdir", workdir, "--out", gen_dir]
    best_path = os.path.join(workdir, "experiments/gan/checkpoints/gan_best.ckpt")
    if track_best and os.path.exists(best_path):
        sample_args += ["--checkpoint", best_path]
    cli(sample_args)

    # diagnostics
    splits_dir = os.path.join(workdir, "data/splits")
    processed = os.path.join(workdir, "data/processed")
    cli(["diagnose", "--split", "train", "--splits-dir", splits_dir,
         "--processed-dir", processed])
    cli(["tsne", "--split", "train", "--splits-dir", splits_dir,
         "--processed-dir", processed, "--out", workdir])

    # independent judge-ED emotion accuracy of fresh samples (writes
    # eval_gen.json; judge trains on the held-out val split)
    eval_args = ["eval-gen", "--workdir", workdir,
                 "--config", os.path.join(REPO, "configs/gan.yaml"),
                 "--ed-config", os.path.join(REPO, "configs/ed.yaml"),
                 "--splits-dir", splits_dir, "--processed-dir", processed,
                 "--samples", "8"]
    if track_best and os.path.exists(best_path):
        eval_args += ["--checkpoint", best_path]
    cli(eval_args)

    # strict-tier gate verdict (raw golden envelopes) — recorded, not fatal
    try:
        cli(["quality-gate", gen_dir, "--tier", "strict", "--no-strict"])
    except SystemExit:
        pass

    with open(os.path.join(workdir, "run_meta.json"), "w") as f:
        json.dump({"wall_seconds": total, "per_emotion": per_emotion,
                   "track_best": track_best, "gan_fm": gan_fm}, f)
    summarize(workdir, per_emotion, total, track_best=track_best)


if __name__ == "__main__":
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    fm_flags = [a for a in flags if a.startswith("--gan-fm=")]
    unknown = flags - {"--summarize", "--track-best"} - set(fm_flags)
    if unknown:
        sys.exit(f"unknown flag(s): {' '.join(sorted(unknown))} "
                 "(known: --summarize --track-best --gan-fm=LAMBDA)")
    gan_fm = float(fm_flags[0].split("=", 1)[1]) if fm_flags else None
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--summarize" in flags:
        if not pos:
            sys.exit("usage: demo_run.py WORKDIR --summarize")
        wd = pos[0]
        meta_path = os.path.join(wd, "run_meta.json")
        meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}
        # An explicit --track-best overrides run_meta.json (older workdirs
        # predate the field; without the override the flag was silently
        # ignored in summarize mode).
        summarize(wd, meta.get("per_emotion", 320), meta.get("wall_seconds"),
                  track_best=("--track-best" in flags
                              or meta.get("track_best", False)))
    else:
        main(
            workdir=pos[0] if len(pos) > 0 else None,
            per_emotion=int(pos[1]) if len(pos) > 1 else 320,
            epochs=int(pos[2]) if len(pos) > 2 else None,
            track_best="--track-best" in flags,
            gan_fm=gan_fm,
        )
