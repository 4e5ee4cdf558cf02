"""Command-line interface — the pipeline surface.

Mirrors the reference entry points (full_script.sh stages, the missing
src/gan/test_gan.py sampling CLI, tools/, diagnostics) as subcommands of one
binary:

  melogan synth-data        generate a synthetic emotion-labelled corpus
  melogan preprocess        raw MIDI → per-song .npz (+ scaler)
  melogan make-splits       manifest → stratified split CSVs
  melogan split-arrays      per-split fast-path .npy arrays
  melogan train-ae          Stage 1: VAE
  melogan encode            export µ latents per split (encoder_feats.npy)
  melogan train-ed          Stage 2: emotion discriminator
  melogan eval-ed           ED evaluation (the script the reference lost)
  melogan train-gan         Stage 3: WGAN-GP
  melogan sweep             Stage 3 population: K seeds — or a --hyper
                            grid of configs — as ONE vmapped program,
                            quality-gate-ranked (TPU-native; no
                            reference equivalent)
  melogan sample            emotion-conditioned .mid generation (test_gan)
  melogan pipeline          all stages end-to-end (full_script.sh)
  melogan diagnose          data-sanity diagnostics
  melogan analyze-midi      MIDI statistics
  melogan tsne              latent-space visualization
  melogan serve             HTTP serving app
  melogan bench             benchmark harness
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import numpy as np


_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _resolve_config(path, workdir="."):
    """Resolve a config path the way the reference scripts absolutize theirs
    (train_ae.py:228-247, encode.py:69-76): as given, then under --workdir,
    then under the installed repo root. None when nothing exists."""
    if not path:
        return None
    for cand in (path, os.path.join(workdir, path), os.path.join(_REPO_ROOT, path)):
        if os.path.exists(cand):
            return cand
    return None


# the argparse default per config class; ONLY these may silently fall back to
# built-in defaults (which mirror the reference YAML values) — an explicitly
# passed config path that resolves nowhere is a hard error, never a silent
# default-hyperparameter run
_CFG_DEFAULTS = {"AEConfig": "configs/ae.yaml", "EDConfig": "configs/ed.yaml",
                 "GANConfig": "configs/gan.yaml"}


def _load_cfg(cls, path, workdir="."):
    """Load a config dataclass from the resolved YAML path (so the CLI works
    from any cwd); see _CFG_DEFAULTS for the fallback rule."""
    resolved = _resolve_config(path, workdir)
    if resolved is None:
        if path != _CFG_DEFAULTS.get(cls.__name__):
            raise FileNotFoundError(
                f"config {path!r} not found (tried as given, under --workdir "
                f"{workdir!r}, and under the repo root)")
        print(f"[WARN] default config {path!r} not found (tried cwd, workdir, "
              "repo root); using built-in defaults")
        return cls()
    return cls.from_yaml(resolved)


def _add_common(p, config_default="configs/gan.yaml"):
    p.add_argument("--workdir", default=".", help="root for data/experiments paths")


def cmd_synth_data(args):
    from melogan_tpu.data.synthetic import generate_corpus

    entries = generate_corpus(args.out, n_per_emotion=args.per_emotion, seed=args.seed)
    print(f"[INFO] wrote {len(entries)} synthetic songs + manifest -> {args.out}")


def cmd_preprocess(args):
    from melogan_tpu.data.preprocess import preprocess_corpus
    from melogan_tpu.data.scaler import StandardScaler
    from melogan_tpu.data.splits import read_manifest

    rows = read_manifest(args.manifest)
    entries = [(r["file_key"], r["full_path"], r["emotion"]) for r in rows]
    scaler = None
    if args.scaler and os.path.exists(args.scaler):
        scaler = StandardScaler.load(args.scaler)
        print(f"[INFO] using existing scaler {args.scaler}")
    scaler = preprocess_corpus(entries, args.out, scaler=scaler)
    save_to = args.scaler or os.path.join(os.path.dirname(args.out) or ".", "scaler.npz")
    if not (args.scaler and os.path.exists(args.scaler)):
        scaler.save(save_to)
        print(f"[INFO] saved scaler -> {save_to}")


def cmd_make_splits(args):
    from melogan_tpu.data.splits import create_splits, read_manifest

    ratios = getattr(args, "ratios", None)
    kw = {}
    if ratios:
        parts = [float(x) for x in str(ratios).split("/")]
        if len(parts) != 3 or abs(sum(parts) - 1.0) > 1e-6:
            raise SystemExit("--ratios must be three fractions summing to 1, "
                             "e.g. 0.5/0.25/0.25")
        kw["ratios"] = tuple(parts)
    splits = create_splits(read_manifest(args.manifest), args.out,
                           seed=args.seed, **kw)
    print({k: len(v) for k, v in splits.items()})


def cmd_split_arrays(args):
    from melogan_tpu.data.preprocess import build_split_arrays

    for name in args.splits:
        csv_path = os.path.join(args.splits_dir, f"{name}_split.csv")
        build_split_arrays(csv_path, args.processed_dir, os.path.join(args.splits_dir, name))


def _load_split(args, name):
    from melogan_tpu.data.datasets import load_split

    csv_path = os.path.join(args.splits_dir, f"{name}_split.csv")
    return load_split(csv_path, args.processed_dir)


def _mesh_from_args(args, batch_size=None):
    """--dp N → a (data=N, model=1) mesh over the first N local devices (the
    fused train programs then run SPMD data-parallel); 0/absent → None.

    Hard-errors when ``batch_size`` does not divide N: the microbatch
    constrainer would silently skip every leaf and the run would be fully
    replicated — single-device speed while claiming to be data-parallel."""
    dp = getattr(args, "dp", 0)
    if not dp:
        return None
    if batch_size is not None and batch_size % dp != 0:
        raise SystemExit(
            f"--dp {dp} requires the config batch_size ({batch_size}) to be "
            f"divisible by it; otherwise no batch sharding can be applied"
        )
    from melogan_tpu.parallel.mesh import make_mesh

    return make_mesh(n_devices=dp)


def cmd_train_ae(args):
    from melogan_tpu.config import AEConfig
    from melogan_tpu.train import vae_loop

    cfg = _load_cfg(AEConfig, args.config, args.workdir)
    if args.epochs:
        cfg.epochs = args.epochs
    train_data = _load_split(args, "train")
    val_data = _load_split(args, "val")
    _, metrics = vae_loop.train(
        cfg, train_data, val_data, workdir=args.workdir,
        resume=getattr(args, "resume", False),
        mesh=_mesh_from_args(args, cfg.batch_size),
        precision="bf16" if getattr(args, "bf16", False) else None,
    )
    print(json.dumps(metrics))


def cmd_encode(args):
    from melogan_tpu.config import AEConfig
    from melogan_tpu.models.vae import VAE
    from melogan_tpu.train import vae_loop
    from melogan_tpu.utils.checkpoint import load_checkpoint

    cfg = _load_cfg(AEConfig, args.config, args.workdir)
    model = VAE.from_config(cfg)
    state = vae_loop.init_state(cfg, model, seed=cfg.seed)
    ckpt_path = args.checkpoint or os.path.join(args.workdir, cfg.checkpoint_dir, "ae_best.ckpt")
    ckpt = load_checkpoint(ckpt_path)
    state = state.replace(params=ckpt["params"], batch_stats=ckpt.get("batch_stats", {}))

    for name in args.splits:
        data = _load_split(args, name)
        mu = vae_loop.encode_mu(model, state, data.notes_ae(cfg))
        out_dir = os.path.join(args.splits_dir, name)
        os.makedirs(out_dir, exist_ok=True)
        out = os.path.join(out_dir, "encoder_feats.npy")
        np.save(out, mu)
        print(f"[INFO] wrote {mu.shape} latents -> {out}")


def cmd_train_ed(args):
    from melogan_tpu.config import EDConfig
    from melogan_tpu.train import ed_loop

    cfg = _load_cfg(EDConfig, args.config, args.workdir)
    if args.epochs:
        cfg.num_epochs = args.epochs
    train_data = _load_split(args, "train")
    val_data = _load_split(args, "val")
    lat_tr = lat_va = None
    if cfg.input_mode == "latent":
        lat_tr = np.load(os.path.join(args.splits_dir, "train", "encoder_feats.npy"))
        lat_va = np.load(os.path.join(args.splits_dir, "val", "encoder_feats.npy"))
    _, metrics = ed_loop.train(
        cfg, train_data, val_data, lat_tr, lat_va, workdir=args.workdir,
        resume=getattr(args, "resume", False),
        mesh=_mesh_from_args(args, cfg.batch_size),
        precision="bf16" if getattr(args, "bf16", False) else None,
    )
    print(json.dumps(metrics))


def cmd_eval_ed(args):
    from melogan_tpu.config import EDConfig
    from melogan_tpu.models.ed import EmotionDiscriminator
    from melogan_tpu.train import ed_loop
    from melogan_tpu.utils.checkpoint import load_checkpoint

    cfg = _load_cfg(EDConfig, args.config, args.workdir)
    model = EmotionDiscriminator.from_config(cfg)
    state = ed_loop.init_state(cfg, model, seed=cfg.seed)
    ckpt_path = args.checkpoint or os.path.join(args.workdir, cfg.checkpoint_dir, "ed_best.ckpt")
    ckpt = load_checkpoint(ckpt_path)
    state = state.replace(params=ckpt["params"], batch_stats=ckpt.get("batch_stats", {}))
    data = _load_split(args, args.split)
    result = ed_loop.evaluate(cfg, state, data)
    print(json.dumps(result))


def _resolve_ema_arg(raw, cfg, n_epochs, n_train, flag="--ema"):
    """``--ema DECAY|auto`` → a concrete decay in [0, 1).

    ``auto`` derives the decay from the planned G-update count
    (gan_step.ema_auto_decay — window ≈ t/50, the TPU-measured rule for
    gating parity with the live weights), so a user never has to size the
    horizon by hand (VERDICT-r4 item 7)."""
    from melogan_tpu.config import validate_ema_decay
    from melogan_tpu.train.gan_step import ema_auto_decay

    try:
        if isinstance(raw, str) and raw.strip().lower() == "auto":
            d = ema_auto_decay(cfg, n_epochs, n_train)
            print(f"[INFO] {flag} auto: decay {d:.4g} sized for "
                  f"{n_epochs} epochs x {n_train} rows "
                  f"(window ~ t/50 G updates)")
            return d
        return validate_ema_decay(raw)
    except ValueError as e:
        raise SystemExit(f"{flag}: {e}")


def cmd_train_gan(args):
    from melogan_tpu.config import EDConfig, GANConfig
    from melogan_tpu.train import gan_loop
    from melogan_tpu.utils.checkpoint import load_checkpoint

    cfg = _load_cfg(GANConfig, args.config, args.workdir)
    ed_cfg = _load_cfg(EDConfig, args.ed_config, args.workdir)
    if args.epochs:
        cfg.epochs = args.epochs
    train_data = _load_split(args, "train")
    if getattr(args, "ema", None) is not None:
        cfg.ema_decay = _resolve_ema_arg(args.ema, cfg, cfg.epochs, train_data.n)
    if getattr(args, "fm", None) is not None:
        cfg.lambda_fm = float(args.fm)

    latents = None
    feats_path = os.path.join(args.splits_dir, "train", "encoder_feats.npy")
    if os.path.exists(feats_path):
        latents = np.load(feats_path)

    ed_variables = None
    ed_ckpt = args.ed_ckpt or os.path.join(args.workdir, ed_cfg.checkpoint_dir, "ed_best.ckpt")
    if os.path.exists(ed_ckpt):
        ckpt = load_checkpoint(ed_ckpt)
        ed_variables = {"params": ckpt["params"], "batch_stats": ckpt.get("batch_stats", {})}
        print(f"[INFO] loaded frozen ED from {ed_ckpt}")
    else:
        print(f"[WARN] ED checkpoint not found at {ed_ckpt}. ED will be random!")

    # EMA implies --track-best: the gate catches a mis-sized decay (a lagging
    # G_ema scores below the live weights and is never exported as the best
    # artifact) without the user reading docs/operations.md (VERDICT-r4 #7).
    track_best = getattr(args, "track_best", False)
    if cfg.ema_decay and not track_best and not getattr(args, "no_track_best", False):
        track_best = True
        print("[INFO] --track-best enabled (default with EMA; disable with "
              "--no-track-best)")

    _, metrics = gan_loop.train(
        cfg, ed_cfg, train_data, latents=latents, ed_variables=ed_variables,
        workdir=args.workdir, resume=getattr(args, "resume", False),
        mesh=_mesh_from_args(args, cfg.batch_size),
        precision="bf16" if getattr(args, "bf16", False) else None,
        track_best=track_best,
        gate_samples_per_emotion=getattr(args, "gate_samples", 2),
    )
    print(json.dumps(metrics))


def parse_hyper_grid(spec):
    """``--hyper`` JSON → a per-member override list for sweep_gan.

    Accepts row form (a list of override dicts) or column form (a dict of
    equal-length lists: '{"lr_g": [1e-4, 2e-4]}'); key validity is checked
    downstream by gan_step.HyperParams.from_config."""
    if not spec:
        return None
    grid = json.loads(spec)
    if isinstance(grid, dict):
        lens = {len(v) for v in grid.values()}
        if len(lens) != 1:
            raise SystemExit("--hyper column lists must share one length")
        n = lens.pop()
        grid = [{k: v[i] for k, v in grid.items()} for i in range(n)]
    if not isinstance(grid, list) or not all(isinstance(h, dict) for h in grid):
        raise SystemExit("--hyper must be a JSON list of override dicts "
                         "or a dict of equal-length lists")
    return grid


def cmd_sweep(args):
    """Population sweep: K WGAN-GP seeds trained concurrently as one vmapped
    XLA program, ranked by the golden-band quality gate (train/sweep.py —
    no reference equivalent; the torch scripts train one model per process)."""
    from melogan_tpu.config import EDConfig, GANConfig
    from melogan_tpu.train.sweep import sweep_gan
    from melogan_tpu.utils.checkpoint import load_checkpoint

    cfg = _load_cfg(GANConfig, args.config, args.workdir)
    ed_cfg = _load_cfg(EDConfig, args.ed_config, args.workdir)
    if args.epochs:
        cfg.epochs = args.epochs
    train_data = _load_split(args, "train")
    if getattr(args, "ema", None) is not None:
        cfg.ema_decay = _resolve_ema_arg(args.ema, cfg, cfg.epochs, train_data.n)

    latents = None
    feats_path = os.path.join(args.splits_dir, "train", "encoder_feats.npy")
    if os.path.exists(feats_path):
        latents = np.load(feats_path)

    ed_variables = None
    ed_ckpt = args.ed_ckpt or os.path.join(args.workdir, ed_cfg.checkpoint_dir, "ed_best.ckpt")
    if os.path.exists(ed_ckpt):
        ckpt = load_checkpoint(ed_ckpt)
        ed_variables = {"params": ckpt["params"], "batch_stats": ckpt.get("batch_stats", {})}
        print(f"[INFO] loaded frozen ED from {ed_ckpt}")
    else:
        print(f"[WARN] ED checkpoint not found at {ed_ckpt}. ED will be random!")

    hyper_grid = parse_hyper_grid(getattr(args, "hyper", None))

    if args.seeds:
        seeds = args.seeds
    elif hyper_grid is not None:
        # a hyper search defaults to a SHARED seed: members differ only in
        # their hyperparameters, so the comparison is init/noise-controlled
        seeds = [cfg.seed] * len(hyper_grid)
    else:
        seeds = [cfg.seed + i for i in range(args.population)]
    report = sweep_gan(
        cfg, ed_cfg, train_data, seeds=seeds, latents=latents,
        ed_variables=ed_variables, workdir=args.workdir,
        samples_per_emotion=args.samples_per_emotion,
        promote_best=args.promote_best,
        mesh=_mesh_from_args(args),
        precision="bf16" if getattr(args, "bf16", False) else None,
        hyper_grid=hyper_grid,
        halving=getattr(args, "halving", False),
        rung_epochs=getattr(args, "rung_epochs", None),
        resume=getattr(args, "resume", False),
    )
    print(json.dumps({"best_seed": report["best_seed"],
                      "best_checkpoint": report["best_checkpoint"],
                      "gate": [{ "seed": r["seed"],
                                 "passed": r["gate_passed"],
                                 "total": r["gate_total"]}
                               for r in report["results"]]}))


def cmd_sample(args):
    from melogan_tpu.config import GANConfig
    from melogan_tpu.sampling import EMOTION_BPM, Sampler, emotion_scale
    from melogan_tpu.train.gan_loop import load_gan_final_full

    cfg = _load_cfg(GANConfig, args.config, args.workdir)
    gen_vars = fe_vars = None
    emotion_features = None
    ckpt_path = args.checkpoint or os.path.join(args.workdir, cfg.checkpoint_dir, "gan_final.ckpt")
    if os.path.exists(ckpt_path):
        gen_vars, fe_vars, extras = load_gan_final_full(
            ckpt_path, ema=getattr(args, "ema", False))
        emotion_features = extras["emotion_features"]
        print(f"[INFO] loaded generator from {ckpt_path}"
              + (" (EMA weights)" if getattr(args, "ema", False) else "")
              + ("" if emotion_features is None
                 else " (corpus-calibrated conditioning)"))
    else:
        print(f"[WARN] checkpoint not found at {ckpt_path}; sampling with random weights")

    sampler = Sampler(cfg, gen_variables=gen_vars, fe_variables=fe_vars,
                      seed=args.seed, mesh=_mesh_from_args(args),
                      emotion_features=emotion_features)
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    emotions = [args.emotion] if args.emotion != "all" else ["happy", "sad", "angry", "calm"]
    # one device batch for all prompts; per-file jittered bpm around the
    # emotion base (test_gan reconstruction; shipped artifact bpms scatter
    # ~±BPM_JITTER around the map — the quality gate derives its tempo bands
    # from the same constant)
    from melogan_tpu.constants import BPM_JITTER

    prompts, paths, bpms = [], [], []
    for emotion in emotions:
        for i in range(1, args.samples + 1):
            prompts.append(emotion)
            paths.append(os.path.join(args.out, f"test_{emotion}_{i}.mid"))
            bpms.append(float(EMOTION_BPM[emotion] * (1.0 + rng.uniform(-BPM_JITTER, BPM_JITTER))))
    sampler.generate_many(prompts, paths, seed=int(rng.integers(0, 2**31)), bpms=bpms)
    for emotion, out, bpm in zip(prompts, paths, bpms):
        print(f"[INFO] wrote {out} (bpm {max(60, min(bpm, 180)):.0f}, "
              f"{emotion_scale(emotion)})")


def _launch_precompiles(args, workdir, splits_dir, stages):
    """Warm the persistent XLA compile cache for the requested training
    stages' fused multi-epoch programs — at the EXACT corpus shapes read from
    ``splits_dir`` — in background threads. Returns ``{"train-<s>": Thread}``.
    Each stage's ``precompile()`` mirrors its ``train()`` construction path,
    so the later real run's jit is a cache hit (equality enforced by
    tests/test_train_loops.py::test_*_precompile_seeds_the_exact_train_program).
    Best-effort: a failed warm-up only means the stage compiles itself."""
    import threading
    import time

    from melogan_tpu.config import AEConfig, EDConfig, GANConfig
    from melogan_tpu.train import ed_loop, gan_loop, vae_loop

    def _n_rows(split):
        arr = np.load(os.path.join(splits_dir, split, "notes.npy"), mmap_mode="r")
        return int(arr.shape[0])

    n_train = corpus_len = n_val = None
    if set(stages) & {"ae", "ed", "gan"}:  # "serve" alone needs no corpus
        train_notes = np.load(os.path.join(splits_dir, "train", "notes.npy"),
                              mmap_mode="r")
        n_train, corpus_len = int(train_notes.shape[0]), int(train_notes.shape[1])
        n_val = _n_rows("val")
    precision = "bf16" if getattr(args, "bf16", False) else None
    epochs = getattr(args, "epochs", None)

    def _launch(name, fn, *a, **kw):
        def run():
            try:
                t0 = time.perf_counter()
                fn(*a, **kw)
                print(f"[INFO] {name} precompile finished in "
                      f"{time.perf_counter() - t0:.1f}s (overlapped)")
            except Exception as e:  # noqa: BLE001 — warm-up is best-effort
                print(f"[WARN] {name} precompile failed "
                      f"(the stage will compile itself): {e}")

        t = threading.Thread(target=run, name=f"precompile-{name}", daemon=True)
        t.start()
        return t

    def _len_ok(name, cfg_len):
        # the AE/GAN loops consume the stored (n, L, 4) arrays unpadded, so a
        # config whose max_notes ≠ the corpus L can never match the real run
        # (ED is length-agnostic — its precompile gets the corpus L directly)
        if cfg_len == corpus_len:
            return True
        print(f"[WARN] skipping {name} precompile: config max_notes "
              f"({cfg_len}) != corpus note length ({corpus_len})")
        return False

    # resolve every config/mesh BEFORE starting any thread: an exception
    # raised here with a compile already in flight would propagate past the
    # caller's drain and abort the interpreter mid-compile (LLVM crash)
    launches = []
    ed_cfg = _load_cfg(EDConfig, args.ed_config, workdir)
    if epochs:
        ed_cfg.num_epochs = epochs
    if "ae" in stages:
        ae_cfg = _load_cfg(AEConfig, args.ae_config, workdir)
        if epochs:
            ae_cfg.epochs = epochs
        if _len_ok("AE", ae_cfg.max_notes):
            launches.append(("train-ae", "AE", vae_loop.precompile,
                             (ae_cfg, n_train, n_val),
                             dict(mesh=_mesh_from_args(args, ae_cfg.batch_size),
                                  precision=precision)))
    if "ed" in stages:
        launches.append(("train-ed", "ED", ed_loop.precompile,
                         (ed_cfg, n_train, n_val),
                         dict(mesh=_mesh_from_args(args, ed_cfg.batch_size),
                              precision=precision, notes_len=corpus_len)))
    if "gan" in stages and getattr(args, "gan_fm", None):
        # the fm loss bakes per-corpus centroid CONSTANTS into the program;
        # a data-less warm compile could never match the real train's cache
        # key, so skip rather than burn a useless multi-minute remote compile
        print("[INFO] skipping GAN precompile: --gan-fm bakes corpus "
              "constants (the train stage compiles its own program)")
        stages = tuple(s for s in stages if s != "gan")
    if "gan" in stages:
        gan_cfg = _load_cfg(GANConfig, args.gan_config, workdir)
        if epochs:
            gan_cfg.epochs = epochs
        # --gan-ema changes the fused program (EMA update + extra state
        # leaves); warming the non-EMA variant would miss the cache
        if getattr(args, "gan_ema", None) is not None:
            gan_cfg.ema_decay = _resolve_ema_arg(
                args.gan_ema, gan_cfg, gan_cfg.epochs, n_train, flag="--gan-ema")
        if _len_ok("GAN", gan_cfg.max_notes):
            launches.append(("train-gan", "GAN", gan_loop.precompile,
                             (gan_cfg, ed_cfg, n_train),
                             dict(mesh=_mesh_from_args(args, gan_cfg.batch_size),
                                  precision=precision)))
    if "serve" in stages:
        serve_cfg = (gan_cfg if "gan" in stages
                     else _load_cfg(GANConfig, args.gan_config, workdir))
        launches.append(("serve", "serve", _serve_warm, (serve_cfg,),
                         dict(fast_math=getattr(args, "fast_math", False),
                              mesh=_mesh_from_args(args))))
    return {key: _launch(name, fn, *a, **kw) for key, name, fn, a, kw in launches}


def _serve_warm(gan_cfg, fast_math=False, mesh=None):
    """Warm every sampling program `melogan serve` will dispatch: the batch-1
    startup warm plus the pool's whole quantized refill ladder (each size is
    a distinct compiled program; only the SHAPES enter the compile key, so
    prompt/seed choices here cannot drift from the pool's real refills). The
    sample step takes its weights as jit arguments, so the warmed programs
    serve any later checkpoint. ``fast_math`` must match the later
    `melogan serve --fast-math` — bf16-pass traces are different programs.
    Per-size compiles run in parallel threads (compilation parallelizes; the
    warm would otherwise be ~5 serial remote compiles)."""
    import threading

    from melogan_tpu import EMOTIONS
    from melogan_tpu.sampling import Sampler
    from melogan_tpu.serving.pool import SamplePool

    sampler = Sampler(gan_cfg, fast_math=fast_math, mesh=mesh)
    ladder = SamplePool(sampler, background=False).warm_sizes()
    errors = []

    def warm_one(b):
        try:
            prompts = [EMOTIONS[i % len(EMOTIONS)] for i in range(b)]
            sampler.sample_notes(prompts, seed=0)
        except Exception as e:  # noqa: BLE001 — collect, report once
            errors.append(f"batch {b}: {e}")

    threads = [threading.Thread(target=warm_one, args=(b,), daemon=True)
               for b in [1] + ladder]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise RuntimeError("; ".join(errors))


def cmd_precompile(args):
    """Warm the persistent compile cache (.jax_cache by default) for all three
    stages' fused training programs in parallel, at the corpus shapes found in
    --splits-dir — so a subsequent `melogan pipeline`/`train-*` run pays zero
    cold XLA compiles. Compilation parallelizes across threads even though
    training can't; on a cold cache this turns ~3 serial remote compiles into
    the wall-clock of the slowest one."""
    import time

    t0 = time.perf_counter()
    threads = _launch_precompiles(
        args, args.workdir, args.splits_dir,
        tuple(args.stages) if args.stages else ("ae", "ed", "gan"))
    for t in threads.values():
        t.join()
    print(f"[INFO] precompile done ({len(threads)} programs) in "
          f"{time.perf_counter() - t0:.1f}s")


def cmd_doctor(args):
    """Bounded environment diagnostic: device backend, compile cache, config
    resolution, data/checkpoint presence, native codecs, text backend. Every
    check that could touch the device runs in a KILLABLE subprocess with a
    timeout — a wedged TPU tunnel hangs device init forever, and a diagnostic
    tool hanging on the very condition it diagnoses would be useless. Exits
    nonzero if any check FAILs (WARNs don't fail the run)."""
    import subprocess
    import time

    work = args.workdir
    results = []  # (level, name, detail)

    def check(level, name, detail):
        results.append((level, name, detail))
        print(f"[{level}] {name}: {detail}")

    # device backend (subprocess probe; a hung init means wedged/unavailable)
    probe_secs = float(os.environ.get("MELOGAN_DOCTOR_PROBE_SECS", "240"))
    t0 = time.perf_counter()
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d=jax.devices(); print(d[0].platform, d[0].device_kind, len(d))"],
            timeout=probe_secs, capture_output=True)
        if r.returncode == 0:
            check("OK", "device", f"{r.stdout.decode().strip()} "
                  f"(init {time.perf_counter() - t0:.1f}s)")
        else:
            tail = r.stderr.decode("utf-8", "replace").strip().splitlines()[-1:]
            check("FAIL", "device", f"backend errored: {tail[0][:160] if tail else '?'}")
    except subprocess.TimeoutExpired:
        check("FAIL", "device",
              f"init hung >{probe_secs:.0f}s — wedged/unavailable TPU tunnel "
              "(usually self-recovers in ~10 min; do not kill live clients)")

    # persistent compile cache
    cache = os.environ.get("MELOGAN_COMPILE_CACHE", os.path.join(_REPO_ROOT, ".jax_cache"))
    if cache == "0":
        check("WARN", "compile-cache", "disabled (MELOGAN_COMPILE_CACHE=0)")
    elif os.path.isdir(cache):
        entries = os.listdir(cache)
        size = sum(os.path.getsize(os.path.join(cache, e)) for e in entries)
        check("OK", "compile-cache", f"{cache}: {len(entries)} entries, "
              f"{size / 1e6:.0f} MB")
    else:
        check("WARN", "compile-cache", f"{cache} does not exist yet (cold)")

    # config resolution (the same loader every subcommand uses)
    from melogan_tpu.config import AEConfig, EDConfig, GANConfig

    for name, cls, path in (("ae-config", AEConfig, args.ae_config),
                            ("ed-config", EDConfig, args.ed_config),
                            ("gan-config", GANConfig, args.gan_config)):
        resolved = _resolve_config(path, work)
        if resolved:
            check("OK", name, resolved)
        else:
            check("WARN", name, f"{path} not found; built-in defaults would be used")

    # data + checkpoints under the workdir
    splits_dir = os.path.join(work, "data", "splits")
    have = [s for s in ("train", "val", "test")
            if os.path.exists(os.path.join(splits_dir, s, "notes.npy"))]
    if len(have) == 3:
        n = int(np.load(os.path.join(splits_dir, "train", "notes.npy"),
                        mmap_mode="r").shape[0])
        check("OK", "splits", f"{splits_dir} (train {n} rows)")
    else:
        check("WARN", "splits", f"{splits_dir}: arrays present for {have or 'none'}")
    for name, rel in (("ae-ckpt", "data/models/ae/ae_best.ckpt"),
                      ("ed-ckpt", "data/models/ed/ed_best.ckpt"),
                      ("gan-ckpt", "experiments/gan/checkpoints/gan_final.ckpt")):
        p = os.path.join(work, rel)
        check("OK" if os.path.exists(p) else "WARN", name,
              p if os.path.exists(p) else f"{p} missing")

    # golden artifacts (the quality gate's ground truth)
    golden = os.environ.get("MELOGAN_REFERENCE_DIR", "/root/reference")
    n_golden = len([f for d in ("good_gens1", "generated_tests")
                    for f in (os.listdir(os.path.join(golden, d))
                              if os.path.isdir(os.path.join(golden, d)) else [])
                    if f.endswith(".mid")])
    check("OK" if n_golden else "WARN", "golden-artifacts",
          f"{n_golden} reference .mid files under {golden}"
          if n_golden else f"none under {golden} (quality gate unavailable)")

    # native codecs (builds on demand; no jax involved)
    from melogan_tpu.imaging.native import get_lib as jpeg_lib
    from melogan_tpu.midi.native import native_available as midi_native

    check("OK" if midi_native() else "WARN", "native-midi",
          "built" if midi_native() else "unavailable (Python fallback serves)")
    check("OK" if jpeg_lib() is not None else "WARN", "native-jpeg",
          "built" if jpeg_lib() is not None else "unavailable (Python fallback serves)")

    # text backend (subprocess, CPU-forced: the jax-roberta path would touch
    # the device)
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.config.update('jax_platforms', 'cpu'); "
             "from melogan_tpu.models.text_emotion import backend_name; "
             "print(backend_name())"],
            # a COLD probe retrains the classifier (~30-60 s on an idle CPU;
            # several minutes on a loaded shared host) — the bound covers
            # that; warm probes (fingerprint-valid cache) answer in seconds
            timeout=300, capture_output=True)
        name = r.stdout.decode().strip() or "?"
        check("OK" if r.returncode == 0 else "FAIL", "text-backend", name)
    except subprocess.TimeoutExpired:
        check("FAIL", "text-backend", "probe hung >300s")

    fails = [n for lv, n, _ in results if lv == "FAIL"]
    print(f"[{'FAIL' if fails else 'OK'}] doctor: "
          f"{len(results) - len(fails)}/{len(results)} checks passed"
          + (f" (failing: {', '.join(fails)})" if fails else ""))
    if fails:
        raise SystemExit(1)


def cmd_pipeline(args):
    """full_script.sh equivalent: synth-data? → preprocess → splits → arrays →
    train-ae → encode → train-ed → train-gan → sample ×4 emotions.
    Prints per-stage wall-clock at the end."""
    import time
    from types import SimpleNamespace

    from melogan_tpu.utils.atomic import atomic_write

    timings = []

    work = args.workdir
    data_root = os.path.join(work, "data")
    resume = getattr(args, "resume", False)

    # EMA implies --gan-track-best (mirrors train-gan's default): the gate
    # protects a mis-sized decay and the sample stage serves the gated-best
    # artifact instead of a possibly lagging final EMA (VERDICT-r4 item 7).
    if (getattr(args, "gan_ema", None) is not None
            and not getattr(args, "gan_track_best", False)
            and not getattr(args, "no_gan_track_best", False)):
        args.gan_track_best = True
        print("[INFO] --gan-track-best enabled (default with --gan-ema; "
              "disable with --no-gan-track-best)")

    # Completed-stage markers: each finished stage records its invocation
    # signature under .pipeline_done/; --resume skips a stage whose marker
    # matches instead of re-running it (a train stage that COMPLETED would
    # otherwise retrain from scratch whenever its run was shorter than
    # save_freq — no periodic checkpoint to resume from). A marker is only
    # trusted while every upstream stage was also skipped: as soon as one
    # stage actually runs, everything downstream re-runs too.
    done_dir = os.path.join(work, ".pipeline_done")
    # data_sig: the invocation knobs that determine WHAT data the data stages
    # produce. A --resume with a changed --per-emotion (or a different
    # manifest) must regenerate the corpus, not silently retrain on stale
    # data — so done_if gates on it, and it is part of the train-stage sig.
    data_sig = {
        "synthetic": bool(args.synthetic),
        "per_emotion": getattr(args, "per_emotion", None),
        "manifest": None if args.synthetic else args.manifest,
    }
    sig = {
        "epochs": getattr(args, "epochs", None),
        "bf16": getattr(args, "bf16", False),
        "dp": getattr(args, "dp", 0),
        "gan_ema": getattr(args, "gan_ema", None),
        "gan_track_best": getattr(args, "gan_track_best", False),
        "gan_fm": getattr(args, "gan_fm", None),
        "configs": [args.ae_config, args.ed_config, args.gan_config],
        **data_sig,
    }
    upstream_ran = False

    def _read_marker(name):
        try:
            return json.load(open(os.path.join(done_dir, f"{name}.json")))
        except (OSError, ValueError):
            return None

    def stage(name, fn, *a, skippable=True, artifacts=()):
        nonlocal upstream_ran
        marker = os.path.join(done_dir, f"{name}.json")
        if (resume and skippable and not upstream_ran and os.path.exists(marker)
                and all(os.path.exists(p) for p in artifacts)):
            saved = _read_marker(name)
            if saved and saved.get("sig") == sig:
                print(f"[INFO] --resume: skipping {name} "
                      "(completed in a previous run)")
                timings.append((name, 0.0))
                return None
        upstream_ran = True
        t0 = time.perf_counter()
        out = fn(*a)
        timings.append((name, time.perf_counter() - t0))
        os.makedirs(done_dir, exist_ok=True)
        atomic_write(marker, lambda f: json.dump(
            {"stage": name, "sig": sig, "data_sig": data_sig}, f))
        return out

    def done_if(name, *artifacts):
        # --resume: a data stage whose outputs already exist is skipped (the
        # train stages resume from their own checkpoints instead) — but only
        # if its marker's data_sig matches this invocation (a marker-less
        # workdir, e.g. data staged by individual subcommands, keeps the
        # existence-based skip: there is no record to contradict it)
        if resume and artifacts and all(os.path.exists(p) for p in artifacts):
            saved = _read_marker(name)
            if saved is not None and saved.get("data_sig") != data_sig:
                print(f"[INFO] --resume: re-running {name} "
                      "(data parameters changed since the previous run)")
                return False
            print(f"[INFO] --resume: skipping {name} (outputs exist)")
            timings.append((name, 0.0))
            return True
        return False

    processed = os.path.join(data_root, "processed")
    splits_dir = os.path.join(data_root, "splits")
    if args.synthetic:
        manifest = os.path.join(data_root, "data_manifest.csv")
    else:
        manifest = args.manifest

    # Per-stage output artifacts. A --resume skip requires these to still
    # exist: a matching marker whose checkpoint was since deleted must
    # re-run, or cmd_sample would silently fall back to random weights.
    from melogan_tpu.config import AEConfig, EDConfig, GANConfig

    arts = {
        "synth-data": (manifest,) if args.synthetic else (),
        "preprocess": (processed, os.path.join(data_root, "scaler.npz")),
        "make-splits": tuple(os.path.join(splits_dir, f"{s}_split.csv")
                             for s in ("train", "val", "test")),
        "split-arrays": tuple(os.path.join(splits_dir, s, f"{a}.npy")
                              for s in ("train", "val", "test")
                              for a in ("notes", "emotion", "numeric_features")),
        "train-ae": (os.path.join(
            work, _load_cfg(AEConfig, args.ae_config, work).checkpoint_dir,
            "ae_best.ckpt"),),
        "encode": tuple(os.path.join(splits_dir, s, "encoder_feats.npy")
                        for s in ("train", "val", "test")),
        "train-ed": (os.path.join(
            work, _load_cfg(EDConfig, args.ed_config, work).checkpoint_dir,
            "ed_best.ckpt"),),
        "train-gan": (os.path.join(
            work, _load_cfg(GANConfig, args.gan_config, work).checkpoint_dir,
            "gan_final.ckpt"),),
    }
    gan_best_path = os.path.join(
        work, _load_cfg(GANConfig, args.gan_config, work).checkpoint_dir,
        "gan_best.ckpt")
    if getattr(args, "gan_track_best", False):
        arts["train-gan"] = arts["train-gan"] + (gan_best_path,)

    if args.synthetic and not done_if("synth-data", *arts["synth-data"]):
        stage("synth-data", cmd_synth_data,
              SimpleNamespace(out=data_root, per_emotion=args.per_emotion, seed=42),
              skippable=False)
    if not done_if("preprocess", *arts["preprocess"]):
        stage("preprocess", cmd_preprocess,
              SimpleNamespace(manifest=manifest, out=processed, scaler=None),
              skippable=False)
    if not done_if("make-splits", *arts["make-splits"]):
        stage("make-splits", cmd_make_splits,
              SimpleNamespace(manifest=manifest, out=splits_dir, seed=42),
              skippable=False)
    if not done_if("split-arrays", *arts["split-arrays"]):
        stage("split-arrays", cmd_split_arrays,
              SimpleNamespace(splits=["train", "val", "test"], splits_dir=splits_dir,
                              processed_dir=processed),
              skippable=False)
    base = SimpleNamespace(
        workdir=work, splits_dir=splits_dir, processed_dir=processed,
        config=args.ae_config, epochs=args.epochs, checkpoint=None,
        bf16=getattr(args, "bf16", False), dp=getattr(args, "dp", 0),
        resume=resume,
    )

    # Predict which train stages --resume will skip, mirroring stage()'s
    # decision exactly: a stage skips iff no upstream stage ran (the data
    # stages above have already run or skipped, so `upstream_ran` is the
    # observed truth), its marker's sig matches, and its artifacts exist.
    # Used below to avoid warming XLA programs for stages that will never
    # run — resuming a completed pipeline must not block minutes on remote
    # compiles (and must not occupy the single-client TPU) for nothing.
    def _would_skip(name):
        saved = _read_marker(name)
        return (resume and bool(saved) and saved.get("sig") == sig
                and all(os.path.exists(p) for p in arts[name]))

    will_skip = {}
    chain_ok = not upstream_ran
    for nm in ("train-ae", "encode", "train-ed", "train-gan"):
        chain_ok = chain_ok and _would_skip(nm)
        will_skip[nm] = chain_ok

    # overlap the ED/GAN fused-program XLA compiles with the AE stage: on a
    # cold cache the remote compiler dominates pipeline wall (~760 s of 830 s
    # measured round 3) and compiles parallelize across threads. precompile()
    # reproduces each stage's program at the exact corpus shapes, so the
    # stage's own jit becomes a persistent-cache hit. Best-effort: a failed
    # warm-up only means the stage compiles itself as before.
    precompiles = {}
    warm = tuple(s for s in ("ed", "gan") if not will_skip.get(f"train-{s}"))
    if warm and os.environ.get("MELOGAN_PIPELINE_PRECOMPILE", "1") != "0":
        precompiles = _launch_precompiles(args, work, splits_dir, warm)

    try:
        stage("train-ae", cmd_train_ae, base, artifacts=arts["train-ae"])
        stage("encode", cmd_encode,
              SimpleNamespace(**{**vars(base), "splits": ["train", "val", "test"]}),
              artifacts=arts["encode"])
        if "train-ed" in precompiles:
            precompiles["train-ed"].join()
        stage("train-ed", cmd_train_ed,
              SimpleNamespace(**{**vars(base), "config": args.ed_config}),
              artifacts=arts["train-ed"])
        if "train-gan" in precompiles:
            precompiles["train-gan"].join()
        stage("train-gan", cmd_train_gan,
              SimpleNamespace(**{**vars(base), "config": args.gan_config,
                                 "ed_config": args.ed_config, "ed_ckpt": None,
                                 "ema": getattr(args, "gan_ema", None),
                                 "track_best": getattr(args, "gan_track_best", False),
                                 "fm": getattr(args, "gan_fm", None)}),
              artifacts=arts["train-gan"])
    except BaseException:
        # a stage failed while background precompiles may still be mid-XLA-
        # compile: interpreter teardown under an active compile aborts the
        # process (LLVM crash) and eats the real traceback — drain first
        live = [t for t in precompiles.values() if t.is_alive()]
        if live:
            print(f"[INFO] stage failed; waiting for {len(live)} background "
                  "precompile(s) before exiting")
            for t in live:
                t.join(timeout=600)  # a stalled remote compile must not turn
                # the stage failure (or a Ctrl-C) into an indefinite hang
            stuck = [t.name for t in live if t.is_alive()]
            if stuck:
                print(f"[WARN] {', '.join(stuck)} still compiling after 600 s; "
                      "exiting anyway (teardown may abort noisily)")
        raise
    gen_dir = os.path.join(work, "generated_tests")
    # downstream serves what training selected: the gate-tracked best when
    # --gan-track-best produced one, its EMA weights when --gan-ema trained
    sample_ckpt = (gan_best_path if getattr(args, "gan_track_best", False)
                   and os.path.exists(gan_best_path) else None)
    stage("sample", cmd_sample, SimpleNamespace(
        workdir=work, config=args.gan_config, checkpoint=sample_ckpt,
        emotion="all", samples=2, seed=42, out=gen_dir,
        ema=getattr(args, "gan_ema", None) is not None,
    ), artifacts=(gen_dir,))
    # golden-band quality gate over the fresh samples (VERDICT r1 item 6)
    if not getattr(args, "skip_quality_gate", False):
        stage("quality-gate", cmd_quality_gate,
              SimpleNamespace(dir=gen_dir, strict=True), skippable=False)
    total = sum(t for _, t in timings)
    print("[INFO] pipeline stage timings: "
          + " | ".join(f"{n} {t:.1f}s" for n, t in timings)
          + f" | total {total:.1f}s")
    # persist the timings for tooling (demo_run summaries, regression checks)
    from melogan_tpu.utils.atomic import atomic_write

    atomic_write(
        os.path.join(work, "pipeline_timings.json"),
        lambda f: json.dump(
            {"stages": [{"name": n, "seconds": round(t, 3)} for n, t in timings],
             "total_seconds": round(total, 3),
             "resumed": resume}, f),
    )
    print("[INFO] pipeline complete")


def cmd_diagnose(args):
    from melogan_tpu.diagnostics.diagnose import diagnose

    data = _load_split(args, args.split)
    feats_path = os.path.join(args.splits_dir, args.split, "encoder_feats.npy")
    latents = np.load(feats_path) if os.path.exists(feats_path) else None
    report = diagnose(data, latents)
    print(json.dumps(report, indent=2, default=str))


def cmd_analyze_midi(args):
    from melogan_tpu.diagnostics.analyze_midi import analyze_file

    for path in args.files:
        stats = analyze_file(path)
        print(json.dumps({"file": os.path.basename(path), **stats}))


def cmd_import_checkpoint(args):
    """Convert a reference torch ``.pth`` checkpoint into this framework's
    ``.ckpt`` format (migration path for reference users).

    Reference layouts (SURVEY.md §5): ae_best {'epoch','model_state'} or a
    raw state_dict (ae_final); ed_best {'epoch','model','optimizer','cfg'};
    gan_final {'G','E_num'} state dicts.
    """
    import torch

    from melogan_tpu.utils import torch_interop as ti
    from melogan_tpu.utils.checkpoint import save_checkpoint

    raw = torch.load(args.pth, map_location="cpu", weights_only=False)

    if args.kind == "ae":
        sd = raw.get("model_state", raw.get("model", raw)) if isinstance(raw, dict) else raw
        variables = ti.convert_vae(sd)
        tree = {
            "epoch": int(raw.get("epoch", 0)) if isinstance(raw, dict) else 0,
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
        }
    elif args.kind == "ed":
        from melogan_tpu.config import EDConfig

        ed_cfg = _load_cfg(EDConfig, args.ed_config, getattr(args, 'workdir', '.')) if args.ed_config else EDConfig()
        sd = raw.get("model", raw) if isinstance(raw, dict) else raw
        variables = ti.convert_ed(
            sd, notes_blocks=ed_cfg.notes_blocks, mlp_hidden=len(ed_cfg.mlp_hidden)
        )
        tree = {
            "epoch": int(raw.get("epoch", 0)) if isinstance(raw, dict) else 0,
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        }
    elif args.kind == "gan":
        gen_vars, fe_vars = ti.convert_gan_final(raw)
        tree = {"G": gen_vars, "E_num": fe_vars}
    else:  # pragma: no cover - argparse choices guard this
        raise ValueError(f"unknown kind {args.kind}")

    save_checkpoint(args.out, tree)
    print(f"[INFO] imported {args.kind} checkpoint {args.pth} -> {args.out}")
    print("[NOTE] imported checkpoints carry params/stats for inference and "
          "warm-starting; optimizer state is not part of the reference format")


def cmd_export_checkpoint(args):
    """Convert a framework ``.ckpt`` back into the reference torch ``.pth``
    layouts (the inverse of ``import-checkpoint`` — migration is two-way).

    Output layouts match what the reference scripts write/read:
    ae → {'epoch','model_state'} (src/ae/train_ae.py:197), ed →
    {'epoch','model','optimizer','cfg'} (train_ed.py:41-47), gan →
    {'G','E_num'} (train_gan.py:279-282), plus 'D'/'epoch' when the source
    is a periodic gan_epoch ckpt. Optimizer state is framework-native
    (optax) and has no faithful torch Adam encoding, so 'optimizer' exports
    as an empty dict — the reference never reloads it anyway (SURVEY.md §5).
    """
    import torch

    from melogan_tpu.utils import torch_interop as ti
    from melogan_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(args.ckpt)

    def t(sd):
        # copy=True: msgpack-restored arrays are read-only views, which torch
        # tensors cannot wrap
        return {k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()}

    if args.kind == "ae":
        sd = ti.export_vae({"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]})
        out = {"epoch": int(ckpt.get("epoch", 0)), "model_state": t(sd)}
    elif args.kind == "ed":
        sd = ti.export_ed({"params": ckpt["params"], "batch_stats": ckpt.get("batch_stats", {})})
        out = {
            "epoch": int(ckpt.get("epoch", 0)),
            "model": t(sd),
            "optimizer": {},
            "cfg": dict(ckpt.get("cfg", {})),
        }
    elif args.kind == "gan":
        out = {
            "G": t(ti.export_generator(ckpt["G"])),
            "E_num": t(ti.export_feature_encoder(ckpt["E_num"])),
        }
        if "D" in ckpt:  # periodic gan_epoch layout carries the critic too
            out["D"] = t(ti.export_critic(ckpt["D"]))
        if "epoch" in ckpt:
            out["epoch"] = int(ckpt["epoch"])
    else:  # pragma: no cover - argparse choices guard this
        raise ValueError(f"unknown kind {args.kind}")

    torch.save(out, args.out)
    print(f"[INFO] exported {args.kind} checkpoint {args.ckpt} -> {args.out}")


def cmd_augment_corpus(args):
    """Expand real MIDI sources into an augmented training corpus
    (grouped-by-source splits, train-fit scaler — data/augment.py)."""
    from melogan_tpu.data.augment import expand_corpus
    from melogan_tpu.data.npz import read_split_csv

    rows = read_split_csv(args.manifest)
    entries = [(r["file_key"], r["full_path"], r["emotion"]) for r in rows]
    ratios = tuple(float(x) for x in args.ratios.split("/"))
    if len(ratios) != 3 or abs(sum(ratios) - 1.0) > 1e-6:
        raise SystemExit(f"--ratios must be three fractions summing to 1, "
                         f"got {args.ratios!r}")
    report = expand_corpus(
        entries, args.out, per_song=args.per_song, ratios=ratios,
        seed=args.seed)
    print(json.dumps(report))
    return report


def cmd_quality_gate(args):
    """Check generated .mid files against the golden-artifact bands."""
    from melogan_tpu.diagnostics.quality import gate_directory

    tier = getattr(args, "tier", "default")
    report = gate_directory(args.dir, tier=tier)
    for name, entry in report.get("files", {}).items():
        status = "PASS" if not entry["violations"] else "FAIL"
        print(f"[{status}] {name} ({entry['emotion']})")
        for v in entry["violations"]:
            print(f"         {v}")
    if getattr(args, "breakdown", False):
        from melogan_tpu.diagnostics.quality import band_breakdown

        bd = band_breakdown(report, tier=tier)
        print(f"[BREAKDOWN] per-metric ({tier} tier):")
        for metric, m in sorted(bd["per_metric"].items(),
                                key=lambda kv: -kv[1]["n_fail"]):
            if m["n_fail"]:
                print(f"  {metric:14s} {m['n_fail']} file(s) out of band; "
                      f"worst delta {m['worst_delta']:+g} "
                      f"({', '.join(m['failing_files'])})")
            else:
                print(f"  {metric:14s} all files in band")
        out = getattr(args, "breakdown_json", None)
        if out:
            from melogan_tpu.utils.atomic import atomic_write

            atomic_write(out, lambda f: json.dump(bd, f, indent=2))
            print(f"[INFO] breakdown -> {out}")
    if report.get("error"):
        print(f"[FAIL] {report['error']}")
    print(f"[{'PASS' if report['ok'] else 'FAIL'}] quality gate ({tier} tier): "
          f"{sum(1 for e in report.get('files', {}).values() if not e['violations'])}"
          f"/{len(report.get('files', {}))} files within golden bands")
    if not report["ok"] and getattr(args, "strict", True):
        raise SystemExit(1)
    return report


def cmd_eval_gen(args):
    """Independent emotion-accuracy evaluation of fresh generated samples
    (VERDICT-r3 item 2): a judge ED trained on the held-out val split (test
    split as its own validation), different seed, never inside G's loss,
    classifies sampler output per emotion. Writes ``eval_gen.json``."""
    from types import SimpleNamespace

    from melogan_tpu.config import EDConfig, GANConfig
    from melogan_tpu.diagnostics import judge as judge_mod
    from melogan_tpu.sampling import Sampler
    from melogan_tpu.train.gan_loop import load_gan_final
    from melogan_tpu.utils.checkpoint import load_checkpoint

    cfg = _load_cfg(GANConfig, args.config, args.workdir)
    ed_cfg = _load_cfg(EDConfig, args.ed_config, args.workdir)
    judge_cfg = judge_mod.judge_config(ed_cfg, epochs=args.judge_epochs)

    judge_ckpt = os.path.join(args.workdir, judge_cfg.checkpoint_dir, "ed_best.ckpt")
    test_data = None
    if os.path.exists(judge_ckpt) and not args.retrain_judge:
        raw = load_checkpoint(judge_ckpt)
        judge_state = SimpleNamespace(
            params=raw["params"], batch_stats=raw.get("batch_stats", {})
        )
        print(f"[INFO] loaded judge ED from {judge_ckpt}")
    else:
        val_data = _load_split(args, "val")
        test_data = _load_split(args, "test")
        print(f"[INFO] training judge ED on the held-out val split "
              f"({val_data.n} rows; test split as judge-val, {test_data.n} rows)")
        judge_cfg, judge_state = judge_mod.train_judge(
            ed_cfg, val_data, test_data, workdir=args.workdir,
            epochs=args.judge_epochs, verbose=False,
        )
        print(f"[INFO] judge saved -> {judge_ckpt}")

    # Judge calibration: the same judge scored on REAL held-out test rows.
    # A generated-sample accuracy is only meaningful relative to this — a
    # judge that cannot classify real music (tiny-source regimes like the
    # 16-artifact real-MIDI corpus) bounds what the generated number can say.
    judge_real = None
    try:
        if test_data is None:
            test_data = _load_split(args, "test")
        judge_real = judge_mod.judge_notes(
            judge_cfg, judge_state, test_data.notes_gan(),
            test_data.emotion_idx)
        print(f"[INFO] judge on REAL held-out test data: "
              f"{judge_real['accuracy']:.1%} over {judge_real['n']} rows")
    except Exception as exc:  # splits may be absent when judging a bare ckpt
        print(f"[WARN] judge real-data calibration skipped: {exc}")

    gen_vars = fe_vars = None
    emotion_features = None
    ckpt_path = args.checkpoint or os.path.join(
        args.workdir, cfg.checkpoint_dir, "gan_final.ckpt")
    if os.path.exists(ckpt_path):
        from melogan_tpu.train.gan_loop import load_gan_final_full

        gen_vars, fe_vars, extras = load_gan_final_full(
            ckpt_path, ema=getattr(args, "ema", False))
        emotion_features = extras["emotion_features"]
        print(f"[INFO] loaded generator from {ckpt_path}"
              + (" (EMA weights)" if getattr(args, "ema", False) else ""))
    else:
        print(f"[WARN] checkpoint not found at {ckpt_path}; judging RANDOM weights")

    sampler = Sampler(cfg, gen_variables=gen_vars, fe_variables=fe_vars,
                      seed=args.seed, emotion_features=emotion_features)
    report = judge_mod.judge_generated(
        judge_cfg, judge_state, sampler,
        n_per_emotion=args.samples, seed=args.seed,
    )
    print(f"[INFO] judge-ED accuracy over {report['n']} fresh samples: "
          f"{report['accuracy']:.1%} (chance {report['chance']:.0%})")
    for emotion, entry in report["per_emotion"].items():
        acc = entry["accuracy"]
        print(f"    {emotion:6s} {'' if acc is None else f'{acc:.1%}'} "
              f"(n={entry['n']})")
    report["judge_real"] = judge_real
    out_path = os.path.join(args.workdir, "eval_gen.json")
    from melogan_tpu.utils.atomic import atomic_write

    atomic_write(out_path, lambda f: json.dump(report, f, indent=1))
    print(f"[INFO] wrote {out_path}")
    if args.min_accuracy is not None and report["accuracy"] < args.min_accuracy:
        raise SystemExit(
            f"[FAIL] judge-ED accuracy {report['accuracy']:.3f} below the "
            f"--min-accuracy gate {args.min_accuracy}")
    return report


def cmd_text_eval(args):
    """Measured accuracy of the offline text-emotion backends on the
    held-out eval split (VERDICT-r3 item 5)."""
    from melogan_tpu.diagnostics.text_eval import compare_offline_backends

    report = compare_offline_backends(seed=getattr(args, "seed", 0), verbose=True)
    if getattr(args, "ceiling", False):
        from melogan_tpu.diagnostics.text_eval import ceiling_study

        report["ceiling"] = ceiling_study(seed=getattr(args, "seed", 0),
                                          verbose=True)
    if getattr(args, "json", False):
        print(json.dumps(report))
    return report


def cmd_tsne(args):
    from melogan_tpu.diagnostics.tsne import visualize_latents

    out = visualize_latents(args.splits_dir, args.split, args.processed_dir, out_dir=args.out)
    print(f"[INFO] wrote {out}")


def cmd_serve(args):
    from melogan_tpu.config import GANConfig
    from melogan_tpu.serving.app import serve

    # resolve the config exactly like every other subcommand (as given →
    # --workdir → repo root), so `melogan precompile --stages serve` and
    # `melogan serve` can never warm/compile different-shaped programs
    cfg = _load_cfg(GANConfig, args.config, args.workdir)
    serve(host=args.host, port=args.port, workdir=args.workdir,
          config=cfg, checkpoint=args.checkpoint,
          fast_math=getattr(args, "fast_math", False),
          dp=getattr(args, "dp", 0),
          watch_ckpt=getattr(args, "watch_ckpt", 0.0),
          use_ema=getattr(args, "ema", False))


def cmd_roll_to_midi(args):
    from melogan_tpu.midi.codec import raw_roll_to_song

    roll = np.load(args.roll)
    out = args.out or "generated_sample.mid"
    raw_roll_to_song(roll, bpm=args.bpm).write(out)
    print(f"Wrote {out}")


def cmd_clean(args):
    from melogan_tpu.utils.cleaner import bulk_delete

    report = bulk_delete(
        args.workdir, dry_run=not args.confirm, confirm=args.confirm
    )
    mode = "DRY RUN — would delete" if report["dry_run"] or not args.confirm else "deleted"
    for p in report["planned"]:
        print(f"[{mode}] {p}")
    if report.get("deleted"):
        print(f"[INFO] removed {len(report['deleted'])} artifact paths")
    elif not args.confirm:
        print("[INFO] pass --confirm to actually delete")


def cmd_logs(args):
    from melogan_tpu.utils.metrics import read_tfevents

    events = []
    for root, _, files in os.walk(args.log_dir):
        for f in files:
            if f.startswith("events.out"):
                events.extend(read_tfevents(os.path.join(root, f)))
    tags = sorted({t for t, _, _ in events})
    if args.tag:
        series = sorted(((s, v) for t, v, s in events if t == args.tag))
        for step, value in series:
            print(f"{step}\t{value}")
    else:
        for tag in tags:
            series = sorted(((s, v) for t, v, s in events if t == tag))
            if series:
                print(f"{tag}: {series[0][1]:.4f} -> {series[-1][1]:.4f} "
                      f"({len(series)} points)")


def cmd_bench(args):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import bench

    # main(), not run(): the CLI surface must get the same wedged-device gate
    # as `python bench.py` (an unavailable TPU otherwise hangs forever)
    bench.main()


def cmd_profile(args):
    """Trace + time the sampling hot path (device timeline via jax.profiler
    when --trace-dir is given, viewable in TensorBoard/Perfetto)."""
    from melogan_tpu.config import GANConfig
    from melogan_tpu.sampling import Sampler
    from melogan_tpu.utils.profiling import StepTimer, device_trace

    cfg = _load_cfg(GANConfig, args.config, getattr(args, 'workdir', '.'))
    sampler = Sampler(cfg, seed=0)
    sampler.sample_notes(["happy"], seed=0)  # compile outside the window
    timer = StepTimer()
    with device_trace(args.trace_dir):
        for i in range(args.steps):
            with timer:
                sampler.sample_notes(["happy", "sad", "angry", "calm"], seed=i)
    out = {"batch": 4, **timer.summary()}
    if args.trace_dir:
        out["trace_dir"] = args.trace_dir
    print(json.dumps(out))
    return out


def build_parser():
    p = argparse.ArgumentParser(prog="melogan", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("synth-data", help="generate a synthetic labelled corpus")
    s.add_argument("--out", default="data")
    s.add_argument("--per-emotion", type=int, default=64, dest="per_emotion")
    s.add_argument("--seed", type=int, default=42)
    s.set_defaults(fn=cmd_synth_data)

    s = sub.add_parser("preprocess", help="raw MIDI → per-song .npz")
    s.add_argument("--manifest", required=True)
    s.add_argument("--out", default="data/processed")
    s.add_argument("--scaler", default=None)
    s.set_defaults(fn=cmd_preprocess)

    s = sub.add_parser("make-splits", help="manifest → stratified split CSVs")
    s.add_argument("--manifest", required=True)
    s.add_argument("--out", default="data/splits")
    s.add_argument("--seed", type=int, default=42)
    s.add_argument("--ratios", default=None, metavar="TR/VA/TE",
                   help="split fractions, e.g. 0.5/0.25/0.25 (default "
                        "0.70/0.15/0.15; tiny corpora need coarser cuts so "
                        "no split lands empty)")
    s.set_defaults(fn=cmd_make_splits)

    s = sub.add_parser("split-arrays", help="per-split fast-path arrays")
    s.add_argument("--splits", nargs="+", default=["train", "val", "test"])
    s.add_argument("--splits-dir", default="data/splits")
    s.add_argument("--processed-dir", default="data/processed")
    s.set_defaults(fn=cmd_split_arrays)

    for name, fn, cfg_default in (
        ("train-ae", cmd_train_ae, "configs/ae.yaml"),
        ("train-ed", cmd_train_ed, "configs/ed.yaml"),
    ):
        s = sub.add_parser(name)
        s.add_argument("--config", default=cfg_default)
        s.add_argument("--workdir", default=".")
        s.add_argument("--splits-dir", default="data/splits")
        s.add_argument("--processed-dir", default="data/processed")
        s.add_argument("--epochs", type=int, default=None)
        s.add_argument("--resume", action="store_true")
        s.add_argument("--dp", type=int, default=0,
                       help="data-parallel device count (0 = single device)")
        s.add_argument("--bf16", action="store_true",
                       help="mixed-precision MXU training (bf16 matmul passes)")
        s.set_defaults(fn=fn)

    s = sub.add_parser("encode", help="export µ latents per split")
    s.add_argument("--config", default="configs/ae.yaml")
    s.add_argument("--checkpoint", default=None)
    s.add_argument("--workdir", default=".")
    s.add_argument("--splits-dir", default="data/splits")
    s.add_argument("--processed-dir", default="data/processed")
    s.add_argument("--splits", nargs="+", default=["train", "val", "test"])
    s.set_defaults(fn=cmd_encode)

    s = sub.add_parser("eval-ed", help="evaluate the emotion discriminator")
    s.add_argument("--config", default="configs/ed.yaml")
    s.add_argument("--checkpoint", default=None)
    s.add_argument("--workdir", default=".")
    s.add_argument("--splits-dir", default="data/splits")
    s.add_argument("--processed-dir", default="data/processed")
    s.add_argument("--split", default="test")
    s.set_defaults(fn=cmd_eval_ed)

    s = sub.add_parser("train-gan")
    s.add_argument("--config", default="configs/gan.yaml")
    s.add_argument("--ed-config", default="configs/ed.yaml", dest="ed_config")
    s.add_argument("--ed-ckpt", default=None, dest="ed_ckpt")
    s.add_argument("--workdir", default=".")
    s.add_argument("--splits-dir", default="data/splits")
    s.add_argument("--processed-dir", default="data/processed")
    s.add_argument("--epochs", type=int, default=None)
    s.add_argument("--resume", action="store_true",
                   help="restart from the newest periodic checkpoint")
    s.add_argument("--ema", default=None, metavar="DECAY|auto",
                   help="track a generator weight EMA on device (e.g. 0.999); "
                        "checkpoints gain G_ema, served via sample/serve "
                        "--ema. 'auto' sizes the decay from the planned "
                        "G-update count (window ~ t/50, the TPU-measured "
                        "gating-parity rule); implies --track-best")
    s.add_argument("--track-best", action="store_true", dest="track_best",
                   help="score fresh samples against the golden-band quality "
                        "gate at every checkpoint cadence and keep the best "
                        "weights as gan_best.ckpt (the GAN model-selection "
                        "step the reference never had); ON by default when "
                        "--ema is set")
    s.add_argument("--no-track-best", action="store_true", dest="no_track_best",
                   help="opt out of the EMA-implied --track-best default")
    s.add_argument("--fm", type=float, default=None, metavar="LAMBDA",
                   help="per-emotion note-space feature-matching loss weight "
                        "(documented deviation, default 0 = exact reference "
                        "loss; YAML key LAMBDA_FM)")
    s.add_argument("--gate-samples", type=int, default=2, dest="gate_samples",
                   help="gate samples per emotion for --track-best")
    s.add_argument("--dp", type=int, default=0,
                   help="data-parallel device count (0 = single device)")
    s.add_argument("--bf16", action="store_true",
                   help="mixed-precision MXU training (bf16 matmul passes)")
    s.set_defaults(fn=cmd_train_gan)

    s = sub.add_parser(
        "sweep",
        help="population training: K GAN seeds as one vmapped program, "
             "quality-gate-ranked (train/sweep.py)")
    s.add_argument("--config", default="configs/gan.yaml")
    s.add_argument("--ed-config", default="configs/ed.yaml", dest="ed_config")
    s.add_argument("--ed-ckpt", default=None, dest="ed_ckpt")
    s.add_argument("--workdir", default=".")
    s.add_argument("--splits-dir", default="data/splits")
    s.add_argument("--processed-dir", default="data/processed")
    s.add_argument("--epochs", type=int, default=None)
    s.add_argument("--seeds", type=int, nargs="+", default=None,
                   help="explicit member seeds (default: cfg.seed .. +K-1; "
                        "with --hyper: cfg.seed shared by every member)")
    s.add_argument("--population", type=int, default=4,
                   help="member count when --seeds is not given")
    s.add_argument("--hyper", default=None,
                   help="JSON hyperparameter grid: a list of per-member "
                        "override dicts (keys: lr_g, lr_d, lambda_gp, "
                        "lambda_emotion) or a dict of equal-length lists, "
                        "e.g. '{\"lr_g\": [1e-4, 2e-4, 4e-4]}' — all members "
                        "train in ONE vmapped program")
    s.add_argument("--samples-per-emotion", type=int, default=2,
                   help="gate samples generated per emotion per member")
    s.add_argument("--halving", action="store_true",
                   help="successive-halving search: per rung, train the "
                        "population --rung-epochs, rank by the quality gate, "
                        "keep the top half (state + shuffle streams carry "
                        "over); the winner trains on to --epochs total")
    s.add_argument("--rung-epochs", type=int, default=None, dest="rung_epochs",
                   help="epochs per halving rung (default: SAVE_FREQ)")
    s.add_argument("--promote-best", action="store_true",
                   help="copy the winning member to the stage's gan_final.ckpt")
    s.add_argument("--resume", action="store_true",
                   help="continue an interrupted sweep from sweep_state.ckpt "
                        "(trajectory-identical to straight-through; the "
                        "invocation must match the interrupted run)")
    s.add_argument("--ema", default=None, metavar="DECAY|auto",
                   help="track per-member generator EMAs; the gate then "
                        "ranks EMA weights and finals carry G_ema ('auto' "
                        "sizes the decay from the planned G-update count)")
    s.add_argument("--dp", type=int, default=0,
                   help="shard the POPULATION over N devices (members are "
                        "independent: zero collectives, linear scaling)")
    s.add_argument("--bf16", action="store_true",
                   help="mixed-precision MXU training (bf16 matmul passes)")
    s.set_defaults(fn=cmd_sweep)

    s = sub.add_parser("sample", help="emotion-conditioned MIDI generation")
    s.add_argument("--emotion", default="all", choices=["all", "happy", "sad", "angry", "calm"])
    s.add_argument("--samples", type=int, default=1)
    s.add_argument("--seed", type=int, default=42)
    s.add_argument("--config", default="configs/gan.yaml")
    s.add_argument("--checkpoint", default=None)
    s.add_argument("--workdir", default=".")
    s.add_argument("--out", default="generated_tests")
    s.add_argument("--ema", action="store_true",
                   help="sample from the EMA generator weights (G_ema)")
    s.add_argument("--dp", type=int, default=0,
                   help="shard the sample batch over N devices")
    s.set_defaults(fn=cmd_sample)

    s = sub.add_parser("pipeline", help="all stages end-to-end")
    s.add_argument("--workdir", default=".")
    s.add_argument("--synthetic", action="store_true")
    s.add_argument("--per-emotion", type=int, default=32, dest="per_emotion")
    s.add_argument("--manifest", default=None)
    s.add_argument("--epochs", type=int, default=None)
    s.add_argument("--ae-config", default="configs/ae.yaml", dest="ae_config")
    s.add_argument("--ed-config", default="configs/ed.yaml", dest="ed_config")
    s.add_argument("--gan-config", default="configs/gan.yaml", dest="gan_config")
    s.add_argument("--skip-quality-gate", action="store_true", dest="skip_quality_gate",
                   help="skip the final golden-band quality gate")
    s.add_argument("--gan-ema", default=None, dest="gan_ema",
                   metavar="DECAY|auto",
                   help="train the GAN stage with a generator weight EMA; "
                        "the sample stage then samples the EMA weights "
                        "('auto' sizes the decay from the planned G-update "
                        "count; implies --gan-track-best)")
    s.add_argument("--gan-track-best", action="store_true", dest="gan_track_best",
                   help="gate-score GAN checkpoints during training and "
                        "sample from gan_best.ckpt instead of gan_final; ON "
                        "by default when --gan-ema is set")
    s.add_argument("--no-gan-track-best", action="store_true",
                   dest="no_gan_track_best",
                   help="opt out of the EMA-implied --gan-track-best default")
    s.add_argument("--gan-fm", type=float, default=None, dest="gan_fm",
                   metavar="LAMBDA",
                   help="feature-matching loss weight for the GAN stage "
                        "(documented deviation, default 0 = reference loss)")
    s.add_argument("--resume", action="store_true",
                   help="continue an interrupted run: skip data stages whose "
                        "outputs exist, resume each train stage from its "
                        "checkpoints (step-identical)")
    s.add_argument("--bf16", action="store_true",
                   help="mixed-precision MXU training for all three stages")
    s.add_argument("--dp", type=int, default=0,
                   help="data-parallel device count for all three stages")
    s.set_defaults(fn=cmd_pipeline)

    s = sub.add_parser(
        "precompile",
        help="warm the XLA compile cache for the fused training programs "
             "(all stages in parallel, at the corpus shapes in --splits-dir)")
    s.add_argument("--workdir", default=".")
    s.add_argument("--splits-dir", default="data/splits")
    s.add_argument("--stages", nargs="+", choices=["ae", "ed", "gan", "serve"],
                   default=None,
                   help="stages to warm (default: the three training stages; "
                        "'serve' additionally warms the serving refill ladder)")
    s.add_argument("--epochs", type=int, default=None)
    s.add_argument("--ae-config", default="configs/ae.yaml", dest="ae_config")
    s.add_argument("--ed-config", default="configs/ed.yaml", dest="ed_config")
    s.add_argument("--gan-config", default="configs/gan.yaml", dest="gan_config")
    s.add_argument("--gan-ema", default=None, dest="gan_ema",
                   metavar="DECAY|auto",
                   help="warm the EMA variant of the GAN program (must match "
                        "the later train-gan --ema / pipeline --gan-ema; "
                        "'auto' resolves against the same corpus shapes)")
    s.add_argument("--dp", type=int, default=0,
                   help="data-parallel device count (matches the later run)")
    s.add_argument("--bf16", action="store_true",
                   help="warm the --bf16 mixed-precision TRAINING variants")
    s.add_argument("--fast-math", action="store_true", dest="fast_math",
                   help="warm the `serve --fast-math` sampling variants "
                        "(independent of --bf16; only affects --stages serve)")
    s.set_defaults(fn=cmd_precompile)

    s = sub.add_parser("doctor", help="environment diagnostic (device, cache, "
                                      "configs, data, native codecs) — bounded, "
                                      "never hangs on a wedged device")
    s.add_argument("--workdir", default=".")
    s.add_argument("--ae-config", default="configs/ae.yaml", dest="ae_config")
    s.add_argument("--ed-config", default="configs/ed.yaml", dest="ed_config")
    s.add_argument("--gan-config", default="configs/gan.yaml", dest="gan_config")
    s.set_defaults(fn=cmd_doctor)

    s = sub.add_parser("diagnose", help="data-sanity diagnostics")
    s.add_argument("--split", default="train")
    s.add_argument("--splits-dir", default="data/splits")
    s.add_argument("--processed-dir", default="data/processed")
    s.set_defaults(fn=cmd_diagnose)

    s = sub.add_parser("analyze-midi", help="per-file MIDI statistics")
    s.add_argument("files", nargs="+")
    s.set_defaults(fn=cmd_analyze_midi)

    s = sub.add_parser("profile", help="trace + time the sampling hot path")
    s.add_argument("--steps", type=int, default=20)
    s.add_argument("--config", default="configs/gan.yaml")
    s.add_argument("--trace-dir", default=None, dest="trace_dir")
    s.set_defaults(fn=cmd_profile)

    s = sub.add_parser(
        "import-checkpoint",
        help="convert a reference torch .pth checkpoint to .ckpt",
    )
    s.add_argument("pth")
    s.add_argument("out")
    s.add_argument("--kind", choices=["ae", "ed", "gan"], required=True)
    s.add_argument("--ed-config", default=None, dest="ed_config")
    s.set_defaults(fn=cmd_import_checkpoint)

    s = sub.add_parser(
        "export-checkpoint",
        help="convert a framework .ckpt back to the reference torch .pth layout",
    )
    s.add_argument("ckpt")
    s.add_argument("out")
    s.add_argument("--kind", choices=["ae", "ed", "gan"], required=True)
    s.set_defaults(fn=cmd_export_checkpoint)

    s = sub.add_parser(
        "augment-corpus",
        help="expand real MIDI sources into an augmentation-expanded corpus "
             "(K variants/song, leakage-safe grouped splits)",
    )
    s.add_argument("--manifest", required=True,
                   help="CSV with file_key, emotion, full_path columns")
    s.add_argument("--out", required=True, help="output corpus root")
    s.add_argument("--per-song", type=int, default=20, dest="per_song")
    s.add_argument("--ratios", default="0.5/0.25/0.25",
                   help="train/val/test fractions over SOURCE songs")
    s.add_argument("--seed", type=int, default=42)
    s.set_defaults(fn=cmd_augment_corpus)

    s = sub.add_parser(
        "quality-gate",
        help="check generated .mid files against the golden-artifact bands",
    )
    s.add_argument("dir")
    s.add_argument("--no-strict", dest="strict", action="store_false",
                   help="report violations without failing")
    s.add_argument("--tier", choices=("default", "strict"), default="default",
                   help="band tier: 'strict' = raw golden envelopes "
                        "(no safety margins)")
    s.add_argument("--breakdown", action="store_true",
                   help="print a per-metric table: which bands fail, by how "
                        "much, in which files")
    s.add_argument("--breakdown-json", default=None, dest="breakdown_json",
                   metavar="PATH", help="also write the full per-file "
                        "per-metric breakdown as JSON")
    s.set_defaults(fn=cmd_quality_gate, strict=True)

    s = sub.add_parser(
        "eval-gen",
        help="judge-ED emotion accuracy of fresh generated samples "
             "(independent of the in-loss ED)",
    )
    s.add_argument("--config", default="configs/gan.yaml")
    s.add_argument("--ed-config", default="configs/ed.yaml")
    s.add_argument("--checkpoint", default=None,
                   help="generator checkpoint (default workdir gan_final.ckpt)")
    s.add_argument("--ema", action="store_true",
                   help="judge the EMA generator weights")
    s.add_argument("--workdir", default=".")
    s.add_argument("--splits-dir", default="data/splits")
    s.add_argument("--processed-dir", default="data/processed")
    s.add_argument("--samples", type=int, default=8, metavar="N",
                   help="fresh samples per emotion (default 8)")
    s.add_argument("--seed", type=int, default=1234)
    s.add_argument("--judge-epochs", type=int, default=None,
                   help="judge training epochs (default: ed config epochs)")
    s.add_argument("--retrain-judge", action="store_true",
                   help="retrain even if a judge checkpoint exists")
    s.add_argument("--min-accuracy", type=float, default=None,
                   help="exit nonzero when overall judge accuracy is below "
                        "this (optional gate)")
    s.set_defaults(fn=cmd_eval_gen)

    s = sub.add_parser(
        "text-eval",
        help="measured accuracy of the offline text-emotion backends",
    )
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--json", action="store_true")
    s.add_argument("--ceiling", action="store_true",
                   help="add the ceiling study: 1-NN surface baseline, "
                        "train-self capacity check, confusion matrix, "
                        "misclassified examples")
    s.set_defaults(fn=cmd_text_eval)

    s = sub.add_parser("tsne", help="latent-space t-SNE visualization")
    s.add_argument("--split", default="train")
    s.add_argument("--splits-dir", default="data/splits")
    s.add_argument("--processed-dir", default="data/processed")
    s.add_argument("--out", default="experiments")
    s.set_defaults(fn=cmd_tsne)

    s = sub.add_parser("serve", help="HTTP serving app")
    s.add_argument("--host", default="0.0.0.0")
    s.add_argument("--port", type=int, default=5000)
    s.add_argument("--workdir", default=".")
    s.add_argument("--config", default="configs/gan.yaml")
    s.add_argument("--checkpoint", default=None)
    s.add_argument("--fast-math", action="store_true", dest="fast_math",
                   help="bf16 MXU passes: ~2x throughput, non-f32-deterministic bytes")
    s.add_argument("--dp", type=int, default=0,
                   help="shard pool-refill batches over N devices")
    s.add_argument("--watch-ckpt", type=float, default=0.0, dest="watch_ckpt",
                   metavar="SECS",
                   help="auto hot-reload the checkpoint when its mtime "
                        "changes, polled every SECS (0 = off; POST /reload "
                        "swaps on demand either way)")
    s.add_argument("--ema", action="store_true",
                   help="serve the EMA generator weights (G_ema) from every "
                        "loaded checkpoint, incl. hot-swaps")
    s.set_defaults(fn=cmd_serve)

    s = sub.add_parser("roll-to-midi", help="raw (pitch,vel,dur,start) .npy → .mid")
    s.add_argument("roll")
    s.add_argument("--out", default=None)
    s.add_argument("--bpm", type=float, default=120.0)
    s.set_defaults(fn=cmd_roll_to_midi)

    s = sub.add_parser("clean", help="delete generated artifacts (dry-run by default)")
    s.add_argument("--workdir", default=".")
    s.add_argument("--confirm", action="store_true")
    s.set_defaults(fn=cmd_clean)

    s = sub.add_parser("logs", help="inspect tfevents training curves")
    s.add_argument("log_dir")
    s.add_argument("--tag", default=None)
    s.set_defaults(fn=cmd_logs)

    s = sub.add_parser("bench", help="benchmark harness")
    s.set_defaults(fn=cmd_bench)

    return p


# subcommand handlers that never touch jax — skip the jax import (and the
# compile-cache setup) entirely for them
_HOST_ONLY_FNS = {"cmd_synth_data", "cmd_preprocess", "cmd_make_splits",
                  "cmd_split_arrays", "cmd_analyze_midi", "cmd_quality_gate",
                  "cmd_clean", "cmd_logs",
                  # doctor must never init jax in-process: it diagnoses the
                  # wedged-device condition, whose init hangs forever
                  "cmd_doctor"}


def _enable_compile_cache():
    """Persistent XLA compile cache for jax-using CLI subcommands (the fused
    multi-epoch programs cost minutes to compile cold through this
    environment's remote TPU compiler; warm runs reuse them in <1 s).
    Override the location with MELOGAN_COMPILE_CACHE; set it to 0 to
    disable. Must run before tracing (safe before device access); this jax
    version does NOT honor the JAX_COMPILATION_CACHE_DIR env var, hence
    jax.config.update."""
    try:
        cache = os.environ.get(
            "MELOGAN_COMPILE_CACHE", os.path.join(_REPO_ROOT, ".jax_cache")
        )
        if cache and cache != "0":
            import jax

            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # noqa: BLE001 — cache is an optimization only
        print(f"[WARN] compile cache unavailable: {e}", file=sys.stderr)


def main(argv=None):
    args = build_parser().parse_args(argv)
    # MELOGAN_PLATFORM=cpu forces the backend for this invocation. The image's
    # TPU plugin overrides the JAX_PLATFORMS env var at interpreter startup,
    # so an env-only selection silently lands on the TPU — jax.config.update
    # BEFORE any device access is the only reliable switch (CLAUDE.md). Used
    # by CI/verify runs that must not attach to the single-client TPU.
    platform = os.environ.get("MELOGAN_PLATFORM")
    if platform:
        try:
            import jax

            jax.config.update("jax_platforms", platform)
        except Exception as e:  # noqa: BLE001 — never block the CLI on this
            print(f"[WARN] MELOGAN_PLATFORM={platform!r} not applied: {e}")
    if getattr(args.fn, "__name__", "") not in _HOST_ONLY_FNS:
        _enable_compile_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
