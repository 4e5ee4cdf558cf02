"""CLI surface: parser coverage and light end-to-end subcommands."""
import json
import os

import jax
import pytest

import numpy as np

from melogan_tpu.cli import build_parser, main


def test_parser_has_all_subcommands():
    p = build_parser()
    subs = p._subparsers._group_actions[0].choices
    expected = {
        "synth-data", "preprocess", "make-splits", "split-arrays",
        "train-ae", "encode", "train-ed", "eval-ed", "train-gan", "sweep",
        "sample", "pipeline", "precompile", "diagnose", "analyze-midi", "tsne",
        "serve", "bench", "roll-to-midi", "clean",
    }
    assert expected <= set(subs)


def test_roll_to_midi_cli(tmp_path, rng, capsys):
    roll = np.zeros((16, 4), np.float32)
    roll[:, 0] = rng.integers(40, 90, 16)
    roll[:, 1] = rng.integers(30, 120, 16)
    roll[:, 2] = rng.uniform(0.1, 1.0, 16)
    roll[:, 3] = np.arange(16) * 0.5
    npy = tmp_path / "roll.npy"
    np.save(npy, roll)
    out = tmp_path / "out.mid"
    main(["roll-to-midi", str(npy), "--out", str(out), "--bpm", "96"])
    from melogan_tpu.midi.midifile import read_midi

    song = read_midi(str(out))
    assert abs(song.initial_tempo - 96.0) < 0.01
    assert len(song.note_array()) == 16


def test_sample_cli_random_weights(tmp_path, capsys):
    main([
        "sample", "--emotion", "happy", "--samples", "2", "--seed", "5",
        "--config", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs/gan.yaml"),
        "--workdir", str(tmp_path), "--out", str(tmp_path / "gen"),
    ])
    files = sorted(os.listdir(tmp_path / "gen"))
    assert files == ["test_happy_1.mid", "test_happy_2.mid"]


def test_analyze_midi_cli(tmp_path, rng, capsys):
    from melogan_tpu.midi.codec import save_piano_roll_to_midi

    notes = rng.normal(0, 0.6, size=(64, 4)).astype(np.float32)
    path = tmp_path / "x.mid"
    save_piano_roll_to_midi(notes, str(path), bpm=120, scale="major", verbose=False)
    capsys.readouterr()
    main(["analyze-midi", str(path)])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    stats = json.loads(out)
    assert stats["file"] == "x.mid"
    assert stats["n_notes"] > 0 and "avg_pitch" in stats


def test_clean_cli_dry_run(tmp_path, capsys):
    (tmp_path / "generated_tests").mkdir()
    main(["clean", "--workdir", str(tmp_path)])
    out = capsys.readouterr().out
    assert "DRY RUN" in out
    assert (tmp_path / "generated_tests").exists()


def test_host_only_fns_exist():
    """_HOST_ONLY_FNS gates the compile-cache/jax-import skip by function
    name; a renamed handler must not silently fall out of the set."""
    from melogan_tpu import cli

    for name in cli._HOST_ONLY_FNS:
        assert callable(getattr(cli, name, None)), f"{name} is not a cli handler"
    # every registered subcommand handler is either host-only or jax-bound;
    # the parser must only reference real functions
    parser = cli.build_parser()
    for action in parser._subparsers._group_actions[0].choices.values():
        fn = action.get_default("fn")
        assert callable(fn)


def test_precompile_cli_warms_all_three_stages(tmp_path, capsys, monkeypatch):
    """`melogan precompile` compiles the AE/ED/GAN fused programs in parallel
    at the corpus shapes found in --splits-dir, with zero WARNs (a WARN means
    a precompile() diverged from its train() construction path)."""
    from jax.experimental.compilation_cache import compilation_cache as cc

    cache_dir = tmp_path / "xla_cache"
    monkeypatch.setenv("MELOGAN_COMPILE_CACHE", str(cache_dir))
    monkeypatch.setenv("MELOGAN_EPOCH_CHUNK", "2")
    prev_dir = jax.config.jax_compilation_cache_dir
    cc.reset_cache()  # rebind the singleton: an earlier test may own it

    data = tmp_path / "data"
    splits, processed = str(data / "splits"), str(data / "processed")
    main(["synth-data", "--out", str(data), "--per-emotion", "6", "--seed", "42"])
    main(["preprocess", "--manifest", str(data / "data_manifest.csv"), "--out", processed])
    main(["make-splits", "--manifest", str(data / "data_manifest.csv"),
          "--out", splits, "--seed", "42"])
    main(["split-arrays", "--splits-dir", splits, "--processed-dir", processed])

    # max_notes must equal the preprocessed corpus note length (512): the
    # AE/GAN loops consume the stored arrays unpadded, and _launch_precompiles
    # refuses to warm a program that can't match the later run
    ae = tmp_path / "ae.yaml"
    ae.write_text("latent_dim: 4\nhidden_dim: 32\n"
                  "batch_size: 8\nrecon_save_count: 2\n")
    ed = tmp_path / "ed.yaml"
    ed.write_text("input_mode: notes\nnotes_hidden: 32\n"
                  "mlp_hidden: [32, 16]\nbatch_size: 8\nlatent_dim: 4\n")
    gan = tmp_path / "gan.yaml"
    gan.write_text("NOISE_DIM: 16\nLATENT_DIM: 4\nGEN_HIDDEN: 32\n"
                   "BATCH_SIZE: 4\nCRITIC_ITERS: 2\nEPOCHS: 2\nSAVE_FREQ: 2\n")

    try:
        main(["precompile", "--workdir", str(tmp_path), "--splits-dir", splits,
              "--ae-config", str(ae), "--ed-config", str(ed),
              "--gan-config", str(gan)])
    finally:
        # main() pointed the config at the tmp dir — restore it and detach
        # the singleton so later tests don't persist into pytest tmp
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        cc.reset_cache()
    out = capsys.readouterr().out
    assert "precompile done (3 programs)" in out
    assert "[WARN]" not in out, out
    assert cache_dir.exists() and any(cache_dir.iterdir())


# ---------------------------------------------------------------------------
# Process-level crash recovery (real subprocesses, SIGKILL)
# ---------------------------------------------------------------------------

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CLI_BOOT = (
    "import jax; jax.config.update('jax_platforms', 'cpu'); "
    "import sys; from melogan_tpu.cli import main; main(sys.argv[1:])"
)


def _cli_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["MELOGAN_EPOCH_CHUNK"] = "2"  # checkpoint every 2 epochs
    env["MELOGAN_COMPILE_CACHE"] = "0"  # don't pollute the repo cache from tests
    return env


@pytest.mark.slow
def test_sigkill_crash_resume_through_real_cli(tmp_path):
    """Hard-crash recovery end to end: SIGKILL a real `melogan train-ae`
    subprocess mid-run, resume through the CLI, and the final checkpoints are
    ARRAY-IDENTICAL to an uninterrupted run — proving atomic checkpoint
    writes (utils/checkpoint.py:33-37) plus step-identical resume survive a
    kill at an arbitrary moment, not just the library-level simulated
    interruption of test_train_loops."""
    import signal
    import subprocess
    import sys
    import time

    from melogan_tpu.utils.checkpoint import load_checkpoint

    data = tmp_path / "data"
    splits = str(data / "splits")
    processed = str(data / "processed")
    prep = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "from melogan_tpu.cli import main; "
        f"main(['synth-data', '--out', {str(data)!r}, '--per-emotion', '6', '--seed', '42']); "
        f"main(['preprocess', '--manifest', {str(data / 'data_manifest.csv')!r}, '--out', {processed!r}]); "
        f"main(['make-splits', '--manifest', {str(data / 'data_manifest.csv')!r}, '--out', {splits!r}, '--seed', '42']); "
        f"main(['split-arrays', '--splits-dir', {splits!r}, '--processed-dir', {processed!r}])"
    )
    subprocess.run([sys.executable, "-c", prep], env=_cli_env(), check=True,
                   capture_output=True, timeout=300)

    cfg_path = tmp_path / "ae_tiny.yaml"
    cfg_path.write_text(
        "latent_dim: 4\nhidden_dim: 32\nbatch_size: 8\nepochs: 40\n"
        "recon_save_count: 2\n"
    )

    def train_args(workdir, resume=False):
        a = ["train-ae", "--config", str(cfg_path), "--workdir", str(workdir),
             "--splits-dir", splits, "--processed-dir", processed]
        return a + (["--resume"] if resume else [])

    # uninterrupted reference run
    straight = tmp_path / "straight"
    subprocess.run([sys.executable, "-c", _CLI_BOOT, *train_args(straight)],
                   env=_cli_env(), check=True, capture_output=True, timeout=600)

    # crash run: wait for the first checkpoint, then SIGKILL mid-training
    crash = tmp_path / "crash"
    ckpt = crash / "data" / "models" / "ae" / "ae_best.ckpt"
    proc = subprocess.Popen([sys.executable, "-c", _CLI_BOOT, *train_args(crash)],
                            env=_cli_env(), stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    try:
        deadline = time.monotonic() + 300
        while not ckpt.exists():
            assert proc.poll() is None, "train-ae exited before its first checkpoint"
            assert time.monotonic() < deadline, "no checkpoint within 300 s"
            time.sleep(0.02)
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == -signal.SIGKILL, (
        f"expected the kill to land mid-run, got exit {proc.returncode}"
    )

    # resume through the CLI and compare final artifacts
    subprocess.run([sys.executable, "-c", _CLI_BOOT, *train_args(crash, resume=True)],
                   env=_cli_env(), check=True, capture_output=True, timeout=600)
    for name in ("ae_best.ckpt", "ae_final.ckpt"):
        a = load_checkpoint(str(straight / "data" / "models" / "ae" / name))
        b = load_checkpoint(str(crash / "data" / "models" / "ae" / name))
        flat_a = jax.tree_util.tree_leaves_with_path(a)
        flat_b = jax.tree_util.tree_leaves_with_path(b)
        assert len(flat_a) == len(flat_b)
        for (pa, va), (pb, vb) in zip(flat_a, flat_b):
            assert pa == pb
            assert np.array_equal(np.asarray(va), np.asarray(vb)), (
                f"{name}: leaf {jax.tree_util.keystr(pa)} differs after crash-resume"
            )


def test_serve_warm_compiles_the_ladder(monkeypatch):
    """`melogan precompile --stages serve` wiring: warms batch-1 plus every
    pool refill-ladder size through the real sample step (ladder shrunk here;
    the real ladder is SamplePool.warm_sizes)."""
    from melogan_tpu import cli
    from melogan_tpu.config import GANConfig
    from melogan_tpu.serving import pool as pool_mod

    monkeypatch.setattr(pool_mod.SamplePool, "warm_sizes", lambda self: [2, 4])
    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    cli._serve_warm(cfg)  # completes without error = all programs compiled


@pytest.mark.slow
def test_pipeline_resume_skips_done_stages(tmp_path, capsys, monkeypatch):
    """`melogan pipeline --resume` after a completed run: data stages are
    skipped (outputs exist) and the train stages resume from their final
    checkpoints without retraining — the rerun completes fast and re-samples."""
    monkeypatch.setenv("MELOGAN_EPOCH_CHUNK", "2")
    monkeypatch.setenv("MELOGAN_PIPELINE_PRECOMPILE", "0")
    monkeypatch.setenv("MELOGAN_COMPILE_CACHE", "0")

    ae = tmp_path / "ae.yaml"
    ae.write_text("latent_dim: 4\nhidden_dim: 32\nbatch_size: 8\n"
                  "recon_save_count: 0\n")
    ed = tmp_path / "ed.yaml"
    ed.write_text("input_mode: notes\nnotes_hidden: 32\nmlp_hidden: [32, 16]\n"
                  "batch_size: 8\nlatent_dim: 4\n")
    gan = tmp_path / "gan.yaml"
    gan.write_text("NOISE_DIM: 16\nLATENT_DIM: 4\nGEN_HIDDEN: 32\n"
                   "BATCH_SIZE: 4\nCRITIC_ITERS: 2\nSAVE_FREQ: 2\n")

    argv = ["pipeline", "--workdir", str(tmp_path), "--synthetic",
            "--per-emotion", "6", "--epochs", "2", "--skip-quality-gate",
            "--ae-config", str(ae), "--ed-config", str(ed),
            "--gan-config", str(gan)]
    main(argv)
    capsys.readouterr()

    # resume after a COMPLETED run: data stages skip on existing outputs,
    # train/encode/sample stages skip on their completion markers (a finished
    # short run has no periodic checkpoint, so without markers the train
    # stages would silently retrain from scratch)
    main(argv + ["--resume"])
    out = capsys.readouterr().out
    for s in ("synth-data", "preprocess", "make-splits", "split-arrays"):
        assert f"--resume: skipping {s}" in out, out
    for s in ("train-ae", "encode", "train-ed", "train-gan", "sample"):
        assert f"--resume: skipping {s} (completed in a previous run)" in out, out
    assert "pipeline complete" in out
    meta = json.loads((tmp_path / "pipeline_timings.json").read_text())
    assert meta["resumed"] is True
    assert [s["name"] for s in meta["stages"]][:2] == ["synth-data", "preprocess"]

    # resume after an INTERRUPTION inside train-gan (its marker is missing):
    # upstream completed stages still skip, the interrupted stage resumes
    # from its periodic checkpoint, and downstream stages re-run
    (tmp_path / ".pipeline_done" / "train-gan.json").unlink()
    main(argv + ["--resume"])
    out = capsys.readouterr().out
    assert "--resume: skipping train-ed (completed in a previous run)" in out
    assert "resumed from" in out  # train-gan picked up its checkpoint
    assert "--resume: skipping sample" not in out  # downstream of a run stage
    assert "pipeline complete" in out

    # a changed invocation (different --epochs) invalidates every marker
    argv3 = [a if a != "2" else "3" for a in argv]  # --epochs 2 → 3
    main(argv3 + ["--resume"])
    out = capsys.readouterr().out
    assert "skipping train-ae (completed in a previous run)" not in out, out

    # resuming a FULLY completed pipeline must not launch (or join) any
    # background precompile: the train stages are predicted to skip, so
    # warming their XLA programs would block the resume on minutes of
    # remote compiles for stages that never run
    from melogan_tpu import cli

    def _boom(*a, **k):
        raise AssertionError("precompile launched for a fully-skipped resume")

    monkeypatch.setattr(cli, "_launch_precompiles", _boom)
    monkeypatch.setenv("MELOGAN_PIPELINE_PRECOMPILE", "1")
    main(argv3 + ["--resume"])
    out = capsys.readouterr().out
    assert "skipping train-gan (completed in a previous run)" in out, out
    monkeypatch.setenv("MELOGAN_PIPELINE_PRECOMPILE", "0")

    # a marker whose checkpoint was DELETED must re-run its stage: skipping
    # on the marker alone would hand cmd_sample a missing checkpoint and
    # silently emit random-weight artifacts
    gan_ckpt = tmp_path / "experiments" / "gan" / "checkpoints" / "gan_final.ckpt"
    assert gan_ckpt.exists()
    gan_ckpt.unlink()
    main(argv3 + ["--resume"])
    out = capsys.readouterr().out
    assert "skipping train-ed (completed in a previous run)" in out, out
    assert "skipping train-gan (completed in a previous run)" not in out, out
    assert gan_ckpt.exists()  # the stage re-ran and rewrote it

    # a changed --per-emotion must REGENERATE the data (and retrain), not
    # silently retrain on the stale corpus: done_if gates on the marker's
    # data_sig, not bare output existence
    argv4 = [a if a != "6" else "7" for a in argv3]  # --per-emotion 6 → 7
    main(argv4 + ["--resume"])
    out = capsys.readouterr().out
    assert "re-running synth-data (data parameters changed" in out, out
    assert "skipping train-ae" not in out, out


def test_doctor_cli_is_bounded_and_reports(tmp_path, capsys, monkeypatch):
    """`melogan doctor` completes within its probe bounds regardless of
    device state (it diagnoses the wedged-device condition, so it must never
    hang on it) and reports every check. Device outcome is environment-
    dependent and not asserted."""
    monkeypatch.setenv("MELOGAN_DOCTOR_PROBE_SECS", "3")
    try:
        main(["doctor", "--workdir", str(tmp_path)])
    except SystemExit:
        pass  # expected when any check FAILs (e.g. unavailable device)
    out = capsys.readouterr().out
    for frag in ("device:", "compile-cache:", "ae-config:", "splits:",
                 "native-midi:", "text-backend:", "doctor:"):
        assert frag in out, out
    # offline image: the framework's own trained classifier is the default
    # offline backend (round 4; lexicon remains the last-resort fallback)
    assert "text-backend: text-mlp" in out


def test_precompile_refuses_corpus_length_mismatch(tmp_path, capsys, monkeypatch):
    """A GAN config whose max_notes != the stored corpus note length can
    never match the real run — the warm-up must refuse (WARN + skip), not
    burn a multi-minute compile on a useless program."""
    monkeypatch.setenv("MELOGAN_COMPILE_CACHE", "0")
    data = tmp_path / "data"
    splits, processed = str(data / "splits"), str(data / "processed")
    main(["synth-data", "--out", str(data), "--per-emotion", "6", "--seed", "42"])
    main(["preprocess", "--manifest", str(data / "data_manifest.csv"), "--out", processed])
    main(["make-splits", "--manifest", str(data / "data_manifest.csv"),
          "--out", splits, "--seed", "42"])
    main(["split-arrays", "--splits-dir", splits, "--processed-dir", processed])

    gan = tmp_path / "gan.yaml"
    gan.write_text("MAX_NOTES: 64\nNOISE_DIM: 16\nLATENT_DIM: 4\nGEN_HIDDEN: 32\n")
    main(["precompile", "--workdir", str(tmp_path), "--splits-dir", splits,
          "--stages", "gan", "--gan-config", str(gan)])
    out = capsys.readouterr().out
    assert "skipping GAN precompile" in out and "512" in out
    assert "precompile done (0 programs)" in out


def test_parse_hyper_grid_forms():
    """--hyper accepts row form and column form; malformed specs exit typed."""
    from melogan_tpu.cli import parse_hyper_grid

    assert parse_hyper_grid(None) is None
    assert parse_hyper_grid("") is None
    rows = parse_hyper_grid('[{"lr_g": 1e-4}, {"lr_g": 2e-4, "lambda_gp": 5}]')
    assert rows == [{"lr_g": 1e-4}, {"lr_g": 2e-4, "lambda_gp": 5}]
    cols = parse_hyper_grid('{"lr_g": [1e-4, 2e-4], "lambda_emotion": [1, 2]}')
    assert cols == [{"lr_g": 1e-4, "lambda_emotion": 1},
                    {"lr_g": 2e-4, "lambda_emotion": 2}]
    with pytest.raises(SystemExit, match="share one length"):
        parse_hyper_grid('{"lr_g": [1e-4], "lr_d": [1, 2]}')
    with pytest.raises(SystemExit, match="list of override dicts"):
        parse_hyper_grid('[1, 2]')


def test_pipeline_gan_selection_flags(tmp_path, capsys, monkeypatch):
    """`pipeline --gan-ema DECAY --gan-track-best`: the GAN stage trains with
    a generator EMA and gate-tracked best checkpoint, and the sample stage
    consumes gan_best.ckpt's EMA weights (not gan_final's live ones)."""
    monkeypatch.setenv("MELOGAN_EPOCH_CHUNK", "2")
    monkeypatch.setenv("MELOGAN_PIPELINE_PRECOMPILE", "0")
    monkeypatch.setenv("MELOGAN_COMPILE_CACHE", "0")

    ae = tmp_path / "ae.yaml"
    ae.write_text("latent_dim: 4\nhidden_dim: 32\nbatch_size: 8\n"
                  "recon_save_count: 0\n")
    ed = tmp_path / "ed.yaml"
    ed.write_text("input_mode: notes\nnotes_hidden: 32\nmlp_hidden: [32, 16]\n"
                  "batch_size: 8\nlatent_dim: 4\n")
    gan = tmp_path / "gan.yaml"
    gan.write_text("NOISE_DIM: 16\nLATENT_DIM: 4\nGEN_HIDDEN: 32\n"
                   "BATCH_SIZE: 4\nCRITIC_ITERS: 2\nSAVE_FREQ: 2\n")

    main(["pipeline", "--workdir", str(tmp_path), "--synthetic",
          "--per-emotion", "6", "--epochs", "2", "--skip-quality-gate",
          "--gan-ema", "0.9", "--gan-track-best",
          "--ae-config", str(ae), "--ed-config", str(ed),
          "--gan-config", str(gan)])
    out = capsys.readouterr().out
    assert "pipeline complete" in out

    from melogan_tpu.utils.checkpoint import load_checkpoint

    best = tmp_path / "experiments/gan/checkpoints/gan_best.ckpt"
    assert best.exists()
    ckpt = load_checkpoint(str(best))
    assert "G_ema" in ckpt and "gate" in ckpt
    # the sample stage loaded the gate-selected best, as EMA weights
    assert f"loaded generator from {best}" in out
    assert "(EMA weights)" in out
    gen = tmp_path / "generated_tests"
    mids = list(gen.glob("*.mid"))
    assert len(mids) == 8 and all(m.stat().st_size > 0 for m in mids)


def test_make_splits_ratios_flag(tmp_path, capsys):
    """--ratios lets tiny corpora avoid empty splits (16 files at the default
    70/15/15 stratified cut round the test split to zero)."""
    import csv

    from melogan_tpu.data.synthetic import generate_corpus

    entries = generate_corpus(str(tmp_path), n_per_emotion=4, seed=0, n_notes=16)
    manifest = str(tmp_path / "data_manifest.csv")
    main(["make-splits", "--manifest", manifest, "--out", str(tmp_path / "s"),
          "--ratios", "0.5/0.25/0.25"])
    out = capsys.readouterr().out
    assert "'train': 8" in out and "'val': 4" in out and "'test': 4" in out
    for name, want in (("train", 8), ("val", 4), ("test", 4)):
        rows = list(csv.DictReader(open(tmp_path / "s" / f"{name}_split.csv")))
        assert len(rows) == want

    import pytest

    with pytest.raises(SystemExit, match="ratios"):
        main(["make-splits", "--manifest", manifest, "--out", str(tmp_path / "s2"),
              "--ratios", "0.5/0.6"])
