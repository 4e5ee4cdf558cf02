"""Judge-ED: independent emotion accuracy of generated samples (VERDICT-r3
item 2). The judge trains on held-out data with a different seed and is never
part of G's loss; these tests pin its mechanics at CI scale."""
import json
import os

import numpy as np

from melogan_tpu.config import EDConfig, GANConfig
from melogan_tpu.diagnostics import judge as judge_mod
from test_train_loops import synth_split


def tiny_ed_cfg():
    return EDConfig(
        max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,),
        batch_size=8, num_epochs=15,
    )


def test_judge_trains_heldout_with_distinct_seed(rng, tmp_path):
    ed_cfg = tiny_ed_cfg()
    ed_cfg.optimizer.lr = 1e-3
    jcfg = judge_mod.judge_config(ed_cfg)
    assert jcfg.seed == ed_cfg.seed + judge_mod.JUDGE_SEED_OFFSET
    assert jcfg.checkpoint_dir != ed_cfg.checkpoint_dir
    assert jcfg.input_mode == "notes"

    val_data = synth_split(rng, 24, 64)   # stands in for the held-out split
    test_data = synth_split(rng, 8, 64)
    jcfg, state = judge_mod.train_judge(
        ed_cfg, val_data, test_data, workdir=str(tmp_path)
    )
    assert os.path.exists(tmp_path / jcfg.checkpoint_dir / "ed_best.ckpt")

    # the judge recognizes the real data it never trained on G with
    report = judge_mod.judge_notes(
        jcfg, state, val_data.notes_gan(), val_data.emotion_idx
    )
    assert report["accuracy"] > 0.7
    assert set(report["per_emotion"]) == {"happy", "sad", "angry", "calm"}
    assert np.asarray(report["confusion"]).sum() == 24


def test_judge_generated_is_deterministic_and_near_chance_for_random_G(rng, tmp_path):
    ed_cfg = tiny_ed_cfg()
    ed_cfg.optimizer.lr = 1e-3
    jcfg, state = judge_mod.train_judge(
        ed_cfg, synth_split(rng, 24, 64), synth_split(rng, 8, 64),
        workdir=str(tmp_path),
    )

    from melogan_tpu.sampling import Sampler

    gan_cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    sampler = Sampler(gan_cfg, seed=0)  # random weights
    r1 = judge_mod.judge_generated(jcfg, state, sampler, n_per_emotion=4, seed=7)
    r2 = judge_mod.judge_generated(jcfg, state, sampler, n_per_emotion=4, seed=7)
    assert r1 == r2  # deterministic given (weights, seed) — gate-usable
    assert r1["n"] == 16
    # an untrained G emits one near-constant pattern for all emotions: at
    # most one target class can score, so overall accuracy is far from 1.0
    assert r1["accuracy"] <= 0.5


def test_eval_gen_cli(tmp_path, capsys, monkeypatch):
    """End-to-end: mini pipeline, then `melogan eval-gen` trains the judge on
    the held-out splits, scores fresh samples, writes eval_gen.json, and the
    --min-accuracy gate can fail."""
    import pytest

    from melogan_tpu.cli import main

    monkeypatch.setenv("MELOGAN_EPOCH_CHUNK", "2")
    monkeypatch.setenv("MELOGAN_PIPELINE_PRECOMPILE", "0")
    monkeypatch.setenv("MELOGAN_COMPILE_CACHE", "0")

    ae = tmp_path / "ae.yaml"
    ae.write_text("latent_dim: 4\nhidden_dim: 32\nbatch_size: 8\n"
                  "recon_save_count: 0\n")
    ed = tmp_path / "ed.yaml"
    ed.write_text("input_mode: notes\nnotes_hidden: 32\nmlp_hidden: [32, 16]\n"
                  "batch_size: 8\nlatent_dim: 4\nnum_epochs: 6\n")
    gan = tmp_path / "gan.yaml"
    gan.write_text("NOISE_DIM: 16\nLATENT_DIM: 4\nGEN_HIDDEN: 32\n"
                   "BATCH_SIZE: 4\nCRITIC_ITERS: 2\nSAVE_FREQ: 2\n")
    main(["pipeline", "--workdir", str(tmp_path), "--synthetic",
          "--per-emotion", "8", "--epochs", "2", "--skip-quality-gate",
          "--ae-config", str(ae), "--ed-config", str(ed),
          "--gan-config", str(gan)])
    capsys.readouterr()

    splits = str(tmp_path / "data" / "splits")
    processed = str(tmp_path / "data" / "processed")
    args = ["eval-gen", "--workdir", str(tmp_path), "--config", str(gan),
            "--ed-config", str(ed), "--splits-dir", splits,
            "--processed-dir", processed, "--samples", "2",
            "--judge-epochs", "4"]
    main(args)
    out = capsys.readouterr().out
    assert "training judge ED on the held-out val split" in out
    assert "judge-ED accuracy" in out
    report = json.loads((tmp_path / "eval_gen.json").read_text())
    assert report["n"] == 8 and 0.0 <= report["accuracy"] <= 1.0
    # judge calibration on REAL held-out test rows always rides along so the
    # generated-sample number is interpretable in tiny-source regimes
    assert report["judge_real"] is not None
    assert 0.0 <= report["judge_real"]["accuracy"] <= 1.0
    assert report["judge_real"]["n"] > 0

    # second run reuses the saved judge
    main(args)
    out = capsys.readouterr().out
    assert "loaded judge ED" in out
    assert "judge on REAL held-out test data" in out

    # the gate can fail: demand an impossible accuracy
    with pytest.raises(SystemExit, match="min-accuracy"):
        main(args + ["--min-accuracy", "1.01"])
