"""Training loops on synthetic data (CPU, tiny shapes): losses move, harness
mechanics (plateau, early stop, checkpoints) behave, latents export."""
import os

import jax

import numpy as np
import pytest

from melogan_tpu.config import AEConfig, EDConfig, GANConfig
from melogan_tpu.data.datasets import SplitData
from melogan_tpu.data.preprocess import raw_to_gan_normalized
from melogan_tpu.train import ed_loop, gan_loop, vae_loop
from melogan_tpu.train.harness import EarlyStopping, ReduceLROnPlateau, beta_schedule
from melogan_tpu.utils.checkpoint import load_checkpoint


def synth_split(rng, n=24, max_notes=64):
    """Emotion-differentiated raw-notes split, directly in memory."""
    notes = np.zeros((n, max_notes, 4), np.float32)
    emotions = np.empty(n, dtype=object)
    numeric = np.zeros((n, 6), np.float32)
    styles = {
        0: ("happy", 75, 95, 0.3),
        1: ("sad", 45, 60, 1.2),
        2: ("angry", 40, 120, 0.2),
        3: ("calm", 60, 65, 0.8),
    }
    for i in range(n):
        name, pitch0, vel, step = styles[i % 4]
        emotions[i] = name
        notes[i, :, 0] = np.clip(pitch0 + rng.normal(0, 3, max_notes), 21, 108)
        steps = np.abs(rng.normal(step, 0.1, max_notes))
        notes[i, :, 1] = np.cumsum(steps) - steps
        notes[i, :, 2] = np.abs(rng.normal(step * 2, 0.2, max_notes)) + 0.1
        notes[i, :, 3] = np.clip(vel + rng.normal(0, 5, max_notes), 1, 127)
        numeric[i] = rng.normal(0, 1, 6)
        numeric[i, 0] += (i % 4) - 1.5  # emotion-correlated feature
    return SplitData(
        notes_raw=notes,
        emotions=np.asarray([str(e) for e in emotions]),
        numeric=numeric,
        filenames=[f"s{i}.npz" for i in range(n)],
    )


@pytest.fixture
def splits(rng):
    return synth_split(rng, 24, 64), synth_split(rng, 8, 64)


def test_vae_training_reduces_loss(splits, tmp_path):
    train_data, val_data = splits
    cfg = AEConfig(max_notes=64, batch_size=8, epochs=4, recon_save_count=2)
    state, metrics = vae_loop.train(
        cfg, train_data, val_data, workdir=str(tmp_path), verbose=False
    )
    assert np.isfinite(metrics["best_val"])
    # artifacts: best + final checkpoints, metrics, recon dumps
    assert os.path.exists(tmp_path / cfg.checkpoint_dir / "ae_best.ckpt")
    assert os.path.exists(tmp_path / cfg.checkpoint_dir / "ae_final.ckpt")
    assert os.path.exists(tmp_path / cfg.log_dir / "metrics.jsonl")
    recon_files = os.listdir(tmp_path / cfg.recon_dir)
    assert any(f.endswith("_in.mid") for f in recon_files)
    assert any(f.endswith("_out.mid") for f in recon_files)
    # checkpoint restores
    ckpt = load_checkpoint(str(tmp_path / cfg.checkpoint_dir / "ae_best.ckpt"))
    assert "params" in ckpt and "opt_state" in ckpt

    # latent export shape
    from melogan_tpu.models.vae import VAE

    model = VAE.from_config(cfg)
    mu = vae_loop.encode_mu(model, state, val_data.notes_ae(cfg))
    assert mu.shape == (8, cfg.latent_dim)


def test_ed_training_learns(splits, tmp_path):
    train_data, val_data = splits
    cfg = EDConfig(
        max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,),
        batch_size=8, num_epochs=15,
    )
    cfg.optimizer.lr = 1e-3  # tiny data: a few dozen steps need a hotter LR
    state, metrics = ed_loop.train(
        cfg, train_data, val_data, workdir=str(tmp_path), verbose=False
    )
    result = ed_loop.evaluate(cfg, state, val_data)
    assert result["n"] == 8
    assert len(result["confusion"]) == 4
    # strongly separated synthetic classes: should beat chance comfortably
    train_eval = ed_loop.evaluate(cfg, state, train_data)
    assert train_eval["accuracy"] > 0.7


def test_ed_weighted_sampler_runs(splits, tmp_path):
    train_data, val_data = splits
    cfg = EDConfig(
        max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,),
        batch_size=8, num_epochs=2, use_weighted_sampler=True,
    )
    _, _ = ed_loop.train(cfg, train_data, val_data, workdir=str(tmp_path), verbose=False)


def test_gan_training_moves_losses(splits, tmp_path):
    train_data, _ = splits
    cfg = GANConfig(
        max_notes=64, batch_size=4, noise_dim=16, latent_dim=8, gen_hidden=32,
        epochs=3, save_freq=2,
    )
    ed_cfg = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,))
    state, metrics = gan_loop.train(
        cfg, ed_cfg, train_data, workdir=str(tmp_path), verbose=False
    )
    assert np.isfinite(metrics["Loss/Critic"])
    # with 24 samples / batch 4 = 6 batches -> one 5-group + 1 tail: G trains
    assert metrics["Loss/Generator_Adv"] != 0.0
    assert os.path.exists(tmp_path / cfg.checkpoint_dir / "gan_final.ckpt")
    assert os.path.exists(tmp_path / cfg.checkpoint_dir / "gan_epoch0002.ckpt")
    # reload the final checkpoint into a sampler
    gen_vars, fe_vars = gan_loop.load_gan_final(
        str(tmp_path / cfg.checkpoint_dir / "gan_final.ckpt")
    )
    from melogan_tpu.sampling import Sampler

    sampler = Sampler(cfg, gen_variables=gen_vars, fe_variables=fe_vars)
    notes = sampler.sample_notes(["angry"], seed=1)
    assert notes.shape == (1, 64, 4)


def test_plateau_scheduler_semantics():
    sched = ReduceLROnPlateau(factor=0.5, patience=2, min_lr=1e-6)
    lr = 1.0
    lr = sched.step(1.0, lr)  # best=1.0
    assert lr == 1.0
    for _ in range(2):
        lr = sched.step(1.0, lr)  # no improvement ×2 → still within patience
    assert lr == 1.0
    lr = sched.step(1.0, lr)  # 3rd bad epoch → reduce
    assert lr == 0.5


def test_early_stopping_semantics():
    es = EarlyStopping(patience=2)
    assert not es.step(1.0) and es.improved
    assert not es.step(0.5) and es.improved
    assert not es.step(0.6) and not es.improved
    assert es.step(0.7)  # second bad epoch → stop


def test_beta_schedule():
    assert beta_schedule(1, 1, 10.0) == 10.0  # warmup 1 → full at epoch 1
    assert beta_schedule(1, 4, 10.0) == 2.5
    assert beta_schedule(4, 4, 10.0) == 10.0
    assert beta_schedule(9, 4, 10.0) == 10.0


def test_gan_resume_from_checkpoint(splits, tmp_path, rng):
    """Kill-and-resume: a resumed run restores params + optimizer state and
    continues from the next epoch."""
    train_data, _ = splits
    cfg = GANConfig(
        max_notes=64, batch_size=4, noise_dim=16, latent_dim=8, gen_hidden=32,
        epochs=2, save_freq=2,
    )
    ed_cfg = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,))
    state1, _ = gan_loop.train(cfg, ed_cfg, train_data, workdir=str(tmp_path), verbose=False)

    # resume for 2 more epochs
    cfg4 = GANConfig(
        max_notes=64, batch_size=4, noise_dim=16, latent_dim=8, gen_hidden=32,
        epochs=4, save_freq=2,
    )
    state2, metrics = gan_loop.train(
        cfg4, ed_cfg, train_data, workdir=str(tmp_path), verbose=False, resume=True
    )
    assert metrics["epoch"] == 4
    # params actually moved past the restored point
    a = jax.tree_util.tree_leaves(state1.gen_params)[0]
    b = jax.tree_util.tree_leaves(state2.gen_params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_ed_latent_mode_training(splits, tmp_path, rng):
    """input_mode='latent' (no batch-norm collections): trains end to end."""
    train_data, val_data = splits
    lat_tr = rng.normal(size=(train_data.n, 8)).astype(np.float32)
    lat_tr += train_data.emotion_idx[:, None]  # separable signal
    lat_va = rng.normal(size=(val_data.n, 8)).astype(np.float32)
    lat_va += val_data.emotion_idx[:, None]
    cfg = EDConfig(input_mode="latent", latent_dim=8, mlp_hidden=(16,),
                   batch_size=8, num_epochs=10)
    cfg.optimizer.lr = 1e-2
    state, metrics = ed_loop.train(
        cfg, train_data, val_data, lat_tr, lat_va, workdir=str(tmp_path), verbose=False
    )
    assert ed_loop.evaluate(cfg, state, train_data, latents=lat_tr)["accuracy"] > 0.7


def test_vae_resume_from_checkpoint(splits, tmp_path):
    train_data, val_data = splits
    cfg = AEConfig(max_notes=64, batch_size=8, epochs=2, recon_save_count=0)
    vae_loop.train(cfg, train_data, val_data, workdir=str(tmp_path),
                   verbose=False, recon_dumps=False)
    cfg4 = AEConfig(max_notes=64, batch_size=8, epochs=4, recon_save_count=0)
    _, metrics = vae_loop.train(cfg4, train_data, val_data, workdir=str(tmp_path),
                                verbose=False, recon_dumps=False, resume=True)
    assert metrics.get("epoch", 0) >= 3  # continued past the restored epoch


def test_ed_resume_from_checkpoint(splits, tmp_path):
    train_data, val_data = splits
    cfg = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,),
                   batch_size=8, num_epochs=5, save_freq=2)
    ed_loop.train(cfg, train_data, val_data, workdir=str(tmp_path), verbose=False)
    cfg8 = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,),
                    batch_size=8, num_epochs=8, save_freq=2)
    _, metrics = ed_loop.train(cfg8, train_data, val_data, workdir=str(tmp_path),
                               verbose=False, resume=True)
    assert metrics.get("epoch", 0) >= 5


# ---------------------------------------------------------------------------
# Step-identical resume (VERDICT r1 item 8): interrupted-and-resumed training
# must reproduce the straight-through run exactly — scheduler/early-stop wait
# counters, device RNG streams, and data order all checkpointed and replayed.
# ---------------------------------------------------------------------------


def _leaves_equal(a, b, atol=0.0):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol, rtol=0)


def test_vae_resume_is_step_identical(splits, tmp_path):
    train_data, val_data = splits
    kw = dict(max_notes=64, batch_size=8, recon_save_count=0)
    straight, _ = vae_loop.train(
        AEConfig(epochs=4, **kw), train_data, val_data,
        workdir=str(tmp_path / "straight"), verbose=False, recon_dumps=False,
    )
    vae_loop.train(
        AEConfig(epochs=2, **kw), train_data, val_data,
        workdir=str(tmp_path / "resumed"), verbose=False, recon_dumps=False,
    )
    resumed, _ = vae_loop.train(
        AEConfig(epochs=4, **kw), train_data, val_data,
        workdir=str(tmp_path / "resumed"), verbose=False, recon_dumps=False, resume=True,
    )
    _leaves_equal(straight.params, resumed.params)
    _leaves_equal(straight.batch_stats, resumed.batch_stats)


def test_ed_resume_is_step_identical(splits, tmp_path):
    train_data, val_data = splits
    kw = dict(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,),
              batch_size=8, save_freq=2)
    straight, _ = ed_loop.train(
        EDConfig(num_epochs=6, **kw), train_data, val_data,
        workdir=str(tmp_path / "straight"), verbose=False,
    )
    ed_loop.train(
        EDConfig(num_epochs=4, **kw), train_data, val_data,
        workdir=str(tmp_path / "resumed"), verbose=False,
    )
    resumed, _ = ed_loop.train(
        EDConfig(num_epochs=6, **kw), train_data, val_data,
        workdir=str(tmp_path / "resumed"), verbose=False, resume=True,
    )
    _leaves_equal(straight.params, resumed.params)
    _leaves_equal(straight.batch_stats, resumed.batch_stats)


def test_gan_resume_is_step_identical(splits, tmp_path):
    train_data, _ = splits
    kw = dict(max_notes=64, batch_size=4, noise_dim=16, latent_dim=8,
              gen_hidden=32, save_freq=2)
    ed_cfg = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,))
    straight, _ = gan_loop.train(
        GANConfig(epochs=4, **kw), ed_cfg, train_data,
        workdir=str(tmp_path / "straight"), verbose=False,
    )
    gan_loop.train(
        GANConfig(epochs=2, **kw), ed_cfg, train_data,
        workdir=str(tmp_path / "resumed"), verbose=False,
    )
    resumed, _ = gan_loop.train(
        GANConfig(epochs=4, **kw), ed_cfg, train_data,
        workdir=str(tmp_path / "resumed"), verbose=False, resume=True,
    )
    _leaves_equal(straight.gen_params, resumed.gen_params)
    _leaves_equal(straight.critic_params, resumed.critic_params)
    _leaves_equal(straight.gen_stats, resumed.gen_stats)
    _leaves_equal(straight.fe_params, resumed.fe_params)


def test_harness_state_dict_roundtrip():
    p = ReduceLROnPlateau(patience=3)
    s = EarlyStopping(patience=5)
    for m in (1.0, 1.1, 1.2, 0.9, 0.95):
        p.step(m, 1e-3)
        s.step(m)
    p2, s2 = ReduceLROnPlateau(patience=3), EarlyStopping(patience=5)
    p2.load_state_dict(p.state_dict())
    s2.load_state_dict(s.state_dict())
    assert (p2.best, p2.num_bad_epochs) == (p.best, p.num_bad_epochs)
    assert (s2.best, s2.num_bad_epochs) == (s.best, s.num_bad_epochs)


def test_vae_chunked_run_matches_per_epoch_dispatch(splits, tmp_path, monkeypatch):
    """The fused multi-epoch program (chunk > 1, with post-stop epochs masked)
    must produce the same training trajectory as per-epoch dispatch
    (chunk = 1), including early-stop timing and the best checkpoint."""
    train_data, val_data = splits
    # patience small enough that early stop triggers mid-chunk on tiny data
    cfg = AEConfig(max_notes=64, batch_size=8, epochs=12, recon_save_count=0,
                   early_stop_patience=3)

    results = {}
    for chunk in ("1", "5"):
        monkeypatch.setenv("MELOGAN_EPOCH_CHUNK", chunk)
        wd = tmp_path / f"chunk{chunk}"
        state, metrics = vae_loop.train(
            cfg, train_data, val_data, workdir=str(wd), verbose=False,
            recon_dumps=False,
        )
        ckpt = load_checkpoint(str(wd / cfg.checkpoint_dir / "ae_best.ckpt"))
        results[chunk] = (metrics, ckpt)

    m1, c1 = results["1"]
    m5, c5 = results["5"]
    assert m1["best_val"] == pytest.approx(m5["best_val"], rel=1e-6)
    assert m1.get("epoch") == m5.get("epoch")
    assert c1["epoch"] == c5["epoch"]
    assert c1["plateau"] == c5["plateau"]
    assert c1["stopper"] == c5["stopper"]
    for a, b in zip(
        jax.tree_util.tree_leaves(c1["params"]), jax.tree_util.tree_leaves(c5["params"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_precision_training_plumbing(splits, tmp_path):
    """`--bf16` (harness.jit_with_precision): the wrapped program must run,
    restore the global layer precision after each call, and — on CPU, where
    MXU precision requests are no-ops — reproduce the f32 trajectory."""
    from melogan_tpu.models.layers import default_precision
    from melogan_tpu.train.harness import jit_with_precision

    train_data, val_data = splits
    cfg = AEConfig(max_notes=64, batch_size=8, epochs=2, recon_save_count=0)
    before = default_precision()
    state_bf16, m_bf16 = vae_loop.train(
        cfg, train_data, val_data, workdir=str(tmp_path / "bf16"),
        verbose=False, recon_dumps=False, precision="bf16",
    )
    assert default_precision() is before  # restored after every dispatch
    state_f32, m_f32 = vae_loop.train(
        cfg, train_data, val_data, workdir=str(tmp_path / "f32"),
        verbose=False, recon_dumps=False,
    )
    # CPU ignores MXU precision: identical math, identical trajectory
    np.testing.assert_allclose(m_bf16["best_val"], m_f32["best_val"], rtol=1e-6)

    # the wrapper itself: identity for highest, wrapped for bf16
    f = lambda x: x * 2.0
    assert jit_with_precision(f, None)(3.0) == 6.0
    assert float(jit_with_precision(f, "bf16")(3.0)) == 6.0
    assert default_precision() is before


def test_gan_padded_final_chunk_matches_unchunked(splits, tmp_path):
    """ADVICE-r2 #1: a run whose epochs don't divide save_freq pads the final
    chunk with live-masked rows; the trajectory must equal the same run
    dispatched as one full chunk (padding epochs are device no-ops)."""
    train_data, _ = splits
    ed_cfg = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,))
    base = dict(max_notes=64, batch_size=4, noise_dim=16, latent_dim=8,
                gen_hidden=32, epochs=3)
    s_pad, m_pad = gan_loop.train(
        GANConfig(**base, save_freq=2),  # chunks [1,2] + padded [3,(3)]
        ed_cfg, train_data, workdir=str(tmp_path / "pad"), verbose=False,
    )
    s_one, m_one = gan_loop.train(
        GANConfig(**base, save_freq=3),  # one unpadded chunk [1,2,3]
        ed_cfg, train_data, workdir=str(tmp_path / "one"), verbose=False,
    )
    assert m_pad["Loss/Critic"] == pytest.approx(m_one["Loss/Critic"], rel=1e-5)
    assert m_pad["Loss/Generator_Adv"] == pytest.approx(m_one["Loss/Generator_Adv"], rel=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_pad.gen_params)
        + jax.tree_util.tree_leaves(s_pad.critic_params),
        jax.tree_util.tree_leaves(s_one.gen_params)
        + jax.tree_util.tree_leaves(s_one.critic_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_vae_recon_dumps_respect_recon_freq(splits, tmp_path):
    """ADVICE-r2 #2: the fused program computes the fixed-set reconstruction
    only on dump epochs (ep % recon_freq == 0); the host writes exactly
    those files and no others."""
    train_data, val_data = splits
    cfg = AEConfig(max_notes=64, batch_size=8, epochs=5, recon_save_count=2,
                   recon_freq=2)
    vae_loop.train(cfg, train_data, val_data, workdir=str(tmp_path), verbose=False)
    recon_files = os.listdir(tmp_path / cfg.recon_dir)
    eps = sorted({int(f.split("_")[0][2:]) for f in recon_files})
    assert eps == [2, 4], recon_files


# ---------------------------------------------------------------------------
# Pipeline precompile: warm the persistent cache with the EXACT stage programs
# ---------------------------------------------------------------------------


def _with_fresh_cache(tmp_path, fn):
    """Run fn() with an isolated persistent compile cache; returns the set of
    cache entries created. Restores the global cache config afterwards."""
    from jax.experimental.compilation_cache import compilation_cache as cc

    cache = str(tmp_path / "xla_cache")
    os.makedirs(cache, exist_ok=True)
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.35)
    # the cache singleton binds its directory at first use and ignores later
    # config updates — drop it so this test's dir takes effect
    cc.reset_cache()
    try:
        fn()
        return set(os.listdir(cache))
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)
        cc.reset_cache()


def test_ed_precompile_seeds_the_exact_train_program(splits, tmp_path):
    """precompile() must produce the SAME XLA program train() compiles: after
    warming a fresh persistent cache, a real train() run adds no new cache
    entry for the fused program. Guards against shape/dtype drift between
    precompile's reconstruction and train's real argument construction."""
    train_data, val_data = splits
    cfg = EDConfig(max_notes=64, batch_size=8, num_epochs=2, save_freq=2,
                   notes_hidden=32, mlp_hidden=[32, 16])

    before = _with_fresh_cache(
        tmp_path, lambda: ed_loop.precompile(cfg, train_data.n, val_data.n)
    )
    assert before, "precompile cached nothing (min-compile-time too high?)"

    def run_train():
        ed_loop.train(cfg, train_data, val_data,
                      workdir=str(tmp_path / "ed"), verbose=False)

    after = _with_fresh_cache(tmp_path, run_train)
    assert after == before, (
        f"train() compiled a program precompile missed: {after - before}"
    )


def test_ed_precompile_uses_corpus_note_length(splits, tmp_path):
    """ED notes mode consumes the stored corpus arrays unpadded (the encoder
    is length-agnostic), so when cfg.max_notes != the corpus note length the
    warmed program must be built at the CORPUS length or it can never match
    the real run."""
    train_data, val_data = splits  # corpus note length 64
    cfg = EDConfig(max_notes=128, batch_size=8, num_epochs=2, save_freq=2,
                   notes_hidden=32, mlp_hidden=[32, 16])

    before = _with_fresh_cache(
        tmp_path,
        lambda: ed_loop.precompile(cfg, train_data.n, val_data.n, notes_len=64),
    )
    assert before

    def run_train():
        ed_loop.train(cfg, train_data, val_data,
                      workdir=str(tmp_path / "ed"), verbose=False)

    after = _with_fresh_cache(tmp_path, run_train)
    assert after == before, (
        f"train() compiled a program precompile missed: {after - before}"
    )


def test_ed_precompile_matches_bf16_train_program(splits, tmp_path):
    """--bf16 runs trace different programs (single-pass bf16 MXU matmuls);
    precompile(precision='bf16') must warm exactly those. Also guards the
    precision context being thread-correct: a warmed program traced at the
    wrong precision would show up as a cache mismatch here."""
    train_data, val_data = splits
    cfg = EDConfig(max_notes=64, batch_size=8, num_epochs=2, save_freq=2,
                   notes_hidden=32, mlp_hidden=[32, 16])

    before = _with_fresh_cache(
        tmp_path,
        lambda: ed_loop.precompile(cfg, train_data.n, val_data.n,
                                   precision="bf16"),
    )
    assert before

    def run_train():
        ed_loop.train(cfg, train_data, val_data, workdir=str(tmp_path / "ed"),
                      verbose=False, precision="bf16")

    after = _with_fresh_cache(tmp_path, run_train)
    assert after == before, (
        f"bf16 train() compiled a program precompile missed: {after - before}"
    )


def test_ed_precompile_matches_dp_train_program(splits, tmp_path):
    """Under --dp the train() data args are committed replicated-over-mesh,
    and that sharding enters jit's compile key — precompile must reproduce it
    (harness.data_sds) or the warmed program never matches the dp run."""
    from melogan_tpu.parallel.mesh import make_mesh

    train_data, val_data = splits
    cfg = EDConfig(max_notes=64, batch_size=8, num_epochs=2, save_freq=2,
                   notes_hidden=32, mlp_hidden=[32, 16])
    mesh = make_mesh(n_devices=2)

    before = _with_fresh_cache(
        tmp_path,
        lambda: ed_loop.precompile(cfg, train_data.n, val_data.n, mesh=mesh),
    )
    assert before

    def run_train():
        ed_loop.train(cfg, train_data, val_data,
                      workdir=str(tmp_path / "ed"), verbose=False, mesh=mesh)

    after = _with_fresh_cache(tmp_path, run_train)
    assert after == before, (
        f"dp train() compiled a program precompile missed: {after - before}"
    )


def test_vae_precompile_seeds_the_exact_train_program(splits, tmp_path, monkeypatch):
    monkeypatch.setenv("MELOGAN_EPOCH_CHUNK", "2")  # keep the fused program small
    train_data, val_data = splits
    cfg = AEConfig(max_notes=64, batch_size=8, epochs=2, recon_save_count=2)

    before = _with_fresh_cache(
        tmp_path, lambda: vae_loop.precompile(cfg, train_data.n, val_data.n)
    )
    assert before, "precompile cached nothing (min-compile-time too high?)"

    def run_train():
        vae_loop.train(cfg, train_data, val_data,
                       workdir=str(tmp_path / "ae"), verbose=False)

    # the encode program is checked separately
    # (test_encode_program_is_weight_independent): its ~0.35 s compile
    # straddles the cache persistence threshold, which made a cache-entry
    # equality assertion for it nondeterministic on a loaded host
    after = {e for e in _with_fresh_cache(tmp_path, run_train)
             if not e.startswith("jit__lambda")}
    before = {e for e in before if not e.startswith("jit__lambda")}
    assert after == before, (
        f"train() compiled a program precompile missed: {after - before}"
    )


def test_encode_program_is_weight_independent(splits):
    """encode_mu's program must take the weights as jit ARGUMENTS: closure
    capture would inline them into the HLO as constants, forcing a fresh XLA
    compile for every new checkpoint (the bug fixed in round 3). Lowered HLO
    must therefore be identical across different weight values, and the
    padded-tail export must produce correct values for a non-multiple corpus."""
    import jax.numpy as jnp

    from melogan_tpu.models.vae import VAE

    train_data, _ = splits
    cfg = AEConfig(max_notes=64, batch_size=8, recon_save_count=0)
    model = VAE.from_config(cfg)
    s1 = vae_loop.init_state(cfg, model, seed=0)
    s2 = vae_loop.init_state(cfg, model, seed=99)  # different weights

    def lowered_text(state):
        v = {"params": state.params, "batch_stats": state.batch_stats}
        x = jnp.zeros((vae_loop.ENCODE_BATCH, cfg.max_notes, 4), jnp.float32)
        return vae_loop._encode_apply(model).lower(v, x).as_text()

    assert lowered_text(s1) == lowered_text(s2)

    # padded tail: n=24 < ENCODE_BATCH — one padded batch, rows sliced back,
    # and identical to an unpadded whole-corpus forward
    x = train_data.notes_ae(cfg)
    mu = vae_loop.encode_mu(model, s1, x)
    assert mu.shape == (train_data.n, cfg.latent_dim)
    ref = vae_loop.encode_mu(model, s1, x, batch_size=train_data.n)
    np.testing.assert_allclose(mu, ref, rtol=1e-5, atol=1e-6)


def test_gan_precompile_seeds_the_exact_train_program(rng, tmp_path):
    # big enough that the fused WGAN-GP program's compile crosses the cache's
    # min-compile-time threshold (the tiny-32-hidden variant compiles too
    # fast to be persisted at all)
    train_data = synth_split(rng, 24, 64)
    # ema_decay on: the EMA variant is the RICHER program (extra state
    # leaves + fused update); equality here covers the plain variant too —
    # both share the same construction path, differing only in a static
    # trace-time branch
    cfg = GANConfig(max_notes=64, batch_size=4, epochs=2, save_freq=2,
                    critic_iters=2, noise_dim=32, latent_dim=8, gen_hidden=96,
                    ema_decay=0.9)
    ed_cfg = EDConfig(max_notes=64, batch_size=8, notes_hidden=32,
                      mlp_hidden=[32, 16])

    before = _with_fresh_cache(
        tmp_path, lambda: gan_loop.precompile(cfg, ed_cfg, train_data.n)
    )
    assert before

    def run_train():
        gan_loop.train(cfg, ed_cfg, train_data,
                       workdir=str(tmp_path / "gan"), verbose=False)

    after = _with_fresh_cache(tmp_path, run_train)
    assert after == before, (
        f"train() compiled a program precompile missed: {after - before}"
    )


# -- generator weight EMA (no reference equivalent; standard GAN practice,
# -- tracked on device inside the fused programs — gan_step.group_step)


def test_gan_ema_matches_hand_computed(rng):
    """Raw stream: ema ← d·ema + (1−d)·params after EVERY generator update,
    seeded with ZEROS; the exported weights (gan_step.ema_weights) are the
    debiased ema/(1 − d^t). Verified against a host tree_map recomputation
    from the per-dispatch live params (1 group per epoch ⇒ 1 G update per
    dispatch). Zero-seeding + debiasing matters: an init-seeded stream would
    carry d^t worth of random init into the served weights (~90% at
    d=0.999, t=100 — observed as a 0/8 gate on a real TPU run)."""
    import jax.numpy as jnp

    from melogan_tpu.train import gan_step

    d = 0.5
    cfg = GANConfig(max_notes=64, batch_size=4, noise_dim=16, latent_dim=8,
                    gen_hidden=32, ema_decay=d)
    ed_cfg = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,))
    # 20 rows = batch(4) × critic_iters(5): exactly one group, no tail
    split = synth_split(rng, 20, 64)
    models = gan_step.build_models(cfg, ed_cfg)
    s0 = gan_step.init_state(cfg, models, seed=0)
    for leaf in jax.tree_util.tree_leaves(s0.ema_params):
        assert not np.any(np.asarray(leaf))  # zero-seeded raw stream
    # before any G update the deployable weights are the live ones
    _leaves_equal(gan_step.ema_weights(s0, d), s0.gen_params)

    data = (
        jnp.asarray(split.notes_gan()),
        jnp.asarray(split.emotion_idx.astype(np.int32)),
        jnp.zeros((20, cfg.latent_dim), jnp.float32),
        jnp.asarray(split.numeric.astype(np.float32)),
    )
    run = jax.jit(gan_step.make_train_steps(cfg, models).run)
    host = np.random.default_rng(0)
    live = jnp.ones((1,), bool)

    def one_epoch(st):
        idx = host.permutation(20).reshape(1, 1, 5, 4).astype(np.int32)
        return run(st, data, jnp.asarray(idx), None, live)

    s1, _ = one_epoch(s0)
    s2, _ = one_epoch(s1)

    f = lambda e, p: d * np.asarray(e, np.float32) + (1 - d) * np.asarray(p, np.float32)
    e1 = jax.tree_util.tree_map(f, s0.ema_params, s1.gen_params)
    e2 = jax.tree_util.tree_map(f, e1, s2.gen_params)
    for a, b in zip(jax.tree_util.tree_leaves(e2),
                    jax.tree_util.tree_leaves(s2.ema_params)):
        np.testing.assert_allclose(np.asarray(b), a, rtol=0, atol=1e-7)

    # debiased export: raw / (1 − d^t) with t = 2 G updates
    deb = gan_step.ema_weights(s2, d)
    for a, b in zip(jax.tree_util.tree_leaves(e2), jax.tree_util.tree_leaves(deb)):
        np.testing.assert_allclose(np.asarray(b), a / (1.0 - d ** 2),
                                   rtol=1e-6, atol=1e-7)
    # ...which is a true weighted average of visited params: magnitudes match
    # the live weights (an undebaised zero-seeded stream at t=2 would be
    # scaled down by 1 − d² = 0.75)
    la = jax.tree_util.tree_leaves(s2.gen_params)[0]
    lb = jax.tree_util.tree_leaves(deb)[0]
    assert not np.allclose(np.asarray(la), np.asarray(lb))  # lags, not equals
    assert 0.5 < np.linalg.norm(np.asarray(lb)) / np.linalg.norm(np.asarray(la)) < 2.0

    # off by default: no EMA state, program unchanged
    s_off = gan_step.init_state(
        GANConfig(max_notes=64, batch_size=4, noise_dim=16, latent_dim=8,
                  gen_hidden=32), models, seed=0)
    assert s_off.ema_params is None


def test_gan_ema_checkpoints_and_loader(splits, tmp_path):
    """--ema runs save G_ema in periodic + final checkpoints;
    load_gan_final(ema=True) returns it (and raises clearly on ema-less
    checkpoints); the EMA weights drive the Sampler."""
    train_data, _ = splits
    kw = dict(max_notes=64, batch_size=4, noise_dim=16, latent_dim=8,
              gen_hidden=32, epochs=2, save_freq=2)
    ed_cfg = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,))
    state, _ = gan_loop.train(
        GANConfig(ema_decay=0.9, **kw), ed_cfg, train_data,
        workdir=str(tmp_path / "ema"), verbose=False,
    )
    ckpt_dir = tmp_path / "ema" / "experiments/gan/checkpoints"
    periodic = load_checkpoint(str(ckpt_dir / "gan_epoch0002.ckpt"))
    assert "G_ema" in periodic
    gen_ema, fe = gan_loop.load_gan_final(str(ckpt_dir / "gan_final.ckpt"), ema=True)
    gen_live, _ = gan_loop.load_gan_final(str(ckpt_dir / "gan_final.ckpt"))
    a = jax.tree_util.tree_leaves(gen_ema["params"])[0]
    b = jax.tree_util.tree_leaves(gen_live["params"])[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))
    from melogan_tpu.train import gan_step

    _leaves_equal(gan_step.ema_weights(state, 0.9), gen_ema["params"])
    # the periodic checkpoint carries the raw stream for resume
    assert "ema_raw" in periodic
    _leaves_equal(state.ema_params,
                  load_checkpoint(str(ckpt_dir / "gan_epoch0002.ckpt"))["ema_raw"])

    from melogan_tpu.sampling import Sampler

    out = tmp_path / "ema_sample.mid"
    Sampler(GANConfig(ema_decay=0.9, **kw), gen_variables=gen_ema,
            fe_variables=fe).generate_midi("happy", str(out), seed=1)
    assert out.exists() and out.stat().st_size > 0

    # ema-less run: no G_ema anywhere; loader refuses ema=True with guidance
    gan_loop.train(GANConfig(**kw), ed_cfg, train_data,
                   workdir=str(tmp_path / "plain"), verbose=False)
    plain_final = str(tmp_path / "plain" / "experiments/gan/checkpoints/gan_final.ckpt")
    assert "G_ema" not in load_checkpoint(plain_final)
    with pytest.raises(KeyError, match="ema_decay"):
        gan_loop.load_gan_final(plain_final, ema=True)


def test_gan_ema_resume_is_step_identical(splits, tmp_path):
    """Interrupted-and-resumed ≡ straight-through must hold for the EMA
    stream too (it is saved/restored with the periodic checkpoints)."""
    train_data, _ = splits
    kw = dict(max_notes=64, batch_size=4, noise_dim=16, latent_dim=8,
              gen_hidden=32, save_freq=2, ema_decay=0.9)
    ed_cfg = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,))
    straight, _ = gan_loop.train(
        GANConfig(epochs=4, **kw), ed_cfg, train_data,
        workdir=str(tmp_path / "straight"), verbose=False,
    )
    gan_loop.train(
        GANConfig(epochs=2, **kw), ed_cfg, train_data,
        workdir=str(tmp_path / "resumed"), verbose=False,
    )
    resumed, _ = gan_loop.train(
        GANConfig(epochs=4, **kw), ed_cfg, train_data,
        workdir=str(tmp_path / "resumed"), verbose=False, resume=True,
    )
    _leaves_equal(straight.gen_params, resumed.gen_params)
    _leaves_equal(straight.ema_params, resumed.ema_params)


def test_gan_track_best_keeps_gate_winner(splits, tmp_path, monkeypatch):
    """--track-best gates fresh samples at every checkpoint cadence and keeps
    the best-scoring weights as gan_best.ckpt. The gate is monkeypatched to a
    deterministic schedule (epoch-2 perfect, epoch-4 worse) so the winner is
    known: gan_best must hold the epoch-2 weights (== gan_epoch0002.ckpt) and
    record its gate score."""
    from melogan_tpu.diagnostics import quality

    train_data, _ = splits
    scores = iter([
        {"files": {f"f{i}": {"violations": []} for i in range(8)}},          # ep 2
        {"files": {f"f{i}": {"violations": ["x"]} for i in range(8)}},       # ep 4
    ])
    monkeypatch.setattr(quality, "gate_directory", lambda d: next(scores))

    kw = dict(max_notes=64, batch_size=4, noise_dim=16, latent_dim=8,
              gen_hidden=32, epochs=4, save_freq=2)
    ed_cfg = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,))
    gan_loop.train(GANConfig(**kw), ed_cfg, train_data,
                   workdir=str(tmp_path), verbose=False, track_best=True,
                   gate_samples_per_emotion=2)

    ckpt_dir = tmp_path / "experiments/gan/checkpoints"
    best = load_checkpoint(str(ckpt_dir / "gan_best.ckpt"))
    assert best["epoch"] == 2
    assert best["gate"] == {"passed": 8, "total": 8, "violations": 0}
    ep2 = load_checkpoint(str(ckpt_dir / "gan_epoch0002.ckpt"))
    for a, b in zip(jax.tree_util.tree_leaves(best["G"]["params"]),
                    jax.tree_util.tree_leaves(ep2["G"]["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # loadable by the standard final loader (serve/sample can point at it)
    gen_vars, fe_vars = gan_loop.load_gan_final(str(ckpt_dir / "gan_best.ckpt"))
    assert "params" in gen_vars and "params" in fe_vars
    # gate samples were really generated at both cadences
    assert (tmp_path / "experiments/gan/samples/gate_epoch0002").is_dir()
    assert (tmp_path / "experiments/gan/samples/gate_epoch0004").is_dir()


def test_gan_resume_enables_ema_on_pre_ema_checkpoint(splits, tmp_path):
    """Resuming with --ema from a checkpoint that predates EMA seeds the raw
    stream so the debiased weights EQUAL the restored live weights at the
    resume point, then track the trajectory — no init contamination, sane
    magnitudes."""
    from melogan_tpu.train import gan_step

    train_data, _ = splits
    kw = dict(max_notes=64, batch_size=4, noise_dim=16, latent_dim=8,
              gen_hidden=32, save_freq=2)
    ed_cfg = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,))
    gan_loop.train(GANConfig(epochs=2, **kw), ed_cfg, train_data,
                   workdir=str(tmp_path), verbose=False)  # no EMA
    ckpt_dir = tmp_path / "experiments/gan/checkpoints"
    assert "G_ema" not in load_checkpoint(str(ckpt_dir / "gan_epoch0002.ckpt"))

    d = 0.9
    state, _ = gan_loop.train(GANConfig(epochs=4, ema_decay=d, **kw), ed_cfg,
                              train_data, workdir=str(tmp_path),
                              verbose=False, resume=True)
    ema = gan_step.ema_weights(state, d)
    live = state.gen_params
    for a, b in zip(jax.tree_util.tree_leaves(ema),
                    jax.tree_util.tree_leaves(live)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(a))
        # same magnitude class as the live weights (an unseeded/uncorrected
        # stream would be scaled way down toward zero)
        if np.linalg.norm(b) > 1e-3:
            assert 0.5 < np.linalg.norm(a) / np.linalg.norm(b) < 2.0
    final = load_checkpoint(str(ckpt_dir / "gan_final.ckpt"))
    assert "G_ema" in final


def test_vae_loss_knob_formulas(rng):
    """free_bits / capacity shape only the penalty; defaults are the exact
    reference loss (train_ae.py:35-51) and the returned kld is always the true
    reference KLD."""
    import jax.numpy as jnp

    from melogan_tpu.models.vae import vae_loss

    recon = jnp.asarray(rng.normal(size=(4, 16, 4)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(4, 16, 4)), jnp.float32)
    mu = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    log_var = jnp.asarray(rng.normal(size=(4, 8)) * 0.3, jnp.float32)

    total, mse, kld = vae_loss(recon, x, mu, log_var, 10.0)
    ref_mse = float(jnp.mean(jnp.square(recon - x)))
    ref_kld = float(-0.5 * jnp.mean(1 + log_var - jnp.square(mu) - jnp.exp(log_var)))
    assert float(mse) == ref_mse and float(kld) == ref_kld
    assert float(total) == float(mse + 10.0 * kld)

    # free bits: penalty uses per-dim KL clamped from below; kld unchanged
    lam = 1.0
    kld_dim = -0.5 * jnp.mean(1 + log_var - jnp.square(mu) - jnp.exp(log_var), axis=0)
    expect = ref_mse + 10.0 * float(jnp.mean(jnp.maximum(kld_dim, lam)))
    t_fb, m_fb, k_fb = vae_loss(recon, x, mu, log_var, 10.0, free_bits=lam)
    np.testing.assert_allclose(float(t_fb), expect, rtol=1e-6)
    assert float(k_fb) == ref_kld
    # a floor above every dim's KL removes the KL term's mu-gradient entirely
    import jax

    g_ref = jax.grad(lambda m: vae_loss(recon, x, m, log_var, 10.0)[0])(mu)
    g_fb = jax.grad(
        lambda m: vae_loss(recon, x, m, log_var, 10.0, free_bits=1e6)[0]
    )(mu)
    assert float(jnp.abs(g_fb).max()) == 0.0  # recon path doesn't touch mu here
    assert float(jnp.abs(g_ref).max()) > 0.0

    # capacity: |KL - C| pulls KL TOWARD C from both sides
    C = ref_kld + 0.7
    t_c, _, k_c = vae_loss(recon, x, mu, log_var, 10.0, capacity=jnp.float32(C))
    np.testing.assert_allclose(float(t_c), ref_mse + 10.0 * abs(ref_kld - C), rtol=1e-6)
    assert float(k_c) == ref_kld


def test_capacity_schedule():
    from melogan_tpu.train.harness import capacity_schedule

    assert capacity_schedule(0, 4.0, 10) == 0.0
    assert capacity_schedule(5, 4.0, 10) == 2.0
    assert capacity_schedule(10, 4.0, 10) == 4.0
    assert capacity_schedule(99, 4.0, 10) == 4.0
    assert capacity_schedule(3, 4.0, 0) == 4.0  # no ramp -> constant


@pytest.mark.slow
def test_free_bits_defeats_posterior_collapse(rng, tmp_path):
    """The measured VERDICT-r3 weakness: at the reference beta=10 the posterior
    fully collapses (all mu dims std < 1e-3 on this fixture); FREE_BITS keeps
    the latent alive by orders of magnitude under otherwise identical
    training. Full-scale decollapse is recorded in RESULTS.md; this pins the
    mechanism at CI scale."""
    from melogan_tpu.models.vae import VAE

    train_data = synth_split(rng, 48, 64)
    val_data = synth_split(rng, 16, 64)
    stds = {}
    for label, kw in [("ref", {}), ("fb", dict(free_bits=0.5))]:
        cfg = AEConfig(max_notes=64, batch_size=8, epochs=150, lr=1e-3,
                       recon_save_count=0, early_stop_patience=1000, **kw)
        state, _ = vae_loop.train(
            cfg, train_data, val_data, workdir=str(tmp_path / label),
            verbose=False, recon_dumps=False,
        )
        mu = vae_loop.encode_mu(VAE.from_config(cfg), state, train_data.notes_ae(cfg))
        stds[label] = mu.std(axis=0)
    assert stds["ref"].max() < 0.01  # the reference regime really collapses
    assert stds["fb"].max() > 10 * stds["ref"].max()
    assert stds["fb"].min() > 5 * stds["ref"].min()


def test_capacity_annealed_training_runs(splits, tmp_path):
    """KL-capacity training exercises the caps-carrying fused program
    (including the padded final chunk) end-to-end."""
    train_data, val_data = splits
    cfg = AEConfig(max_notes=64, batch_size=8, epochs=13, recon_save_count=0,
                   kl_capacity=1.0, kl_capacity_epochs=8)
    state, metrics = vae_loop.train(
        cfg, train_data, val_data, workdir=str(tmp_path), verbose=False,
        recon_dumps=False,
    )
    assert np.isfinite(metrics["best_val"])
    assert os.path.exists(tmp_path / cfg.checkpoint_dir / "ae_best.ckpt")


def test_conditioning_mode_latent_dim_mismatch_fails_fast(splits, tmp_path):
    """A conditioning-mode GAN trained on d-dim encoder latents with a config
    whose LATENT_DIM disagrees must raise a clear error at train() time —
    the round-4 real-MIDI run originally crashed with a flax shape error at
    SAMPLE time instead."""
    import pytest

    from melogan_tpu.train import gan_loop

    train_data, _ = splits
    cfg = GANConfig(max_notes=64, batch_size=4, noise_dim=16, latent_dim=64,
                    gen_hidden=32, integration_mode="conditioning")
    ed_cfg = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32,
                      mlp_hidden=(16,))
    bad_latents = np.zeros((train_data.n, 8), np.float32)  # AE dim 8 != 64
    with pytest.raises(ValueError, match="LATENT_DIM"):
        gan_loop.train(cfg, ed_cfg, train_data, latents=bad_latents,
                       workdir=str(tmp_path), verbose=False, epochs=1)
