"""Population sweep (train/sweep.py): K WGAN-GP seeds vmapped into one
program. Member semantics must equal K solo gan_loop.train runs — same
init, same device RNG stream, same epoch shuffles — and selection must
rank by the golden-band gate and save load_gan_final-compatible finals."""
import json
import os

import numpy as np
import pytest

from melogan_tpu.config import EDConfig, GANConfig
from melogan_tpu.train import gan_loop
from melogan_tpu.train.sweep import sweep_gan

from tests.test_train_loops import synth_split


@pytest.fixture
def train_data(rng):
    return synth_split(rng, 24, 64)


_KW = dict(max_notes=64, batch_size=4, noise_dim=16, latent_dim=8,
           gen_hidden=32, epochs=2, save_freq=2)


def test_sweep_member_reproduces_solo_train(train_data, tmp_path):
    """Member k of the population must consume EXACTLY what a solo
    gan_loop.train with cfg.seed = seeds[k] consumes: identical param init
    (init_state(seed)), identical device RNG stream, identical epoch
    shuffles (np.random.default_rng(seed)). The discriminating assertion is
    the epoch-1 loss sums — they depend on the exact batch composition,
    init, and noise stream, and must match to float-noise. (Final PARAMS are
    not comparable at tight tolerance: Adam's first-step update is ±lr
    elementwise, so float-level gradient noise near zero flips signs —
    measured ~2·lr divergence with identical losses. The param diff is
    asserted bounded by the optimizer's step-size envelope instead.)"""
    kw = dict(_KW, epochs=1)
    solo_cfg = GANConfig(seed=7, **kw)
    ed_cfg = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,))
    solo_state, solo_hist = gan_loop.train(
        solo_cfg, ed_cfg, train_data, workdir=str(tmp_path / "solo"), verbose=False
    )

    report = sweep_gan(
        GANConfig(**kw), ed_cfg, train_data, seeds=[7, 11],
        workdir=str(tmp_path / "sweep"), verbose=False, samples_per_emotion=1,
    )
    m0 = report["results"][0]["curve"][0]
    for key in ("Loss/Critic", "Loss/Generator_Adv", "Loss/Generator_Emo"):
        np.testing.assert_allclose(m0[key], solo_hist[key], rtol=1e-4,
                                   atol=1e-7, err_msg=key)

    # params track within the Adam step-size envelope (epochs × steps × lr);
    # a data/stream mismatch would not show here — that is the loss check
    import jax

    member = gan_loop.load_gan_final(report["results"][0]["checkpoint"])
    for a, b in zip(jax.tree_util.tree_leaves(solo_state.gen_params),
                    jax.tree_util.tree_leaves(member[0]["params"])):
        assert np.max(np.abs(np.asarray(a) - np.asarray(b))) < 5e-3

    # and the two members genuinely differ (independent seeds)
    other = gan_loop.load_gan_final(report["results"][1]["checkpoint"])
    m1 = report["results"][1]["curve"][0]
    assert abs(m1["Loss/Critic"] - m0["Loss/Critic"]) > 1e-6
    a0 = jax.tree_util.tree_leaves(member[0]["params"])[0]
    b0 = jax.tree_util.tree_leaves(other[0]["params"])[0]
    assert not np.allclose(np.asarray(a0), np.asarray(b0))


def test_sweep_report_and_promotion(train_data, tmp_path):
    """Report structure, per-member gate results, checkpoints loadable by
    load_gan_final, and --promote-best copying the winner into the stage's
    regular gan_final.ckpt."""
    cfg = GANConfig(**_KW)
    ed_cfg = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,))
    report = sweep_gan(
        cfg, ed_cfg, train_data, seeds=[1, 2, 3],
        workdir=str(tmp_path), verbose=False, samples_per_emotion=1,
        promote_best=True,
    )
    assert report["best_seed"] in (1, 2, 3)
    assert len(report["results"]) == 3
    for r in report["results"]:
        assert os.path.exists(r["checkpoint"])
        gen_vars, fe_vars = gan_loop.load_gan_final(r["checkpoint"])
        assert "params" in gen_vars and "params" in fe_vars
        assert r["gate_total"] == 4  # 1 sample × 4 emotions
        assert 0 <= r["gate_passed"] <= r["gate_total"]
        assert len(r["curve"]) == cfg.epochs

    best = next(r for r in report["results"] if r["seed"] == report["best_seed"])
    for r in report["results"]:
        assert (r["gate_passed"], -r["gate_violations"]) <= (
            best["gate_passed"], -best["gate_violations"])

    # promotion: stage-level gan_final.ckpt == the winner's bytes
    promoted = os.path.join(str(tmp_path), cfg.checkpoint_dir, "gan_final.ckpt")
    assert report["promoted"] and os.path.exists(promoted)
    with open(promoted, "rb") as f1, open(best["checkpoint"], "rb") as f2:
        assert f1.read() == f2.read()

    # the report is also persisted
    sweep_dir = os.path.dirname(os.path.dirname(best["checkpoint"]))
    on_disk = json.load(open(os.path.join(sweep_dir, "sweep_report.json")))
    assert on_disk["best_seed"] == report["best_seed"]


def test_sweep_population_shards_over_mesh(train_data, tmp_path):
    """--dp: the POPULATION axis shards over the 'data' mesh axis (members
    are independent → zero collectives). Member curves must match the
    unsharded sweep to float-noise."""
    from melogan_tpu.parallel.mesh import make_mesh

    kw = dict(_KW, epochs=1)
    ed_cfg = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,))
    base = sweep_gan(
        GANConfig(**kw), ed_cfg, train_data, seeds=[3, 4, 5, 6],
        workdir=str(tmp_path / "plain"), verbose=False, samples_per_emotion=1,
    )
    sharded = sweep_gan(
        GANConfig(**kw), ed_cfg, train_data, seeds=[3, 4, 5, 6],
        workdir=str(tmp_path / "dp"), verbose=False, samples_per_emotion=1,
        mesh=make_mesh(n_devices=4),
    )
    for rb, rs in zip(base["results"], sharded["results"]):
        assert rb["seed"] == rs["seed"]
        for key in ("Loss/Critic", "Loss/Generator_Adv", "Loss/Generator_Emo"):
            np.testing.assert_allclose(rs["curve"][0][key], rb["curve"][0][key],
                                       rtol=1e-4, atol=1e-7, err_msg=key)

    with pytest.raises(ValueError, match="divisible"):
        sweep_gan(GANConfig(**kw), ed_cfg, train_data, seeds=[1, 2, 3],
                  mesh=make_mesh(n_devices=2))


def test_sweep_rejects_duplicate_seeds_and_tiny_corpus(train_data, rng):
    ed_cfg = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,))
    with pytest.raises(ValueError, match="duplicate"):
        sweep_gan(GANConfig(**_KW), ed_cfg, train_data, seeds=[1, 1])
    tiny = synth_split(rng, 8, 64)  # 2 batches < critic_iters(5)
    with pytest.raises(ValueError, match="too small"):
        sweep_gan(GANConfig(**_KW), ed_cfg, tiny, seeds=[1, 2])


def test_hyper_steps_bit_identical_at_defaults(train_data):
    """The hyper path (adam(1.0) + update×lr, traced λs) must be BIT-identical
    to the baked path at config values: optax.adam(lr) ends in one multiply
    per leaf (scale(-lr)·x) and lr·(−x) is the same IEEE value exactly, so a
    hyper member with no overrides IS the solo trajectory."""
    import jax
    import jax.numpy as jnp

    from melogan_tpu.train import gan_step

    cfg = GANConfig(**dict(_KW, epochs=1))
    ed_cfg = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,))
    models = gan_step.build_models(cfg, ed_cfg)
    state = gan_step.init_state(cfg, models, seed=3)

    notes = train_data.notes_gan()
    data = (
        jnp.asarray(notes),
        jnp.asarray(train_data.emotion_idx.astype(np.int32)),
        jnp.zeros((notes.shape[0], cfg.latent_dim), jnp.float32),
        jnp.asarray(train_data.numeric.astype(np.float32)),
    )
    n = data[0].shape[0]
    g = (n // cfg.batch_size) // cfg.critic_iters
    idx = np.random.default_rng(0).permutation(
        g * cfg.critic_iters * cfg.batch_size
    ).reshape(1, g, cfg.critic_iters, cfg.batch_size).astype(np.int32)
    live = jnp.ones((1,), bool)

    plain = gan_step.make_train_steps(cfg, models)
    hyper = gan_step.make_train_steps(
        cfg, models, hyper=gan_step.HyperParams.from_config(cfg))
    out_p, m_p = jax.jit(plain.run)(state, data, jnp.asarray(idx), None, live)
    out_h, m_h = jax.jit(hyper.run)(state, data, jnp.asarray(idx), None, live)

    for a, b in zip(jax.tree_util.tree_leaves(out_p), jax.tree_util.tree_leaves(out_h)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for k in m_p:
        np.testing.assert_array_equal(np.asarray(m_p[k]), np.asarray(m_h[k]))

    # ...and traced lr/λ values actually act: a different lr_d moves the critic
    hot = gan_step.make_train_steps(
        cfg, models,
        hyper=gan_step.HyperParams.from_config(cfg, lr_d=cfg.lr_d * 10))
    out_x, _ = jax.jit(hot.run)(state, data, jnp.asarray(idx), None, live)
    a0 = jax.tree_util.tree_leaves(out_h.critic_params)[0]
    b0 = jax.tree_util.tree_leaves(out_x.critic_params)[0]
    assert not np.allclose(np.asarray(a0), np.asarray(b0))


def test_hyper_grid_members_match_solo_modified_configs(train_data, tmp_path):
    """A hyper-grid sweep is a REAL hyperparameter search: member k's
    trajectory must equal a solo gan_loop.train run whose config carries
    those values (same seed, same shuffles), for both the default member and
    an overridden one. Report rows must carry the resolved hyperparams and
    member dirs must not collide despite the shared seed."""
    kw = dict(_KW, epochs=1)
    ed_cfg = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,))
    over = {"lr_g": 8e-4, "lr_d": 3e-4, "lambda_emotion": 2.5}

    report = sweep_gan(
        GANConfig(seed=7, **kw), ed_cfg, train_data, seeds=[7, 7],
        hyper_grid=[{}, over],
        workdir=str(tmp_path / "sweep"), verbose=False, samples_per_emotion=1,
    )

    for k, solo_kw in enumerate([{}, over]):
        solo_cfg = GANConfig(seed=7, **kw, **solo_kw)
        _, solo_hist = gan_loop.train(
            solo_cfg, ed_cfg, train_data,
            workdir=str(tmp_path / f"solo{k}"), verbose=False,
        )
        m = report["results"][k]["curve"][0]
        for key in ("Loss/Critic", "Loss/Generator_Adv", "Loss/Generator_Emo"):
            np.testing.assert_allclose(m[key], solo_hist[key], rtol=1e-4,
                                       atol=1e-7, err_msg=f"member {k} {key}")

    r0, r1 = report["results"]
    assert r0["hyper"]["lr_g"] != r1["hyper"]["lr_g"]
    assert r1["hyper"]["lambda_emotion"] == 2.5
    assert r0["checkpoint"] != r1["checkpoint"]
    assert os.path.exists(r0["checkpoint"]) and os.path.exists(r1["checkpoint"])
    # different hyperparams genuinely diverge
    assert abs(r0["curve"][0]["Loss/Critic"] - r1["curve"][0]["Loss/Critic"]) > 1e-6


def test_hyper_grid_validation(train_data):
    ed_cfg = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,))
    with pytest.raises(ValueError, match="1:1"):
        sweep_gan(GANConfig(**_KW), ed_cfg, train_data, seeds=[1, 2],
                  hyper_grid=[{}])
    with pytest.raises(ValueError, match="unknown hyperparams"):
        sweep_gan(GANConfig(**_KW), ed_cfg, train_data, seeds=[1],
                  hyper_grid=[{"learning_rate": 1e-4}])


def test_halving_winner_matches_uninterrupted_solo_run(train_data, tmp_path):
    """Successive halving: rungs halve the population by gate rank, survivors
    carry their trained state and shuffle streams, and the winner's FULL curve
    (across all rungs + the budget tail) must equal a solo gan_loop.train run
    with the winner's config and seed — halving must not perturb training."""
    kw = dict(_KW, epochs=3, save_freq=1)
    ed_cfg = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,))
    grid = [{"lr_g": 1e-4}, {"lr_g": 2e-4}, {"lr_g": 4e-4}, {"lr_g": 8e-4}]

    report = sweep_gan(
        GANConfig(seed=7, **kw), ed_cfg, train_data, seeds=[7] * 4,
        hyper_grid=grid, halving=True, rung_epochs=1,
        workdir=str(tmp_path / "sweep"), verbose=False, samples_per_emotion=1,
    )

    # structure: 4 -> 2 -> 1 over two rungs, then the winner trains to 3 epochs
    assert [len(r["members"]) for r in report["rungs"]] == [4, 2]
    assert [sum(m["survived"] for m in r["members"]) for r in report["rungs"]] == [2, 1]
    assert len(report["results"]) == 1
    winner = report["results"][0]
    assert [row["epoch"] for row in winner["curve"]] == [1, 2, 3]

    # the survivor chain is consistent: rung-1 members are rung-0 survivors
    r0_survivors = {m["member"] for m in report["rungs"][0]["members"] if m["survived"]}
    assert {m["member"] for m in report["rungs"][1]["members"]} == r0_survivors

    # winner trajectory == solo run with the winner's hyperparameters
    solo_cfg = GANConfig(seed=7, **kw, lr_g=winner["hyper"]["lr_g"])
    _, solo_hist = gan_loop.train(
        solo_cfg, ed_cfg, train_data, workdir=str(tmp_path / "solo"),
        verbose=False,
    )
    # gan_loop.train returns the final epoch's metrics dict; compare epoch 3
    last = winner["curve"][-1]
    for key in ("Loss/Critic", "Loss/Generator_Adv", "Loss/Generator_Emo"):
        np.testing.assert_allclose(last[key], solo_hist[key], rtol=1e-4,
                                   atol=1e-7, err_msg=key)

    # report persisted with the rungs included
    on_disk = json.load(open(os.path.join(
        str(tmp_path / "sweep"), "experiments/gan/sweep/sweep_report.json")))
    assert "rungs" in on_disk and len(on_disk["rungs"]) == 2


def test_halving_validation(train_data):
    ed_cfg = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,))
    with pytest.raises(ValueError, match="at least 2"):
        sweep_gan(GANConfig(**_KW), ed_cfg, train_data, seeds=[1], halving=True)


def test_sweep_resume_is_step_identical(train_data, tmp_path):
    """Interrupted-and-resumed ≡ straight-through for the plain population:
    a sweep stopped after its first fused chunk (simulated by a 2-epoch run,
    whose sweep_state.ckpt is exactly what a crash after chunk 1 of a
    4-epoch run leaves behind) and resumed to 4 epochs must reproduce the
    straight-through run bit-for-bit — curves equal, member finals
    byte-identical (device state round-trips msgpack lossless; host shuffle
    streams are replayed)."""
    kw = dict(_KW, epochs=4)
    ed_cfg = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,))
    straight = sweep_gan(
        GANConfig(**kw), ed_cfg, train_data, seeds=[3, 5],
        workdir=str(tmp_path / "straight"), verbose=False, samples_per_emotion=1,
    )
    sweep_gan(
        GANConfig(**dict(_KW, epochs=2)), ed_cfg, train_data, seeds=[3, 5],
        workdir=str(tmp_path / "resumed"), verbose=False, samples_per_emotion=1,
    )
    state_path = os.path.join(
        str(tmp_path / "resumed"), "experiments/gan/sweep/sweep_state.ckpt")
    assert os.path.exists(state_path)

    # a mismatched invocation must refuse to resume (streams would diverge)
    with pytest.raises(ValueError, match="different"):
        sweep_gan(GANConfig(**kw), ed_cfg, train_data, seeds=[3, 6],
                  workdir=str(tmp_path / "resumed"), verbose=False,
                  samples_per_emotion=1, resume=True)

    resumed = sweep_gan(
        GANConfig(**kw), ed_cfg, train_data, seeds=[3, 5],
        workdir=str(tmp_path / "resumed"), verbose=False, samples_per_emotion=1,
        resume=True,
    )
    for rs, rr in zip(straight["results"], resumed["results"]):
        assert rs["seed"] == rr["seed"]
        assert rs["curve"] == rr["curve"]  # floats bitwise (JSON round-trips)
        with open(rs["checkpoint"], "rb") as f1, open(rr["checkpoint"], "rb") as f2:
            assert f1.read() == f2.read()
    assert straight["best_seed"] == resumed["best_seed"]


def test_halving_resume_after_crash_is_step_identical(train_data, tmp_path,
                                                      monkeypatch):
    """A halving sweep killed mid-search (here: during rung-1 gating, AFTER
    rung 1's training chunk checkpointed the survivors) must resume into the
    identical trajectory: no retraining of finished epochs, deterministic
    re-gating, same survivor chain, same winner, byte-identical final."""
    from melogan_tpu.train import sweep as sweep_mod

    kw = dict(_KW, epochs=3, save_freq=1)
    ed_cfg = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,))
    seeds = [1, 2, 3, 4]

    straight = sweep_gan(
        GANConfig(**kw), ed_cfg, train_data, seeds=seeds, halving=True,
        rung_epochs=1, workdir=str(tmp_path / "straight"), verbose=False,
        samples_per_emotion=1,
    )

    # crash on the 5th gate call = first member of rung 1 (rung 0 gates 4)
    real_gate = sweep_mod._gate_member
    trap = {"calls": 0, "armed": True}

    def crashing_gate(*a, **k):
        trap["calls"] += 1
        if trap["armed"] and trap["calls"] == 5:
            raise RuntimeError("simulated crash during rung-1 gating")
        return real_gate(*a, **k)

    monkeypatch.setattr(sweep_mod, "_gate_member", crashing_gate)
    with pytest.raises(RuntimeError, match="simulated crash"):
        sweep_gan(GANConfig(**kw), ed_cfg, train_data, seeds=seeds,
                  halving=True, rung_epochs=1,
                  workdir=str(tmp_path / "resumed"), verbose=False,
                  samples_per_emotion=1)
    trap["armed"] = False

    state_path = os.path.join(
        str(tmp_path / "resumed"), "experiments/gan/sweep/sweep_state.ckpt")
    assert os.path.exists(state_path)

    resumed = sweep_gan(
        GANConfig(**kw), ed_cfg, train_data, seeds=seeds, halving=True,
        rung_epochs=1, workdir=str(tmp_path / "resumed"), verbose=False,
        samples_per_emotion=1, resume=True,
    )

    assert [len(r["members"]) for r in resumed["rungs"]] == [4, 2]
    for rs, rr in zip(straight["rungs"], resumed["rungs"]):
        assert [m["member"] for m in rs["members"]] == [m["member"] for m in rr["members"]]
        assert [m["survived"] for m in rs["members"]] == [m["survived"] for m in rr["members"]]
    ws, wr = straight["results"][0], resumed["results"][0]
    assert ws["seed"] == wr["seed"]
    assert ws["curve"] == wr["curve"]
    with open(ws["checkpoint"], "rb") as f1, open(wr["checkpoint"], "rb") as f2:
        assert f1.read() == f2.read()


def test_sweep_members_carry_ema_finals(train_data, tmp_path):
    """With cfg.ema_decay > 0 every member tracks its own EMA inside the one
    vmapped program; member finals carry G_ema (live G preserved) and the
    gate ranks the EMA weights (the deployable artifact)."""
    import jax

    # ≥2 G updates: at t=1 the debiased EMA is exactly the single visited
    # param vector (ê = p₁ = live), so divergence only shows from t=2 on
    kw = dict(_KW, epochs=2, ema_decay=0.9)
    ed_cfg = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,))
    report = sweep_gan(
        GANConfig(**kw), ed_cfg, train_data, seeds=[3, 5],
        workdir=str(tmp_path), verbose=False, samples_per_emotion=1,
    )
    from melogan_tpu.utils.checkpoint import load_checkpoint

    for r in report["results"]:
        ckpt = load_checkpoint(r["checkpoint"])
        assert "G_ema" in ckpt
        gen_ema, _ = gan_loop.load_gan_final(r["checkpoint"], ema=True)
        gen_live, _ = gan_loop.load_gan_final(r["checkpoint"])
        a = jax.tree_util.tree_leaves(gen_ema["params"])[0]
        b = jax.tree_util.tree_leaves(gen_live["params"])[0]
        assert not np.allclose(np.asarray(a), np.asarray(b))


def test_sweep_resume_corrupt_state_fails_typed(train_data, tmp_path):
    """Random bytes / truncation in sweep_state.ckpt surface as ValueError
    with recovery guidance, never a raw msgpack internal (fuzzing convention
    of the other parsers: tests/test_tools.py)."""
    ed_cfg = EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,))
    sweep_dir = tmp_path / "experiments/gan/sweep"
    sweep_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for payload in (b"", b"garbage", rng.bytes(256)):
        (sweep_dir / "sweep_state.ckpt").write_bytes(payload)
        with pytest.raises(ValueError, match="delete it to restart"):
            sweep_gan(GANConfig(**_KW), ed_cfg, train_data, seeds=[3, 5],
                      workdir=str(tmp_path), verbose=False, resume=True)
