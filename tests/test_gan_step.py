"""WGAN-GP fused train step: correctness of the gradient penalty, state
threading, and the 5:1 update schedule on synthetic data (CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from melogan_tpu.config import EDConfig, GANConfig
from melogan_tpu.train import gan_step


def tiny_cfg(**kw):
    base = dict(max_notes=64, batch_size=4, noise_dim=16, latent_dim=8, gen_hidden=32)
    base.update(kw)
    return GANConfig(**base)


def tiny_ed_cfg():
    return EDConfig(max_notes=64, notes_blocks=2, notes_hidden=32, mlp_hidden=(16,))


def make_batches(rng, cfg, k):
    b = cfg.batch_size
    return (
        jnp.asarray(rng.normal(size=(k, b, cfg.max_notes, cfg.note_dim)), jnp.float32),
        jnp.asarray(rng.integers(0, 4, size=(k, b)), jnp.int32),
        jnp.asarray(rng.normal(size=(k, b, cfg.latent_dim)), jnp.float32),
        jnp.asarray(rng.normal(size=(k, b, cfg.numeric_input_dim)), jnp.float32),
    )


def test_gradient_penalty_matches_per_sample_jacobian(rng):
    cfg = tiny_cfg()
    models = gan_step.build_models(cfg, tiny_ed_cfg())
    b = 4
    real = jnp.asarray(rng.normal(size=(b, cfg.max_notes, 4)), jnp.float32)
    fake = jnp.asarray(rng.normal(size=(b, cfg.max_notes, 4)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(b, cfg.encoder_out_dim)), jnp.float32)
    alpha = jnp.asarray(rng.uniform(size=(b, 1, 1)), jnp.float32)

    cvars = models.critic.init(jax.random.PRNGKey(0), real, emb)
    gp = gan_step._gradient_penalty(models.critic, cvars["params"], real, fake, emb, alpha)

    # independent path: per-sample grad via vmap over single-sample critic
    interp = alpha * real + (1 - alpha) * fake

    def single(x, e):
        return models.critic.apply(cvars, x[None], e[None])[0]

    grads = jax.vmap(jax.grad(single))(interp, emb)
    norms = jnp.linalg.norm(grads.reshape(b, -1), axis=1)
    expected = jnp.mean((norms - 1.0) ** 2)
    np.testing.assert_allclose(float(gp), float(expected), rtol=1e-4)


def test_group_step_updates_everything(rng):
    cfg = tiny_cfg()
    models = gan_step.build_models(cfg, tiny_ed_cfg())
    state = gan_step.init_state(cfg, models, seed=0)
    steps = gan_step.make_train_steps(cfg, models)
    group_step, tail_step = steps.group, steps.tail
    group_step = jax.jit(group_step)
    tail_step = jax.jit(tail_step)

    batches = make_batches(rng, cfg, cfg.critic_iters)
    new_state, metrics = group_step(state, batches)

    for k in ("loss_d_sum", "gp_mean", "loss_g_adv", "loss_g_emo"):
        assert np.isfinite(float(metrics[k])), k

    def changed(a, b):
        return any(
            not np.allclose(np.asarray(x), np.asarray(y))
            for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
        )

    assert changed(state.critic_params, new_state.critic_params)
    assert changed(state.gen_params, new_state.gen_params)
    assert changed(state.fe_params, new_state.fe_params)
    assert changed(state.gen_stats, new_state.gen_stats)
    # the frozen ED must NOT move
    assert not changed(state.ed_params, new_state.ed_params)
    assert int(new_state.step) == 1

    # tail step updates only the critic side
    tail_batches = make_batches(rng, cfg, 3)
    tail_state, tail_metrics = tail_step(new_state, tail_batches)
    assert changed(new_state.critic_params, tail_state.critic_params)
    assert not changed(new_state.gen_params, tail_state.gen_params)
    assert np.isfinite(float(tail_metrics["loss_d_sum"]))


def test_critic_loss_decreases_on_fixed_batch(rng):
    """A few critic updates on a fixed batch should reduce the critic loss —
    sanity that second-order GP gradients are wired correctly."""
    cfg = tiny_cfg()
    models = gan_step.build_models(cfg, tiny_ed_cfg())
    state = gan_step.init_state(cfg, models, seed=0)
    steps = gan_step.make_train_steps(cfg, models)
    group_step, tail_step = steps.group, steps.tail
    tail_step = jax.jit(tail_step)

    one = make_batches(rng, cfg, 1)
    losses = []
    for _ in range(8):
        state, metrics = tail_step(state, one)
        losses.append(float(metrics["loss_d_sum"]))
    assert losses[-1] < losses[0]


def test_ed_frozen_eval_inside_g_loss(rng):
    """The ED contribution must be computed in eval mode (dropout off,
    running stats): same state twice -> identical emotion loss."""
    cfg = tiny_cfg()
    models = gan_step.build_models(cfg, tiny_ed_cfg())
    state = gan_step.init_state(cfg, models, seed=0)
    group_step = gan_step.make_train_steps(cfg, models).group
    group_step = jax.jit(group_step)
    batches = make_batches(rng, cfg, cfg.critic_iters)
    _, m1 = group_step(state, batches)
    _, m2 = group_step(state, batches)
    assert float(m1["loss_g_emo"]) == float(m2["loss_g_emo"])


def test_cross_entropy_matches_torch(rng):
    torch = pytest.importorskip("torch")
    logits = rng.normal(size=(8, 4)).astype(np.float32)
    labels = rng.integers(0, 4, size=(8,))
    ours = float(gan_step.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    theirs = float(
        torch.nn.functional.cross_entropy(torch.tensor(logits), torch.tensor(labels))
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_group_step_conditioning_mode(rng):
    """INTEGRATION_MODE=conditioning: the AE latent is concatenated into the
    generator input; the full fused step must train end to end."""
    cfg = tiny_cfg(integration_mode="conditioning")
    models = gan_step.build_models(cfg, tiny_ed_cfg())
    state = gan_step.init_state(cfg, models, seed=0)
    group_step = jax.jit(gan_step.make_train_steps(cfg, models).group)
    batches = make_batches(rng, cfg, cfg.critic_iters)
    new_state, metrics = group_step(state, batches)
    assert np.isfinite(float(metrics["loss_d_sum"]))
    assert np.isfinite(float(metrics["loss_g_emo"]))
    # latents must actually influence the generator: different latents in the
    # same state produce different fake scores
    real, emo, lat, num = batches
    lat2 = lat + 1.0
    _, m1 = group_step(state, (real, emo, lat, num))
    _, m2 = group_step(state, (real, emo, lat2, num))
    assert float(m1["loss_g_adv"]) != float(m2["loss_g_adv"])


def test_epoch_step_matches_sequential_groups(rng):
    """One fused epoch dispatch must equal running the groups sequentially."""
    cfg = tiny_cfg()
    models = gan_step.build_models(cfg, tiny_ed_cfg())
    steps = gan_step.make_train_steps(cfg, models)
    group_step, epoch_step = steps.group, steps.epoch
    group_step = jax.jit(group_step)
    epoch_step = jax.jit(epoch_step)

    state0 = gan_step.init_state(cfg, models, seed=0)
    g1 = make_batches(rng, cfg, cfg.critic_iters)
    g2 = make_batches(rng, cfg, cfg.critic_iters)

    # sequential
    s_seq, m1 = group_step(state0, g1)
    s_seq, m2 = group_step(s_seq, g2)

    # fused scan over both groups
    stacks = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), g1, g2)
    s_fused, m = epoch_step(state0, stacks)

    # two separately-compiled programs: identical algorithm, but XLA fusion
    # order differs -> float reassociation; Adam's rsqrt amplifies tiny grad
    # deltas, so compare with realistic tolerances
    np.testing.assert_allclose(float(m["loss_d_sum"][0]), float(m1["loss_d_sum"]), rtol=1e-4)
    np.testing.assert_allclose(float(m["loss_d_sum"][1]), float(m2["loss_d_sum"]), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_seq.gen_params),
        jax.tree_util.tree_leaves(s_fused.gen_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_indexed_epoch_matches_stacked_epoch(rng):
    """Device-resident indexed gathering must equal explicit batch stacking."""
    cfg = tiny_cfg()
    models = gan_step.build_models(cfg, tiny_ed_cfg())
    steps = gan_step.make_train_steps(cfg, models)
    epoch_step, indexed_step = steps.epoch, steps.indexed
    epoch_step = jax.jit(epoch_step)
    indexed_step = jax.jit(indexed_step)
    state0 = gan_step.init_state(cfg, models, seed=0)

    n = 48
    notes = jnp.asarray(rng.normal(size=(n, cfg.max_notes, 4)), jnp.float32)
    emo = jnp.asarray(rng.integers(0, 4, size=(n,)), jnp.int32)
    lat = jnp.asarray(rng.normal(size=(n, cfg.latent_dim)), jnp.float32)
    num = jnp.asarray(rng.normal(size=(n, cfg.numeric_input_dim)), jnp.float32)

    from melogan_tpu.data.datasets import epoch_group_indices

    data_rng = np.random.default_rng(7)
    gidx, tidx = epoch_group_indices(n, cfg.batch_size, cfg.critic_iters, data_rng)
    assert gidx is not None

    stacks = (notes[gidx], emo[gidx], lat[gidx], num[gidx])
    s_stacked, m_stacked = epoch_step(state0, stacks)
    s_indexed, m_indexed = indexed_step(
        state0, (notes, emo, lat, num), jnp.asarray(gidx, jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(m_stacked["loss_d_sum"]), np.asarray(m_indexed["loss_d_sum"]), rtol=1e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_stacked.critic_params),
        jax.tree_util.tree_leaves(s_indexed.critic_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_multi_epoch_run_matches_sequential_epochs(rng):
    """The multi-epoch fused program (one dispatch per save_freq epochs) must
    produce bit-for-bit the same trajectory as dispatching each epoch's
    indexed program + critic-only tail separately."""
    cfg = tiny_cfg()
    models = gan_step.build_models(cfg, tiny_ed_cfg())
    steps = gan_step.make_train_steps(cfg, models)
    indexed_step = jax.jit(steps.indexed)
    tail_step = jax.jit(steps.tail)
    run_step = jax.jit(steps.run)
    state0 = gan_step.init_state(cfg, models, seed=0)

    # n chosen so each epoch has 2 full groups + a 2-batch critic-only tail
    n = cfg.batch_size * (2 * cfg.critic_iters + 2)
    notes = jnp.asarray(rng.normal(size=(n, cfg.max_notes, 4)), jnp.float32)
    emo = jnp.asarray(rng.integers(0, 4, size=(n,)), jnp.int32)
    lat = jnp.asarray(rng.normal(size=(n, cfg.latent_dim)), jnp.float32)
    num = jnp.asarray(rng.normal(size=(n, cfg.numeric_input_dim)), jnp.float32)
    data = (notes, emo, lat, num)

    from melogan_tpu.data.datasets import epoch_group_indices

    data_rng = np.random.default_rng(11)
    epochs = []
    for _ in range(2):
        gidx, tidx = epoch_group_indices(n, cfg.batch_size, cfg.critic_iters, data_rng)
        assert gidx is not None and tidx is not None
        epochs.append((gidx, tidx))

    # sequential reference path: per-epoch indexed program + host-side tail
    s_seq = state0
    seq_d = []
    for gidx, tidx in epochs:
        s_seq, m = indexed_step(s_seq, data, jnp.asarray(gidx, jnp.int32))
        d = float(jnp.sum(m["loss_d_sum"]))
        tsel = jnp.asarray(tidx, jnp.int32)
        s_seq, mt = tail_step(s_seq, (notes[tsel], emo[tsel], lat[tsel], num[tsel]))
        seq_d.append(d + float(mt["loss_d_sum"]))

    # fused path: both epochs in one dispatch
    g_all = jnp.asarray(np.stack([g for g, _ in epochs]), jnp.int32)
    t_all = jnp.asarray(np.stack([t for _, t in epochs]), jnp.int32)
    s_run, m_run = run_step(state0, data, g_all, t_all)

    np.testing.assert_allclose(np.asarray(m_run["loss_d_sum"]), seq_d, rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_seq.critic_params)
        + jax.tree_util.tree_leaves(s_seq.gen_params)
        + jax.tree_util.tree_leaves(s_seq.opt_g),
        jax.tree_util.tree_leaves(s_run.critic_params)
        + jax.tree_util.tree_leaves(s_run.gen_params)
        + jax.tree_util.tree_leaves(s_run.opt_g),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(s_seq.rng), np.asarray(s_run.rng))


def test_ema_horizon_note():
    """The horizon-rule advisory fires exactly when t < 2/(1-d).

    Rule and thresholds from the TPU measurements recorded in RESULTS.md /
    docs/operations.md: a d=0.98 EMA over a ~100-G-update run gated 0/8
    while the live weights passed 8/8; sized decays work. The helper is pure
    host arithmetic, so the boundary is testable exactly."""
    # EMA off -> no note regardless of shape
    assert gan_step.ema_horizon_note(tiny_cfg(), 50, 10_000) is None

    # reference regime: N=896 train rows, B=32, k=5 -> 5 G updates/epoch;
    # 50 epochs -> t=250. d=0.999 (window 1000) must warn; d=0.9 (window
    # 10, 2*window=20 <= 250) must not.
    cfg_big = tiny_cfg(batch_size=32, critic_iters=5, ema_decay=0.999)
    note = gan_step.ema_horizon_note(cfg_big, 50, 896)
    assert note is not None and "t=250" in note and "track-best" in note
    cfg_ok = tiny_cfg(batch_size=32, critic_iters=5, ema_decay=0.9)
    assert gan_step.ema_horizon_note(cfg_ok, 50, 896) is None

    # exact boundary: t == 2*window passes, one G update fewer warns.
    # window(0.98)=50 -> need t>=100; 20 epochs x 5 G/epoch = 100.
    cfg_b = tiny_cfg(batch_size=32, critic_iters=5, ema_decay=0.98)
    assert gan_step.ema_horizon_note(cfg_b, 20, 896) is None
    assert gan_step.ema_horizon_note(cfg_b, 19, 896) is not None

    # the suggested decay cap in the message is consistent: d <= 1 - 2/t
    note = gan_step.ema_horizon_note(cfg_big, 50, 896)
    assert "0.992" in note  # 1 - 2/250


def test_ema_decay_validation():
    """ema_decay outside [0,1) is rejected at config construction (ADVICE-r3:
    --ema 1.0 used to crash with a ZeroDivisionError inside ema_horizon_note),
    and a corpus smaller than one critic group gets the zero-G-updates
    message, not the generic lag warning."""
    import dataclasses

    import pytest

    with pytest.raises(ValueError, match="ema_decay"):
        tiny_cfg(ema_decay=1.0)
    with pytest.raises(ValueError, match="ema_decay"):
        tiny_cfg(ema_decay=-0.1)
    # dataclasses.replace revalidates too
    with pytest.raises(ValueError, match="ema_decay"):
        dataclasses.replace(tiny_cfg(), ema_decay=1.5)

    # belt-and-braces guard in the helper itself (bypassing __post_init__)
    cfg = tiny_cfg(ema_decay=0.9)
    object.__setattr__(cfg, "ema_decay", 1.0)
    note = gan_step.ema_horizon_note(cfg, 50, 896)
    assert note is not None and "never move" in note

    # n_train // batch_size < critic_iters -> zero generator updates ever
    cfg0 = tiny_cfg(batch_size=32, critic_iters=5, ema_decay=0.9)
    note = gan_step.ema_horizon_note(cfg0, 1000, 4 * 32)  # 4 batches < 5
    assert note is not None and "ZERO" in note and "critic-only" in note


def test_feature_matching_loss(rng):
    """The optional λ_fm loss (VERDICT-r4 item 1, documented deviation):
    targets derive from real data per emotion; training with it drives the
    generator's note-space stats toward the per-emotion centroids; λ_fm=0
    (the default) leaves the program and metrics exactly as before."""
    cfg0 = tiny_cfg(critic_iters=2)
    models = gan_step.build_models(cfg0, tiny_ed_cfg())

    # targets: per-emotion centroids of phi over synthetic "real" notes
    n = 32
    notes = rng.normal(size=(n, cfg0.max_notes, 4)).astype(np.float32)
    emo = np.asarray(rng.integers(0, 4, size=(n,)), np.int32)
    targets, scale = gan_step.fm_targets_from_data(notes, emo)
    assert targets.shape == (4, 18) and scale.shape == (18,)
    semi = (notes[..., 0] + 1.0) * 63.5
    chroma = []
    for k in (1, 2, 3):
        th = (2.0 * np.pi / 12.0) * k * semi
        chroma += [np.sin(th).mean(1), np.cos(th).mean(1)]
    phi = np.concatenate(
        [notes.mean(axis=1), np.sqrt(np.maximum(notes.var(axis=1), 1e-8)),
         np.abs(np.diff(notes, axis=1)).mean(axis=1),
         np.stack(chroma, -1)], -1)
    np.testing.assert_allclose(targets[1], phi[emo == 1].mean(0), rtol=1e-4)

    # default path: no fm metric, states identical to a build without the arg
    state0 = gan_step.init_state(cfg0, models, seed=0)
    batches = make_batches(np.random.default_rng(7), cfg0, cfg0.critic_iters)
    s_plain, m_plain = jax.jit(
        gan_step.make_train_steps(cfg0, models).group)(state0, batches)
    assert "loss_g_fm" not in m_plain

    # fm ON: metric present and finite; repeated G updates reduce the fm term
    cfg = tiny_cfg(critic_iters=2, lambda_fm=20.0)
    group = jax.jit(gan_step.make_train_steps(
        cfg, models, fm_target=(targets, scale)).group)
    st = gan_step.init_state(cfg, models, seed=0)
    first = None
    for i in range(12):
        st, m = group(st, batches)
        if first is None:
            first = float(m["loss_g_fm"])
    assert np.isfinite(first)
    assert float(m["loss_g_fm"]) < first, (
        f"fm loss did not decrease: {first} -> {float(m['loss_g_fm'])}")

    # misconfiguration fails fast
    with pytest.raises(ValueError, match="fm_target"):
        gan_step.make_train_steps(cfg, models)


def test_ed_feature_matching(rng):
    """The ED-feature-matching channel: targets are per-emotion centroids of
    the frozen ED's penultimate features; training with it reduces the fm
    term; latent-mode EDs return None (no meaningful feature space)."""
    cfg = tiny_cfg(critic_iters=2, lambda_fm=10.0)
    ed_cfg = tiny_ed_cfg()
    models = gan_step.build_models(cfg, ed_cfg)

    n = 24
    notes = rng.normal(size=(n, cfg.max_notes, 4)).astype(np.float32)
    emo = np.asarray(rng.integers(0, 4, size=(n,)), np.int32)
    state = gan_step.init_state(cfg, models, seed=0)
    ed_vars = {"params": state.ed_params, "batch_stats": state.ed_stats}

    tgt = gan_step.fm_ed_targets_from_data(models.ed, ed_vars, notes, emo,
                                           batch_size=8)
    assert tgt is not None
    targets, scale = tgt
    # multi-scale features: per-block pooled channels + the penultimate
    # embedding (tiny ED: 64 + 32 blocks, hidden 32 -> 128 dims)
    assert targets.shape[0] == 4 and targets.shape[1] > ed_cfg.notes_hidden
    assert scale.shape == (targets.shape[1],)
    assert np.isfinite(targets).all() and (scale > 0).all()

    group = jax.jit(gan_step.make_train_steps(
        cfg, models, fm_ed_target=tgt).group)
    batches = make_batches(np.random.default_rng(5), cfg, cfg.critic_iters)
    st, first = state, None
    for _ in range(12):
        st, m = group(st, batches)
        if first is None:
            first = float(m["loss_g_fm"])
    assert np.isfinite(first)
    assert float(m["loss_g_fm"]) < first

    # latent-mode ED: no feature target
    import dataclasses

    ed_lat = dataclasses.replace(ed_cfg, input_mode="latent", latent_dim=8)
    models_lat = gan_step.build_models(tiny_cfg(), ed_lat)
    assert gan_step.fm_ed_targets_from_data(
        models_lat.ed, ed_vars, notes, emo) is None


def test_feature_matching_hyper_matches_static(rng):
    """λ_fm as a traced HyperParams knob (the sweep path) is numerically
    identical to the statically-baked config value."""
    import dataclasses

    cfg = tiny_cfg(critic_iters=2, lambda_fm=5.0)
    models = gan_step.build_models(cfg, tiny_ed_cfg())
    n = 16
    notes = rng.normal(size=(n, cfg.max_notes, 4)).astype(np.float32)
    emo = np.asarray(rng.integers(0, 4, size=(n,)), np.int32)
    fm_t = gan_step.fm_targets_from_data(notes, emo)
    batches = make_batches(np.random.default_rng(3), cfg, cfg.critic_iters)

    st0 = gan_step.init_state(cfg, models, seed=1)
    _, m_static = jax.jit(gan_step.make_train_steps(
        cfg, models, fm_target=fm_t).group)(st0, batches)

    cfg_h = dataclasses.replace(cfg, lambda_fm=0.0)
    hyper = gan_step.HyperParams.from_config(cfg_h, lambda_fm=5.0)
    st1 = gan_step.init_state(cfg_h, models, seed=1)
    _, m_hyper = jax.jit(gan_step.make_train_steps(
        cfg_h, models, hyper=hyper, fm_target=fm_t).group)(st1, batches)

    np.testing.assert_allclose(
        float(m_hyper["loss_g_fm"]), float(m_static["loss_g_fm"]), rtol=1e-6)
    np.testing.assert_allclose(
        float(m_hyper["loss_g_adv"]), float(m_static["loss_g_adv"]), rtol=1e-5)


def test_ema_auto_decay():
    """--ema auto sizes the window to ~t/50 (the TPU-measured gating-parity
    rule — RESULTS.md: at reference scale even d=0.9 = t/25 lagged 7/8 vs
    live 8/8), floors at 0.01 for micro-runs, and always satisfies the
    2/(1-d) debias horizon rule (so ema_horizon_note never warns on it)."""
    import pytest

    # reference regime: 896 rows, B=32, k=5, 50 epochs -> t=250 G updates
    cfg = tiny_cfg(batch_size=32, critic_iters=5)
    d = gan_step.ema_auto_decay(cfg, 50, 896)
    assert d == pytest.approx(1.0 - 50.0 / 250.0)  # 0.8
    assert gan_step.ema_horizon_note(
        tiny_cfg(batch_size=32, critic_iters=5, ema_decay=d), 50, 896) is None

    # long run: decay grows toward (but is capped below) 1
    d_long = gan_step.ema_auto_decay(cfg, 5000, 896)  # t=25000
    assert d_long == pytest.approx(1.0 - 50.0 / 25000.0)
    assert gan_step.ema_auto_decay(cfg, 10**9, 896) == 0.9999

    # micro-run: t < 50 floors at 0.01 (EMA ~ live; artifact still exists)
    assert gan_step.ema_auto_decay(cfg, 2, 896) == 0.01

    # zero planned G updates is a clear error, not a silent 0-decay
    with pytest.raises(ValueError, match="zero generator updates"):
        gan_step.ema_auto_decay(cfg, 1000, 4 * 32)


def test_resolve_ema_arg_cli():
    """The CLI-level resolver: 'auto' -> ema_auto_decay, numeric strings ->
    validated floats, junk -> SystemExit with the flag name."""
    import pytest

    from melogan_tpu.cli import _resolve_ema_arg

    cfg = tiny_cfg(batch_size=32, critic_iters=5)
    assert _resolve_ema_arg("auto", cfg, 50, 896) == pytest.approx(0.8)
    assert _resolve_ema_arg(" AUTO ", cfg, 50, 896) == pytest.approx(0.8)
    assert _resolve_ema_arg("0.99", cfg, 50, 896) == 0.99
    assert _resolve_ema_arg(0.5, cfg, 50, 896) == 0.5
    with pytest.raises(SystemExit, match="--ema"):
        _resolve_ema_arg("1.0", cfg, 50, 896)
    with pytest.raises(SystemExit, match="--gan-ema"):
        _resolve_ema_arg("auto", cfg, 1000, 4 * 32, flag="--gan-ema")


def test_fused_critic_batch_matches_reference_structure(rng):
    """The fused [real; fake; interp] single-dispatch critic update
    (cfg.fused_critic_batch, the VERDICT-r3 item-6 optimization) is
    mathematically identical to the reference-structured three-application
    program: same group-step metrics and parameter trajectories to float
    reassociation tolerance."""
    cfg_f = tiny_cfg(batch_size=8, fused_critic_batch=True)
    cfg_r = tiny_cfg(batch_size=8, fused_critic_batch=False)
    ed_cfg = tiny_ed_cfg()
    models = gan_step.build_models(cfg_f, ed_cfg)
    state0 = gan_step.init_state(cfg_f, models, seed=0)

    k, b = cfg_f.critic_iters, cfg_f.batch_size
    batches = (
        jnp.asarray(rng.normal(size=(k, b, cfg_f.max_notes, 4)), jnp.float32),
        jnp.asarray(rng.integers(0, 4, size=(k, b)), jnp.int32),
        jnp.asarray(rng.normal(size=(k, b, cfg_f.latent_dim)), jnp.float32),
        jnp.asarray(rng.normal(size=(k, b, cfg_f.numeric_input_dim)), jnp.float32),
    )
    step_f = jax.jit(gan_step.make_train_steps(cfg_f, models).group)
    step_r = jax.jit(gan_step.make_train_steps(cfg_r, models).group)
    s_f, m_f = step_f(state0, batches)
    s_r, m_r = step_r(state0, batches)
    # two separately-compiled programs: identical math, different XLA fusion
    # order; Adam's rsqrt amplifies reassociation deltas (measured: gp diff
    # 3.6e-7, params 3.6e-4 after the 5 critic updates) — same tolerance
    # rationale as test_epoch_step_matches_sequential_groups
    for name in m_f:
        np.testing.assert_allclose(
            np.asarray(m_f[name]), np.asarray(m_r[name]), rtol=1e-3, atol=5e-5,
            err_msg=name,
        )
    for a, b_ in zip(
        jax.tree_util.tree_leaves(s_f.critic_params)
        + jax.tree_util.tree_leaves(s_f.gen_params),
        jax.tree_util.tree_leaves(s_r.critic_params)
        + jax.tree_util.tree_leaves(s_r.gen_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-3)


def test_precision_tuned_cfg_policy():
    """The measured per-precision dispatch policy: fused critic batch stays
    for f32, is disabled under bf16 (docs/performance.md round-4 table)."""
    cfg = tiny_cfg(fused_critic_batch=True)
    assert gan_step.precision_tuned_cfg(cfg, None).fused_critic_batch
    assert gan_step.precision_tuned_cfg(cfg, "highest").fused_critic_batch
    assert not gan_step.precision_tuned_cfg(cfg, "bf16").fused_critic_batch
    assert not gan_step.precision_tuned_cfg(cfg, "default").fused_critic_batch
    # explicit opt-out is preserved everywhere
    off = tiny_cfg(fused_critic_batch=False)
    assert not gan_step.precision_tuned_cfg(off, None).fused_critic_batch
