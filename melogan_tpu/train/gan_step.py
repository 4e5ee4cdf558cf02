"""WGAN-GP training as fused jitted XLA programs.

Reference semantics reproduced exactly (src/gan/train_gan.py:159-251):

- critic update on EVERY batch: generator forward (train-mode batch-norm, no
  gradient into G), ``loss_d = mean(D(fake)) − mean(D(real)) + λ_gp·GP``
- generator + feature-encoder update every ``critic_iters``-th batch, on that
  same batch with fresh noise:
  ``loss_g = −mean(D(G(z))) + λ_emo·CE(ED(G(z)), emotion)`` with the emotion
  discriminator frozen in eval mode
- gradient penalty with per-sample uniform α interpolates
  (src/gan/utils.py:75-90) — in JAX this is a nested ``jax.grad`` through the
  critic, differentiated again w.r.t. critic params; no retain_graph
  machinery
- Adam(β₁ 0.5, β₂ 0.9), lr_g 2e-4 over G+E_num jointly, lr_d 1e-4 over D

TPU-first restructuring: the data-dependent "every 5th batch" Python schedule
becomes a static-shape *group step* — ``lax.scan`` over ``critic_iters``
stacked microbatches for the critic, then one generator update on the last
microbatch — a single XLA program per group (one dispatch instead of six).
A tail step handles the epoch remainder with critic-only updates. Batch-norm
running statistics thread through both phases in their reference order.

Under a sharded mesh the same program runs SPMD: microbatches are sharded on
the 'data' axis and XLA inserts the gradient/batch-stat all-reduces on ICI.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from melogan_tpu.config import EDConfig, GANConfig
from melogan_tpu.models.ed import EmotionDiscriminator
from melogan_tpu.models.gan import Critic, FeatureEncoder, Generator


class GANTrainState(struct.PyTreeNode):
    step: jnp.ndarray  # group-step counter
    gen_params: Any
    gen_stats: Any  # generator batch-norm running stats
    fe_params: Any
    critic_params: Any
    ed_params: Any  # frozen emotion discriminator (params + stats)
    ed_stats: Any
    opt_g: Any  # over (gen_params, fe_params) jointly
    opt_d: Any
    rng: jnp.ndarray
    # RAW zero-seeded EMA stream of gen_params (None when cfg.ema_decay == 0;
    # updated after every generator step inside the fused programs — a
    # tree_map of fused multiply-adds, free next to the double-backward GP).
    # Deployable weights come from :func:`ema_weights`, which debiases by
    # 1/(1 − d^t) (Adam-style): an init-seeded stream would serve d^t·init —
    # ~90% random weights after 100 G-updates at d=0.999.
    ema_params: Any = None


class GANModels(NamedTuple):
    generator: Generator
    critic: Critic
    feature_encoder: FeatureEncoder
    ed: EmotionDiscriminator


def build_models(cfg: GANConfig, ed_cfg: Optional[EDConfig] = None) -> GANModels:
    ed_cfg = ed_cfg or EDConfig()
    return GANModels(
        generator=Generator.from_config(cfg),
        critic=Critic.from_config(cfg),
        feature_encoder=FeatureEncoder.from_config(cfg),
        ed=EmotionDiscriminator.from_config(ed_cfg),
    )


def make_optimizers(cfg: GANConfig) -> Tuple[optax.GradientTransformation, optax.GradientTransformation]:
    opt_g = optax.adam(cfg.lr_g, b1=cfg.beta1, b2=cfg.beta2)
    opt_d = optax.adam(cfg.lr_d, b1=cfg.beta1, b2=cfg.beta2)
    return opt_g, opt_d


class HyperParams(NamedTuple):
    """Per-run hyperparameters as scalars that may be TRACERS.

    Passing a ``HyperParams`` into :func:`make_train_steps` makes the fused
    programs read these four knobs from runtime values instead of baking the
    config floats into the compiled executable — which is what lets
    ``jax.vmap`` train a POPULATION of hyperparameter configurations as one
    XLA program (train/sweep.py): each member carries its own (lr_g, lr_d,
    λ_gp, λ_emo) scalar, the trace is shared.

    Numerics are bit-identical to the baked path: ``optax.adam(lr)`` ends in
    ``scale(-lr)`` — one IEEE multiply per leaf — and the hyper path computes
    ``lr * (-x)`` via ``adam(1.0)``, which is the same value exactly (both
    are ``-(lr*x)``; negation is exact). Adam's moment state is lr-free, so
    opt-state trees are interchangeable between the two paths (checkpoints
    resume across them). Tested: tests/test_sweep.py.
    """

    lr_g: Any
    lr_d: Any
    lambda_gp: Any
    lambda_emotion: Any
    lambda_fm: Any = 0.0

    @classmethod
    def from_config(cls, cfg: GANConfig, **overrides) -> "HyperParams":
        """Config defaults, with any of the four fields overridden."""
        bad = set(overrides) - set(cls._fields)
        if bad:
            raise ValueError(f"unknown hyperparams {sorted(bad)}; "
                             f"valid: {list(cls._fields)}")
        vals = {f: getattr(cfg, f) for f in cls._fields}
        vals.update({k: v for k, v in overrides.items() if v is not None})
        return cls(**vals)


def note_space_stats(notes) -> "jnp.ndarray":
    """Differentiable per-sample note-space statistics φ(notes) → (B, 18):
    per-column mean, std, mean |Δ| (absolute first difference over the
    event axis — a rhythm/contour statistic), plus a 6-dim chroma signature
    of the pitch column.

    These are the raw-note-space marginals an independent classifier (or a
    kNN) keys on; the renderer's per-emotion bpm map cannot fake them. Used
    by the optional feature-matching loss (``lambda_fm``). The |Δ| term was
    added after the λ_fm=1 full-scale run: matching means/stds alone lifted
    judge-ED 28→47% but left angry at 0% — temporal structure is where the
    conv judge separates the fast emotions (RESULTS.md)."""
    mu = jnp.mean(notes, axis=1)
    sd = jnp.sqrt(jnp.maximum(jnp.var(notes, axis=1), 1e-8))
    dif = jnp.mean(jnp.abs(notes[:, 1:, :] - notes[:, :-1, :]), axis=1)
    # chroma signature (round 5, after fm5/fm6): mean sin/cos of the pitch
    # column at pitch-class frequency and two harmonics — the differentiable
    # analog of a pitch-class histogram. Key/scale membership is the signal
    # an independent judge separates minor-key angry from major-key happy
    # with; mean/std/|Δ| cannot express it (generated angry matched the
    # train-ED centroids yet read as happy to the val judge).
    pitch_semi = (notes[..., 0] + 1.0) * 63.5  # renderer's pitch map
    chroma = []
    for k in (1, 2, 3):
        theta = (2.0 * jnp.pi / 12.0) * k * pitch_semi
        chroma.append(jnp.mean(jnp.sin(theta), axis=1))
        chroma.append(jnp.mean(jnp.cos(theta), axis=1))
    return jnp.concatenate([mu, sd, dif, jnp.stack(chroma, axis=-1)], axis=-1)


def fm_targets_from_data(notes_gan: "np.ndarray", emotion_idx: "np.ndarray"):
    """Per-emotion real-data centroids of :func:`note_space_stats`, plus a
    per-feature scale (global std across songs) for a balanced loss.

    Returns ``(targets (4, 18), scale (18,))`` as numpy — computed ONCE on
    host from the training corpus, then baked into the fused program as
    constants.
    """
    import numpy as np

    pitch_semi = (notes_gan[..., 0] + 1.0) * 63.5
    chroma = []
    for k in (1, 2, 3):
        theta = (2.0 * np.pi / 12.0) * k * pitch_semi
        chroma.append(np.sin(theta).mean(axis=1))
        chroma.append(np.cos(theta).mean(axis=1))
    phi = np.concatenate(
        [notes_gan.mean(axis=1),
         np.sqrt(np.maximum(notes_gan.var(axis=1), 1e-8)),
         np.abs(np.diff(notes_gan, axis=1)).mean(axis=1),
         np.stack(chroma, axis=-1)], axis=-1
    ).astype(np.float32)
    targets = np.stack([
        phi[emotion_idx == e].mean(axis=0) if (emotion_idx == e).any()
        else phi.mean(axis=0)
        for e in range(4)
    ])
    scale = np.maximum(phi.std(axis=0), 1e-3).astype(np.float32)
    return targets, scale


def fm_ed_targets_from_data(
    ed, ed_variables: Dict, notes_gan: "np.ndarray",
    emotion_idx: "np.ndarray", batch_size: int = 128,
):
    """Per-emotion centroids of the FROZEN ED's penultimate features over the
    real corpus, plus a per-feature scale — the ED-feature-matching targets
    (Salimans et al.'s feature matching, aimed at the exact statistics an
    emotion classifier reads; the hand-built φ in fm_targets_from_data can't
    express pitch-class/scale structure, which is where the judge separates
    the slow/fast emotion pairs — RESULTS.md round-5 study).

    Returns ``(targets (4, D), scale (D,))`` numpy; None when the ED runs in
    latent mode (features would just be the input)."""
    import numpy as np

    if ed.input_mode != "notes":
        return None
    ed_vars = {"params": ed_variables["params"]}
    if ed_variables.get("batch_stats"):
        ed_vars["batch_stats"] = ed_variables["batch_stats"]
    feats_fn = jax.jit(
        lambda x: ed.apply(ed_vars, x, train=False, multi=True,
                           method=ed.features)
    )
    outs = []
    n = notes_gan.shape[0]
    for i in range(0, n, batch_size):
        outs.append(np.asarray(feats_fn(jnp.asarray(notes_gan[i:i + batch_size]))))
    feats = np.concatenate(outs, axis=0).astype(np.float32)
    targets = np.stack([
        feats[emotion_idx == e].mean(axis=0) if (emotion_idx == e).any()
        else feats.mean(axis=0)
        for e in range(4)
    ])
    scale = np.maximum(feats.std(axis=0), 1e-3).astype(np.float32)
    return targets, scale


def init_state(
    cfg: GANConfig,
    models: GANModels,
    seed: int = 42,
    ed_variables: Optional[Dict] = None,
    batch_size: Optional[int] = None,
) -> GANTrainState:
    """Initialize all params/opt-state. ``ed_variables`` loads a pre-trained
    frozen emotion discriminator; otherwise it starts random (the reference
    warns and proceeds identically, train_gan.py:128-129)."""
    b = batch_size or cfg.batch_size
    key = jax.random.PRNGKey(seed)
    k_fe, k_g, k_d, k_ed, k_run = jax.random.split(key, 5)

    feat = jnp.zeros((b, cfg.numeric_input_dim))
    fe_vars = models.feature_encoder.init(k_fe, feat, train=False)

    emb = jnp.zeros((b, cfg.encoder_out_dim))
    noise = jnp.zeros((b, cfg.noise_dim))
    latent = (
        jnp.zeros((b, cfg.latent_dim)) if cfg.integration_mode == "conditioning" else None
    )
    gen_vars = models.generator.init(k_g, noise, latent, emb, train=False)

    notes = jnp.zeros((b, cfg.max_notes, cfg.note_dim))
    critic_vars = models.critic.init(k_d, notes, emb)

    if ed_variables is None:
        ed_variables = models.ed.init(k_ed, notes, train=False)
    ed_params = ed_variables["params"]
    ed_stats = ed_variables.get("batch_stats", {})

    opt_g, opt_d = make_optimizers(cfg)
    g_joint = (gen_vars["params"], fe_vars["params"])
    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_vars["params"],
        gen_stats=gen_vars.get("batch_stats", {}),
        fe_params=fe_vars["params"],
        critic_params=critic_vars["params"],
        ed_params=ed_params,
        ed_stats=ed_stats,
        opt_g=opt_g.init(g_joint),
        opt_d=opt_d.init(critic_vars["params"]),
        rng=jax.random.PRNGKey(seed + 1),
        ema_params=(
            jax.tree_util.tree_map(jnp.zeros_like, gen_vars["params"])
            if cfg.ema_decay else None
        ),
    )


def ema_weights(state: GANTrainState, decay: float):
    """Debiased EMA generator weights for export/serving/gating.

    The state carries the raw zero-seeded stream ``e_t = d·e_{t-1} +
    (1−d)·p_t``; the unbiased estimate is ``e_t / (1 − d^t)`` with ``t`` the
    generator-update count (``state.step`` — one G update per group step).
    Exact at every horizon: at small ``t`` it is a proper weighted average of
    the visited weights with no init contamination. Returns the live params
    when no update has happened yet (t = 0), or None when EMA is off."""
    if state.ema_params is None:
        return None
    t = int(np.asarray(state.step))
    if t == 0:
        return state.gen_params
    corr = 1.0 - float(decay) ** t
    return jax.tree_util.tree_map(
        lambda e: np.asarray(e) / np.float32(corr), state.ema_params
    )


def ema_horizon_note(cfg: GANConfig, n_epochs: int, n_train: int) -> Optional[str]:
    """Advisory for a mis-sized generator-EMA decay (the measured gotcha).

    The run performs ``t = n_epochs × (⌊N/B⌋ // critic_iters)`` generator
    updates while the EMA averages over a ``1/(1−d)``-update window. Measured
    on TPU at full reference scale (RESULTS.md, docs/operations.md "horizon
    rule"): the debiased EMA needs roughly ``2/(1−d)`` updates before it
    matches the live trajectory — at t≈100, d=0.98 gated 0/8 while the live
    weights passed 8/8; a 500-epoch run at d=0.99 reached 8/8 at ~2× the
    window. Returns a warning string when ``t < 2/(1−d)``, else None. Pure
    host-side arithmetic — never traced."""
    d = cfg.ema_decay
    if not d:
        return None
    if d >= 1.0:  # GANConfig.__post_init__ rejects this; belt-and-braces
        return (
            f"[WARN] ema_decay={d:g} is ≥ 1.0: the EMA would never move off "
            f"its seed. Use a decay in [0, 1)."
        )
    g_per_epoch = (n_train // cfg.batch_size) // max(cfg.critic_iters, 1)
    t = n_epochs * g_per_epoch
    if g_per_epoch == 0:
        return (
            f"[WARN] ema_decay={d:g} requested but this run will perform ZERO "
            f"generator updates: the corpus yields only "
            f"{n_train // cfg.batch_size} batches/epoch at batch_size="
            f"{cfg.batch_size}, fewer than critic_iters={cfg.critic_iters}, "
            f"so every epoch is a critic-only tail and G_ema stays its zero "
            f"seed regardless of epochs. Lower the batch size or critic_iters."
        )
    window = 1.0 / (1.0 - d)
    if t >= 2.0 * window:
        return None
    fix = f"lower the decay to ≤ {1.0 - 2.0 / t:.4g}, " if t > 2 else ""
    return (
        f"[WARN] ema_decay={d:g} averages over ~{window:.0f} G updates but "
        f"this run only performs t={t} ({n_epochs} epochs × {g_per_epoch} "
        f"G updates/epoch); measured on TPU the EMA needs ~2/(1−d) updates "
        f"to catch the live trajectory, so the exported G_ema will lag — "
        f"{fix}train longer, or use --track-best to gate the EMA artifact "
        f"(docs/operations.md: horizon rule)"
    )


def ema_auto_decay(cfg: GANConfig, n_epochs: int, n_train: int) -> float:
    """Derive a generator-EMA decay from the planned G-update count
    (``--ema auto`` — VERDICT-r4 item 7: turn the horizon warning into
    behavior).

    Measured on TPU at reference scale (RESULTS.md EMA table): the
    2/(1−d) debias rule is necessary but NOT sufficient for gating parity —
    at t≈250 G updates, d=0.98 (t = 5× window) gated 0/8 and d=0.9
    (t = 25× window) still lagged at 7/8 vs live 8/8. The trajectory moves
    fast for this model's entire reference-length run, so the EMA window
    must cover only the settled tail: auto sizes the window to ~t/50
    (``d = 1 − 50/t``), i.e. average the last ~2% of the run. At reference
    scale that is d≈0.8 — wide enough to smooth per-update noise, narrow
    enough not to drag in stale weights. Floors at 0.01 (EMA ≈ live weights
    but the G_ema artifact still exists) for micro-runs."""
    g_per_epoch = (n_train // cfg.batch_size) // max(cfg.critic_iters, 1)
    t = n_epochs * g_per_epoch
    if t <= 0:
        raise ValueError(
            f"--ema auto: this run performs zero generator updates "
            f"({n_train} rows, batch_size={cfg.batch_size}, "
            f"critic_iters={cfg.critic_iters}); lower the batch size or "
            f"critic_iters."
        )
    return float(min(max(1.0 - 50.0 / t, 0.01), 0.9999))


def cross_entropy(logits, labels) -> jnp.ndarray:
    """torch CrossEntropyLoss semantics: mean over batch of −log_softmax[y]."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def _gradient_penalty(critic: Critic, critic_params, real, fake, emb, alpha):
    """((‖∇ₓD(interp)‖₂ − 1)²).mean() with per-sample α (utils.py:75-90)."""
    interp = alpha * real + (1.0 - alpha) * fake

    def critic_sum(x):
        return jnp.sum(critic.apply({"params": critic_params}, x, emb))

    grads = jax.grad(critic_sum)(interp)
    norms = jnp.sqrt(jnp.sum(jnp.square(grads.reshape(grads.shape[0], -1)), axis=1) + 1e-12)
    return jnp.mean(jnp.square(norms - 1.0))


def precision_tuned_cfg(cfg: GANConfig, precision) -> GANConfig:
    """Apply the measured per-precision dispatch policy (round 4, v5e,
    scripts/mfu_breakdown.py): the fused [real; fake; interp] single-dispatch
    critic batch is 1.44× faster at f32 but 0.75× (slower) under bf16 MXU
    passes, so bf16 runs keep the reference-structured program. Explicit
    ``FUSED_CRITIC_BATCH`` in YAML still wins for f32 runs; bf16 always
    unfuses (the fused program is strictly worse there)."""
    import dataclasses

    if precision in ("bf16", "default") and cfg.fused_critic_batch:
        return dataclasses.replace(cfg, fused_critic_batch=False)
    return cfg


class TrainStepFns(NamedTuple):
    """The fused WGAN-GP programs, coarsest-granularity last (each is a pure
    function to be jitted; the loop picks the coarsest one the data allows)."""

    group: Any  # (state, (K,B,...)-batches) → one group: K critic + 1 G update
    tail: Any  # (state, (T,B,...)-batches) → T critic-only updates
    epoch: Any  # (state, (G,K,B,...)-batches) → one epoch of groups
    indexed: Any  # (state, device data, (G,K,B) idx) → one epoch, device gather
    run: Any  # (state, device data, (E,G,K,B) idx, (E,T,B) idx) → E epochs


def make_train_steps(
    cfg: GANConfig, models: GANModels, mesh=None,
    hyper: Optional[HyperParams] = None,
    fm_target=None, fm_ed_target=None,
) -> TrainStepFns:
    """Build the fused train-step pure functions (see TrainStepFns).

    group(state, batches) with each batch field stacked to
    (critic_iters, B, ...): runs ``critic_iters`` critic updates then one
    G+E update on the final microbatch. Returns (state, metrics).

    tail(state, batches) with (T, B, ...) stacks: the epoch tail
    (the reference updates D on every batch regardless of the G schedule).

    With ``mesh`` (a ``jax.sharding.Mesh`` with a 'data' axis) the SAME
    programs run SPMD data-parallel: every microbatch (and the per-sample
    noise/α draws) is constrained batch-over-'data' and GSPMD inserts the
    gradient/batch-stat all-reduces on ICI. Params/opt state stay replicated
    (they're tiny); trajectories match the single-device program up to
    reduction order (tested in tests/test_parallel.py).

    With ``hyper`` (a :class:`HyperParams`, fields may be tracers) the four
    knobs become runtime values: the optimizers run at lr 1.0 and the update
    is scaled by ``hyper.lr_*`` (bit-identical — see HyperParams), and the
    loss weights multiply by ``hyper.lambda_*``. This is how train/sweep.py
    vmaps a hyperparameter population through ONE compiled program.
    """
    gen, critic, fe, ed = models
    if hyper is None:
        opt_g, opt_d = make_optimizers(cfg)
        lr_scale_g = lr_scale_d = None
        lambda_gp, lambda_emo = cfg.lambda_gp, cfg.lambda_emotion
        lambda_fm = cfg.lambda_fm
    else:
        opt_g = optax.adam(1.0, b1=cfg.beta1, b2=cfg.beta2)
        opt_d = optax.adam(1.0, b1=cfg.beta1, b2=cfg.beta2)
        lr_scale_g, lr_scale_d = hyper.lr_g, hyper.lr_d
        lambda_gp, lambda_emo = hyper.lambda_gp, hyper.lambda_emotion
        lambda_fm = hyper.lambda_fm
    # feature matching (documented deviation, DEFAULT OFF — cfg.lambda_fm=0
    # keeps the exact reference loss): pull each generated sample's raw
    # note-space statistics toward its emotion's real-data centroid. The
    # reference's λ_emo·CE through a frozen ED never demonstrably moved
    # emotion into note space (its CE plateaued at ln 4 — BASELINE.md); this
    # term targets the marginals an independent judge actually reads.
    fm_on = fm_target is not None
    if fm_on:
        fm_mu = jnp.asarray(fm_target[0], jnp.float32)   # (4, 18)
        fm_scale = jnp.asarray(fm_target[1], jnp.float32)  # (18,)
    fm_ed_on = fm_ed_target is not None
    if fm_ed_on:
        fm_ed_mu = jnp.asarray(fm_ed_target[0], jnp.float32)   # (4, D)
        fm_ed_scale = jnp.asarray(fm_ed_target[1], jnp.float32)  # (D,)
    if hyper is None and cfg.lambda_fm and not (fm_on or fm_ed_on):
        raise ValueError(
            "cfg.lambda_fm > 0 requires fm_target / fm_ed_target — compute "
            "them from the training corpus with fm_targets_from_data() / "
            "fm_ed_targets_from_data()"
        )

    def _scale(updates, lr):
        if lr is None:
            return updates
        return jax.tree_util.tree_map(lambda u: u * lr, updates)
    from melogan_tpu.parallel.mesh import microbatch_constrainer

    shard_mb = microbatch_constrainer(mesh)

    def fe_embed(fe_params, numeric, rng):
        return fe.apply(
            {"params": fe_params}, numeric, train=True, rngs={"dropout": rng}
        )

    def gen_forward(gen_params, gen_stats, noise, latent, emb):
        (notes, glatent), mutated = gen.apply(
            {"params": gen_params, "batch_stats": gen_stats},
            noise,
            latent,
            emb,
            train=True,
            mutable=["batch_stats"],
        )
        return notes, glatent, mutated["batch_stats"]

    def latent_input(batch_latent):
        return batch_latent if cfg.integration_mode == "conditioning" else None

    # -- one critic update ------------------------------------------------
    def critic_update(carry, batch):
        critic_params, opt_d_state, gen_params, gen_stats, fe_params, rng = carry
        real, emot_idx, latents, numeric = shard_mb(batch)
        b = real.shape[0]
        rng, k_drop, k_noise, k_alpha = jax.random.split(rng, 4)

        emb = fe_embed(fe_params, numeric, k_drop)
        noise = shard_mb(jax.random.normal(k_noise, (b, cfg.noise_dim)))
        fake, _, gen_stats = gen_forward(
            gen_params, gen_stats, noise, latent_input(latents), emb
        )
        fake = jax.lax.stop_gradient(fake)
        alpha = shard_mb(jax.random.uniform(k_alpha, (b, 1, 1)))

        def loss_fn(cp):
            if cfg.fused_critic_batch:
                # ONE critic dispatch over [real; fake; interp] (3B rows)
                # instead of three B-row applications. Mathematically exact:
                # the critic has no cross-batch ops (convs + per-sample pool
                # + linears, NO batch-norm — models.py:140-147), so batching
                # is row-independent; grad of the interp-slice sum w.r.t. the
                # interp input equals the per-sample grads the GP needs. At
                # B=32 and Cin=4 the batched conv triples the MXU rows per
                # dispatch — the VERDICT-r3 item-6 targeted optimization
                # (measured on TPU in docs/performance.md).
                interp = alpha * real + (1.0 - alpha) * fake
                emb3 = jnp.concatenate([emb, emb, emb], axis=0)

                def interp_sum(x_i):
                    x = jnp.concatenate([real, fake, x_i], axis=0)
                    s = critic.apply({"params": cp}, x, emb3)
                    return jnp.sum(s[2 * b:]), s

                (_, s), g = jax.value_and_grad(interp_sum, has_aux=True)(interp)
                norms = jnp.sqrt(
                    jnp.sum(jnp.square(g.reshape(b, -1)), axis=1) + 1e-12
                )
                gp = jnp.mean(jnp.square(norms - 1.0))
                dr, df = jnp.mean(s[:b]), jnp.mean(s[b:2 * b])
            else:
                # reference-structured program (three separate applications)
                d_real = critic.apply({"params": cp}, real, emb)
                d_fake = critic.apply({"params": cp}, fake, emb)
                gp = _gradient_penalty(critic, cp, real, fake, emb, alpha)
                dr, df = jnp.mean(d_real), jnp.mean(d_fake)
            loss = df - dr + lambda_gp * gp
            return loss, (gp, dr, df)

        (loss_d, (gp, dr, df)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            critic_params
        )
        updates, opt_d_state = opt_d.update(grads, opt_d_state, critic_params)
        critic_params = optax.apply_updates(critic_params, _scale(updates, lr_scale_d))
        carry = (critic_params, opt_d_state, gen_params, gen_stats, fe_params, rng)
        return carry, (loss_d, gp, dr, df)

    # -- one generator+feature-encoder update -----------------------------
    def gen_update(state: GANTrainState, batch, critic_params, gen_stats, rng):
        real, emot_idx, latents, numeric = shard_mb(batch)
        b = real.shape[0]
        rng, k_drop, k_noise = jax.random.split(rng, 3)

        def loss_fn(joint):
            gen_params, fe_params = joint
            emb = fe_embed(fe_params, numeric, k_drop)
            noise = shard_mb(jax.random.normal(k_noise, (b, cfg.noise_dim)))
            notes, glatent, new_stats = gen_forward(
                gen_params, gen_stats, noise, latent_input(latents), emb
            )
            adv = -jnp.mean(critic.apply({"params": critic_params}, notes, emb))
            ed_in = glatent if ed.input_mode == "latent" else notes
            ed_vars = {"params": state.ed_params}
            if state.ed_stats:
                ed_vars["batch_stats"] = state.ed_stats
            if fm_ed_on:
                # one encoder pass serves both the CE and the feature match;
                # multi=True matches per-block pooled activations too (multi-
                # scale texture), not just the penultimate embedding
                ed_feats, logits = ed.apply(
                    ed_vars, ed_in, train=False, multi=True,
                    method=ed.features_and_logits)
            else:
                logits = ed.apply(ed_vars, ed_in, train=False)
            emo = cross_entropy(logits, emot_idx)
            loss = adv + lambda_emo * emo
            fm = jnp.zeros(())
            if fm_on:
                phi = note_space_stats(notes)
                diff = (phi - fm_mu[emot_idx]) / fm_scale
                fm = fm + jnp.mean(jnp.sum(jnp.square(diff), axis=-1)) / phi.shape[-1]
            if fm_ed_on:
                dfe = (ed_feats - fm_ed_mu[emot_idx]) / fm_ed_scale
                fm = fm + jnp.mean(jnp.sum(jnp.square(dfe), axis=-1)) / dfe.shape[-1]
            if fm_on or fm_ed_on:
                loss = loss + lambda_fm * fm
            return loss, (new_stats, adv, emo, fm)

        joint = (state.gen_params, state.fe_params)
        (_, (new_stats, adv, emo, fm)), grads = jax.value_and_grad(loss_fn, has_aux=True)(joint)
        updates, opt_g_state = opt_g.update(grads, state.opt_g, joint)
        gen_params, fe_params = optax.apply_updates(joint, _scale(updates, lr_scale_g))
        return gen_params, fe_params, opt_g_state, new_stats, adv, emo, fm, rng

    # -- fused group step --------------------------------------------------
    def group_step(state: GANTrainState, batches):
        """batches: tuple of arrays stacked to (critic_iters, B, ...)."""
        carry = (
            state.critic_params,
            state.opt_d,
            state.gen_params,
            state.gen_stats,
            state.fe_params,
            state.rng,
        )
        carry, (d_losses, gps, drs, dfs) = jax.lax.scan(critic_update, carry, batches)
        critic_params, opt_d_state, _, gen_stats, _, rng = carry

        last_batch = jax.tree_util.tree_map(lambda x: x[-1], batches)
        gen_params, fe_params, opt_g_state, gen_stats, adv, emo, fm, rng = gen_update(
            state, last_batch, critic_params, gen_stats, rng
        )

        # generator weight EMA, tracked on device after every G update
        # (static python branch: when ema_decay == 0 the compiled program is
        # unchanged and ema_params stays None)
        ema_params = state.ema_params
        if cfg.ema_decay:
            d = jnp.float32(cfg.ema_decay)
            ema_params = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p, ema_params, gen_params
            )

        new_state = state.replace(
            step=state.step + 1,
            gen_params=gen_params,
            gen_stats=gen_stats,
            fe_params=fe_params,
            critic_params=critic_params,
            opt_g=opt_g_state,
            opt_d=opt_d_state,
            rng=rng,
            ema_params=ema_params,
        )
        metrics = {
            "loss_d_sum": jnp.sum(d_losses),
            "gp_mean": jnp.mean(gps),
            "loss_g_adv": adv,
            "loss_g_emo": emo,
            # per-component critic tracking (VERDICT-r3 item 3): sums over
            # the K per-update batch-means of D(real)/D(fake); the loop
            # derives the Wasserstein estimate W ≈ E[D(real)] − E[D(fake)]
            "d_real_sum": jnp.sum(drs),
            "d_fake_sum": jnp.sum(dfs),
        }
        if fm_on or fm_ed_on:  # static: metric exists only when compiled in
            metrics["loss_g_fm"] = fm
        return new_state, metrics

    # -- epoch-level fusion: scan group steps in ONE dispatch ---------------
    def epoch_step(state: GANTrainState, group_stacks):
        """group_stacks: tuple of arrays stacked to (G, critic_iters, B, ...).

        Runs G fused group steps inside a single jitted program — the whole
        epoch body is one dispatch (the group step itself is ~0.5 ms on
        device; per-dispatch host↔device latency dominates otherwise).
        Returns per-group metric arrays.
        """

        def body(st, batches):
            st, m = group_step(st, batches)
            return st, m

        state, metrics = jax.lax.scan(body, state, group_stacks)
        return state, metrics

    # -- device-resident-data epoch: host sends only the index array --------
    def indexed_epoch_step(state: GANTrainState, data, idx):
        """``data``: the full device-resident epoch arrays
        (notes (N, L, 4), emotion_idx (N,), latents (N, latent), numeric
        (N, 6)); ``idx``: (G, critic_iters, B) int32 gather indices.

        The per-epoch host→device transfer shrinks from the stacked batches
        (~MBs) to the index array (~KBs); batch gathering happens on-device
        inside the scanned program.
        """
        notes_all, emot_all, lat_all, num_all = data

        def body(st, idx_g):
            batches = (
                notes_all[idx_g],
                emot_all[idx_g],
                lat_all[idx_g],
                num_all[idx_g],
            )
            return group_step(st, batches)

        state, metrics = jax.lax.scan(body, state, idx)
        return state, metrics

    # -- multi-epoch fusion: E whole epochs in ONE dispatch ------------------
    def indexed_run_step(state: GANTrainState, data, group_idx, tail_idx=None, live=None):
        """``group_idx``: (E, G, critic_iters, B) int32 gather indices;
        ``tail_idx``: (E, T, B) int32 or None (datasets where the batch count
        divides critic_iters have no tail); ``live``: (E,) bool or None —
        False marks padding rows the host added so a short final chunk runs
        through the SAME compiled program (the epoch is skipped via
        ``lax.cond``: state unchanged, zero metrics).

        Scans whole epochs — G fused group steps then the critic-only tail,
        in the reference's order — inside a single jitted program, so the
        host pays one dispatch (and one ~30 ms tunnel round trip) per E
        epochs instead of per epoch. E is the checkpoint cadence in the real
        loop (``save_freq``), keeping artifact semantics identical.
        Returns per-epoch metric arrays (each (E,))."""
        notes_all, emot_all, lat_all, num_all = data

        def gather(idx):
            return (notes_all[idx], emot_all[idx], lat_all[idx], num_all[idx])

        def run_epoch(st, idx_e):
            st, gm = jax.lax.scan(lambda s, i: group_step(s, gather(i)), st, idx_e["group"])
            metrics = {
                "loss_d_sum": jnp.sum(gm["loss_d_sum"]),
                "loss_g_adv": jnp.sum(gm["loss_g_adv"]),
                "loss_g_emo": jnp.sum(gm["loss_g_emo"]),
                "gp_mean": jnp.mean(gm["gp_mean"]),
                "d_real_sum": jnp.sum(gm["d_real_sum"]),
                "d_fake_sum": jnp.sum(gm["d_fake_sum"]),
            }
            if "loss_g_fm" in gm:
                metrics["loss_g_fm"] = jnp.sum(gm["loss_g_fm"])
            if "tail" in idx_e:
                st, tm = critic_only_step(st, gather(idx_e["tail"]))
                for k in ("loss_d_sum", "d_real_sum", "d_fake_sum"):
                    metrics[k] = metrics[k] + tm[k]
                # Fold the tail's gp into the epoch mean weighted by critic
                # update counts, so Critic/gp covers the same updates as
                # Critic/Wasserstein (which divides by an n_steps that
                # includes the tail). Shapes are static inside jit:
                # group idx (G, critic_iters, B), tail idx (T, B).
                n_group = idx_e["group"].shape[0] * idx_e["group"].shape[1]
                n_tail = idx_e["tail"].shape[0]
                metrics["gp_mean"] = (
                    metrics["gp_mean"] * n_group + tm["gp_mean"] * n_tail
                ) / float(n_group + n_tail)
            return st, metrics

        def epoch_body(st, idx_e):
            if "live" not in idx_e:
                return run_epoch(st, idx_e)
            payload = {k: v for k, v in idx_e.items() if k != "live"}

            def skip(s):
                keys = ["loss_d_sum", "loss_g_adv", "loss_g_emo",
                        "gp_mean", "d_real_sum", "d_fake_sum"]
                if fm_on or fm_ed_on:
                    keys.append("loss_g_fm")
                zeros = {k: jnp.zeros((), jnp.float32) for k in keys}
                return s, zeros

            return jax.lax.cond(
                idx_e["live"], lambda s: run_epoch(s, payload), skip, st
            )

        idx = {"group": group_idx}
        if tail_idx is not None:
            idx["tail"] = tail_idx
        if live is not None:
            idx["live"] = live
        return jax.lax.scan(epoch_body, state, idx)

    # -- critic-only tail --------------------------------------------------
    def critic_only_step(state: GANTrainState, batches):
        carry = (
            state.critic_params,
            state.opt_d,
            state.gen_params,
            state.gen_stats,
            state.fe_params,
            state.rng,
        )
        carry, (d_losses, gps, drs, dfs) = jax.lax.scan(critic_update, carry, batches)
        critic_params, opt_d_state, _, gen_stats, _, rng = carry
        new_state = state.replace(
            critic_params=critic_params,
            opt_d=opt_d_state,
            gen_stats=gen_stats,
            rng=rng,
        )
        return new_state, {
            "loss_d_sum": jnp.sum(d_losses),
            "gp_mean": jnp.mean(gps),
            "d_real_sum": jnp.sum(drs),
            "d_fake_sum": jnp.sum(dfs),
        }

    return TrainStepFns(
        group=group_step,
        tail=critic_only_step,
        epoch=epoch_step,
        indexed=indexed_epoch_step,
        run=indexed_run_step,
    )
