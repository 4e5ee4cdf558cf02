"""WGAN-GP epoch loop (Stage 3).

Drives the fused group/tail steps from ``gan_step`` over reference-identical
epochs: shuffled batches with drop_last, critic update on every batch,
generator update every ``critic_iters``-th batch, per-epoch scalar tags
``Loss/Critic``, ``Loss/Generator_Adv``, ``Loss/Generator_Emo`` with the
reference's averaging (src/gan/train_gan.py:253-264), periodic
``gan_epochNNNN`` checkpoints and a final ``gan_final`` (G + feature encoder).
"""
from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from melogan_tpu.config import EDConfig, GANConfig
from melogan_tpu.data.datasets import SplitData, epoch_group_indices
from melogan_tpu.train import gan_step
from melogan_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from melogan_tpu.utils.metrics import MetricsWriter


def precompile(
    cfg: GANConfig,
    ed_cfg: EDConfig,
    n_train: int,
    mesh=None,
    precision=None,
):
    """Compile the fused multi-epoch WGAN-GP run program for an ``n_train``-row
    corpus WITHOUT training — e.g. from a background thread overlapped with an
    earlier pipeline stage. Mirrors :func:`train`'s construction path and
    argument shapes exactly (parameter shapes don't depend on the frozen ED's
    weights), so the persistent compile cache turns train()'s own jit into a
    cache hit. Data is passed as ShapeDtypeStructs (no device memory)."""
    from melogan_tpu.train.harness import data_sds, jit_with_precision

    cfg = gan_step.precision_tuned_cfg(cfg, precision)
    models = gan_step.build_models(cfg, ed_cfg)
    state = gan_step.init_state(cfg, models, seed=cfg.seed)
    steps = gan_step.make_train_steps(cfg, models, mesh=mesh)
    run_fn = jit_with_precision(steps.run, precision)

    n_batches = n_train // cfg.batch_size
    n_groups = n_batches // cfg.critic_iters
    if n_groups == 0:
        return  # tiny corpus: train() takes the tail-only path, cheap compile
    rem = n_batches - n_groups * cfg.critic_iters
    n_epochs = cfg.epochs
    e_dim = cfg.save_freq if n_epochs > cfg.save_freq else n_epochs

    sds = jax.ShapeDtypeStruct
    dsds = data_sds(mesh)  # train() commits the data args replicated-over-mesh
    data_dev = (
        dsds((n_train, cfg.max_notes, 4), jnp.float32),
        dsds((n_train,), jnp.int32),
        dsds((n_train, cfg.latent_dim), jnp.float32),
        dsds((n_train, 6), jnp.float32),
    )
    gidx = sds((e_dim, n_groups, cfg.critic_iters, cfg.batch_size), jnp.int32)
    tidx = sds((e_dim, rem, cfg.batch_size), jnp.int32) if rem else None
    live = sds((e_dim,), jnp.bool_)
    run_fn.lower(state, data_dev, gidx, tidx, live).compile()


def train(
    cfg: GANConfig,
    ed_cfg: EDConfig,
    train_data: SplitData,
    latents: Optional[np.ndarray] = None,
    ed_variables: Optional[Dict] = None,
    workdir: Optional[str] = None,
    epochs: Optional[int] = None,
    verbose: bool = True,
    resume: bool = False,
    mesh=None,
    precision=None,
    track_best: bool = False,
    gate_samples_per_emotion: int = 2,
) -> Tuple[gan_step.GANTrainState, Dict[str, float]]:
    """Full Stage-3 run. ``ed_variables`` is the pre-trained frozen emotion
    discriminator ({'params': ..., 'batch_stats': ...}); when absent the ED is
    random (the reference warns and proceeds, train_gan.py:128-129).
    ``resume=True`` restarts from the newest periodic checkpoint, including
    both optimizer states — the resume path the reference never implemented
    (SURVEY.md §5). ``mesh``: an optional ``jax.sharding.Mesh`` with a 'data'
    axis — the fused programs then run SPMD data-parallel over it (corpus
    replicated, microbatches sharded; `melogan train-gan --dp N`).
    ``precision='bf16'``: mixed-precision MXU training (note: the WGAN-GP
    second-order penalty is precision-sensitive; the parity default stays
    HIGHEST).

    ``track_best``: at every checkpoint cadence, generate
    ``gate_samples_per_emotion`` fresh .mid per emotion (deterministic seed
    per epoch — resume-stable) and score them against the golden-band
    quality gate; the best-scoring weights are kept as ``gan_best.ckpt``.
    This is the model-selection step the reference's GAN stage never had
    (train_gan.py saves only periodic + final; AE/ED key their best on val
    loss — SURVEY.md §2.1/§2.2): WGAN critic loss is not a quality metric,
    so the gate scores the actual artifact statistics instead. Gates the
    EMA weights when ``cfg.ema_decay > 0`` (the deployable artifact)."""
    cfg = gan_step.precision_tuned_cfg(cfg, precision)
    models = gan_step.build_models(cfg, ed_cfg)
    state = gan_step.init_state(cfg, models, seed=cfg.seed, ed_variables=ed_variables)
    # optional feature matching: per-emotion note-space centroids + frozen-ED
    # penultimate-feature centroids from the REAL training corpus (host-
    # computed once, baked into the program as constants — a lambda_fm run
    # therefore compiles per-corpus; the default lambda_fm=0 path is
    # byte-identical to before)
    fm_target = fm_ed_target = None
    if cfg.lambda_fm:
        fm_target = gan_step.fm_targets_from_data(
            train_data.notes_gan(), train_data.emotion_idx)
        if ed_variables is not None:
            fm_ed_target = gan_step.fm_ed_targets_from_data(
                models.ed, ed_variables, train_data.notes_gan(),
                train_data.emotion_idx)
    steps = gan_step.make_train_steps(cfg, models, mesh=mesh,
                                      fm_target=fm_target,
                                      fm_ed_target=fm_ed_target)

    # per-emotion standardized-feature centroids of the TRAIN corpus: stored
    # in every checkpoint as "emotion_features" so sampling conditions E_num
    # exactly the way it was trained (the reference app's hand-tuned vectors
    # are out-of-distribution for a freshly trained scaler and scramble the
    # emotion mapping at sample time — round-5 study, RESULTS.md)
    emo_idx_all = train_data.emotion_idx
    emotion_features = np.stack([
        train_data.numeric[emo_idx_all == e].mean(axis=0)
        if (emo_idx_all == e).any() else train_data.numeric.mean(axis=0)
        for e in range(4)
    ]).astype(np.float32)
    from melogan_tpu.train.harness import jit_with_precision

    tail_fn = jit_with_precision(steps.tail, precision)
    run_fn = jit_with_precision(steps.run, precision)

    ckpt_dir = os.path.join(workdir, cfg.checkpoint_dir) if workdir else cfg.checkpoint_dir
    log_dir = os.path.join(workdir, cfg.log_dir) if workdir else cfg.log_dir
    writer = MetricsWriter(log_dir)

    start_epoch = 1
    if resume:
        latest = latest_checkpoint(ckpt_dir, "gan_epoch")
        if latest:
            from flax import serialization

            raw = load_checkpoint(latest)  # tolerant of older field sets
            state = state.replace(
                gen_params=serialization.from_state_dict(state.gen_params, raw["G"]["params"]),
                gen_stats=serialization.from_state_dict(state.gen_stats, raw["G"]["batch_stats"]),
                critic_params=serialization.from_state_dict(state.critic_params, raw["D"]["params"]),
                fe_params=serialization.from_state_dict(state.fe_params, raw["E_num"]["params"]),
                opt_g=serialization.from_state_dict(state.opt_g, raw["opt_G"]),
                opt_d=serialization.from_state_dict(state.opt_d, raw["opt_D"]),
            )
            # device RNG stream + group-step counter: with these a resumed run
            # consumes the identical noise/α/dropout stream as straight-through
            if "rng" in raw:
                state = state.replace(rng=jnp.asarray(raw["rng"], jnp.uint32))
            if "step" in raw:
                state = state.replace(step=jnp.asarray(raw["step"], jnp.int32))
            if state.ema_params is not None:
                if "ema_raw" in raw:
                    # the raw zero-seeded stream continues exactly
                    state = state.replace(ema_params=serialization.from_state_dict(
                        state.ema_params, raw["ema_raw"]))
                else:
                    # checkpoint predates --ema: seed the raw stream so the
                    # debiased EMA equals the restored live weights at the
                    # resume point ((1 − d^t)·p debiases back to p) and
                    # tracks the trajectory from there
                    t = int(np.asarray(raw.get("step", 0)))
                    corr = 1.0 - float(cfg.ema_decay) ** t if t else 0.0
                    state = state.replace(ema_params=jax.tree_util.tree_map(
                        lambda p: np.asarray(p) * np.float32(corr),
                        serialization.from_state_dict(
                            state.gen_params, raw["G"]["params"]),
                    ))
            start_epoch = int(raw["epoch"]) + 1
            if verbose:
                print(f"[INFO] resumed from {latest} at epoch {start_epoch}")

    notes = train_data.notes_gan()
    emotion_idx = train_data.emotion_idx.astype(np.int32)
    numeric = train_data.numeric.astype(np.float32)
    if latents is None or latents.shape[0] != notes.shape[0]:
        if latents is not None and verbose:
            print("[WARN] latent feats length mismatch; using zero latents")
        latents = np.zeros((notes.shape[0], cfg.latent_dim), np.float32)
    if cfg.integration_mode == "conditioning" and latents.shape[1] != cfg.latent_dim:
        # fail HERE, not as a shape crash at sample time: a generator trained
        # on d-dim encoder latents is unusable by a sampler built from a
        # config whose LATENT_DIM says otherwise
        raise ValueError(
            f"conditioning mode: encoder latents are {latents.shape[1]}-d but "
            f"the GAN config's LATENT_DIM is {cfg.latent_dim}. Set LATENT_DIM "
            f"to the AE latent size (configs/gan_conditioning.yaml does), or "
            f"re-export the latents."
        )

    # device-resident epoch arrays: per epoch the host sends only gather
    # indices (~KB) instead of the stacked batches (~MB)
    data_dev = (
        jnp.asarray(notes),
        jnp.asarray(emotion_idx),
        jnp.asarray(latents),
        jnp.asarray(numeric),
    )
    if mesh is not None:
        from melogan_tpu.parallel.mesh import put_replicated

        data_dev = put_replicated(data_dev, mesh)

    gate_sampler = None
    best_gate = None  # (passed, -violations) comparator for gan_best.ckpt
    if track_best and resume:
        # re-seed the comparator from the existing best so a resumed run
        # only overwrites gan_best when it genuinely beats it
        best_path = os.path.join(ckpt_dir, "gan_best.ckpt")
        if os.path.exists(best_path):
            prev = load_checkpoint(best_path)
            if "gate" in prev:
                best_gate = (int(prev["gate"]["passed"]),
                             -int(prev["gate"]["violations"]))

    rng = np.random.default_rng(cfg.seed)
    n_epochs = epochs or cfg.epochs
    note = gan_step.ema_horizon_note(cfg, n_epochs, notes.shape[0])
    if note and verbose:
        print(note)
    # replay the data-order RNG so a resumed run consumes the same stream
    for _ in range(start_epoch - 1):
        rng.permutation(notes.shape[0])
    history: Dict[str, float] = {}
    epoch = start_epoch
    # epochs run in chunks bounded by the checkpoint cadence: each chunk is
    # ONE device dispatch of the multi-epoch fused program (gan_step.run) —
    # the per-dispatch tunnel round trip (~30 ms, ~10× the per-epoch device
    # compute at reference scale) is paid once per save_freq epochs
    while epoch <= n_epochs:
        chunk_end = min(n_epochs, ((epoch - 1) // cfg.save_freq + 1) * cfg.save_freq)
        chunk = list(range(epoch, chunk_end + 1))
        t0 = time.perf_counter()
        g_stack, t_stack = [], []
        for _ in chunk:
            gi, ti = epoch_group_indices(
                notes.shape[0], cfg.batch_size, cfg.critic_iters, rng
            )
            g_stack.append(gi)
            t_stack.append(ti)

        if g_stack[0] is not None:
            # pad a short final chunk to save_freq epochs with live-masked
            # rows (skipped via lax.cond on device): every dispatch of the
            # run then hits the SAME compiled program instead of paying a
            # second full XLA compile (minutes through the remote compiler).
            # Short total runs (n_epochs ≤ save_freq) keep their natural
            # size — there is only one dispatch either way.
            e_dim = cfg.save_freq if n_epochs > cfg.save_freq else len(chunk)
            if len(chunk) < e_dim:
                pad = e_dim - len(chunk)
                g_stack = g_stack + [g_stack[-1]] * pad
                t_stack = t_stack + [t_stack[-1]] * pad
            live_mask = jnp.asarray(np.arange(e_dim) < len(chunk))
            gidx = jnp.asarray(np.stack(g_stack), jnp.int32)
            tidx = (
                jnp.asarray(np.stack(t_stack), jnp.int32)
                if t_stack[0] is not None
                else None
            )
            state, m = run_fn(state, data_dev, gidx, tidx, live_mask)
            n_groups, k = gidx.shape[1], cfg.critic_iters
            n_steps = n_groups * k + (tidx.shape[1] if tidx is not None else 0)
            per_epoch = [
                {
                    "Loss/Critic": float(m["loss_d_sum"][j]) / n_steps,
                    "Loss/Generator_Adv": float(m["loss_g_adv"][j]) / n_groups,
                    "Loss/Generator_Emo": float(m["loss_g_emo"][j]) / n_groups,
                    # Wasserstein estimate W ≈ E[D(real)] − E[D(fake)] and its
                    # components, per critic update (VERDICT-r3 item 3: make
                    # the adversarial balance observable, not just loss_g_adv)
                    "Critic/Wasserstein": (float(m["d_real_sum"][j])
                                           - float(m["d_fake_sum"][j])) / n_steps,
                    "Critic/d_real": float(m["d_real_sum"][j]) / n_steps,
                    "Critic/d_fake": float(m["d_fake_sum"][j]) / n_steps,
                    "Critic/gp": float(m["gp_mean"][j]),
                    **({"Loss/Generator_FM":
                        float(m["loss_g_fm"][j]) / n_groups}
                       if "loss_g_fm" in m else {}),
                }
                for j in range(len(chunk))
            ]
        else:
            # dataset smaller than one group: critic-only tail epochs
            per_epoch = []
            for ti in t_stack:
                if ti is None:
                    per_epoch.append(
                        {"Loss/Critic": 0.0, "Loss/Generator_Adv": 0.0,
                         "Loss/Generator_Emo": 0.0, "Critic/Wasserstein": 0.0,
                         "Critic/d_real": 0.0, "Critic/d_fake": 0.0,
                         "Critic/gp": 0.0})
                    continue
                sel = ti
                tail = (notes[sel], emotion_idx[sel], latents[sel], numeric[sel])
                state, mt = tail_fn(state, jax.tree_util.tree_map(jnp.asarray, tail))
                n_t = ti.shape[0]
                per_epoch.append(
                    {"Loss/Critic": float(mt["loss_d_sum"]) / n_t,
                     "Loss/Generator_Adv": 0.0, "Loss/Generator_Emo": 0.0,
                     "Critic/Wasserstein": (float(mt["d_real_sum"])
                                            - float(mt["d_fake_sum"])) / n_t,
                     "Critic/d_real": float(mt["d_real_sum"]) / n_t,
                     "Critic/d_fake": float(mt["d_fake_sum"]) / n_t,
                     "Critic/gp": float(mt["gp_mean"])})

        dt = (time.perf_counter() - t0) / len(chunk)
        for ep, scalars in zip(chunk, per_epoch):
            scalars = dict(scalars, epoch_seconds=dt)
            writer.add_scalars(scalars, ep)
            if verbose:
                print(
                    f"[GAN epoch {ep}/{n_epochs}] D {scalars['Loss/Critic']:.4f} | "
                    f"G_adv {scalars['Loss/Generator_Adv']:.4f} | "
                    f"G_emo {scalars['Loss/Generator_Emo']:.4f} | {dt:.2f}s"
                )
            history = dict(scalars, epoch=ep)

        if chunk_end % cfg.save_freq == 0:
            payload = {
                "epoch": chunk_end,
                "G": {"params": state.gen_params, "batch_stats": state.gen_stats},
                "D": {"params": state.critic_params},
                "E_num": {"params": state.fe_params},
                "opt_G": state.opt_g,
                "opt_D": state.opt_d,
                "rng": state.rng,
                "step": state.step,
                "emotion_features": emotion_features,
            }
            if state.ema_params is not None:
                # G_ema is the DEBIASED serving artifact; ema_raw is the
                # zero-seeded stream the resume path continues from
                payload["G_ema"] = {
                    "params": gan_step.ema_weights(state, cfg.ema_decay),
                    "batch_stats": state.gen_stats,
                }
                payload["ema_raw"] = state.ema_params
            save_checkpoint(
                os.path.join(ckpt_dir, f"gan_epoch{chunk_end:04d}.ckpt"), payload
            )
        if track_best and (chunk_end % cfg.save_freq == 0 or chunk_end == n_epochs):
            # sweep's gate helper scores any GANTrainState; the sampler is
            # built once and weight-swapped per gate (jit args, no recompile)
            from melogan_tpu.train.sweep import _gate_member

            gate_dir = os.path.join(workdir or ".", cfg.sample_dir,
                                    f"gate_epoch{chunk_end:04d}")
            passed, total, violations, _, _, gate_sampler = _gate_member(
                cfg, state, cfg.seed + chunk_end, gate_dir,
                gate_samples_per_emotion, gate_sampler,
                emotion_features=emotion_features)
            writer.add_scalars(
                {"Gate/passed": passed, "Gate/violations": violations}, chunk_end)
            score = (passed, -violations)
            if best_gate is None or score > best_gate:
                best_gate = score
                best = {
                    "epoch": chunk_end,
                    "G": {"params": state.gen_params,
                          "batch_stats": state.gen_stats},
                    "E_num": {"params": state.fe_params},
                    "gate": {"passed": passed, "total": total,
                             "violations": violations},
                    "emotion_features": emotion_features,
                }
                if state.ema_params is not None:
                    best["G_ema"] = {
                        "params": gan_step.ema_weights(state, cfg.ema_decay),
                        "batch_stats": state.gen_stats,
                    }
                save_checkpoint(os.path.join(ckpt_dir, "gan_best.ckpt"), best)
                if verbose:
                    print(f"[GAN] new best at epoch {chunk_end}: "
                          f"gate {passed}/{total} ({violations} violations)")
        epoch = chunk_end + 1

    final = {
        "G": {"params": state.gen_params, "batch_stats": state.gen_stats},
        "E_num": {"params": state.fe_params},
        "emotion_features": emotion_features,
    }
    if state.ema_params is not None:
        final["G_ema"] = {"params": gan_step.ema_weights(state, cfg.ema_decay),
                          "batch_stats": state.gen_stats}
    save_checkpoint(os.path.join(ckpt_dir, "gan_final.ckpt"), final)
    writer.close()
    return state, history


def load_gan_final(path: str, ema: bool = False):
    """Load a gan_final checkpoint → (gen_variables, fe_variables).

    ``ema=True`` returns the EMA generator weights (``G_ema``, present when
    the run trained with ``cfg.ema_decay > 0``); raises KeyError with a clear
    message when the checkpoint has none."""
    gen_vars, fe_vars, _ = load_gan_final_full(path, ema=ema)
    return gen_vars, fe_vars


def load_gan_final_full(path: str, ema: bool = False):
    """(gen_variables, fe_variables, extras) — extras carries
    ``emotion_features`` (the train corpus's per-emotion standardized-feature
    centroids, (4, 6)) when the checkpoint has them; None for pre-round-5
    checkpoints (samplers then fall back to the reference app's hand-tuned
    vectors)."""
    from melogan_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(path)
    g_key = "G"
    if ema:
        if "G_ema" not in ckpt:
            raise KeyError(
                f"{path} has no EMA weights (G_ema); it was trained without "
                "ema_decay — rerun training with --ema or load without ema"
            )
        g_key = "G_ema"
    gen_vars = {
        "params": ckpt[g_key]["params"],
        "batch_stats": ckpt[g_key].get("batch_stats", {}),
    }
    fe_vars = {"params": ckpt["E_num"]["params"]}
    ef = ckpt.get("emotion_features")
    extras = {"emotion_features": (np.asarray(ef, np.float32)
                                   if ef is not None else None)}
    return gen_vars, fe_vars, extras
