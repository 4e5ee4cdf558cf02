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
) -> Tuple[gan_step.GANTrainState, Dict[str, float]]:
    """Full Stage-3 run. ``ed_variables`` is the pre-trained frozen emotion
    discriminator ({'params': ..., 'batch_stats': ...}); when absent the ED is
    random (the reference warns and proceeds, train_gan.py:128-129).
    ``resume=True`` restarts from the newest periodic checkpoint, including
    both optimizer states — the resume path the reference never implemented
    (SURVEY.md §5)."""
    models = gan_step.build_models(cfg, ed_cfg)
    state = gan_step.init_state(cfg, models, seed=cfg.seed, ed_variables=ed_variables)
    group_fn, tail_fn, epoch_fn, indexed_fn = gan_step.make_train_steps(cfg, models)
    tail_fn = jax.jit(tail_fn)
    indexed_fn = jax.jit(indexed_fn)

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

    # device-resident epoch arrays: per epoch the host sends only gather
    # indices (~KB) instead of the stacked batches (~MB)
    data_dev = (
        jnp.asarray(notes),
        jnp.asarray(emotion_idx),
        jnp.asarray(latents),
        jnp.asarray(numeric),
    )

    rng = np.random.default_rng(cfg.seed)
    n_epochs = epochs or cfg.epochs
    # replay the data-order RNG so a resumed run consumes the same stream
    for _ in range(start_epoch - 1):
        rng.permutation(notes.shape[0])
    history: Dict[str, float] = {}
    for epoch in range(start_epoch, n_epochs + 1):
        t0 = time.perf_counter()
        group_idx, tail_idx = epoch_group_indices(
            notes.shape[0], cfg.batch_size, cfg.critic_iters, rng
        )
        ep_d, ep_adv, ep_emo, n_steps, n_gsteps = 0.0, 0.0, 0.0, 0, 0
        if group_idx is not None:
            state, m = indexed_fn(state, data_dev, jnp.asarray(group_idx, jnp.int32))
            ep_d += float(jnp.sum(m["loss_d_sum"]))
            ep_adv += float(jnp.sum(m["loss_g_adv"]))
            ep_emo += float(jnp.sum(m["loss_g_emo"]))
            n_steps += cfg.critic_iters * group_idx.shape[0]
            n_gsteps += group_idx.shape[0]
        if tail_idx is not None:
            sel = tail_idx
            tail = (notes[sel], emotion_idx[sel], latents[sel], numeric[sel])
            state, m = tail_fn(state, jax.tree_util.tree_map(jnp.asarray, tail))
            ep_d += float(m["loss_d_sum"])
            n_steps += tail_idx.shape[0]
        dt = time.perf_counter() - t0

        # reference averaging: D over all batch-steps, G over G-steps
        scalars = {
            "Loss/Critic": ep_d / max(1, n_steps),
            "Loss/Generator_Adv": ep_adv / max(1, n_gsteps),
            "Loss/Generator_Emo": ep_emo / max(1, n_gsteps),
            "epoch_seconds": dt,
        }
        writer.add_scalars(scalars, epoch)
        if verbose:
            print(
                f"[GAN epoch {epoch}/{n_epochs}] D {scalars['Loss/Critic']:.4f} | "
                f"G_adv {scalars['Loss/Generator_Adv']:.4f} | "
                f"G_emo {scalars['Loss/Generator_Emo']:.4f} | {dt:.2f}s"
            )
        history = dict(scalars, epoch=epoch)

        if epoch % cfg.save_freq == 0:
            save_checkpoint(
                os.path.join(ckpt_dir, f"gan_epoch{epoch:04d}.ckpt"),
                {
                    "epoch": epoch,
                    "G": {"params": state.gen_params, "batch_stats": state.gen_stats},
                    "D": {"params": state.critic_params},
                    "E_num": {"params": state.fe_params},
                    "opt_G": state.opt_g,
                    "opt_D": state.opt_d,
                    "rng": state.rng,
                    "step": state.step,
                },
            )

    save_checkpoint(
        os.path.join(ckpt_dir, "gan_final.ckpt"),
        {
            "G": {"params": state.gen_params, "batch_stats": state.gen_stats},
            "E_num": {"params": state.fe_params},
        },
    )
    writer.close()
    return state, history


def load_gan_final(path: str):
    """Load a gan_final checkpoint → (gen_variables, fe_variables)."""
    from melogan_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(path)
    gen_vars = {
        "params": ckpt["G"]["params"],
        "batch_stats": ckpt["G"].get("batch_stats", {}),
    }
    fe_vars = {"params": ckpt["E_num"]["params"]}
    return gen_vars, fe_vars
