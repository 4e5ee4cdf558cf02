"""Emotion-discriminator training workload (Stage 2).

Reference semantics (src/emotion_discriminator/train_ed.py): cross-entropy,
AdamW(2e-4, betas (0.5, 0.999)), ReduceLROnPlateau(0.5, patience 5), early
stop patience 10, best checkpoint ``ed_best`` on val loss, periodic epoch
checkpoints, optional inverse-frequency weighted sampling. Also provides the
evaluation entry point the reference lost to copy-paste (its evaluate_ed.py is
a byte-identical copy of ed_model.py, SURVEY.md §2.2).

TPU-first: one jitted scan per epoch over stacked batches.
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from melogan_tpu.config import EDConfig
from melogan_tpu.data.datasets import SplitData, class_balance_weights
from melogan_tpu.models.ed import EmotionDiscriminator
from melogan_tpu.train.gan_step import cross_entropy
from melogan_tpu.train.harness import (
    EarlyStopping,
    ReduceLROnPlateau,
    device_sched_init,
    device_sched_step,
)
from melogan_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from melogan_tpu.utils.metrics import MetricsWriter


class EDTrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jnp.ndarray


def make_optimizer(cfg: EDConfig) -> optax.GradientTransformation:
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=cfg.optimizer.lr,
        b1=cfg.optimizer.betas[0],
        b2=cfg.optimizer.betas[1],
        weight_decay=cfg.optimizer.weight_decay,
    )


def get_lr(state: EDTrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def set_lr(state: EDTrainState, lr: float) -> EDTrainState:
    hyper = state.opt_state.hyperparams
    hyper["learning_rate"] = jnp.asarray(lr, dtype=hyper["learning_rate"].dtype)
    return state


def _with_lr(opt_state, lr):
    """Functional (trace-safe) twin of set_lr."""
    hyper = dict(opt_state.hyperparams)
    hyper["learning_rate"] = jnp.asarray(lr, hyper["learning_rate"].dtype)
    return opt_state._replace(hyperparams=hyper)


def init_sched(state: EDTrainState, plateau: ReduceLROnPlateau, stopper: EarlyStopping):
    """Device scheduler state for the fused multi-epoch program (see
    vae_loop.init_sched)."""
    sched = device_sched_init(plateau, stopper)
    sched["epoch"] = jnp.asarray(0, jnp.int32)
    sched["best_epoch"] = jnp.asarray(0, jnp.int32)
    sched["best"] = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "rng": state.rng,
        "plateau_best": jnp.asarray(plateau.best, jnp.float32),
        "plateau_bad": jnp.asarray(plateau.num_bad_epochs, jnp.int32),
        "stop_best": jnp.asarray(stopper.best, jnp.float32),
        "stop_bad": jnp.asarray(stopper.num_bad_epochs, jnp.int32),
        "lr": jnp.asarray(get_lr(state), jnp.float32),
        "val_acc": jnp.zeros(()),
    }
    return sched


def init_state(cfg: EDConfig, model: EmotionDiscriminator, seed: int = 42) -> EDTrainState:
    key = jax.random.PRNGKey(seed)
    if cfg.input_mode == "notes":
        dummy = jnp.zeros((1, cfg.max_notes, cfg.note_dim))
    else:
        dummy = jnp.zeros((1, cfg.latent_dim))
    variables = model.init(key, dummy, train=False)
    opt = make_optimizer(cfg)
    return EDTrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=opt.init(variables["params"]),
        rng=jax.random.PRNGKey(seed + 1),
    )


def make_epoch_fns(cfg: EDConfig, model: EmotionDiscriminator, mesh=None):
    """With ``mesh`` the same programs run SPMD data-parallel (microbatches
    constrained batch-over-'data'; see gan_step.make_train_steps)."""
    opt = make_optimizer(cfg)
    from melogan_tpu.parallel.mesh import microbatch_constrainer

    shard_mb = microbatch_constrainer(mesh)

    def apply_vars(params, stats):
        v = {"params": params}
        if stats:
            v["batch_stats"] = stats
        return v

    def train_step(state, batch):
        x, y = shard_mb(batch)
        rng, k_drop = jax.random.split(state.rng)

        def loss_fn(params):
            if state.batch_stats:
                logits, mutated = model.apply(
                    apply_vars(params, state.batch_stats),
                    x,
                    train=True,
                    rngs={"dropout": k_drop},
                    mutable=["batch_stats"],
                )
                stats = mutated["batch_stats"]
            else:
                # latent mode: no batch-norm collections to thread
                logits = model.apply(
                    apply_vars(params, state.batch_stats),
                    x,
                    train=True,
                    rngs={"dropout": k_drop},
                )
                stats = state.batch_stats
            loss = cross_entropy(logits, y)
            acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
            return loss, (stats, acc)

        (loss, (stats, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        state = state.replace(params=params, batch_stats=stats, opt_state=opt_state, rng=rng)
        return state, (loss, acc)

    def train_epoch(state: EDTrainState, batches):
        state, (losses, accs) = jax.lax.scan(train_step, state, batches)
        return state, {"loss": jnp.mean(losses), "acc": jnp.mean(accs)}

    def train_epoch_indexed(state: EDTrainState, x_all, y_all, idx):
        """Device-resident-data epoch: host sends only gather indices."""

        def step(st, idx_b):
            return train_step(st, (x_all[idx_b], y_all[idx_b]))

        state, (losses, accs) = jax.lax.scan(step, state, idx)
        return state, {"loss": jnp.mean(losses), "acc": jnp.mean(accs)}

    def eval_step(state, batch):
        x, y = shard_mb(batch)
        logits = model.apply(apply_vars(state.params, state.batch_stats), x, train=False)
        loss = cross_entropy(logits, y)
        acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
        return state, (loss, acc)

    def eval_epoch(state: EDTrainState, batches):
        _, (losses, accs) = jax.lax.scan(eval_step, state, batches)
        return {"loss": jnp.mean(losses), "acc": jnp.mean(accs)}

    # -- multi-epoch fusion: E epochs of train+val+LR-control+early-stop in
    # ONE dispatch (same design as vae_loop.run_epochs) ----------------------
    def run_epochs(state: EDTrainState, x_all, y_all, idx, live_mask, val_batches, sched):
        """``idx``: (E, n_batches, B) gather indices; ``live_mask``: (E,)
        bool — False marks host-added padding rows that keep E constant
        across chunks (one compiled program for the whole run). The whole
        per-epoch control flow of the reference loop (train_ed.py:160-207) —
        train epoch, validation, ReduceLROnPlateau, early stopping, best
        tracking — runs inside one jitted scan; the host dispatches once per
        E epochs (the ``save_freq`` checkpoint cadence). Post-stop and
        padding epochs are masked no-ops, keeping chunked runs step-identical
        to the sequential loop."""

        def masked(cond_, new, old):
            return jax.tree_util.tree_map(lambda a, b: jnp.where(cond_, a, b), new, old)

        def body(carry, xs):
            state, sched = carry
            idx_e, alive = xs
            live = alive & jnp.logical_not(sched["done"])

            def do_epoch(st):
                st, tm = train_epoch_indexed(st, x_all, y_all, idx_e)
                vm = eval_epoch(st, val_batches)
                return st, tm, vm

            def skip_epoch(st):
                zeros = {"loss": jnp.zeros(()), "acc": jnp.zeros(())}
                return st, zeros, dict(zeros)

            state, tm, vm = jax.lax.cond(live, do_epoch, skip_epoch, state)
            val = vm["loss"]

            lr = state.opt_state.hyperparams["learning_rate"]
            sched, new_lr, improved = device_sched_step(sched, val, lr, live)
            state = state.replace(opt_state=_with_lr(state.opt_state, new_lr))

            epoch_no = sched["epoch"] + live.astype(jnp.int32)
            best = masked(improved, {
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "rng": state.rng,
                "plateau_best": sched["plateau_best"],
                "plateau_bad": sched["plateau_bad"],
                "stop_best": sched["stop_best"],
                "stop_bad": sched["stop_bad"],
                "lr": new_lr,
                "val_acc": vm["acc"],
            }, sched["best"])
            sched = dict(
                sched,
                best=best,
                best_epoch=jnp.where(improved, epoch_no, sched["best_epoch"]),
                epoch=epoch_no,
            )
            out = {"train": tm, "val": vm, "lr": new_lr, "ran": live, "improved": improved}
            return (state, sched), out

        (state, sched), out = jax.lax.scan(body, (state, sched), (idx, live_mask))
        return state, sched, out

    return train_epoch, eval_epoch, train_epoch_indexed, run_epochs


def _inputs(cfg: EDConfig, data: SplitData, latents: Optional[np.ndarray]):
    if cfg.input_mode == "latent":
        if latents is None:
            raise ValueError("latent mode requires encoder_feats latents")
        return latents.astype(np.float32)
    # notes mode: normalized GAN layout by default (in-domain for the GAN's
    # emotion loss); 'raw' reproduces the reference's unnormalized training
    if getattr(cfg, "notes_domain", "normalized") == "raw":
        return data.notes_raw.astype(np.float32)
    return data.notes_gan()


def _stack(x: np.ndarray, y: np.ndarray, batch_size: int, order: np.ndarray):
    batch_size = min(batch_size, len(order))  # small splits: one batch
    n_batches = max(1, len(order) // batch_size)
    idx = order[: n_batches * batch_size].reshape(n_batches, batch_size)
    return jnp.asarray(x[idx]), jnp.asarray(y[idx])


def precompile(cfg: EDConfig, n_train: int, n_val: int, mesh=None, precision=None,
               notes_len: Optional[int] = None):
    """Compile the fused multi-epoch ED program for the given corpus sizes
    WITHOUT training — e.g. from a background thread overlapped with an
    earlier pipeline stage. Uses the same construction path and the same
    argument shapes/dtypes as :func:`train`, so the resulting XLA program is
    byte-identical and lands in the persistent compile cache; train()'s own
    jit then hits the cache instead of paying the multi-minute remote
    compile. Data arrays are passed as ShapeDtypeStructs (no device memory)."""
    from melogan_tpu.train.harness import data_sds, jit_with_precision

    model = EmotionDiscriminator.from_config(cfg)
    state = init_state(cfg, model, seed=cfg.seed)
    run_fn = jit_with_precision(make_epoch_fns(cfg, model, mesh=mesh)[3], precision)

    # notes mode consumes the stored corpus arrays UNPADDED (_inputs →
    # notes_gan(), no pad/trunc to cfg.max_notes; the encoder is
    # length-agnostic via adaptive pooling) — the warmed program must use the
    # corpus note length, not the config's
    if cfg.input_mode == "latent":
        feat = (cfg.latent_dim,)
    else:
        feat = (notes_len or cfg.max_notes, 4)
    bs = min(cfg.batch_size, n_train)
    n_batches = max(1, n_train // bs)
    vbs = min(cfg.batch_size, n_val)
    n_vbatches = max(1, n_val // vbs)

    plateau = ReduceLROnPlateau(
        factor=cfg.scheduler.factor,
        patience=cfg.scheduler.patience,
        threshold=cfg.scheduler.threshold,
    )
    stopper = EarlyStopping(patience=cfg.early_stopping_patience)
    sched = init_sched(state, plateau, stopper)
    sched["epoch"] = jnp.asarray(0, jnp.int32)

    sds = jax.ShapeDtypeStruct
    dsds = data_sds(mesh)  # train() commits the data args replicated-over-mesh
    run_fn.lower(
        state,
        dsds((n_train,) + feat, jnp.float32),
        dsds((n_train,), jnp.int32),
        sds((cfg.save_freq, n_batches, bs), jnp.int32),
        sds((cfg.save_freq,), jnp.bool_),
        (dsds((n_vbatches, vbs) + feat, jnp.float32),
         dsds((n_vbatches, vbs), jnp.int32)),
        sched,
    ).compile()


def train(
    cfg: EDConfig,
    train_data: SplitData,
    val_data: SplitData,
    train_latents: Optional[np.ndarray] = None,
    val_latents: Optional[np.ndarray] = None,
    workdir: Optional[str] = None,
    verbose: bool = True,
    resume: bool = False,
    mesh=None,
    precision=None,
) -> Tuple[EDTrainState, Dict[str, float]]:
    """``mesh``: optional Mesh with a 'data' axis for SPMD data-parallel
    epochs (`melogan train-ed --dp N`). ``precision='bf16'``: mixed-precision
    MXU training (harness.jit_with_precision; `--bf16`)."""
    model = EmotionDiscriminator.from_config(cfg)
    state = init_state(cfg, model, seed=cfg.seed)
    from melogan_tpu.train.harness import jit_with_precision

    run_fn = jit_with_precision(make_epoch_fns(cfg, model, mesh=mesh)[3], precision)

    ckpt_dir = os.path.join(workdir, cfg.checkpoint_dir) if workdir else cfg.checkpoint_dir
    log_dir = os.path.join(workdir, cfg.log_dir) if workdir else cfg.log_dir
    writer = MetricsWriter(log_dir)

    x_train = _inputs(cfg, train_data, train_latents)
    y_train = train_data.emotion_idx
    x_val = _inputs(cfg, val_data, val_latents)
    y_val = val_data.emotion_idx

    weights = class_balance_weights(y_train) if cfg.use_weighted_sampler else None
    rng = np.random.default_rng(cfg.seed)
    val_batches = _stack(x_val, y_val, cfg.batch_size, np.arange(len(y_val)))
    # device-resident epoch data: per epoch the host sends only gather indices
    x_train_dev = jnp.asarray(x_train)
    y_train_dev = jnp.asarray(y_train)
    if mesh is not None:
        from melogan_tpu.parallel.mesh import put_replicated

        x_train_dev, y_train_dev, val_batches = put_replicated(
            (x_train_dev, y_train_dev, val_batches), mesh
        )

    plateau = ReduceLROnPlateau(
        factor=cfg.scheduler.factor,
        patience=cfg.scheduler.patience,
        threshold=cfg.scheduler.threshold,
    )
    stopper = EarlyStopping(patience=cfg.early_stopping_patience)

    start_epoch = 1
    if resume:
        latest = latest_checkpoint(ckpt_dir, "ed_epoch")
        if latest:
            from flax import serialization

            raw = load_checkpoint(latest)
            state = state.replace(
                params=serialization.from_state_dict(state.params, raw["params"]),
                batch_stats=serialization.from_state_dict(
                    state.batch_stats, raw["batch_stats"]
                ),
                opt_state=serialization.from_state_dict(state.opt_state, raw["opt_state"]),
            )
            if "rng" in raw:  # device RNG (dropout) — step-identical resume
                state = state.replace(rng=jnp.asarray(raw["rng"], jnp.uint32))
            if "lr" in raw:
                state = set_lr(state, float(raw["lr"]))
            # scheduler/early-stop wait counters (older ckpts lack them)
            if "plateau" in raw:
                plateau.load_state_dict(raw["plateau"])
            if "stopper" in raw:
                stopper.load_state_dict(raw["stopper"])
            start_epoch = int(raw["epoch"]) + 1
            for _ in range(start_epoch - 1):
                if weights is not None:
                    p = weights / weights.sum()
                    rng.choice(len(y_train), size=len(y_train), replace=True, p=p)
                else:
                    rng.permutation(len(y_train))
            if verbose:
                print(f"[ED] resumed from {latest} at epoch {start_epoch}")

    # device scheduler state: plateau LR + early stop + best tracking run
    # inside the fused multi-epoch program; the host chunks epochs at the
    # periodic-checkpoint cadence and does file I/O between chunks
    sched = init_sched(state, plateau, stopper)
    sched["epoch"] = jnp.asarray(start_epoch - 1, jnp.int32)

    best_metrics: Dict[str, float] = {}
    last_saved_best = None
    epoch = start_epoch
    while epoch <= cfg.num_epochs:
        chunk_end = min(cfg.num_epochs, ((epoch - 1) // cfg.save_freq + 1) * cfg.save_freq)
        chunk = list(range(epoch, chunk_end + 1))
        t0 = time.perf_counter()
        idx = []
        for _ in chunk:
            if weights is not None:
                p = weights / weights.sum()
                order = rng.choice(len(y_train), size=len(y_train), replace=True, p=p)
            else:
                order = rng.permutation(len(y_train))
            bs = min(cfg.batch_size, len(order))
            n_batches = max(1, len(order) // bs)
            idx.append(order[: n_batches * bs].reshape(n_batches, bs))
        # pad a short final chunk to save_freq with live-masked no-op rows so
        # every dispatch reuses ONE compiled program (see vae_loop)
        idx = np.stack(idx)
        live = np.ones(cfg.save_freq, bool)
        if idx.shape[0] < cfg.save_freq:
            pad = cfg.save_freq - idx.shape[0]
            idx = np.concatenate([idx, np.repeat(idx[-1:], pad, axis=0)])
            live[idx.shape[0] - pad:] = False
        state, sched, out = run_fn(
            state, x_train_dev, y_train_dev, jnp.asarray(idx),
            jnp.asarray(live), val_batches, sched,
        )
        out = jax.tree_util.tree_map(np.asarray, out)
        dt = (time.perf_counter() - t0) / len(chunk)

        stopped_at = None
        for j, ep in enumerate(chunk):
            if not out["ran"][j]:
                break
            val_loss = float(out["val"]["loss"][j])
            writer.add_scalars(
                {
                    "loss/train": float(out["train"]["loss"][j]),
                    "acc/train": float(out["train"]["acc"][j]),
                    "loss/val": val_loss,
                    "acc/val": float(out["val"]["acc"][j]),
                    "lr": float(out["lr"][j]),
                    "epoch_seconds": dt,
                },
                ep,
            )
            if verbose:
                print(
                    f"[ED epoch {ep}] train loss {float(out['train']['loss'][j]):.4f} "
                    f"acc {float(out['train']['acc'][j]):.3f} | "
                    f"val loss {val_loss:.4f} acc {float(out['val']['acc'][j]):.3f} | {dt:.2f}s"
                )
            if bool(sched["done"]) and (j + 1 == len(chunk) or not out["ran"][j + 1]):
                stopped_at = ep

        # periodic checkpoint at the chunk boundary: current state + current
        # (post-epoch) scheduler counters — identical to what the sequential
        # loop's _ckpt_tree captured at this epoch. Written iff the boundary
        # epoch actually ran (the sequential loop saves on a stop epoch too)
        if int(sched["epoch"]) == chunk_end and chunk_end % cfg.save_freq == 0:
            save_checkpoint(
                os.path.join(ckpt_dir, f"ed_epoch{chunk_end:04d}.ckpt"),
                {
                    "epoch": chunk_end,
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state,
                    "rng": state.rng,
                    "lr": float(out["lr"][len(chunk) - 1]),
                    "plateau": {"best": float(sched["plateau_best"]),
                                "num_bad_epochs": int(sched["plateau_bad"])},
                    "stopper": {"best": float(sched["stop_best"]),
                                "num_bad_epochs": int(sched["stop_bad"])},
                },
            )

        # best checkpoint: written once per chunk when a new best appeared,
        # from the state captured AT the best epoch
        best_epoch = int(sched["best_epoch"])
        if out["improved"].any() and best_epoch != last_saved_best:
            best = jax.tree_util.tree_map(np.asarray, sched["best"])
            best_metrics = {"epoch": best_epoch,
                            "val_loss": float(best["stop_best"]),
                            "val_acc": float(best["val_acc"])}
            save_checkpoint(
                os.path.join(ckpt_dir, "ed_best.ckpt"),
                {
                    "epoch": best_epoch,
                    "params": best["params"],
                    "batch_stats": best["batch_stats"],
                    "opt_state": best["opt_state"],
                    "rng": best["rng"],
                    "lr": float(best["lr"]),
                    "plateau": {"best": float(best["plateau_best"]),
                                "num_bad_epochs": int(best["plateau_bad"])},
                    "stopper": {"best": float(best["stop_best"]),
                                "num_bad_epochs": int(best["stop_bad"])},
                },
            )
            last_saved_best = best_epoch

        if stopped_at is not None:
            if verbose:
                print(f"[ED] early stop at epoch {stopped_at}")
            break
        epoch = chunk_end + 1

    best_state = EDTrainState(
        params=sched["best"]["params"],
        batch_stats=sched["best"]["batch_stats"],
        opt_state=sched["best"]["opt_state"],
        rng=sched["best"]["rng"],
    )
    writer.close()
    return best_state, best_metrics


def evaluate(
    cfg: EDConfig,
    state: EDTrainState,
    data: SplitData,
    latents: Optional[np.ndarray] = None,
) -> Dict[str, float]:
    """The evaluation script the reference is missing: loss, accuracy, and a
    per-class confusion matrix over a split."""
    model = EmotionDiscriminator.from_config(cfg)
    x = _inputs(cfg, data, latents)
    y = data.emotion_idx
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    logits = np.asarray(
        jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, jnp.asarray(x))
    )
    pred = logits.argmax(-1)
    loss = float(cross_entropy(jnp.asarray(logits), jnp.asarray(y)))
    acc = float((pred == y).mean())
    confusion = np.zeros((cfg.n_classes, cfg.n_classes), np.int64)
    for t, p in zip(y, pred):
        confusion[int(t), int(p)] += 1
    return {"loss": loss, "accuracy": acc, "confusion": confusion.tolist(), "n": len(y)}
