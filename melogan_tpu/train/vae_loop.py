"""VAE training workload (Stage 1).

Reference semantics (src/ae/train_ae.py): AdamW(lr 1e-4, wd 1e-5) with global
grad-norm clip 1.0, β-annealed MSE+KLD loss (β → 10 over 1 warm-up epoch),
validation at β=1.0, ReduceLROnPlateau(0.5, patience 5, min_lr 1e-6) on val
total, early stop patience 15, best checkpoint on val total, per-epoch
reconstruction MIDI dumps of up to 6 fixed val songs, scalar tags
``loss/{train,val}_{total,recon,kld}``, ``lr``, ``beta``.

TPU-first: the whole epoch is ONE jitted program — batches are stacked to
(n_batches, B, 512, 4) and scanned on-device; β and learning rate are runtime
scalars (no recompiles). LR lives in the optimizer state via
``optax.inject_hyperparams`` so the host-side plateau controller can write it.
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

from melogan_tpu.config import AEConfig
from melogan_tpu.data.datasets import SplitData, ae_denormalize
from melogan_tpu.midi.codec import save_recon_midi
from melogan_tpu.models.vae import VAE, vae_loss
from melogan_tpu.train.harness import (
    EarlyStopping,
    ReduceLROnPlateau,
    beta_schedule,
    capacity_schedule,
    device_sched_init,
    device_sched_step,
)
from melogan_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from melogan_tpu.utils.metrics import MetricsWriter


class VAETrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jnp.ndarray


ENCODE_BATCH = 256  # µ-export batch: encode_mu pads its tail to this, so the
# whole export is ONE compiled shape (warmable by precompile)


def make_optimizer(cfg: AEConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=cfg.lr, weight_decay=cfg.weight_decay
        ),
    )


def get_lr(state: VAETrainState) -> float:
    return float(state.opt_state[1].hyperparams["learning_rate"])


def set_lr(state: VAETrainState, lr: float) -> VAETrainState:
    hyper = state.opt_state[1].hyperparams
    hyper["learning_rate"] = jnp.asarray(lr, dtype=hyper["learning_rate"].dtype)
    return state


def _with_lr(opt_state, lr):
    """Functional (trace-safe) twin of set_lr: a new opt-state pytree with the
    injected learning-rate hyperparameter replaced."""
    inj = opt_state[1]
    hyper = dict(inj.hyperparams)
    hyper["learning_rate"] = jnp.asarray(lr, hyper["learning_rate"].dtype)
    return (opt_state[0], inj._replace(hyperparams=hyper))


def init_sched(state: VAETrainState, plateau: "ReduceLROnPlateau", stopper: "EarlyStopping"):
    """Device scheduler state for the fused multi-epoch program, seeded from
    the host harness objects (so resume restores wait counters exactly)."""
    sched = device_sched_init(plateau, stopper)
    sched["epoch"] = jnp.asarray(0, jnp.int32)  # set by the loop before use
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
    }
    return sched


def init_state(cfg: AEConfig, model: VAE, seed: int = 42) -> VAETrainState:
    key = jax.random.PRNGKey(seed)
    variables = model.init(
        {"params": key, "reparam": key}, jnp.zeros((1, cfg.max_notes, 4)), train=False
    )
    opt = make_optimizer(cfg)
    return VAETrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=opt.init(variables["params"]),
        rng=jax.random.PRNGKey(seed + 1),
    )


def make_epoch_fns(cfg: AEConfig, model: VAE, mesh=None):
    """(train_epoch, eval_epoch, train_epoch_indexed, run_epochs) jittable
    over stacked epoch batches. With ``mesh`` the same programs run SPMD
    data-parallel (microbatches constrained batch-over-'data'; see
    gan_step.make_train_steps)."""
    opt = make_optimizer(cfg)
    from melogan_tpu.parallel.mesh import microbatch_constrainer

    shard_mb = microbatch_constrainer(mesh)

    def train_step(carry, batch):
        state, beta, cap = carry
        batch = shard_mb(batch)
        rng, k_rep = jax.random.split(state.rng)

        def loss_fn(params):
            (recon, z, mu, log_var), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                train=True,
                rngs={"reparam": k_rep},
                mutable=["batch_stats"],
            )
            total, mse, kld = vae_loss(
                recon, batch, mu, log_var, beta,
                free_bits=cfg.free_bits, capacity=cap,
            )
            return total, (mutated["batch_stats"], mse, kld)

        (total, (stats, mse, kld)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        state = state.replace(params=params, batch_stats=stats, opt_state=opt_state, rng=rng)
        return (state, beta, cap), (total, mse, kld)

    def train_epoch(state: VAETrainState, batches, beta, cap=None):
        (state, _, _), (totals, mses, klds) = jax.lax.scan(
            train_step, (state, beta, cap), batches
        )
        metrics = {
            "total": jnp.mean(totals),
            "recon": jnp.mean(mses),
            "kld": jnp.mean(klds),
        }
        return state, metrics

    def train_epoch_indexed(state: VAETrainState, x_all, idx, beta, cap=None):
        """Device-resident-data epoch: the host sends only the (n_batches, B)
        gather indices (~KB) instead of the stacked batches (~MB) — the same
        pattern as the GAN loop's indexed_epoch_step."""

        def step(carry, idx_b):
            return train_step(carry, x_all[idx_b])

        (state, _, _), (totals, mses, klds) = jax.lax.scan(step, (state, beta, cap), idx)
        metrics = {
            "total": jnp.mean(totals),
            "recon": jnp.mean(mses),
            "kld": jnp.mean(klds),
        }
        return state, metrics

    def eval_step(state, batch):
        batch = shard_mb(batch)
        recon, z, mu, log_var = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch,
            train=False,
        )
        total, mse, kld = vae_loss(recon, batch, mu, log_var, beta=1.0)
        return state, (total, mse, kld)

    def eval_epoch(state: VAETrainState, batches):
        _, (totals, mses, klds) = jax.lax.scan(eval_step, state, batches)
        return {
            "total": jnp.mean(totals),
            "recon": jnp.mean(mses),
            "kld": jnp.mean(klds),
        }

    # -- multi-epoch fusion: E epochs of train+val+LR-control+early-stop in
    # ONE dispatch ----------------------------------------------------------
    def run_epochs(state: VAETrainState, x_all, idx, betas, live_mask,
                   val_batches, fixed_val, sched, dump_mask=None, caps=None):
        """``idx``: (E, n_batches, B) gather indices; ``betas``: (E,) KL
        weights; ``live_mask``: (E,) bool — False marks padding rows the host
        added to keep E constant across chunks (one compiled program for the
        whole run, including a short final chunk); ``val_batches``: stacked
        validation batches; ``fixed_val``: (R, L, 4) recon-dump songs (R may
        be 0); ``sched``: device scheduler state from :func:`init_sched`;
        ``dump_mask``: (E,) bool — epochs whose fixed-set reconstruction the
        host will actually write (``ep % recon_freq == 0``); the recon
        forward is skipped (zeros returned) elsewhere. Default: every live
        epoch.

        The ENTIRE per-epoch control flow of the reference loop
        (train_ae.py:96-205) — train epoch, validation at β=1, torch-semantics
        ReduceLROnPlateau, early stopping, best-state tracking — runs inside
        one jitted scan: the host pays one dispatch (~30 ms tunnel RTT) per E
        epochs instead of 2+ per epoch. Epochs after the early-stop trigger
        (and padding epochs) are masked no-ops (identical state,
        ``ran=False``), so a chunked run is step-identical to the sequential
        loop."""

        def masked(cond_, new, old):
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(cond_, a, b), new, old
            )

        def body(carry, xs):
            state, sched = carry
            if caps is None:
                idx_e, beta, alive, dump = xs
                cap = None
            else:
                idx_e, beta, alive, dump, cap = xs
            live = alive & jnp.logical_not(sched["done"])

            def do_epoch(st):
                st, tm = train_epoch_indexed(st, x_all, idx_e, beta, cap)
                vm = eval_epoch(st, val_batches)
                if fixed_val.shape[0]:
                    # recon forward only on epochs the host will dump —
                    # elsewhere it was a discarded (E, R, L, 4) of work
                    recon = jax.lax.cond(
                        dump,
                        lambda s: model.apply(
                            {"params": s.params, "batch_stats": s.batch_stats},
                            fixed_val,
                            train=False,
                        )[0],
                        lambda s: jnp.zeros_like(fixed_val),
                        st,
                    )
                else:
                    recon = jnp.zeros_like(fixed_val)
                return st, tm, vm, recon

            def skip_epoch(st):
                zeros = {k: jnp.zeros(()) for k in ("total", "recon", "kld")}
                return st, zeros, zeros, jnp.zeros_like(fixed_val)

            state, tm, vm, recon = jax.lax.cond(live, do_epoch, skip_epoch, state)
            val = vm["total"]

            # plateau LR + early stopping on device (harness semantics)
            lr = state.opt_state[1].hyperparams["learning_rate"]
            sched, new_lr, improved = device_sched_step(sched, val, lr, live)
            state = state.replace(opt_state=_with_lr(state.opt_state, new_lr))

            # best-state tracking: capture scheduler counters AT the improved
            # epoch too, so the best checkpoint resumes with exactly the wait
            # counters the sequential loop would have saved at that epoch
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
            }, sched["best"])
            sched = dict(
                sched,
                best=best,
                best_epoch=jnp.where(improved, epoch_no, sched["best_epoch"]),
                epoch=epoch_no,
            )
            out = {
                "train": tm,
                "val": vm,
                "lr": new_lr,
                "ran": live,
                "improved": improved,
                "recon": recon,
            }
            return (state, sched), out

        dumps = live_mask if dump_mask is None else dump_mask
        xs = (idx, betas, live_mask, dumps)
        if caps is not None:
            xs = xs + (caps,)
        (state, sched), out = jax.lax.scan(body, (state, sched), xs)
        return state, sched, out

    return train_epoch, eval_epoch, train_epoch_indexed, run_epochs


def epoch_indices(n: int, batch_size: int, rng: np.random.Generator, shuffle=True):
    """(n_batches, B) gather indices for one epoch (shared RNG-stream shape
    with stack_epoch so resume replay stays step-identical)."""
    batch_size = min(batch_size, n)  # small splits: one whole-split batch
    order = rng.permutation(n) if shuffle else np.arange(n)
    n_batches = max(1, n // batch_size)
    return order[: n_batches * batch_size].reshape(n_batches, batch_size)


def stack_epoch(notes: np.ndarray, batch_size: int, rng: np.random.Generator, shuffle=True):
    return jnp.asarray(notes[epoch_indices(notes.shape[0], batch_size, rng, shuffle)])


def precompile(cfg: AEConfig, n_train: int, n_val: int, mesh=None,
               precision=None, recon_dumps: bool = True):
    """Compile the fused multi-epoch VAE program for the given corpus sizes
    WITHOUT training — e.g. to warm the persistent compile cache ahead of a
    production run (``melogan precompile``). Mirrors :func:`train`'s
    construction path and argument shapes/dtypes exactly, so train()'s own
    jit becomes a cache hit. Data is passed as ShapeDtypeStructs (no device
    memory beyond the initialized model)."""
    from melogan_tpu.train.harness import data_sds, jit_with_precision

    model = VAE.from_config(cfg)
    state = init_state(cfg, model, seed=cfg.seed)
    run_fn = jit_with_precision(make_epoch_fns(cfg, model, mesh=mesh)[3], precision)

    bs = min(cfg.batch_size, n_train)
    n_batches = max(1, n_train // bs)
    vbs = min(cfg.batch_size, n_val)
    n_vbatches = max(1, n_val // vbs)
    n_recon = min(cfg.recon_save_count, n_val) if recon_dumps else 0
    chunk = max(1, int(os.environ.get("MELOGAN_EPOCH_CHUNK", "10")))

    plateau = ReduceLROnPlateau(factor=0.5, patience=5, min_lr=1e-6)
    stopper = EarlyStopping(patience=cfg.early_stop_patience)
    sched = init_sched(state, plateau, stopper)
    sched["epoch"] = jnp.asarray(0, jnp.int32)

    sds = jax.ShapeDtypeStruct
    dsds = data_sds(mesh)  # train() commits the data args replicated-over-mesh
    caps_arg = () if cfg.kl_capacity <= 0.0 else (sds((chunk,), jnp.float32),)
    run_fn.lower(
        state,
        dsds((n_train, cfg.max_notes, 4), jnp.float32),
        sds((chunk, n_batches, bs), jnp.int32),
        sds((chunk,), jnp.float32),
        sds((chunk,), jnp.bool_),
        dsds((n_vbatches, vbs, cfg.max_notes, 4), jnp.float32),
        dsds((n_recon, cfg.max_notes, 4), jnp.float32),
        sched,
        sds((chunk,), jnp.bool_),
        *caps_arg,
    ).compile()

    # the encode stage's µ-export program too: weight-independent (params are
    # jit arguments) and single-shape (encode_mu pads its tail batch), so one
    # warm covers every later `melogan encode` on this config
    var_sds = jax.tree_util.tree_map(
        lambda a: sds(a.shape, a.dtype),
        {"params": state.params, "batch_stats": state.batch_stats},
    )
    _encode_apply(model).lower(
        var_sds, sds((ENCODE_BATCH, cfg.max_notes, 4), jnp.float32)
    ).compile()


def train(
    cfg: AEConfig,
    train_data: SplitData,
    val_data: SplitData,
    workdir: Optional[str] = None,
    verbose: bool = True,
    recon_dumps: bool = True,
    resume: bool = False,
    mesh=None,
    precision=None,
) -> Tuple[VAETrainState, Dict[str, float]]:
    """Full Stage-1 training run; returns (best-state, final metrics).
    ``resume=True`` restarts from ``ae_best.ckpt`` (params, optimizer state,
    epoch, scheduler/early-stop state). ``mesh``: optional Mesh with a 'data'
    axis for SPMD data-parallel epochs (`melogan train-ae --dp N`).
    ``precision='bf16'``: mixed-precision MXU training (see
    harness.jit_with_precision; `--bf16`)."""
    model = VAE.from_config(cfg)
    state = init_state(cfg, model, seed=cfg.seed)
    from melogan_tpu.train.harness import jit_with_precision

    run_fn = jit_with_precision(make_epoch_fns(cfg, model, mesh=mesh)[3], precision)

    ckpt_dir = os.path.join(workdir, cfg.checkpoint_dir) if workdir else cfg.checkpoint_dir
    log_dir = os.path.join(workdir, cfg.log_dir) if workdir else cfg.log_dir
    recon_dir = os.path.join(workdir, cfg.recon_dir) if workdir else cfg.recon_dir
    writer = MetricsWriter(log_dir)

    x_train = train_data.notes_ae(cfg)
    x_val = val_data.notes_ae(cfg)
    fixed_val = x_val[: min(cfg.recon_save_count, x_val.shape[0])]
    fixed_names = val_data.filenames[: fixed_val.shape[0]]

    plateau = ReduceLROnPlateau(factor=0.5, patience=5, min_lr=1e-6)
    stopper = EarlyStopping(patience=cfg.early_stop_patience)
    data_rng = np.random.default_rng(cfg.seed)

    start_epoch = 1
    best_path = os.path.join(ckpt_dir, "ae_best.ckpt")
    if resume and os.path.exists(best_path):
        from flax import serialization

        raw = load_checkpoint(best_path)  # tolerant of older field sets
        state = state.replace(
            params=serialization.from_state_dict(state.params, raw["params"]),
            batch_stats=serialization.from_state_dict(
                state.batch_stats, raw["batch_stats"]
            ),
            opt_state=serialization.from_state_dict(state.opt_state, raw["opt_state"]),
        )
        if "rng" in raw:  # device RNG stream (reparam noise) — step-identical resume
            state = state.replace(rng=jnp.asarray(raw["rng"], jnp.uint32))
        start_epoch = int(raw["epoch"]) + 1
        best = float(raw.get("best_val", float("inf")))
        # full scheduler/early-stop state (wait counters) when present;
        # older checkpoints fall back to best-only restoration
        if "plateau" in raw:
            plateau.load_state_dict(raw["plateau"])
        else:
            plateau.best = best
        if "stopper" in raw:
            stopper.load_state_dict(raw["stopper"])
        else:
            stopper.best = best
        state = set_lr(state, float(raw.get("lr", cfg.lr)))
        for _ in range(start_epoch - 1):
            data_rng.permutation(x_train.shape[0])  # replay data-order stream
        if verbose:
            print(f"[AE] resumed from {best_path} at epoch {start_epoch}")

    val_batches = stack_epoch(x_val, cfg.batch_size, data_rng, shuffle=False)
    x_train_dev = jnp.asarray(x_train)  # device-resident epoch data
    fixed_dev = jnp.asarray(
        fixed_val if recon_dumps else fixed_val[:0]
    )  # (R, L, 4); R=0 disables in-graph recon
    if mesh is not None:
        from melogan_tpu.parallel.mesh import put_replicated

        val_batches, x_train_dev, fixed_dev = put_replicated(
            (val_batches, x_train_dev, fixed_dev), mesh
        )

    # device scheduler state: the fused program runs plateau-LR + early-stop
    # + best-state tracking on device; the host only chunks epochs and does
    # file I/O between chunks
    sched = init_sched(state, plateau, stopper)
    sched["epoch"] = jnp.asarray(start_epoch - 1, jnp.int32)

    chunk_size = max(1, int(os.environ.get("MELOGAN_EPOCH_CHUNK", "10")))
    history: Dict[str, float] = {}
    last_saved_best = None
    epoch = start_epoch
    while epoch <= cfg.epochs:
        chunk = list(range(epoch, min(cfg.epochs, epoch + chunk_size - 1) + 1))
        t0 = time.perf_counter()
        idx = np.stack(
            [epoch_indices(x_train.shape[0], cfg.batch_size, data_rng) for _ in chunk]
        )
        betas = np.asarray(
            [beta_schedule(ep, cfg.kld_warmup_epochs, cfg.beta) for ep in chunk],
            np.float32,
        )
        caps = None
        if cfg.kl_capacity > 0.0:
            ramp = cfg.kl_capacity_epochs or cfg.epochs
            caps = np.asarray(
                [capacity_schedule(ep, cfg.kl_capacity, ramp) for ep in chunk],
                np.float32,
            )
        # pad a short final chunk to the fixed E with live-masked no-op rows:
        # every dispatch then hits the SAME compiled program (a second shape
        # would cost a full recompile — minutes through the remote compiler)
        live = np.ones(chunk_size, bool)
        if len(chunk) < chunk_size:
            pad = chunk_size - len(chunk)
            idx = np.concatenate([idx, np.repeat(idx[-1:], pad, axis=0)])
            betas = np.concatenate([betas, np.repeat(betas[-1:], pad)])
            if caps is not None:
                caps = np.concatenate([caps, np.repeat(caps[-1:], pad)])
            live[len(chunk):] = False
        # recon forwards run only on the epochs whose dump the host writes
        dump = np.zeros(chunk_size, bool)
        if recon_dumps and fixed_val.shape[0]:
            for j, ep in enumerate(chunk):
                dump[j] = ep % cfg.recon_freq == 0
        state, sched, out = run_fn(
            state, x_train_dev, jnp.asarray(idx), jnp.asarray(betas),
            jnp.asarray(live), val_batches, fixed_dev, sched, jnp.asarray(dump),
            *(() if caps is None else (jnp.asarray(caps),)),
        )
        out = jax.tree_util.tree_map(np.asarray, out)
        dt = (time.perf_counter() - t0) / len(chunk)

        stopped_at = None
        for j, ep in enumerate(chunk):
            if not out["ran"][j]:
                break
            val_total = float(out["val"]["total"][j])
            writer.add_scalars(
                {
                    "loss/train_total": float(out["train"]["total"][j]),
                    "loss/train_recon": float(out["train"]["recon"][j]),
                    "loss/train_kld": float(out["train"]["kld"][j]),
                    "loss/val_total": val_total,
                    "loss/val_recon": float(out["val"]["recon"][j]),
                    "loss/val_kld": float(out["val"]["kld"][j]),
                    "lr": float(out["lr"][j]),
                    "beta": float(betas[j]),
                    "epoch_seconds": dt,
                },
                ep,
            )
            if verbose:
                print(
                    f"[AE epoch {ep}] train {float(out['train']['total'][j]):.6f} "
                    f"(recon {float(out['train']['recon'][j]):.6f}, "
                    f"kld {float(out['train']['kld'][j]):.6f}) | "
                    f"val {val_total:.6f} | {dt:.2f}s"
                )
            if recon_dumps and ep % cfg.recon_freq == 0 and fixed_val.shape[0]:
                for i, name in enumerate(fixed_names):
                    base = os.path.splitext(os.path.basename(name))[0]
                    try:
                        save_recon_midi(
                            ae_denormalize(fixed_val[i], cfg.max_start_beat, cfg.max_duration_beat),
                            ae_denormalize(out["recon"][j, i], cfg.max_start_beat, cfg.max_duration_beat),
                            recon_dir,
                            f"ep{ep}_{base}",
                        )
                    except Exception as e:  # noqa: BLE001 — fail-soft like the reference
                        print(f"[WARN] recon dump failed for {name}: {e}")
            is_stop_epoch = bool(sched["done"]) and (
                j + 1 == len(chunk) or not out["ran"][j + 1]
            )
            if not is_stop_epoch:
                history = {"epoch": ep, "val_total": val_total,
                           "best_val": float(sched["stop_best"])}
            else:
                stopped_at = ep

        # best checkpoint: written once per chunk when a new best appeared
        # (same artifact the sequential loop writes at every improved epoch)
        best_epoch = int(sched["best_epoch"])
        if out["improved"].any() and best_epoch != last_saved_best:
            best = jax.tree_util.tree_map(np.asarray, sched["best"])
            save_checkpoint(
                os.path.join(ckpt_dir, "ae_best.ckpt"),
                {
                    "epoch": best_epoch,
                    "params": best["params"],
                    "batch_stats": best["batch_stats"],
                    "opt_state": best["opt_state"],
                    "rng": best["rng"],
                    "best_val": float(best["stop_best"]),
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
                print(f"[AE] early stop at epoch {stopped_at} "
                      f"(no improvement {cfg.early_stop_patience} epochs)")
            break
        epoch = chunk[-1] + 1

    best_state = VAETrainState(
        params=sched["best"]["params"],
        batch_stats=sched["best"]["batch_stats"],
        opt_state=sched["best"]["opt_state"],
        rng=sched["best"]["rng"],
    )
    save_checkpoint(
        os.path.join(ckpt_dir, "ae_final.ckpt"),
        {"params": state.params, "batch_stats": state.batch_stats},
    )
    writer.close()
    return best_state, {"best_val": float(sched["stop_best"]), **history}


def _encode_apply(model: VAE):
    # weights enter as ARGUMENTS, not closure constants: captured arrays are
    # inlined into the HLO, which made every run (new weights) a fresh XLA
    # compile and defeated the persistent cache across runs/precompile
    return jax.jit(lambda v, x: model.apply(v, x, method=VAE.encode_mu))


def encode_mu(model: VAE, state: VAETrainState, notes_ae: np.ndarray,
              batch_size: int = ENCODE_BATCH) -> np.ndarray:
    """Export deterministic µ latents (reference src/ae/encode.py parity)."""
    apply = _encode_apply(model)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    outs = []
    for i in range(0, notes_ae.shape[0], batch_size):
        chunk = notes_ae[i : i + batch_size]
        k = chunk.shape[0]
        if k < batch_size:  # pad the tail: ONE compiled shape per export
            pad = np.zeros((batch_size - k,) + chunk.shape[1:], chunk.dtype)
            chunk = np.concatenate([chunk, pad])
        outs.append(np.asarray(apply(variables, jnp.asarray(chunk)))[:k])
    return np.concatenate(outs, axis=0)
