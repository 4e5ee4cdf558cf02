"""Population training: K independent WGAN-GP runs as ONE vmapped program.

A TPU-native capability with no reference equivalent (the torch scripts
train exactly one model per process — /root/reference/src/gan/train_gan.py):
``jax.vmap`` lifts the fused multi-epoch WGAN-GP run step
(``gan_step.indexed_run_step``) over a population axis, so K members train
concurrently in a single jitted dispatch per checkpoint chunk — ONE compile
for the whole population (the program traces once; members differ only in
values) and one tunnel round trip per chunk. Measured on a v5e at full
reference shapes (scripts/sweep_ab.py, f32 HIGHEST): the fused solo program
already nearly saturates the chip, so aggregate throughput grows 1.22× at
K=8 (800.6 → 972.8 reference steps/s) — the population's real win is
training K configurations for ~1/K-th of the compiles and dispatches, plus
that 22%, not K× compute.

Members may also differ in HYPERPARAMETERS (``hyper_grid``): lr_g/lr_d/λ_gp/
λ_emo become traced scalars (``gan_step.HyperParams``) so one compiled
program trains a whole search grid — a capability the torch reference would
need K processes and K GPUs for.

Each population member gets its own parameter init (``init_state(seed)``),
its own device RNG stream (noise/α/dropout), and its own epoch shuffles
(``np.random.default_rng(seed)`` — the same data-order convention as
``gan_loop.train``), so member ``s`` reproduces a solo ``train`` run with
``cfg.seed = s`` (tested: tests/test_sweep.py).

Selection runs the golden-band quality gate over freshly generated samples
per member — the winner is the checkpoint that best satisfies the
reference's own artifact statistics (diagnostics/quality.py), not a proxy
loss: WGAN critic losses are not comparable across independent critics.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from melogan_tpu.config import EDConfig, GANConfig
from melogan_tpu.data.datasets import SplitData, epoch_group_indices
from melogan_tpu.train import gan_step
from melogan_tpu.utils.checkpoint import save_checkpoint


def _stack_states(states: Sequence[gan_step.GANTrainState]) -> gan_step.GANTrainState:
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def _member(batched: gan_step.GANTrainState, k: int) -> gan_step.GANTrainState:
    return jax.tree_util.tree_map(lambda x: np.asarray(x[k]), batched)


def _take_members(tree, idx: Sequence[int]):
    """Select population members by index along the leading axis (on device:
    halving survivors keep their trained state without a host round trip)."""
    sel = jnp.asarray(list(idx), jnp.int32)
    return jax.tree_util.tree_map(lambda x: jnp.take(x, sel, axis=0), tree)


def _train_population(
    run_fn,
    batched: gan_step.GANTrainState,
    hp_arrays,
    data_dev,
    cfg: GANConfig,
    rngs: List[np.random.Generator],
    seeds: Sequence[int],
    n_epochs: int,
    history: List[List[Dict[str, float]]],
    _pop_put,
    n_rows: int,
    verbose: bool,
    epoch_offset: int = 0,
    total_epochs: Optional[int] = None,
    save_cb=None,
) -> gan_step.GANTrainState:
    """Run ``n_epochs`` of the vmapped population program in save_freq-sized
    fused chunks, appending one row per (member, epoch) to ``history``.

    The per-member shuffle generators in ``rngs`` advance exactly as a solo
    ``gan_loop.train`` run would, so trajectories are chunking-independent —
    halving rungs call this repeatedly with the SAME generator objects and the
    surviving members' curves stay bit-identical to uninterrupted runs."""
    total = total_epochs if total_epochs is not None else epoch_offset + n_epochs
    epoch = 1
    while epoch <= n_epochs:
        chunk_end = min(n_epochs, ((epoch - 1) // cfg.save_freq + 1) * cfg.save_freq)
        chunk = list(range(epoch, chunk_end + 1))
        e_dim = cfg.save_freq if n_epochs > cfg.save_freq else len(chunk)
        t0 = time.perf_counter()
        g_all, t_all = [], []
        for rng in rngs:
            g_stack, t_stack = [], []
            for _ in chunk:
                gi, ti = epoch_group_indices(n_rows, cfg.batch_size, cfg.critic_iters, rng)
                g_stack.append(gi)
                t_stack.append(ti)
            if len(chunk) < e_dim:  # pad the short final chunk (live-masked)
                pad = e_dim - len(chunk)
                g_stack += [g_stack[-1]] * pad
                t_stack += [t_stack[-1]] * pad
            g_all.append(np.stack(g_stack))
            if t_stack[0] is not None:
                t_all.append(np.stack(t_stack))
        live_mask = jnp.asarray(np.arange(e_dim) < len(chunk))
        gidx = _pop_put(np.stack(g_all).astype(np.int32))  # (K, E, G, ci, B)
        tidx = _pop_put(np.stack(t_all).astype(np.int32)) if t_all else None
        batched, m = run_fn(batched, hp_arrays, data_dev, gidx, tidx, live_mask)

        n_groups = gidx.shape[2]
        n_steps = n_groups * cfg.critic_iters + (tidx.shape[2] if tidx is not None else 0)
        dt = (time.perf_counter() - t0) / len(chunk)
        for k in range(len(seeds)):
            for j, ep in enumerate(chunk):
                history[k].append({
                    "epoch": ep + epoch_offset,
                    "Loss/Critic": float(m["loss_d_sum"][k, j]) / n_steps,
                    "Loss/Generator_Adv": float(m["loss_g_adv"][k, j]) / n_groups,
                    "Loss/Generator_Emo": float(m["loss_g_emo"][k, j]) / n_groups,
                    "Critic/Wasserstein": (float(m["d_real_sum"][k, j])
                                           - float(m["d_fake_sum"][k, j])) / n_steps,
                    **({"Loss/Generator_FM":
                        float(m["loss_g_fm"][k, j]) / n_groups}
                       if "loss_g_fm" in m else {}),
                })
        if verbose:
            last = [history[k][-1] for k in range(len(seeds))]
            print(
                f"[SWEEP epochs {chunk[0] + epoch_offset}-"
                f"{chunk[-1] + epoch_offset}/{total}] "
                + " | ".join(
                    f"s{seeds[k]}: D {last[k]['Loss/Critic']:.3f} "
                    f"G_emo {last[k]['Loss/Generator_Emo']:.3f}"
                    for k in range(len(seeds))
                )
                + f" | {dt:.2f}s/epoch (population of {len(seeds)})"
            )
        if save_cb is not None:
            # population-state writes are big (hundreds of MB for K members
            # incl. both optimizer states): at long horizons writing every
            # chunk dominates wall (measured round 4: a 4-member 500-epoch
            # sweep spent most of its time in 587 MB state writes). The
            # cadence trades resume granularity for wall; the final chunk
            # always writes so a completed phase is always resumable.
            every = max(1, int(os.environ.get("MELOGAN_SWEEP_STATE_EVERY", "1")))
            chunk_no = (chunk_end + cfg.save_freq - 1) // cfg.save_freq
            if chunk_end >= n_epochs or chunk_no % every == 0:
                save_cb(batched, epoch_offset + chunk_end)
        epoch = chunk_end + 1
    return batched


def sweep_gan(
    cfg: GANConfig,
    ed_cfg: EDConfig,
    train_data: SplitData,
    seeds: Sequence[int],
    latents: Optional[np.ndarray] = None,
    ed_variables: Optional[Dict] = None,
    workdir: Optional[str] = None,
    epochs: Optional[int] = None,
    verbose: bool = True,
    precision=None,
    samples_per_emotion: int = 2,
    promote_best: bool = False,
    mesh=None,
    hyper_grid: Optional[Sequence[Dict[str, float]]] = None,
    halving: bool = False,
    rung_epochs: Optional[int] = None,
    resume: bool = False,
) -> Dict:
    """Train ``len(seeds)`` WGAN-GP runs concurrently; gate and rank them.

    ``halving``: successive-halving search. Train the whole population for
    ``rung_epochs`` (default ``cfg.save_freq``) as one vmapped program, rank
    members by the golden-band gate on fresh samples, keep the top half
    (survivors keep their trained state ON DEVICE and their epoch-shuffle
    streams, so their curves are identical to uninterrupted runs), and repeat
    until one member remains; the winner then trains on to ``epochs`` total.
    Each rung's population size is a new leading dim — one XLA compile per
    rung (sizes K, K/2, …, 1), against K solo compiles for the torch way.

    ``hyper_grid``: optional per-member hyperparameter overrides — one dict
    per seed with any of ``lr_g, lr_d, lambda_gp, lambda_emotion`` — turning
    the seed population into a HYPERPARAMETER SEARCH in the same single
    vmapped program: the four knobs become traced scalars
    (``gan_step.HyperParams``), so all members share one compile and one
    dispatch per chunk while training different configurations. A member
    whose overrides are empty is bit-identical to the plain-population (and
    solo-train) trajectory with the same seed (tests/test_sweep.py).

    ``mesh``: optional Mesh with a 'data' axis — the POPULATION axis is then
    sharded over it (members are independent, so this is embarrassingly
    parallel: each device trains K/N members with ZERO collectives; the
    corpus is replicated). Requires len(seeds) divisible by the axis size.

    Artifacts (under ``workdir``): ``experiments/gan/sweep/seed<S>/``
    holds each member's ``gan_final.ckpt`` (``load_gan_final``-compatible)
    plus its gate samples; ``experiments/gan/sweep/sweep_report.json`` has
    per-member curves, gate results, and the winner. ``promote_best`` also
    copies the winner to the stage's regular ``gan_final.ckpt`` so the
    pipeline's downstream (sample / serve / quality-gate) picks it up.
    ``precision='bf16'`` runs the population with single-pass MXU matmuls.

    ``resume``: restart an interrupted sweep from
    ``experiments/gan/sweep/sweep_state.ckpt`` — the whole population's
    device state (params, optimizer moments, BN stats, device RNG streams,
    step counters) is checkpointed after every fused chunk and after every
    halving rung, and the per-member host shuffle generators are replayed to
    the saved epoch (the ``gan_loop.train`` resume convention), so an
    interrupted-and-resumed sweep is trajectory-identical to a
    straight-through one (tests/test_sweep.py). The invocation must match
    the interrupted run (seeds, hyper grid, halving shape); epochs may be
    extended.
    """
    from melogan_tpu.train.harness import jit_with_precision

    cfg = gan_step.precision_tuned_cfg(cfg, precision)
    seeds = [int(s) for s in seeds]
    if len(set(seeds)) != len(seeds) and hyper_grid is None:
        raise ValueError(f"duplicate seeds in {seeds}")
    hypers = None
    if hyper_grid is not None:
        if len(hyper_grid) != len(seeds):
            raise ValueError(
                f"hyper_grid has {len(hyper_grid)} entries for "
                f"{len(seeds)} seeds; they must pair 1:1"
            )
        # resolve against the config now so the report carries full values
        # (and unknown keys fail before any compile)
        hypers = [gan_step.HyperParams.from_config(cfg, **h) for h in hyper_grid]
    if mesh is not None and len(seeds) % mesh.shape["data"] != 0:
        raise ValueError(
            f"population ({len(seeds)}) must be divisible by the 'data' "
            f"axis size ({mesh.shape['data']}) to shard members over devices"
        )
    if halving:
        if len(seeds) < 2:
            raise ValueError("halving needs a population of at least 2")
        if mesh is not None:
            raise ValueError(
                "halving does not compose with population sharding: rung "
                "sizes K/2, K/4, … 1 cannot stay divisible by the mesh axis; "
                "run without --dp"
            )
    n_epochs = epochs or cfg.epochs
    r_epochs = (rung_epochs or cfg.save_freq) if halving else None

    base = os.path.join(workdir or ".", cfg.checkpoint_dir)
    sweep_dir = os.path.join(os.path.dirname(base.rstrip("/")), "sweep")
    state_path = os.path.join(sweep_dir, "sweep_state.ckpt")
    # the invocation fingerprint: a resumed run must be a continuation of the
    # SAME sweep (population, grid, rung shape) or the replayed shuffle/RNG
    # streams would silently diverge from the interrupted trajectory
    fingerprint = {
        "seeds": list(seeds),
        "hypers": ([dict(h._asdict()) for h in hypers]
                   if hypers is not None else None),
        "halving": bool(halving),
        "r_epochs": r_epochs,
        "batch_size": cfg.batch_size,
        "critic_iters": cfg.critic_iters,
        "ema_decay": cfg.ema_decay,  # changes the state tree structure
    }

    ids = list(range(len(seeds)))  # stable member ids across halving rungs
    rung = 0
    done = 0  # epochs completed by the CURRENT population (lockstep)
    rung_report: Optional[List[Dict]] = [] if halving else None
    resumed_state = None
    resumed_history = None
    if resume and os.path.exists(state_path):
        from melogan_tpu.utils.checkpoint import load_checkpoint

        try:
            raw = load_checkpoint(state_path)
            meta = json.loads(bytes(np.asarray(raw["meta"], np.uint8)).decode())
        except Exception as e:
            # a torn/corrupt state file must fail TYPED with guidance, not
            # leak a msgpack internal (writes are atomic, so this means
            # external damage — the sweep artifacts themselves are intact)
            raise ValueError(
                f"sweep state at {state_path} is unreadable "
                f"({type(e).__name__}: {e}); delete it to restart the sweep "
                "from scratch — per-member finals and the report are "
                "unaffected"
            ) from e
        if meta["fingerprint"] != fingerprint:
            raise ValueError(
                f"sweep_state.ckpt at {state_path} belongs to a different "
                f"sweep (saved {meta['fingerprint']}, invoked {fingerprint}); "
                "delete it or rerun without resume"
            )
        seeds = [int(s) for s in meta["seeds"]]
        ids = [int(i) for i in meta["ids"]]
        rung = int(meta["rung"])
        done = int(meta["done"])
        if rung_report is not None:
            rung_report = meta["rung_report"]
        if meta["hypers"] is not None:
            hypers = [
                gan_step.HyperParams(**{k: float(v) for k, v in h.items()})
                for h in meta["hypers"]
            ]
        resumed_state = raw["state"]
        resumed_history = [list(h) for h in meta["history"]]
        if verbose:
            print(f"[SWEEP] resumed from {state_path}: population "
                  f"{len(seeds)} at epoch {done}"
                  + (f", rung {rung}" if halving else ""))

    models = gan_step.build_models(cfg, ed_cfg)
    states = [
        gan_step.init_state(cfg, models, seed=s, ed_variables=ed_variables)
        for s in seeds
    ]
    batched = _stack_states(states)
    if resumed_state is not None:
        from flax import serialization

        batched = serialization.from_state_dict(batched, resumed_state)
        batched = jax.tree_util.tree_map(jnp.asarray, batched)
    # population sharding: leading (member) axis over 'data'; every leaf of
    # the state has it, so each device carries K/N members end to end and
    # GSPMD partitions the vmapped program with no cross-member reductions
    # to communicate — per-step collective traffic is exactly zero
    _pop_put = lambda x: x  # noqa: E731
    if mesh is not None:
        from melogan_tpu.parallel.mesh import batch_sharding

        _pop_put = lambda x: jax.device_put(  # noqa: E731
            x, batch_sharding(mesh, np.ndim(x)))
        batched = jax.tree_util.tree_map(_pop_put, batched)
    # per-emotion feature centroids: sampling/gating conditions E_num the way
    # it was trained (stored in member finals; see gan_loop.train)
    emo_idx_all = train_data.emotion_idx
    emotion_features = np.stack([
        train_data.numeric[emo_idx_all == e].mean(axis=0)
        if (emo_idx_all == e).any() else train_data.numeric.mean(axis=0)
        for e in range(4)
    ]).astype(np.float32)

    # optional feature matching: real-corpus note-space centroids, shared by
    # every member (the λ_fm knob itself may vary per member via hypers)
    fm_target = None
    if cfg.lambda_fm or (hypers is not None
                         and any(float(h.lambda_fm) for h in hypers)):
        fm_target = gan_step.fm_targets_from_data(
            train_data.notes_gan(), train_data.emotion_idx)
    steps = gan_step.make_train_steps(cfg, models, fm_target=fm_target)

    # per-member hyperparameters as stacked (K,) f32 scalars — vmap maps
    # them alongside the state, so each member's traced lr/λ values feed the
    # SAME compiled program (gan_step.HyperParams)
    hp_arrays = None
    if hypers is not None:
        hp_arrays = gan_step.HyperParams(*(
            _pop_put(jnp.asarray([float(getattr(h, f)) for h in hypers],
                                 jnp.float32))
            for f in gan_step.HyperParams._fields
        ))

    # population step: vmap the fused multi-epoch run over (state, [hyper,]
    # indices). The corpus and the live mask are shared (closed over); each
    # member carries its own shuffles. tail-less corpora trace the no-tail
    # variant.
    def _member_run(s, h, data, g, t, live):
        member_steps = (
            steps if h is None
            else gan_step.make_train_steps(cfg, models, hyper=h,
                                           fm_target=fm_target)
        )
        return member_steps.run(s, data, g, t, live)

    def _run(st, hp, data, gidx, tidx, live):
        if tidx is None:
            if hp is None:
                return jax.vmap(
                    lambda s, g: _member_run(s, None, data, g, None, live),
                    in_axes=(0, 0),
                )(st, gidx)
            return jax.vmap(
                lambda s, h, g: _member_run(s, h, data, g, None, live),
                in_axes=(0, 0, 0),
            )(st, hp, gidx)
        if hp is None:
            return jax.vmap(
                lambda s, g, t: _member_run(s, None, data, g, t, live),
                in_axes=(0, 0, 0),
            )(st, gidx, tidx)
        return jax.vmap(
            lambda s, h, g, t: _member_run(s, h, data, g, t, live),
            in_axes=(0, 0, 0, 0),
        )(st, hp, gidx, tidx)

    run_fn = jit_with_precision(_run, precision)

    notes = train_data.notes_gan()
    emotion_idx = train_data.emotion_idx.astype(np.int32)
    numeric = train_data.numeric.astype(np.float32)
    if latents is None or latents.shape[0] != notes.shape[0]:
        if latents is not None and verbose:
            print("[WARN] latent feats length mismatch; using zero latents")
        latents = np.zeros((notes.shape[0], cfg.latent_dim), np.float32)
    data_dev = (
        jnp.asarray(notes),
        jnp.asarray(emotion_idx),
        jnp.asarray(latents),
        jnp.asarray(numeric),
    )
    if mesh is not None:
        from melogan_tpu.parallel.mesh import put_replicated

        data_dev = put_replicated(data_dev, mesh)

    n = notes.shape[0]
    note = gan_step.ema_horizon_note(cfg, n_epochs, n)
    if note and verbose:
        print(note)
    n_batches = n // cfg.batch_size
    if n_batches // cfg.critic_iters == 0:
        raise ValueError(
            f"corpus too small for a sweep: {n} rows yield {n_batches} batches "
            f"< critic_iters ({cfg.critic_iters}); use gan_loop.train"
        )

    # per-member epoch-shuffle streams (solo-train convention: seed = cfg.seed);
    # on resume, replay the consumed epochs so the streams continue exactly
    # where the interrupted run stopped (one permutation per live epoch —
    # epoch_group_indices consumes exactly one rng.permutation call)
    rngs = [np.random.default_rng(s) for s in seeds]
    for r_ in rngs:
        for _ in range(done):
            r_.permutation(n)
    history: List[List[Dict[str, float]]] = (
        resumed_history if resumed_history is not None else [[] for _ in seeds]
    )

    def save_state(batched_now, done_now):
        """Checkpoint the whole sweep after a fused chunk or a halving rung:
        device state + enough host meta to resume trajectory-identically.
        Reads the enclosing-scope population variables at call time, so the
        saved meta always reflects the current (possibly halved) population."""
        meta_now = {
            "version": 1,
            "fingerprint": fingerprint,
            "seeds": seeds,
            "ids": ids,
            "hypers": ([dict(h._asdict()) for h in hypers]
                       if hypers is not None else None),
            "rung": rung,
            "done": done_now,
            "rung_report": rung_report,
            "history": history,
        }
        # meta rides inside the same atomic msgpack file as the device state
        # (a crash can never leave the two halves inconsistent); flax msgpack
        # has no str leaf type, so the JSON goes in as a uint8 array
        meta_bytes = np.frombuffer(json.dumps(meta_now).encode(), np.uint8)
        save_checkpoint(state_path,
                        {"meta": meta_bytes, "state": batched_now})

    if halving:
        sampler = None
        while len(seeds) > 1:
            rung_target = (rung + 1) * r_epochs
            if done < rung_target:  # resume may land exactly on a rung boundary
                batched = _train_population(
                    run_fn, batched, hp_arrays, data_dev, cfg, rngs, seeds,
                    rung_target - done, history, _pop_put, n, verbose,
                    epoch_offset=done, save_cb=save_state,
                )
                done = rung_target
            rows = []
            for k in range(len(seeds)):
                out_dir = os.path.join(sweep_dir, f"rung{rung}",
                                       f"m{ids[k]}_seed{seeds[k]}")
                passed, total, violations, _, _, sampler = _gate_member(
                    cfg, _member(batched, k), seeds[k], out_dir,
                    samples_per_emotion, sampler,
                    emotion_features=emotion_features)
                rows.append({"member": ids[k], "seed": seeds[k],
                             "hyper": (dict(hypers[k]._asdict())
                                       if hypers is not None else None),
                             "gate_passed": passed, "gate_total": total,
                             "gate_violations": violations, "survived": False})
            order = sorted(range(len(seeds)),
                           key=lambda i: (-rows[i]["gate_passed"],
                                          rows[i]["gate_violations"], i))
            keep = sorted(order[: max(1, len(seeds) // 2)])
            for i in keep:
                rows[i]["survived"] = True
            rung_report.append({"rung": rung, "epochs": [done - r_epochs + 1, done],
                                "members": rows})
            if verbose:
                kept = ", ".join(f"m{ids[i]}(s{seeds[i]})" for i in keep)
                print(f"[SWEEP rung {rung}] population {len(seeds)} -> "
                      f"{len(keep)}; survivors: {kept}")
            batched = _take_members(batched, keep)
            if hp_arrays is not None:
                hp_arrays = _take_members(hp_arrays, keep)
            seeds = [seeds[i] for i in keep]
            rngs = [rngs[i] for i in keep]
            history = [history[i] for i in keep]
            ids = [ids[i] for i in keep]
            if hypers is not None:
                hypers = [hypers[i] for i in keep]
            rung = 1 + rung
            save_state(batched, done)  # survivors recorded before next rung
        if done < n_epochs:  # winner trains out the remaining budget
            batched = _train_population(
                run_fn, batched, hp_arrays, data_dev, cfg, rngs, seeds,
                n_epochs - done, history, _pop_put, n, verbose,
                epoch_offset=done, save_cb=save_state,
            )
    elif done < n_epochs:
        batched = _train_population(
            run_fn, batched, hp_arrays, data_dev, cfg, rngs, seeds,
            n_epochs - done, history, _pop_put, n, verbose,
            epoch_offset=done, total_epochs=n_epochs, save_cb=save_state,
        )

    report = _select_and_save(
        cfg, batched, seeds, history, workdir=workdir,
        samples_per_emotion=samples_per_emotion, promote_best=promote_best,
        verbose=verbose, hypers=hypers, emotion_features=emotion_features,
    )
    if rung_report is not None:
        report["rungs"] = rung_report
        _rewrite_report(cfg, workdir, report)
    return report


def _rewrite_report(cfg: GANConfig, workdir: Optional[str], report: Dict) -> None:
    """Re-write sweep_report.json after post-selection fields are added."""
    from melogan_tpu.utils.atomic import atomic_write

    base = os.path.join(workdir or ".", cfg.checkpoint_dir)
    sweep_dir = os.path.join(os.path.dirname(base.rstrip("/")), "sweep")
    atomic_write(os.path.join(sweep_dir, "sweep_report.json"),
                 lambda f: json.dump(report, f, indent=2))


def _gate_member(
    cfg: GANConfig,
    member: gan_step.GANTrainState,
    seed: int,
    out_dir: str,
    samples_per_emotion: int,
    sampler,
    emotion_features=None,
):
    """Generate ``samples_per_emotion`` fresh .mid per emotion from one
    population member and score them against the golden bands.

    Gates the member's DEPLOYABLE weights: the EMA generator when the run
    tracks one (cfg.ema_decay > 0), else the live generator.

    Returns ``(passed, total, violations, gen_vars, fe_vars, sampler)`` — the
    sampler is built lazily on first use and its weights swapped thereafter
    (jit args: no recompile per member)."""
    from melogan_tpu.constants import BPM_JITTER
    from melogan_tpu.diagnostics.quality import gate_directory
    from melogan_tpu.sampling import EMOTION_BPM, EMOTIONS, Sampler

    ema = gan_step.ema_weights(member, cfg.ema_decay)
    gen_vars = {"params": ema if ema is not None else member.gen_params,
                "batch_stats": member.gen_stats}
    fe_vars = {"params": member.fe_params}
    os.makedirs(out_dir, exist_ok=True)
    if sampler is None:
        sampler = Sampler(cfg, gen_variables=gen_vars, fe_variables=fe_vars,
                          emotion_features=emotion_features)
    else:
        sampler.swap_variables(gen_vars, fe_vars,
                               emotion_features=emotion_features)
    rng = np.random.default_rng(seed)
    prompts, paths, bpms = [], [], []
    for emotion in EMOTIONS:
        for i in range(1, samples_per_emotion + 1):
            prompts.append(emotion)
            paths.append(os.path.join(out_dir, f"gate_{emotion}_{i}.mid"))
            bpms.append(float(EMOTION_BPM[emotion]
                              * (1.0 + rng.uniform(-BPM_JITTER, BPM_JITTER))))
    sampler.generate_many(prompts, paths, seed=int(rng.integers(0, 2**31)),
                          bpms=bpms)
    gate = gate_directory(out_dir)
    passed = sum(1 for f in gate["files"].values() if not f["violations"])
    violations = sum(len(f["violations"]) for f in gate["files"].values())
    return passed, len(gate["files"]), violations, gen_vars, fe_vars, sampler


def _select_and_save(
    cfg: GANConfig,
    batched: gan_step.GANTrainState,
    seeds: Sequence[int],
    history: List[List[Dict[str, float]]],
    workdir: Optional[str],
    samples_per_emotion: int,
    promote_best: bool,
    verbose: bool,
    hypers: Optional[Sequence[gan_step.HyperParams]] = None,
    emotion_features=None,
) -> Dict:
    """Gate each member's fresh samples against the golden bands; rank by
    (files passed, fewest violations); save per-member finals + report."""
    base = os.path.join(workdir or ".", cfg.checkpoint_dir)
    sweep_dir = os.path.join(os.path.dirname(base.rstrip("/")), "sweep")
    os.makedirs(sweep_dir, exist_ok=True)

    sampler = None  # built once; weights swapped per member (no recompile)
    results = []
    for k, seed in enumerate(seeds):
        member = _member(batched, k)
        # hyper populations may reuse a seed across members; disambiguate dirs
        label = f"seed{seed}" if hypers is None else f"m{k}_seed{seed}"
        seed_dir = os.path.join(sweep_dir, label)
        passed, gate_total, violations, _, fe_vars, sampler = _gate_member(
            cfg, member, seed, seed_dir, samples_per_emotion, sampler,
            emotion_features=emotion_features)
        ckpt_path = os.path.join(seed_dir, "gan_final.ckpt")
        final = {"G": {"params": member.gen_params,
                       "batch_stats": member.gen_stats},
                 "E_num": fe_vars}
        if emotion_features is not None:
            final["emotion_features"] = emotion_features
        if member.ema_params is not None:
            final["G_ema"] = {
                "params": gan_step.ema_weights(member, cfg.ema_decay),
                "batch_stats": member.gen_stats,
            }
        save_checkpoint(ckpt_path, final)
        results.append({
            "seed": seed,
            "checkpoint": ckpt_path,
            "hyper": (dict(hypers[k]._asdict()) if hypers is not None else None),
            "gate_passed": passed,
            "gate_total": gate_total,
            "gate_violations": violations,
            "final": history[k][-1] if history[k] else None,
            "curve": history[k],
        })
        if verbose:
            print(f"[SWEEP seed {seed}] gate {passed}/{gate_total} "
                  f"({violations} violations) -> {ckpt_path}")

    order = sorted(range(len(results)),
                   key=lambda i: (-results[i]["gate_passed"],
                                  results[i]["gate_violations"],
                                  i))
    best = results[order[0]]
    report = {"seeds": seeds, "results": results, "best_seed": best["seed"],
              "best_checkpoint": best["checkpoint"], "promoted": False}
    if promote_best:
        final_path = os.path.join(base, "gan_final.ckpt")
        os.makedirs(base, exist_ok=True)
        with open(best["checkpoint"], "rb") as src:
            payload = src.read()
        from melogan_tpu.utils.atomic import atomic_write

        atomic_write(final_path, lambda f: f.write(payload), mode="wb")
        report["promoted"] = True
        report["promoted_to"] = final_path
        if verbose:
            print(f"[SWEEP] promoted seed {best['seed']} -> {final_path}")

    report_path = os.path.join(sweep_dir, "sweep_report.json")
    from melogan_tpu.utils.atomic import atomic_write

    atomic_write(report_path, lambda f: json.dump(report, f, indent=2))
    if verbose:
        print(f"[SWEEP] best seed {best['seed']} "
              f"(gate {best['gate_passed']}/{best['gate_total']}); "
              f"report -> {report_path}")
    return report
