#!/usr/bin/env python3
"""Randomized kill/resume fault injection over the FULL pipeline
(VERDICT-r3 item 8).

Property under test: for ANY SIGKILL instant t during `melogan pipeline`,
re-running with ``--resume`` completes and produces final artifacts
(every generated .mid byte-for-byte, every gan_final.ckpt array) IDENTICAL
to an uninterrupted run — i.e. the atomic-write + stage-marker +
step-identical-resume claims compose into one end-to-end guarantee, not just
per-stage unit properties.

Method:
1. run the pipeline uninterrupted in a reference workdir; record its wall
   time and artifact digests;
2. per trial: fresh workdir, SIGKILL the pipeline at a uniform-random delay
   in (0, wall); if a checkpoint/marker temp file (``*.tmp``) is observed
   first, kill at that instant instead (targeting mid-atomic-write windows);
3. `pipeline --resume`, then compare artifacts against the reference.

All runs share one persistent XLA compile cache, so only the reference run
pays compiles. Usage:
    python scripts/fault_inject.py WORKROOT [--trials N] [--seed S]
"""
from __future__ import annotations

import glob
import hashlib
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_CLI_BOOT = (
    "import jax; jax.config.update('jax_platforms', 'cpu'); "
    "import sys; from melogan_tpu.cli import main; main(sys.argv[1:])"
)

TINY_AE = ("latent_dim: 4\nhidden_dim: 32\nbatch_size: 8\nepochs: 8\n"
           "recon_save_count: 0\n")
TINY_ED = ("input_mode: notes\nnotes_hidden: 32\nmlp_hidden: [32, 16]\n"
           "batch_size: 8\nlatent_dim: 4\nnum_epochs: 6\n")
TINY_GAN = ("NOISE_DIM: 16\nLATENT_DIM: 4\nGEN_HIDDEN: 32\nBATCH_SIZE: 4\n"
            "CRITIC_ITERS: 2\nSAVE_FREQ: 2\nEPOCHS: 6\n")


def _env(cache_dir: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["MELOGAN_EPOCH_CHUNK"] = "2"
    # The persistent compile cache MUST stay off here: XLA:CPU executables
    # loaded from the AOT cache are numerically different from fresh-JIT
    # ones (the loader itself warns about compile-vs-host machine-feature
    # mismatches), so a resumed process that hits the cache diverges from a
    # straight-through process that compiled fresh — by float reassociation,
    # not by any resume bug. Fresh compiles are bit-deterministic across
    # processes (measured; docs/operations.md "CPU cache determinism").
    env["MELOGAN_COMPILE_CACHE"] = "0"
    del cache_dir  # kept in the signature for call-site symmetry
    env["MELOGAN_PIPELINE_PRECOMPILE"] = "0"
    env.setdefault("JAX_PLATFORMS", "cpu")
    return env


def _write_configs(root: str) -> dict:
    paths = {}
    for name, body in (("ae", TINY_AE), ("ed", TINY_ED), ("gan", TINY_GAN)):
        p = os.path.join(root, f"{name}.yaml")
        with open(p, "w") as f:
            f.write(body)
        paths[name] = p
    return paths


def _pipeline_args(workdir: str, cfgs: dict, resume: bool = False):
    a = ["pipeline", "--workdir", workdir, "--synthetic", "--per-emotion", "8",
         "--skip-quality-gate",
         "--ae-config", cfgs["ae"], "--ed-config", cfgs["ed"],
         "--gan-config", cfgs["gan"]]
    return a + (["--resume"] if resume else [])


def artifact_digests(workdir: str) -> dict:
    """Byte digests of every final artifact the pipeline promises."""
    out = {}
    for p in sorted(glob.glob(os.path.join(workdir, "generated_tests", "*.mid"))):
        out[os.path.relpath(p, workdir)] = hashlib.sha256(
            open(p, "rb").read()).hexdigest()
    ckpt = os.path.join(workdir, "experiments/gan/checkpoints/gan_final.ckpt")
    if os.path.exists(ckpt):
        import jax
        import numpy as np

        from melogan_tpu.utils.checkpoint import load_checkpoint

        tree = load_checkpoint(ckpt)
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
            out[f"gan_final{jax.tree_util.keystr(path)}"] = hashlib.sha256(
                np.ascontiguousarray(np.asarray(leaf)).tobytes()).hexdigest()
    return out


def run_straight(workroot: str, cache_dir: str, cfgs: dict):
    """Uninterrupted reference run; returns (workdir, wall_seconds, digests)."""
    wd = os.path.join(workroot, "straight")
    t0 = time.monotonic()
    subprocess.run(
        [sys.executable, "-c", _CLI_BOOT, *_pipeline_args(wd, cfgs)],
        env=_env(cache_dir), check=True, capture_output=True, timeout=1800,
    )
    wall = time.monotonic() - t0
    digests = artifact_digests(wd)
    if not any(k.endswith(".mid") for k in digests):
        raise RuntimeError("reference run produced no samples")
    return wd, wall, digests


def run_trial(i: int, workroot: str, cache_dir: str, cfgs: dict,
              kill_after: float, reference: dict) -> dict:
    """One kill/resume trial; returns a report dict (raises on mismatch)."""
    wd = os.path.join(workroot, f"trial{i:02d}")
    proc = subprocess.Popen(
        [sys.executable, "-c", _CLI_BOOT, *_pipeline_args(wd, cfgs)],
        env=_env(cache_dir), stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    killed_on_tmp = False
    t0 = time.monotonic()
    try:
        # phase 1: let the pipeline run until the sampled kill instant
        while time.monotonic() - t0 < kill_after and proc.poll() is None:
            time.sleep(0.01)
        # phase 2 (mid-atomic-write targeting): from the kill instant on,
        # prefer to die the moment a ``*.tmp`` file is visible — an
        # atomic_write in flight is the most adversarial place to be killed.
        # Bounded to +25% of the instant so pure-time kills still happen.
        deadline = time.monotonic() + max(0.2, 0.25 * kill_after)
        while time.monotonic() < deadline and proc.poll() is None:
            if glob.glob(os.path.join(wd, "**", "*.tmp"), recursive=True):
                killed_on_tmp = True
                break
            time.sleep(0.005)
        completed_before_kill = proc.poll() is not None
        if not completed_before_kill:
            proc.send_signal(signal.SIGKILL)
            proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()

    subprocess.run(
        [sys.executable, "-c", _CLI_BOOT, *_pipeline_args(wd, cfgs, resume=True)],
        env=_env(cache_dir), check=True, capture_output=True, timeout=1800,
    )
    got = artifact_digests(wd)
    if got != reference:
        missing = set(reference) - set(got)
        extra = set(got) - set(reference)
        diff = [k for k in set(got) & set(reference) if got[k] != reference[k]]
        raise AssertionError(
            f"trial {i} (kill at {kill_after:.2f}s, on_tmp={killed_on_tmp}): "
            f"artifacts differ from the uninterrupted run — "
            f"missing={sorted(missing)} extra={sorted(extra)} diff={sorted(diff)}"
        )
    return {"trial": i, "kill_after_s": round(kill_after, 2),
            "killed_on_tmp_file": killed_on_tmp,
            "completed_before_kill": completed_before_kill, "ok": True}


def main(workroot: str, trials: int = 5, seed: int = 0) -> list:
    import numpy as np

    os.makedirs(workroot, exist_ok=True)
    cache_dir = os.path.join(workroot, "xla_cache")
    cfgs = _write_configs(workroot)
    print("[fault] reference (uninterrupted) run...")
    _, wall, reference = run_straight(workroot, cache_dir, cfgs)
    print(f"[fault] reference wall {wall:.1f}s, "
          f"{len(reference)} artifact digests")
    rng = np.random.default_rng(seed)
    reports = []
    for i in range(trials):
        kill_after = float(rng.uniform(0.05, wall))
        r = run_trial(i, workroot, cache_dir, cfgs, kill_after, reference)
        print(f"[fault] {r}")
        reports.append(r)
    print(f"[fault] all {trials} kill/resume trials produced "
          "byte-identical artifacts")
    return reports


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    kw = {}
    if "--trials" in sys.argv:
        kw["trials"] = int(sys.argv[sys.argv.index("--trials") + 1])
    if "--seed" in sys.argv:
        kw["seed"] = int(sys.argv[sys.argv.index("--seed") + 1])
    main(args[0] if args else "/tmp/melogan_fault", **kw)
