#!/usr/bin/env python3
"""Device-trace attribution of the ACTUAL fused WGAN-GP programs
(VERDICT-r4 item 4: the microbenchmark sum left 35% of the group step
unattributed — profile the compiled program itself instead).

Method: ``jax.profiler`` trace around N dispatches of (a) the fused group
step and (b) the fused multi-epoch run program, both at exact production
shapes; parse the ``*.xplane.pb`` with the framework's own reader
(melogan_tpu/utils/xplane.py — no TensorFlow in this image) and aggregate
per-HLO-op device time from the TPU plane's "XLA Ops" line. Report:
  - per-op and per-category device-time shares
  - parts_over_whole: traced device time / host-measured wall per step
  - the same for bf16
Usage: python scripts/mfu_trace.py [--quick] [--out PATH]
Writes docs/mfu_trace_r5.json by default. Run on the TPU.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timed(fn, *args, n=30, warmup=5):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def trace_program(tag, fn, args, n_dispatch, plane_substring):
    """Trace n_dispatch dispatches; return (summary, logdir).

    Whole-program device time comes from the "XLA Modules" line (one event
    per executable dispatch); per-op attribution from "XLA Ops". Control-flow
    wrapper ops (while/conditional/call) ENCLOSE their body ops, which are
    also recorded individually — the wrappers are excluded from the parts
    sum to avoid double counting."""
    import jax

    from melogan_tpu.utils.xplane import (
        available_lines,
        device_op_totals,
        summarize_ops,
    )

    logdir = tempfile.mkdtemp(prefix=f"mfu_trace_{tag}_")
    jax.profiler.start_trace(logdir)
    out = None
    for _ in range(n_dispatch):
        out = fn(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    totals = device_op_totals(logdir, plane_substring=plane_substring)
    if not totals:
        print(f"[mfu_trace] no '{plane_substring}'/'XLA Ops' events; "
              f"available lines:")
        for row in available_lines(logdir):
            print(f"  plane={row[0]!r} line={row[1]!r} events={row[2]}")
        return None, logdir
    modules = device_op_totals(logdir, plane_substring=plane_substring,
                               line_name="XLA Modules")
    module_ms = sum(t["total_ps"] for t in modules.values()) / 1e9
    summary = summarize_ops(totals, top_n=30)
    leaf_ms = summary["total_device_ms"] - summary["categories_ms"].get("control", 0.0)
    summary["n_dispatch"] = n_dispatch
    summary["module_ms_per_dispatch"] = module_ms / max(n_dispatch, 1)
    summary["leaf_ms_per_dispatch"] = leaf_ms / max(n_dispatch, 1)
    # leaf ops over the module envelope: how much of the executable's device
    # time the per-op rows explain (gaps = scheduling bubbles/overheads)
    summary["parts_over_module"] = (leaf_ms / module_ms) if module_ms else None
    return summary, logdir


def main(quick=False, out_path=None, precision_list=("f32", "bf16")):
    import jax

    cache = os.path.join(REPO, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    import jax.numpy as jnp

    from melogan_tpu.config import EDConfig, GANConfig
    from melogan_tpu.train import gan_step
    from melogan_tpu.train.harness import jit_with_precision

    plane_sub = "TPU" if jax.devices()[0].platform != "cpu" else "CPU"
    print(f"[mfu_trace] device: {jax.devices()[0].device_kind} "
          f"(plane filter {plane_sub!r})")

    cfg0 = GANConfig()
    ed_cfg = EDConfig()
    rng = np.random.default_rng(0)
    report = {"device": jax.devices()[0].device_kind, "programs": {}}

    for precision in precision_list:
        prec = None if precision == "f32" else "bf16"
        cfg = gan_step.precision_tuned_cfg(cfg0, prec)
        models = gan_step.build_models(cfg, ed_cfg)
        state = gan_step.init_state(cfg, models, seed=0)
        steps = gan_step.make_train_steps(cfg, models)
        group = jit_with_precision(steps.group, prec)

        k, b = cfg.critic_iters, cfg.batch_size
        batches = (
            jnp.asarray(rng.normal(size=(k, b, cfg.max_notes, 4)), jnp.float32),
            jnp.asarray(rng.integers(0, 4, size=(k, b)), jnp.int32),
            jnp.asarray(rng.normal(size=(k, b, cfg.latent_dim)), jnp.float32),
            jnp.asarray(rng.normal(size=(k, b, 6)), jnp.float32),
        )

        def run_group(st, bt):
            new_state, m = group(st, bt)
            return m

        wall = timed(run_group, state, batches,
                     n=(10 if quick else 30), warmup=(2 if quick else 5))
        n_dispatch = 20 if quick else 100
        summary, logdir = trace_program(
            f"group_{precision}", run_group, (state, batches),
            n_dispatch, plane_sub)
        entry = {
            "wall_ms_per_step": wall * 1e3,
            "trace_logdir": logdir,
        }
        if summary:
            entry.update(summary)
            entry["parts_over_whole"] = (
                summary["module_ms_per_dispatch"] / (wall * 1e3))
        report["programs"][f"group_step_{precision}"] = entry
        print(f"[mfu_trace] group_step_{precision}: wall "
              f"{wall * 1e3:.3f} ms | module device "
              f"{entry.get('module_ms_per_dispatch', float('nan')):.3f} ms "
              f"({entry.get('parts_over_whole', 0):.1%} of wall) | leaf ops "
              f"{entry.get('leaf_ms_per_dispatch', float('nan')):.3f} ms "
              f"({entry.get('parts_over_module', 0) or 0:.1%} of module)")
        if summary:
            for row in summary["top_ops"][:12]:
                per = row["ms"] / summary["total_device_ms"]
                print(f"    {per:6.1%} {row['op'][:90]} "
                      f"(x{row['count']}, {row['ms']:.2f} ms total)")

    out_path = out_path or os.path.join(REPO, "docs", "mfu_trace_r5.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"[mfu_trace] -> {out_path}")
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--f32-only", action="store_true")
    ap.add_argument("--bf16-only", action="store_true")
    a = ap.parse_args()
    plist = ("f32", "bf16")
    if a.f32_only:
        plist = ("f32",)
    elif a.bf16_only:
        plist = ("bf16",)
    main(quick=a.quick, out_path=a.out, precision_list=plist)
