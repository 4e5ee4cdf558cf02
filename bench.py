#!/usr/bin/env python3
"""Benchmark harness.

Measures on the current default JAX platform (TPU under the driver):
- piano-roll sampling throughput (samples/sec/chip) through the full jitted
  generator pipeline (feature encoder + generator)
- WGAN-GP training throughput in reference-equivalent batch-steps/sec
  (one fused group step = critic_iters batches + 1 G update)
- p50 end-to-end MIDI generation latency (prompt → .mid bytes)

Baseline: the same sampling pipeline on one CPU host core set
(`--cpu-baseline` subprocess), matching the BASELINE.json target definition
(≥10× CPU sampling throughput; ≥5× train steps/sec).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _bench_sampling(sampler, batch: int, iters: int, warmup: int = 2, repeats: int = 1):
    """Returns a list of ``repeats`` samples/sec measurements (fixed work per
    repeat: ``iters`` dispatches of ``batch``), all on one warm trace."""
    import jax
    import jax.numpy as jnp

    idx = jnp.zeros((batch,), jnp.int32)
    step = sampler._step
    for i in range(warmup):
        jax.block_until_ready(
            step(sampler.gen_variables, sampler.fe_variables, jax.random.PRNGKey(i), idx, batch=batch)
        )
    rates = []
    for r in range(repeats):
        t0 = time.perf_counter()
        for i in range(iters):
            out = step(
                sampler.gen_variables, sampler.fe_variables,
                jax.random.PRNGKey(100 + r * iters + i), idx, batch=batch,
            )
        jax.block_until_ready(out)
        rates.append(batch * iters / (time.perf_counter() - t0))
    return rates


def _bench_train(iters: int = 20, warmup: int = 2, pallas: str = "off",
                 epochs_per_dispatch: int = 0, precision=None, repeats: int = 1,
                 groups: int = 5, mesh=None):
    """Returns (list of ``repeats`` batch-steps/sec measurements, ANALYTIC
    FLOPs per reference batch-step — conventional fwd/bwd=3× factors, ±15%;
    XLA cost_analysis is unusable here, see utils/flops.py).

    ``mesh``: optional ``jax.sharding.Mesh`` with a 'data' axis — the fused
    program then runs SPMD data-parallel, exactly as ``melogan train-gan
    --dp N`` does (corpus replicated, microbatches sharded; gan_loop.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from melogan_tpu.config import EDConfig, GANConfig
    from melogan_tpu.ops import conv as conv_ops
    from melogan_tpu.train import gan_step

    conv_ops.set_use_pallas(pallas)

    cfg = GANConfig()  # reference shapes: batch 32, 512×4 notes
    # per-precision dispatch policy (fused critic batch 1.44x at f32,
    # slower under bf16 — measured, scripts/mfu_breakdown.py)
    cfg = gan_step.precision_tuned_cfg(cfg, precision)
    models = gan_step.build_models(cfg, EDConfig())
    state = gan_step.init_state(cfg, models, seed=0)
    steps = gan_step.make_train_steps(cfg, models, mesh=mesh)

    rng = np.random.default_rng(0)
    # headline granularity = the real loop's: gan_loop dispatches ONE fused
    # multi-epoch program per save_freq(=5) epochs, sending only (E, G, K, B)
    # gather indices. Secondary variants (Pallas comparison, CPU baseline) use
    # the 1-epoch indexed program (epochs_per_dispatch=1): same math, smaller
    # compile, and an unchanged persistent-cache entry.
    e = epochs_per_dispatch or cfg.save_freq
    # g=5 groups/epoch matches the reference epoch (897 rows); the CPU
    # baseline shrinks g — steps/sec is normalized by e·g·k so the metric
    # definition is unchanged, only the per-dispatch measurement work
    g, k, b = groups, cfg.critic_iters, cfg.batch_size
    n = g * k * b
    data = (
        jnp.asarray(rng.normal(size=(n, cfg.max_notes, cfg.note_dim)), jnp.float32),
        jnp.asarray(rng.integers(0, 4, size=(n,)), jnp.int32),
        jnp.asarray(rng.normal(size=(n, cfg.latent_dim)), jnp.float32),
        jnp.asarray(rng.normal(size=(n, cfg.numeric_input_dim)), jnp.float32),
    )
    if mesh is not None:
        from melogan_tpu.parallel.mesh import put_replicated

        data = put_replicated(data, mesh)
    from melogan_tpu.train.harness import jit_with_precision

    if e == 1:
        indexed = jit_with_precision(steps.indexed, precision)
        idx = jnp.asarray(rng.permutation(n).reshape(g, k, b), jnp.int32)
        jitted, jit_args = indexed, (data, idx)
    else:
        run_step = jit_with_precision(steps.run, precision)
        idx = jnp.asarray(
            np.stack([rng.permutation(n).reshape(g, k, b) for _ in range(e)]), jnp.int32
        )
        jitted, jit_args = run_step, (data, idx)
    step = lambda st: jitted(st, *jit_args)
    for _ in range(warmup):
        state, metrics = step(state)
    jax.block_until_ready(metrics)
    # analytic FLOPs per reference batch-step (critic+GP+amortized G update).
    # XLA cost_analysis is NOT usable here: it counts lax.scan bodies once,
    # not × trip count, undercounting the fused program ~100×.
    from melogan_tpu.utils.flops import train_flops_per_step

    flops_per_step = train_flops_per_step(cfg, EDConfig())
    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state)
        jax.block_until_ready(metrics)
        # one dispatch = e epochs × g groups × critic_iters reference batch-steps
        rates.append(iters * e * g * k / (time.perf_counter() - t0))
    return rates, flops_per_step


def _bench_latency(sampler, n: int = 20):
    """Direct-dispatch path: one device round trip per request (batch 1)."""
    from melogan_tpu.midi.codec import render_to_bytes
    from melogan_tpu.sampling import EMOTION_BPM, emotion_scale

    lat = []
    for i in range(n):
        t0 = time.perf_counter()
        notes = sampler.sample_notes(["happy"], seed=i)[0]
        _ = render_to_bytes(notes, bpm=EMOTION_BPM["happy"], scale=emotion_scale("happy"))
        lat.append(time.perf_counter() - t0)
    lat.sort()
    return lat[len(lat) // 2]


def _bench_latency_pooled(sampler, n: int = 100):
    """Production serving path: /generate pops a pre-generated sample from
    the batched prefetch pool — no device dispatch on the request path."""
    from melogan_tpu.midi.codec import render_to_bytes
    from melogan_tpu.sampling import EMOTION_BPM, emotion_scale
    from melogan_tpu.serving.pool import SamplePool

    emotions = ["happy", "sad", "angry", "calm"]
    pool = SamplePool(sampler, target=64, refill_batch=512)
    try:
        pool.prefill(timeout=300)
        lat = []
        for i in range(n):
            e = emotions[i % 4]
            t0 = time.perf_counter()
            notes = pool.take(e)
            _ = render_to_bytes(notes, bpm=EMOTION_BPM[e], scale=emotion_scale(e))
            lat.append(time.perf_counter() - t0)
        lat.sort()
        return {
            "p50": lat[len(lat) // 2],
            "p90": lat[int(len(lat) * 0.9)],
            "p99": lat[min(len(lat) - 1, int(len(lat) * 0.99))],
        }
    finally:
        pool.close()


def run(cpu_baseline: bool = False):
    import jax

    if cpu_baseline:
        # NO persistent cache for the baseline: cached XLA:CPU AOT code may
        # have been compiled for a different host's machine features and run
        # denatured here (observed: 40% run-to-run drift from cache-hit vs
        # fresh-compile codegen). Fresh host-native compiles every run.
        jax.config.update("jax_platforms", "cpu")
    else:
        # persistent compile cache: first driver run pays ~minutes of XLA
        # compile for the second-order WGAN-GP program; later runs are instant
        cache_dir = os.path.join(REPO, ".jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from melogan_tpu.config import GANConfig
    from melogan_tpu.ops import conv as conv_ops
    from melogan_tpu.sampling import Sampler

    # baseline numbers are the XLA dispatch path; the Pallas variant is
    # measured separately below (fresh trace per mode)
    conv_ops.set_use_pallas("off")
    sampler = Sampler(GANConfig(), seed=0)
    if cpu_baseline:
        # pinned methodology (VERDICT-r2 #6): fixed work per repeat, ≥3
        # repeats. The estimator is MAX-of-N — the machine's capability with
        # the least interference from the shared 1-core host (medians still
        # drifted ~25% run-to-run from background load; the max is stable
        # when any one repeat runs clean). Spread is reported as the error
        # bar (r1 vs r2 drifted 2× silently with single-shot timing).
        def agg(rates):
            rates = sorted(rates)
            best = rates[-1]
            spread = (rates[-1] - rates[0]) / best * 100 if best else None
            return best, spread

        s_best, s_spread = agg(_bench_sampling(sampler, batch=64, iters=50, repeats=3))
        t_rates, _ = _bench_train(iters=1, warmup=1, epochs_per_dispatch=1, repeats=3,
                                  groups=2)
        t_best, t_spread = agg(t_rates)
        result = {
            "samples_per_sec": s_best,
            "samples_spread_pct": round(s_spread, 1),
            "train_steps_per_sec": t_best,
            "train_spread_pct": round(t_spread, 1),
        }
        print("CPU_BASELINE " + json.dumps(result))
        return result

    # batch 65536: dispatch overhead amortizes with batch (sweep: 36.9k/s
    # @128 -> 449k/s @32768 -> 474k/s @65536; 131072 exceeds compile limits);
    # ~138 ms/batch at the optimum
    samples_per_sec = _bench_sampling(sampler, batch=65536, iters=5)[0]
    train_steps, train_flops_per_step = _bench_train(iters=15)
    train_steps = train_steps[0]
    p50_direct = _bench_latency(sampler)
    pool_lat = _bench_latency_pooled(sampler)  # the serving request path

    # Pallas-dispatch variants: fresh Sampler per mode (the conv mode is read
    # at trace time), guarded so a Mosaic compile stall can't sink the bench
    # apples-to-apples dispatch comparison at batch 8192 (the kernels'
    # validated regime; the headline batch 65536 exceeds the fused kernel's
    # compile envelope)
    xla_samples_8k = _bench_sampling(sampler, batch=8192, iters=5)[0]
    pallas_samples = pallas_train = None
    if os.environ.get("MELOGAN_BENCH_PALLAS", "1") != "0":
        try:
            conv_ops.set_use_pallas("on")
            pallas_sampler = Sampler(GANConfig(), seed=0)
            pallas_samples = _bench_sampling(pallas_sampler, batch=8192, iters=5)[0]
        except Exception as e:  # noqa: BLE001
            print(f"[bench] pallas sampling variant failed: {e}", file=sys.stderr)
        try:
            # 1-epoch granularity on both sides of the Pallas-vs-XLA
            # comparison (xla_train_steps_per_sec_1ep below)
            pallas_train = _bench_train(iters=15, pallas="on", epochs_per_dispatch=1)[0][0]
        except Exception as e:  # noqa: BLE001
            print(f"[bench] pallas train variant failed: {e}", file=sys.stderr)
        finally:
            conv_ops.set_use_pallas("off")

    # fast-math variant: bf16 MXU passes for pure inference throughput
    # (the headline number stays f32 — deterministic bytes)
    fast_samples = None
    try:
        fast_sampler = Sampler(GANConfig(), seed=0, fast_math=True)
        fast_samples = _bench_sampling(fast_sampler, batch=65536, iters=5)[0]
    except Exception as e:  # noqa: BLE001
        print(f"[bench] fast-math sampling failed: {e}", file=sys.stderr)

    # mixed-precision training variant (`melogan train-gan --bf16`): same
    # fused multi-epoch program traced with bf16 MXU passes; headline train
    # number stays HIGHEST (torch-parity numerics)
    bf16_train = None
    try:
        bf16_train = _bench_train(iters=15, precision="bf16")[0][0]
    except Exception as e:  # noqa: BLE001
        print(f"[bench] bf16 train variant failed: {e}", file=sys.stderr)

    # Multi-chip data-parallel variants: auto-activate when the runtime
    # exposes >1 device (this image tunnels ONE v5e chip, so these stay None
    # today — the bench is already multi-chip-ready if the driver's hardware
    # grows). Same SPMD programs as `melogan sample/serve/train-gan --dp N`,
    # validated on the virtual 8-CPU mesh (tests/test_bench.py) and at full
    # reference shapes by dryrun_multichip.
    n_devices = len(jax.devices())
    dp_samples = dp_train = None
    if n_devices > 1:
        try:
            from melogan_tpu.parallel.mesh import make_mesh

            mesh = make_mesh()
            dp_sampler = Sampler(GANConfig(), seed=0, mesh=mesh)
            dp_samples = _bench_sampling(dp_sampler, batch=65536, iters=5)[0]
            dp_train = _bench_train(iters=15, mesh=mesh)[0][0]
        except Exception as e:  # noqa: BLE001
            print(f"[bench] dp variants failed: {e}", file=sys.stderr)

    # CPU baseline in a subprocess (fresh backend)
    cpu = {"samples_per_sec": None, "train_steps_per_sec": None}
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-baseline"],
            capture_output=True,
            text=True,
            timeout=2100,
            cwd=REPO,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("CPU_BASELINE "):
                cpu = json.loads(line[len("CPU_BASELINE "):])
    except Exception as e:  # noqa: BLE001
        print(f"[bench] cpu baseline failed: {e}", file=sys.stderr)

    # headline = best f32 path; sampling variants are measured at different
    # batches (pallas at 8k) so the headline is the optimal-batch XLA number.
    # train headline is the multi-epoch program (the real loop's granularity);
    # the pallas train variant is a 1-epoch-granularity comparison only.
    best_samples = samples_per_sec
    best_train = train_steps
    vs_baseline = (
        best_samples / cpu["samples_per_sec"] if cpu.get("samples_per_sec") else None
    )

    # MFU / roofline accounting (VERDICT-r2 #2): analytic FLOPs throughout —
    # sampling cross-checked vs XLA cost analysis to 0.05% (tests/test_flops
    # .py); the train figure uses conventional fwd/bwd=3× factors (read its
    # MFU as ±15% — XLA cost_analysis counts lax.scan bodies once, not × trip
    # count, so it cannot price the fused program). Percent-of-peak is
    # against the chip's published bf16 matmul peak (f32 runs through the
    # same MXU via multi-pass, so this is conservative)
    from melogan_tpu.utils.flops import chip_peak_bf16_tflops, sampling_flops_per_sample

    fps = sampling_flops_per_sample(GANConfig())
    device_kind = jax.devices()[0].device_kind
    peak = chip_peak_bf16_tflops(device_kind)

    def tflops(rate, per_unit):
        return rate * per_unit / 1e12 if (rate and per_unit) else None

    def pct_peak(tf):
        return round(tf / peak * 100, 2) if (tf and peak) else None

    sampling_tf = tflops(best_samples, fps)
    bf16_sampling_tf = tflops(fast_samples, fps)
    train_tf = tflops(best_train, train_flops_per_step)
    bf16_train_tf = tflops(bf16_train, train_flops_per_step)

    out = {
        "metric": "piano_roll_samples_per_sec_per_chip",
        "value": round(best_samples, 2),
        "unit": "samples/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        # The multiplier inherits the CPU baseline's run-to-run spread
        # (max-of-3 estimator): read vs_baseline as value ± spread_pct
        # (VERDICT-r4 weak #7 — the error bar now rides with the headline).
        "vs_baseline_spread_pct": cpu.get("samples_spread_pct"),
        "train_steps_per_sec": round(best_train, 3),
        "train_steps_vs_cpu": (
            round(best_train / cpu["train_steps_per_sec"], 2)
            if cpu.get("train_steps_per_sec")
            else None
        ),
        "train_steps_vs_cpu_spread_pct": cpu.get("train_spread_pct"),
        "p50_midi_gen_latency_ms": round(pool_lat["p50"] * 1000, 2),
        "p90_midi_gen_latency_ms": round(pool_lat["p90"] * 1000, 2),
        "p99_midi_gen_latency_ms": round(pool_lat["p99"] * 1000, 2),
        "p50_direct_dispatch_ms": round(p50_direct * 1000, 2),
        "xla_samples_per_sec": round(samples_per_sec, 2),
        "xla_samples_per_sec_8k": round(xla_samples_8k, 2),
        "pallas_samples_per_sec_8k": round(pallas_samples, 2) if pallas_samples else None,
        "xla_train_steps_per_sec": round(train_steps, 3),
        "pallas_train_steps_per_sec_1ep": round(pallas_train, 3) if pallas_train else None,
        "bf16_samples_per_sec": round(fast_samples, 2) if fast_samples else None,
        "bf16_train_steps_per_sec": round(bf16_train, 3) if bf16_train else None,
        "cpu_samples_per_sec": round(cpu["samples_per_sec"], 2) if cpu.get("samples_per_sec") else None,
        "cpu_samples_spread_pct": cpu.get("samples_spread_pct"),
        "cpu_train_spread_pct": cpu.get("train_spread_pct"),
        # multi-chip dp (None on single-chip hardware; see the dp section)
        "n_devices": n_devices,
        "dp_samples_per_sec": round(dp_samples, 2) if dp_samples else None,
        "dp_train_steps_per_sec": round(dp_train, 3) if dp_train else None,
        "dp_sampling_scaling": (
            round(dp_samples / samples_per_sec, 2) if dp_samples else None
        ),
        # roofline / MFU
        "chip": device_kind,
        "chip_peak_bf16_tflops": peak,
        "flops_per_sample": fps,
        "train_flops_per_step": round(train_flops_per_step) if train_flops_per_step else None,
        "sampling_tflops": round(sampling_tf, 2) if sampling_tf else None,
        "sampling_pct_bf16_peak": pct_peak(sampling_tf),
        "bf16_sampling_tflops": round(bf16_sampling_tf, 2) if bf16_sampling_tf else None,
        "bf16_sampling_pct_bf16_peak": pct_peak(bf16_sampling_tf),
        "train_tflops": round(train_tf, 2) if train_tf else None,
        "train_pct_bf16_peak": pct_peak(train_tf),
        "bf16_train_tflops": round(bf16_train_tf, 2) if bf16_train_tf else None,
        "bf16_train_pct_bf16_peak": pct_peak(bf16_train_tf),
    }
    print(json.dumps(out))
    return out


def wait_for_device(max_wait: float = 1800.0, probe_timeout: float = 240.0) -> bool:
    """Bounded device-availability gate for the main (TPU) bench path.

    A wedged TPU tunnel makes the first device access hang FOREVER with no
    error; without this gate an outage turns the bench into a silent hang
    that eats the whole driver budget and records nothing. Probes
    `jax.devices()` in a subprocess (so a hung probe is killable without
    poisoning this process), retrying until ``max_wait`` — the tunnel
    usually self-recovers in ~10 min. Killing a hung TPU client can itself
    re-wedge the device for ~10 min, so the retry cadence (probe_timeout +
    600 s sleep) is chosen to clear that window — a transient wedge recovers
    between probes instead of being re-wedged by them. Returns True when the
    device answers; on exhaustion prints an explicit error JSON line and
    returns False."""
    deadline = time.time() + max_wait
    attempt = 0
    outcomes = []
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout, capture_output=True,
            )
            if r.returncode == 0:
                return True
            tail = r.stderr.decode("utf-8", "replace").strip().splitlines()[-1:] or ["?"]
            outcomes.append(f"errored ({tail[0][:160]})")
        except subprocess.TimeoutExpired:
            outcomes.append(f"hung >{probe_timeout:.0f}s")
        remaining = deadline - time.time()
        if remaining <= 0:
            print(json.dumps({
                "metric": "piano_roll_samples_per_sec_per_chip", "value": None,
                "unit": "samples/s", "vs_baseline": None,
                "error": f"device backend unavailable over {max_wait:.0f}s; "
                         f"probes: {outcomes}",
            }))
            return False
        print(f"[bench] device probe {attempt} {outcomes[-1]}; retrying "
              f"({remaining:.0f}s left before giving up)", file=sys.stderr)
        # sleep past the re-wedge window a killed hung probe may have caused
        time.sleep(min(600.0, max(0.0, remaining)))


def main():
    cpu_child = "--cpu-baseline" in sys.argv
    if not cpu_child:  # CPU init can't hang this way; only gate the device path
        try:
            max_wait = float(os.environ.get("MELOGAN_BENCH_DEVICE_WAIT", "1800"))
        except ValueError:  # '' / 'off' — a diagnostics knob must not crash bench
            max_wait = 1800.0
        # 0 disables the gate entirely (run immediately, accepting a possible hang)
        if max_wait > 0 and not wait_for_device(max_wait=max_wait):
            sys.exit(1)
    run(cpu_baseline=cpu_child)


if __name__ == "__main__":
    main()
