"""MFU accounting: analytic FLOP counts vs XLA's own cost analysis."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from melogan_tpu.config import GANConfig
from melogan_tpu.utils.flops import (
    chip_peak_bf16_tflops,
    critic_flops,
    program_flops,
    sampling_flops_per_sample,
)


def test_sampling_flops_match_xla_cost_analysis():
    """Matmul-only analytic count must sit just under the compiled program's
    own count (XLA additionally counts elementwise/BN/RNG flops)."""
    cfg = GANConfig(max_notes=64, noise_dim=16, latent_dim=8, gen_hidden=32)
    from melogan_tpu.sampling import Sampler

    sampler = Sampler(cfg, seed=0)
    batch = 128
    idx = jnp.zeros((batch,), jnp.int32)
    compiled = sampler._step.lower(
        sampler.gen_variables, sampler.fe_variables, jax.random.PRNGKey(0), idx, batch=batch
    ).compile()
    xla_total = program_flops(compiled)
    if xla_total is None:
        pytest.skip("backend exposes no cost analysis")
    analytic = sampling_flops_per_sample(cfg)
    xla_per_sample = xla_total / batch
    # two small opposing deltas: XLA additionally counts elementwise ops;
    # the analytic conv count ignores boundary-tap trimming (only visible at
    # tiny lengths). Both are <5% at any tested shape (0.05% at production).
    assert abs(analytic / xla_per_sample - 1) < 0.05, (analytic, xla_per_sample)


def test_full_config_sampling_flops_value():
    """The production config's per-sample cost is the documented ~49.4 MFLOPs
    (docs/performance.md roofline paragraph; VERDICT-r2 estimated ~49M)."""
    assert sampling_flops_per_sample(GANConfig()) == 49_384_448


def test_critic_flops_match_xla_cost_analysis(rng):
    cfg = GANConfig()
    from melogan_tpu.train import gan_step
    from melogan_tpu.config import EDConfig

    models = gan_step.build_models(cfg, EDConfig())
    critic = models.critic
    variables = critic.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.max_notes, cfg.note_dim)),
        jnp.zeros((1, cfg.encoder_out_dim)),
    )
    batch = 64
    notes = jnp.asarray(rng.normal(size=(batch, cfg.max_notes, cfg.note_dim)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(batch, cfg.encoder_out_dim)), jnp.float32)
    fwd = jax.jit(lambda v, n, e: critic.apply(v, n, e))
    xla_total = program_flops(fwd.lower(variables, notes, emb).compile())
    if xla_total is None:
        pytest.skip("backend exposes no cost analysis")
    analytic = critic_flops(cfg)
    xla_per_sample = xla_total / batch
    assert abs(analytic / xla_per_sample - 1) < 0.05, (analytic, xla_per_sample)


def test_chip_peak_lookup():
    assert chip_peak_bf16_tflops("TPU v5 lite") == 197.0
    assert chip_peak_bf16_tflops("TPU v4") == 275.0
    assert chip_peak_bf16_tflops("TPU v6 lite") == 918.0
    assert chip_peak_bf16_tflops("cpu") is None


def test_ed_flops_match_xla_cost_analysis(rng):
    from melogan_tpu.config import EDConfig
    from melogan_tpu.models.ed import EmotionDiscriminator
    from melogan_tpu.utils.flops import ed_flops

    ed_cfg = EDConfig()
    ed = EmotionDiscriminator.from_config(ed_cfg)
    variables = ed.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 4)), train=False)
    batch = 16
    notes = jnp.asarray(rng.normal(size=(batch, 512, 4)), jnp.float32)
    fwd = jax.jit(lambda v, n: ed.apply(v, n, train=False))
    xla_total = program_flops(fwd.lower(variables, notes).compile())
    if xla_total is None:
        pytest.skip("backend exposes no cost analysis")
    analytic = ed_flops(ed_cfg)
    # ED interleaves erf-GELU + BN over every (512, ch) map; XLA prices those
    # transcendentals (~7% here) while the analytic count is matmul/conv-only
    xla_per_sample = xla_total / batch
    assert 0.85 < analytic / xla_per_sample <= 1.001, (analytic, xla_per_sample)


def test_train_flops_per_step_scales_sensibly():
    from melogan_tpu.config import EDConfig
    from melogan_tpu.utils.flops import train_flops_per_step

    base = train_flops_per_step(GANConfig(), EDConfig())
    assert base > 10e9  # tens of GFLOPs at reference shapes
    double_b = train_flops_per_step(GANConfig(batch_size=64), EDConfig())
    assert abs(double_b / base - 2) < 1e-6  # linear in batch
