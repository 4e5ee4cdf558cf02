"""Model-layer tests: shapes, and numerical parity of the torch-semantics
layers (conv, transposed conv, batch-norm, GELU) against torch CPU."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from melogan_tpu.config import AEConfig, EDConfig, GANConfig
from melogan_tpu.models import (
    VAE,
    Critic,
    EmotionDiscriminator,
    FeatureEncoder,
    Generator,
)
from melogan_tpu.models.layers import (
    Conv1d,
    ConvTranspose1d,
    TorchBatchNorm,
    gelu_exact,
)

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# Layer numerics vs torch
# ---------------------------------------------------------------------------


def test_conv1d_matches_torch(rng):
    x = rng.normal(size=(2, 512, 4)).astype(np.float32)
    w = rng.normal(size=(5, 4, 32)).astype(np.float32) * 0.1  # HIO
    b = rng.normal(size=(32,)).astype(np.float32)

    mod = Conv1d(features=32, kernel_size=5, stride=2, padding=2)
    params = {"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}
    y = mod.apply(params, jnp.asarray(x))
    assert y.shape == (2, 256, 32)

    # torch: (B, C, L) layout, weight (out, in, k)
    tw = torch.tensor(np.transpose(w, (2, 1, 0)))
    ty = torch.nn.functional.conv1d(
        torch.tensor(np.transpose(x, (0, 2, 1))), tw, torch.tensor(b), stride=2, padding=2
    )
    np.testing.assert_allclose(
        np.asarray(y), np.transpose(ty.numpy(), (0, 2, 1)), atol=2e-4
    )


def test_conv_transpose1d_matches_torch(rng):
    x = rng.normal(size=(2, 64, 256)).astype(np.float32)
    w = rng.normal(size=(5, 256, 128)).astype(np.float32) * 0.05  # HIO
    b = rng.normal(size=(128,)).astype(np.float32)

    mod = ConvTranspose1d(features=128, kernel_size=5, stride=2, padding=2, output_padding=1)
    params = {"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}
    y = mod.apply(params, jnp.asarray(x))
    assert y.shape == (2, 128, 128)

    # torch convT weight layout: (in, out, k)
    tw = torch.tensor(np.transpose(w, (1, 2, 0)))
    ty = torch.nn.functional.conv_transpose1d(
        torch.tensor(np.transpose(x, (0, 2, 1))),
        tw,
        torch.tensor(b),
        stride=2,
        padding=2,
        output_padding=1,
    )
    np.testing.assert_allclose(
        np.asarray(y), np.transpose(ty.numpy(), (0, 2, 1)), atol=2e-3
    )


def test_batchnorm_matches_torch(rng):
    x = rng.normal(size=(8, 100, 32)).astype(np.float32) * 3 + 1
    mod = TorchBatchNorm()
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), use_running_average=False)

    tbn = torch.nn.BatchNorm1d(32)
    tx = torch.tensor(np.transpose(x, (0, 2, 1)))

    # two train steps, then eval: running stats must match torch exactly
    for _ in range(2):
        y, mutated = mod.apply(
            variables, jnp.asarray(x), use_running_average=False, mutable=["batch_stats"]
        )
        variables = {"params": variables["params"], **mutated}
        ty = tbn(tx)
    np.testing.assert_allclose(
        np.asarray(y), np.transpose(ty.detach().numpy(), (0, 2, 1)), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]),
        tbn.running_mean.numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]),
        tbn.running_var.numpy(),
        rtol=1e-5,
    )

    tbn.eval()
    y_eval = mod.apply(variables, jnp.asarray(x), use_running_average=True)
    ty_eval = tbn(tx)
    np.testing.assert_allclose(
        np.asarray(y_eval), np.transpose(ty_eval.detach().numpy(), (0, 2, 1)), atol=1e-4
    )


def test_gelu_exact_matches_torch(rng):
    x = rng.normal(size=(64,)).astype(np.float32) * 3
    expected = torch.nn.functional.gelu(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(gelu_exact(jnp.asarray(x))), expected, atol=1e-5)


# ---------------------------------------------------------------------------
# Model shapes (reference architecture contract)
# ---------------------------------------------------------------------------


def test_vae_shapes():
    cfg = AEConfig()
    model = VAE.from_config(cfg)
    x = jnp.zeros((2, 512, 4))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)}, x
    )
    recon, z, mu, log_var = model.apply(
        variables, x, train=True,
        rngs={"reparam": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )[0]
    assert recon.shape == (2, 512, 4)
    assert z.shape == mu.shape == log_var.shape == (2, 8)
    # eval path is deterministic (z == mu)
    recon2, z2, mu2, _ = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(z2), np.asarray(mu2))


def test_generator_critic_shapes():
    cfg = GANConfig()
    gen = Generator.from_config(cfg)
    critic = Critic.from_config(cfg)
    fe = FeatureEncoder.from_config(cfg)

    noise = jnp.zeros((3, cfg.noise_dim))
    numeric = jnp.zeros((3, cfg.numeric_input_dim))

    fe_vars = fe.init(jax.random.PRNGKey(0), numeric)
    emb = fe.apply(fe_vars, numeric, train=False)
    assert emb.shape == (3, cfg.encoder_out_dim)

    gen_vars = gen.init(jax.random.PRNGKey(1), noise, None, emb)
    (notes, latent), _ = gen.apply(
        gen_vars, noise, None, emb, train=True, mutable=["batch_stats"]
    )
    assert notes.shape == (3, 512, 4)
    assert latent.shape == (3, cfg.latent_dim)

    critic_vars = critic.init(jax.random.PRNGKey(2), notes, emb)
    score = critic.apply(critic_vars, notes, emb)
    assert score.shape == (3,)


def test_generator_conditioning_mode():
    cfg = GANConfig(integration_mode="conditioning")
    gen = Generator.from_config(cfg)
    noise = jnp.zeros((2, cfg.noise_dim))
    emb = jnp.zeros((2, cfg.encoder_out_dim))
    latent_in = jnp.zeros((2, cfg.latent_dim))
    gen_vars = gen.init(jax.random.PRNGKey(0), noise, latent_in, emb)
    (notes, _), _ = gen.apply(
        gen_vars, noise, latent_in, emb, train=True, mutable=["batch_stats"]
    )
    assert notes.shape == (2, 512, 4)


def test_ed_shapes():
    cfg = EDConfig()
    model = EmotionDiscriminator.from_config(cfg)
    x = jnp.zeros((5, 512, 4))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert logits.shape == (5, 4)

    latent_model = EmotionDiscriminator(input_mode="latent", latent_dim=128)
    lx = jnp.zeros((5, 128))
    lvars = latent_model.init(jax.random.PRNGKey(0), lx)
    logits = latent_model.apply(lvars, lx, train=False)
    assert logits.shape == (5, 4)


def test_gan_init_statistics():
    """All GAN weights drawn from N(0, 0.02), biases zero (weights_init parity)."""
    cfg = GANConfig()
    gen = Generator.from_config(cfg)
    noise = jnp.zeros((2, cfg.noise_dim))
    emb = jnp.zeros((2, cfg.encoder_out_dim))
    variables = gen.init(jax.random.PRNGKey(0), noise, None, emb)
    leaves = jax.tree_util.tree_leaves_with_path(variables["params"])
    for path, leaf in leaves:
        name = jax.tree_util.keystr(path)
        if "kernel" in name:
            assert abs(float(jnp.std(leaf)) - 0.02) < 0.005, name
        elif "bias" in name:
            assert float(jnp.abs(leaf).max()) == 0.0, name


def test_spectral_norm_bounds_singular_value(rng):
    from melogan_tpu.models.layers import SpectralNormLinear

    x = jnp.asarray(rng.normal(size=(4, 32)), jnp.float32)
    mod = SpectralNormLinear(features=16)
    variables = mod.init(jax.random.PRNGKey(0), x)
    # scale up the kernel so normalization has something to do
    variables = {
        "params": {
            "kernel": variables["params"]["kernel"] * 25.0,
            "bias": variables["params"]["bias"],
        },
        "spectral": variables["spectral"],
    }
    for _ in range(30):  # power iteration converges
        y, mut = mod.apply(variables, x, update_stats=True, mutable=["spectral"])
        variables = {"params": variables["params"], **mut}
    # effective weight = kernel / sigma must have top singular value ~1
    kernel = np.asarray(variables["params"]["kernel"])
    u = np.asarray(variables["spectral"]["u"])
    v = kernel @ u
    v /= np.linalg.norm(v)
    u2 = kernel.T @ v
    sigma = float(v @ (kernel @ (u2 / np.linalg.norm(u2))))
    top_sv = np.linalg.svd(kernel / sigma, compute_uv=False)[0]
    np.testing.assert_allclose(top_sv, 1.0, atol=1e-3)


def test_default_precision_is_thread_local():
    """Concurrent traces (pipeline precompile threads vs the AE train, pool
    refill threads under --fast-math) must not see each other's precision
    set/reset: one thread's finally-reset flipping a shared global mid-trace
    in another produced mixed-precision programs."""
    import threading

    from melogan_tpu.models.layers import default_precision, set_default_precision

    prev = default_precision()
    set_default_precision(jax.lax.Precision.HIGHEST)
    seen = {}

    def worker():
        seen["initial"] = default_precision()  # fresh thread: the default
        set_default_precision(jax.lax.Precision.DEFAULT)
        seen["after_set"] = default_precision()

    try:
        t = threading.Thread(target=worker)
        t.start()
        t.join()
        assert seen["initial"] == jax.lax.Precision.HIGHEST
        assert seen["after_set"] == jax.lax.Precision.DEFAULT
        # the worker's set must not leak into this thread
        assert default_precision() == jax.lax.Precision.HIGHEST
    finally:
        set_default_precision(prev)
