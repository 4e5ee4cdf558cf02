"""Conv1D VAE over (B, MAX_NOTES, 4) note tensors.

Capability parity with the reference VAE (src/ae/model.py): a 3-layer strided
conv encoder (4→32→64→128, k5 s2 p2, BN+ReLU), a linear head to a 512-d hidden
state, fc_mu / fc_log_var to an 8-d latent, and a mirrored transposed-conv
decoder with a final tanh. The reference builds its flatten→linear lazily on
the first forward (src/ae/model.py:27-36); here the flatten width is computed
statically from ``max_notes`` (three stride-2 convs ⇒ L/8 × 128 channels).

The whole model is one XLA program; batch-norm state lives in ``batch_stats``.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from melogan_tpu.config import AEConfig
from melogan_tpu.models.layers import (
    Conv1d,
    ConvTranspose1d,
    TorchBatchNorm,
    TorchLinear,
    trim_or_pad_length,
)


class ConvEncoder(nn.Module):
    """(B, L, 4) → (B, hidden_dim) hidden state."""

    hidden_dim: int = 512
    channels: Tuple[int, ...] = (32, 64, 128)

    @nn.compact
    def __call__(self, x, train: bool = True):
        for ch in self.channels:
            x = Conv1d(features=ch, kernel_size=5, stride=2, padding=2)(x)
            x = TorchBatchNorm()(x, use_running_average=not train)
            x = jax.nn.relu(x)
        # flatten in torch (B, C, L) order so converted checkpoints line up
        b = x.shape[0]
        x = jnp.transpose(x, (0, 2, 1)).reshape(b, -1)
        x = TorchLinear(features=self.hidden_dim)(x)
        return jax.nn.relu(x)


class ConvDecoder(nn.Module):
    """(B, latent) → (B, max_notes, 4) reconstruction in [−1, 1]."""

    max_notes: int = 512
    latent_dim: int = 8
    hidden_dim: int = 512
    out_channels: int = 4

    @nn.compact
    def __call__(self, z, train: bool = True):
        reduced_len = max(1, self.max_notes // 8)
        y = TorchLinear(features=self.hidden_dim)(z)
        y = jax.nn.relu(y)
        y = TorchLinear(features=128 * reduced_len)(y)
        y = jax.nn.relu(y)
        # torch reshapes to (B, 128, reduced_len); our layout is (B, L, C)
        y = y.reshape(y.shape[0], 128, reduced_len)
        y = jnp.transpose(y, (0, 2, 1))

        y = ConvTranspose1d(features=64, kernel_size=5, stride=2, padding=2, output_padding=1)(y)
        y = TorchBatchNorm()(y, use_running_average=not train)
        y = jax.nn.relu(y)
        y = ConvTranspose1d(features=32, kernel_size=5, stride=2, padding=2, output_padding=1)(y)
        y = TorchBatchNorm()(y, use_running_average=not train)
        y = jax.nn.relu(y)
        y = ConvTranspose1d(
            features=self.out_channels, kernel_size=5, stride=2, padding=2, output_padding=1
        )(y)
        y = jnp.tanh(y)
        return trim_or_pad_length(y, self.max_notes)


class VAE(nn.Module):
    """Variational autoencoder; returns (recon, z, mu, log_var)."""

    max_notes: int = 512
    latent_dim: int = 8
    hidden_dim: int = 512

    def setup(self):
        self.encoder = ConvEncoder(hidden_dim=self.hidden_dim)
        self.fc_mu = TorchLinear(features=self.latent_dim)
        self.fc_log_var = TorchLinear(features=self.latent_dim)
        self.decoder = ConvDecoder(
            max_notes=self.max_notes,
            latent_dim=self.latent_dim,
            hidden_dim=self.hidden_dim,
        )

    def __call__(self, x, train: bool = True):
        h = self.encoder(x, train=train)
        mu = self.fc_mu(h)
        log_var = self.fc_log_var(h)
        if train:
            eps = jax.random.normal(self.make_rng("reparam"), mu.shape)
        else:
            eps = jnp.zeros_like(mu)
        z = mu + eps * jnp.exp(0.5 * log_var)
        recon = self.decoder(z, train=train)
        return recon, z, mu, log_var

    def encode_mu(self, x):
        """Deterministic µ embedding (eval mode) — the latent-export path
        (reference src/ae/encode.py:125-134 exports mu, not z)."""
        h = self.encoder(x, train=False)
        return self.fc_mu(h)

    @classmethod
    def from_config(cls, cfg: AEConfig) -> "VAE":
        return cls(max_notes=cfg.max_notes, latent_dim=cfg.latent_dim, hidden_dim=cfg.hidden_dim)


def vae_loss(recon, x, mu, log_var, beta: float, free_bits: float = 0.0,
             capacity=None):
    """MSE + β·KLD (reference src/ae/train_ae.py:35-51 semantics), with two
    optional anti-collapse knobs that default to the exact reference loss.

    Both reference terms are means over *all* elements (the reference KLD is
    ``-0.5·mean(1 + logσ² − µ² − σ²)``, not a per-sample sum). At β=10 on a
    corpus the decoder can reconstruct unconditionally this drives full
    posterior collapse (every µ dim std < 0.1 — the failure the reference's
    own diagnose.py:66-80 checks for). The knobs:

    - ``free_bits`` (static float, nats per latent dim): the KL *penalty*
      uses per-dim batch-mean KL clamped from below —
      ``mean_d(max(KL_d, free_bits))`` — so β stops squeezing a dimension
      once its information content drops to the floor (Kingma et al. 2016,
      IAF appendix). 0.0 keeps the reference's flat-mean formula bitwise
      (the per-dim path is not even traced).
    - ``capacity`` (traced scalar or None): Burgess et al. 2018 capacity
      annealing — the penalty becomes ``β·|KL_pen − C|`` with C ramped by
      the caller (harness.capacity_schedule). None keeps β·KL_pen.

    The returned ``kld`` is always the TRUE reference KLD (for logging /
    val-selection); only ``total`` sees the penalty shaping.
    """
    mse = jnp.mean(jnp.square(recon - x))
    kld = -0.5 * jnp.mean(1 + log_var - jnp.square(mu) - jnp.exp(log_var))
    if free_bits and free_bits > 0.0:
        kld_dim = -0.5 * jnp.mean(
            1 + log_var - jnp.square(mu) - jnp.exp(log_var), axis=0
        )
        kl_pen = jnp.mean(jnp.maximum(kld_dim, free_bits))
    else:
        kl_pen = kld
    if capacity is None:
        total = mse + beta * kl_pen
    else:
        total = mse + beta * jnp.abs(kl_pen - capacity)
    return total, mse, kld
