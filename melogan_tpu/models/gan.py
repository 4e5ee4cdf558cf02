"""WGAN-GP generator, critic, and numeric feature encoder.

Capability parity with the reference (src/gan/models.py, src/gan/feature_encoder.py):

- ``NoiseToLatent``: MLP (input → hidden → latent, ReLU)
- ``GeneratorDecoder``: linear pre-net to (B, max_notes/8, 256), then three
  stride-2 transposed convs 256→128→64→note_dim (BN+ReLU between, no final
  activation), trimmed/padded to ``max_notes``
- ``Generator``: concat [noise, numeric_emb (+ AE latent in 'conditioning'
  mode)] → NoiseToLatent → decoder; returns (notes, latent)
- ``Critic``: three stride-2 convs 4→64→128→256 + LeakyReLU(0.2) (NO
  batch-norm — WGAN-GP), mean-pool, linear to emb, concat numeric_emb,
  scalar score head
- ``FeatureEncoder``: LayerNorm(6) → MLP (GELU, dropout) → 128-d embedding

All GAN modules use the reference's N(0, 0.02) conv/linear init with zero
biases (src/gan/utils.py:37-45). Layout is (B, L, C), channels last.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from melogan_tpu.config import GANConfig
from melogan_tpu.models.layers import (
    Conv1d,
    ConvTranspose1d,
    Dropout,
    SpectralNormLinear,
    TorchBatchNorm,
    TorchLayerNorm,
    TorchLinear,
    adaptive_avg_pool_1,
    gelu_exact,
    leaky_relu_02,
    trim_or_pad_length,
)


class NoiseToLatent(nn.Module):
    """MLP expanding the combined conditioning vector to the decoder latent."""

    out_dim: int
    hidden: int = 512

    @nn.compact
    def __call__(self, z):
        z = TorchLinear(features=self.hidden, gan_init=True)(z)
        z = jax.nn.relu(z)
        return TorchLinear(features=self.out_dim, gan_init=True)(z)


class GeneratorDecoder(nn.Module):
    """(B, latent_dim) → (B, max_notes, out_channels), raw values.

    Eval mode (the sampling hot path) can run the whole upsampling stack —
    three stride-2 transposed convs with their BatchNorm affines folded in —
    as ONE fused Pallas kernel (``ops/pallas/decoder.py``), keeping all
    intermediate activations in VMEM. Training mode always uses the layered
    path (batch-norm statistics must be updated per stage).
    """

    latent_dim: int = 128
    max_notes: int = 512
    out_channels: int = 4

    @nn.compact
    def __call__(self, latent, train: bool = True):
        from melogan_tpu.ops import conv as conv_ops

        reduced_len = max(1, self.max_notes // 8)
        y = TorchLinear(features=512, gan_init=True)(latent)
        y = jax.nn.relu(y)
        y = TorchLinear(features=256 * reduced_len, gan_init=True)(y)
        y = jax.nn.relu(y)
        # torch reshapes to (B, 256, reduced_len); our layout is (B, L, C)
        y = y.reshape(y.shape[0], 256, reduced_len)
        y = jnp.transpose(y, (0, 2, 1))

        convs = [
            ConvTranspose1d(
                features=f, kernel_size=5, stride=2, padding=2, output_padding=1,
                gan_init=True,
            )
            for f in (128, 64, self.out_channels)
        ]
        bns = [TorchBatchNorm() for _ in range(2)]

        from melogan_tpu.models.layers import default_precision

        fuse = (
            not train
            and conv_ops.use_pallas()
            # the kernel is f32/HIGHEST by construction — honor a lower-
            # precision request (bf16 fast-math) with the XLA path instead
            and default_precision() in (None, jax.lax.Precision.HIGHEST)
            and self.max_notes == 8 * reduced_len
            and y.shape[0] <= 32768  # beyond this the kernel exceeds its compile envelope
            and not self.is_mutable_collection("params")
        )
        if fuse:
            from melogan_tpu.ops.pallas.decoder import fold_bn_affine, fused_decoder_tail

            stages = []
            for i, conv in enumerate(convs):
                w = self.get_variable("params", conv.name)["kernel"]
                b = self.get_variable("params", conv.name)["bias"]
                if i < 2:
                    bn_p = self.get_variable("params", bns[i].name)
                    bn_s = self.get_variable("batch_stats", bns[i].name)
                    w, b = fold_bn_affine(
                        w, b, bn_s["mean"], bn_s["var"], bn_p["scale"], bn_p["bias"]
                    )
                stages.append((w, b))
            return trim_or_pad_length(fused_decoder_tail(y, stages), self.max_notes)

        y = convs[0](y)
        y = bns[0](y, use_running_average=not train)
        y = jax.nn.relu(y)
        y = convs[1](y)
        y = bns[1](y, use_running_average=not train)
        y = jax.nn.relu(y)
        y = convs[2](y)
        # no final activation: raw note values
        return trim_or_pad_length(y, self.max_notes)


class Generator(nn.Module):
    """Emotion-conditioned note generator; returns (notes, internal_latent).

    ``mode='warm_start'``: input = [noise, numeric_emb] (the shipped config).
    ``mode='conditioning'``: input additionally concatenates the AE latent.
    """

    noise_dim: int = 128
    latent_dim: int = 128
    mode: str = "warm_start"
    hidden: int = 512
    max_notes: int = 512
    note_dim: int = 4
    numeric_embed_dim: int = 128

    def setup(self):
        assert self.mode in ("conditioning", "warm_start")
        self.noise_to_latent = NoiseToLatent(out_dim=self.latent_dim, hidden=self.hidden)
        self.decoder = GeneratorDecoder(
            latent_dim=self.latent_dim,
            max_notes=self.max_notes,
            out_channels=self.note_dim,
        )

    def __call__(
        self,
        noise,
        encoder_latent=None,
        numeric_embedding=None,
        train: bool = True,
    ):
        inputs = [noise]
        if self.numeric_embed_dim > 0:
            assert numeric_embedding is not None, "numeric_embedding is required"
            inputs.append(numeric_embedding)
        if self.mode == "conditioning":
            assert encoder_latent is not None, "conditioning mode requires the AE latent"
            inputs.append(encoder_latent)
        x = jnp.concatenate(inputs, axis=1)
        latent = self.noise_to_latent(x)
        notes = self.decoder(latent, train=train)
        return notes, latent

    @classmethod
    def from_config(cls, cfg: GANConfig) -> "Generator":
        return cls(
            noise_dim=cfg.noise_dim,
            latent_dim=cfg.latent_dim,
            mode=cfg.integration_mode,
            hidden=cfg.gen_hidden,
            max_notes=cfg.max_notes,
            note_dim=cfg.note_dim,
            numeric_embed_dim=cfg.encoder_out_dim if cfg.use_numeric_encoder else 0,
        )


class Critic(nn.Module):
    """WGAN-GP critic: raw realness score per sample (B,).

    Deliberately batch-norm-free (gradient-penalty training), conditioned on
    the numeric embedding by concatenation before the score head.

    Convolutions are pinned to the XLA path (``pallas=False``): the gradient
    penalty differentiates the critic's input-gradient again w.r.t. its
    params (reference src/gan/utils.py:75-90), and the Pallas kernels'
    ``custom_vjp`` backward is only first-order differentiable.
    """

    emb_dim: int = 256
    numeric_embed_dim: int = 128

    @nn.compact
    def __call__(self, notes, numeric_embedding=None):
        if self.numeric_embed_dim > 0:
            assert numeric_embedding is not None, (
                "critic configured with a numeric conditioning embedding "
                f"(numeric_embed_dim={self.numeric_embed_dim}) but none was passed"
            )
            assert numeric_embedding.shape[-1] == self.numeric_embed_dim, (
                f"numeric embedding dim {numeric_embedding.shape[-1]} != "
                f"configured {self.numeric_embed_dim}"
            )
        x = notes
        for ch in (64, 128, 256):
            x = Conv1d(
                features=ch, kernel_size=5, stride=2, padding=2, gan_init=True, pallas=False
            )(x)
            x = leaky_relu_02(x)
        x = adaptive_avg_pool_1(x)
        x = TorchLinear(features=self.emb_dim, gan_init=True)(x)
        x = leaky_relu_02(x)
        if self.numeric_embed_dim > 0:
            x = jnp.concatenate([x, numeric_embedding], axis=1)
        score = TorchLinear(features=1, gan_init=True)(x)
        return jnp.squeeze(score, axis=1)

    @classmethod
    def from_config(cls, cfg: GANConfig) -> "Critic":
        return cls(
            numeric_embed_dim=cfg.encoder_out_dim if cfg.use_numeric_encoder else 0
        )


class FeatureEncoder(nn.Module):
    """Numeric feature (6,) → conditioning embedding (out_dim,)."""

    hidden_dims: Tuple[int, ...] = (256, 128)
    out_dim: int = 128
    dropout: float = 0.2
    use_sn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = TorchLayerNorm()(x)
        for h in self.hidden_dims:
            if self.use_sn:
                x = SpectralNormLinear(features=h, gan_init=True)(x, update_stats=train)
            else:
                x = TorchLinear(features=h, gan_init=True)(x)
            x = gelu_exact(x)
            x = Dropout(rate=self.dropout)(x, deterministic=not train)
        return TorchLinear(features=self.out_dim, gan_init=True)(x)

    @classmethod
    def from_config(cls, cfg: GANConfig, dropout: Optional[float] = None) -> "FeatureEncoder":
        return cls(
            hidden_dims=tuple(cfg.encoder_hidden),
            out_dim=cfg.encoder_out_dim,
            dropout=cfg.encoder_dropout if dropout is None else dropout,
            use_sn=cfg.encoder_use_sn,
        )
