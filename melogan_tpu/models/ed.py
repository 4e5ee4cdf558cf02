"""Emotion discriminator: 4-class classifier over notes or latents.

Capability parity with the reference (src/emotion_discriminator/ed_model.py):
- ``input_mode='latent'`` → MLP classifier over encoder latents
- ``input_mode='notes'``  → Conv1D NotesEncoder (k5 then k3 blocks, BN+GELU,
  channels 4→64→128→256→256 capped at ``notes_hidden``), mean-pool, linear
  projection, then the MLP classifier

The whole classifier compiles to a single XLA program; during GAN training it
runs frozen inside the generator loss (reference src/gan/train_gan.py:236-245).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from melogan_tpu.models.layers import (
    Conv1d,
    Dropout,
    SpectralNormLinear,
    TorchBatchNorm,
    TorchLinear,
    adaptive_avg_pool_1,
    gelu_exact,
)


class ConvBlock1D(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv1d(
            features=self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            padding=self.padding,
        )(x)
        x = TorchBatchNorm()(x, use_running_average=not train)
        return gelu_exact(x)


class NotesEncoder(nn.Module):
    """(B, T, note_dim) → (B, hidden_dim) pooled embedding."""

    hidden_dim: int = 256
    num_blocks: int = 4

    @nn.compact
    def __call__(self, notes, train: bool = True, return_taps: bool = False):
        x = notes
        ch = 64
        taps = []
        for i in range(self.num_blocks):
            x = ConvBlock1D(
                features=ch,
                kernel_size=5 if i == 0 else 3,
                padding=2 if i == 0 else 1,
            )(x, train=train)
            if return_taps:
                # mean-pooled per-block activations: multi-scale texture
                # statistics for the GAN's feature-matching loss (reads
                # only — the module/parameter structure is unchanged)
                taps.append(jnp.mean(x, axis=1))
            ch = min(ch * 2, self.hidden_dim)
        x = adaptive_avg_pool_1(x)
        out = TorchLinear(features=self.hidden_dim)(x)
        if return_taps:
            return out, jnp.concatenate(taps + [out], axis=-1)
        return out


class MLPClassifier(nn.Module):
    hidden_dims: Tuple[int, ...] = (256, 128)
    n_classes: int = 4
    dropout: float = 0.2
    use_sn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        for h in self.hidden_dims:
            if self.use_sn:
                x = SpectralNormLinear(features=h)(x, update_stats=train)
            else:
                x = TorchLinear(features=h)(x)
            x = gelu_exact(x)
            x = Dropout(rate=self.dropout)(x, deterministic=not train)
        return TorchLinear(features=self.n_classes)(x)


class EmotionDiscriminator(nn.Module):
    """4-class emotion classifier; returns raw logits (B, n_classes)."""

    input_mode: str = "notes"
    latent_dim: int = 64
    note_dim: int = 4
    notes_hidden: int = 256
    notes_blocks: int = 4
    mlp_hidden: Tuple[int, ...] = (256, 128)
    n_classes: int = 4
    dropout: float = 0.2
    use_spectral_norm: bool = False

    def setup(self):
        if self.input_mode == "notes":
            self.encoder = NotesEncoder(
                hidden_dim=self.notes_hidden, num_blocks=self.notes_blocks
            )
            in_dim = self.notes_hidden
        elif self.input_mode == "latent":
            self.encoder = None
            in_dim = self.latent_dim
        else:
            raise ValueError("input_mode must be 'latent' or 'notes'")
        self.classifier = MLPClassifier(
            hidden_dims=self.mlp_hidden, n_classes=self.n_classes,
            dropout=self.dropout, use_sn=self.use_spectral_norm,
        )

    def __call__(self, x, train: bool = True):
        if self.input_mode == "latent":
            if x.ndim != 2:
                raise ValueError(f"expected (B, latent_dim), got {x.shape}")
            feats = x
        else:
            if x.ndim != 3:
                raise ValueError(f"expected (B, T, note_dim), got {x.shape}")
            feats = self.encoder(x, train=train)
        return self.classifier(feats, train=train)

    def features(self, x, train: bool = False, multi: bool = False):
        """Encoder features for the GAN's ED-feature-matching loss
        (train/gan_step.py lambda_fm).

        ``multi=False``: the penultimate (B, notes_hidden) embedding — what
        the classifier head reads. ``multi=True``: that PLUS the mean-pooled
        activations of every conv block (B, 64+128+256+256+256) — matching
        per-emotion centroids at several receptive fields constrains the
        generator's texture at multiple scales, so it cannot satisfy one
        classifier's final layer with off-manifold shortcuts (measured round
        5: penultimate-only matching produced samples the TRAIN ED called
        angry but an independent judge called happy)."""
        if self.input_mode == "latent":
            return x
        if multi:
            _, taps = self.encoder(x, train=train, return_taps=True)
            return taps
        return self.encoder(x, train=train)

    def features_and_logits(self, x, train: bool = False, multi: bool = False):
        """(features, logits) in one encoder pass (the G loss needs both)."""
        if self.input_mode == "latent":
            return x, self.classifier(x, train=train)
        if multi:
            pen, taps = self.encoder(x, train=train, return_taps=True)
            return taps, self.classifier(pen, train=train)
        feats = self.encoder(x, train=train)
        return feats, self.classifier(feats, train=train)

    def predict_proba(self, x):
        return jax.nn.softmax(self(x, train=False), axis=-1)

    def predict(self, x):
        return jnp.argmax(self(x, train=False), axis=-1)

    @classmethod
    def from_config(cls, cfg) -> "EmotionDiscriminator":
        """Build from an EDConfig or a reference-style cfg dict."""
        get = cfg.get if isinstance(cfg, dict) else lambda k, d=None: getattr(cfg, k, d)
        return cls(
            input_mode=get("input_mode", "latent"),
            latent_dim=int(get("latent_dim", 128)),
            note_dim=int(get("note_dim", 4)),
            notes_hidden=int(get("notes_hidden", 256)),
            notes_blocks=int(get("notes_blocks", 4)),
            mlp_hidden=tuple(get("mlp_hidden", (256, 128))),
            n_classes=int(get("n_classes", 4)),
            dropout=float(get("dropout", 0.2)),
            use_spectral_norm=bool(get("use_spectral_norm", False)),
        )
