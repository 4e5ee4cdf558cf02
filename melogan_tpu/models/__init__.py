"""Model zoo: VAE, emotion discriminator, WGAN-GP generator/critic, feature
encoder, and the emotion-input inference models (mini-Xception FER, SSD face
detector, text classifier head).

All models are Flax modules operating on (batch, length, channels) layouts —
feature dim last, the TPU lane dimension — and compile to single XLA programs.
"""

from melogan_tpu.models.vae import VAE, ConvEncoder, ConvDecoder
from melogan_tpu.models.ed import EmotionDiscriminator, NotesEncoder, MLPClassifier
from melogan_tpu.models.gan import (
    Generator,
    GeneratorDecoder,
    NoiseToLatent,
    Critic,
    FeatureEncoder,
)

__all__ = [
    "VAE",
    "ConvEncoder",
    "ConvDecoder",
    "EmotionDiscriminator",
    "NotesEncoder",
    "MLPClassifier",
    "Generator",
    "GeneratorDecoder",
    "NoiseToLatent",
    "Critic",
    "FeatureEncoder",
]
