"""melogan_tpu — a TPU-native JAX framework for emotion-conditioned MIDI generation.

A from-scratch rebuild of the capabilities of the Melo-GAN reference
(WGAN-GP music generator + VAE + emotion classifier + emotion-input models +
serving), designed TPU-first:

- compute path: JAX / Flax / XLA with optional Pallas kernels (``melogan_tpu.ops``)
- parallelism: ``jax.sharding.Mesh`` + jit shardings (``melogan_tpu.parallel``)
- training: single fused-jit steps per workload (``melogan_tpu.train``)
- data/MIDI: vectorized numpy/jnp codecs (``melogan_tpu.midi``, ``melogan_tpu.data``)

The four emotions everywhere: ``happy, sad, angry, calm``.
"""

__version__ = "0.1.0"

EMOTIONS = ("happy", "sad", "angry", "calm")

# Canonical emotion -> class-index map (reference: src/gan/utils.py:63-73).
EMOTION_TO_INDEX = {"happy": 0, "sad": 1, "angry": 2, "calm": 3}
INDEX_TO_EMOTION = {v: k for k, v in EMOTION_TO_INDEX.items()}


def emotion_to_index(emotion) -> int:
    """Map an emotion (str / int / one-hot) to its class index; -1 if unknown.

    Mirrors reference semantics (src/gan/utils.py:63-73).
    """
    import numpy as np

    if emotion is None:
        return -1
    if isinstance(emotion, (list, tuple)) or hasattr(emotion, "ndim"):
        arr = np.asarray(emotion)
        if arr.ndim == 1 and arr.size == 4:
            return int(np.argmax(arr))
        return int(arr)
    if isinstance(emotion, str):
        return EMOTION_TO_INDEX.get(emotion.lower(), -1)
    try:
        return int(emotion)
    except (TypeError, ValueError):
        return -1
