"""Data layer: .npz sample schema, split resolution, preprocessing, datasets.

Consolidates the reference's four duplicated resolver implementations
(src/ae/resolve_splits.py:28-49, src/gan/dataset.py:127-157,
src/emotion_discriminator/ed_dataset.py:188-222, src/ae/encode.py:37-56) into
one, and rebuilds the preprocessing pipeline (raw MIDI → (512,4) notes +
6 numeric features) that is missing from the reference repo (SURVEY.md §2.9).
"""

from melogan_tpu.data.npz import Sample, load_sample, save_sample, resolve_split
from melogan_tpu.data.scaler import StandardScaler

__all__ = [
    "Sample",
    "load_sample",
    "save_sample",
    "resolve_split",
    "StandardScaler",
]
