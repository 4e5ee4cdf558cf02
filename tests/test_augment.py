"""Corpus expansion (data/augment.py): variant generation, grouped
leakage-safe splits, scaler semantics."""
import csv
import os

import numpy as np
import pytest

from melogan_tpu.data.augment import augment_song_raw, expand_corpus
from melogan_tpu.data.npz import PAD_PITCH, load_sample


@pytest.fixture()
def golden_sources():
    import glob

    paths = sorted(glob.glob("/root/reference/good_gens1/*.mid")
                   + glob.glob("/root/reference/generated_tests/*.mid"))
    if len(paths) < 16:
        pytest.skip("reference artifacts unavailable")
    return [(os.path.basename(os.path.dirname(p)) + "_"
             + os.path.splitext(os.path.basename(p))[0],
             p, os.path.basename(p).split("_")[1]) for p in paths]


def test_augment_song_raw_transforms(rng):
    from melogan_tpu.data.npz import pad_notes

    n = 64
    raw = np.zeros((n, 4), np.float32)
    raw[:, 0] = np.clip(60 + rng.normal(0, 5, n), 30, 100).astype(int)
    raw[:, 1] = np.cumsum(np.abs(rng.normal(0.5, 0.1, n)))
    raw[:, 2] = np.abs(rng.normal(1.0, 0.2, n)) + 0.1
    raw[:, 3] = np.clip(80 + rng.normal(0, 10, n), 1, 127)
    raw = pad_notes(raw, 128)

    g = np.random.default_rng(7)
    aug, tempo = augment_song_raw(raw, 120.0, g)
    assert aug.shape == raw.shape
    mask_aug = aug[:, 0] >= 0
    # pitch shift is a (clipped) whole-song transposition: interval structure
    # of the surviving (non-dropped, non-clipped) notes is preserved
    both = (raw[:, 0] >= 0) & mask_aug
    interior = both & (aug[:, 0] > 21) & (aug[:, 0] < 108)
    shifts = aug[interior, 0] - raw[interior, 0]
    assert len(np.unique(shifts.astype(int))) == 1
    # velocities stay valid; padding rows stay padding
    assert (aug[mask_aug, 3] >= 1).all() and (aug[mask_aug, 3] <= 127).all()
    assert (aug[~mask_aug, 0] == PAD_PITCH).all()
    assert 40.0 <= tempo <= 220.0
    # determinism: same seed, same variant
    aug2, tempo2 = augment_song_raw(raw, 120.0, np.random.default_rng(7))
    np.testing.assert_array_equal(aug, aug2)
    assert tempo == tempo2


def test_expand_corpus_grouped_splits(golden_sources, tmp_path):
    report = expand_corpus(golden_sources, str(tmp_path), per_song=3,
                           ratios=(0.5, 0.25, 0.25), seed=0, verbose=False)
    assert report["counts"]["train"] > 0 and report["counts"]["test"] > 0

    src_split = {}
    for split in ("train", "val", "test"):
        path = tmp_path / "splits" / f"{split}_split.csv"
        for row in csv.DictReader(open(path)):
            src = row["file_key"].split("__aug")[0]
            assert src_split.setdefault(src, split) == split, (
                f"source {src} leaked across splits")
            # npz written and loadable, features standardized 6-dim
            s = load_sample(row["npz_path"])
            assert s.notes.shape[1] == 4
            assert s.numeric_features.shape == (6,)
    # every source contributes 1 original + per_song variants
    n_rows = sum(report["counts"].values())
    assert n_rows == len(golden_sources) * (1 + 3)
    assert os.path.exists(tmp_path / "scaler.npz")
