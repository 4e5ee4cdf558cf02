"""Data layer: synthetic corpus → preprocess → splits → datasets end-to-end,
plus normalization/feature semantics."""
import os

import numpy as np
import pytest

from melogan_tpu.config import AEConfig
from melogan_tpu.data.datasets import (
    SplitData,
    ae_denormalize,
    ae_normalize,
    class_balance_weights,
    epoch_batches,
    load_split,
    load_split_fast,
    stack_gan_groups,
)
from melogan_tpu.data.npz import Sample, load_sample, pad_notes, resolve_split, save_sample
from melogan_tpu.data.preprocess import (
    build_split_arrays,
    gan_normalized_to_raw,
    key_analysis,
    numeric_features_raw,
    preprocess_corpus,
    raw_to_gan_normalized,
)
from melogan_tpu.data.scaler import StandardScaler
from melogan_tpu.data.splits import create_splits, read_manifest
from melogan_tpu.data.synthetic import generate_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Small synthetic corpus, preprocessed with splits — shared across tests."""
    root = tmp_path_factory.mktemp("corpus")
    entries = generate_corpus(str(root), n_per_emotion=6, seed=0, n_notes=64)
    processed = str(root / "processed")
    scaler = preprocess_corpus(entries, processed, verbose=False)
    manifest = read_manifest(str(root / "data_manifest.csv"))
    splits = create_splits(manifest, str(root / "splits"), seed=0)
    return dict(root=str(root), processed=processed, scaler=scaler, splits=splits)


def test_corpus_preprocessed(corpus):
    files = os.listdir(corpus["processed"])
    assert len(files) == 24
    s = load_sample(os.path.join(corpus["processed"], sorted(files)[0]))
    assert s.notes.shape == (512, 4)
    assert s.numeric_features.shape == (6,)
    assert s.mood in ("happy", "sad", "angry", "calm")
    # standardized features: roughly centered, constant feature exactly 0
    assert abs(s.numeric_features[5]) < 1e-6


def test_split_sizes_stratified(corpus):
    splits = corpus["splits"]
    assert len(splits["train"]) == 16  # 4 per emotion at 70%
    assert len(splits["val"]) + len(splits["test"]) == 8
    for name in ("train", "val", "test"):
        emotions = {r["emotion"] for r in splits[name]}
        assert emotions == {"happy", "sad", "angry", "calm"}


def test_resolve_and_load_split(corpus):
    csv_path = os.path.join(corpus["root"], "splits", "train_split.csv")
    paths, emotions, dropped = resolve_split(csv_path, corpus["processed"])
    assert len(paths) == 16 and not dropped
    data = load_split(csv_path, corpus["processed"], verbose=False)
    assert data.notes_raw.shape == (16, 512, 4)
    assert data.numeric.shape == (16, 6)
    assert set(data.emotion_idx) <= {0, 1, 2, 3}


def test_build_split_arrays_fast_path(corpus):
    csv_path = os.path.join(corpus["root"], "splits", "val_split.csv")
    out_dir = os.path.join(corpus["root"], "splits", "val")
    arrays = build_split_arrays(csv_path, corpus["processed"], out_dir, verbose=False)
    fast = load_split_fast(out_dir)
    assert fast is not None
    np.testing.assert_array_equal(fast["notes"], arrays["notes"])
    assert fast["notes"].min() >= -1.0 and fast["notes"].max() <= 1.0


def test_ae_normalize_roundtrip(rng):
    raw = np.zeros((8, 4), np.float32)
    raw[:, 0] = rng.integers(30, 100, 8)  # pitch
    raw[:, 1] = rng.uniform(0, 50, 8)  # start beats
    raw[:, 2] = rng.uniform(0.1, 10, 8)  # duration
    raw[:, 3] = rng.integers(20, 120, 8)  # velocity
    raw[5, 0] = -1  # padding row
    norm = ae_normalize(raw)
    assert -1 <= norm[:, 0].min() and norm[:, 0].max() <= 1
    assert norm[5, 0] == -1  # padding untouched
    back = ae_denormalize(norm)
    mask = raw[:, 0] != -1
    np.testing.assert_allclose(back[mask], raw[mask], rtol=1e-5, atol=1e-4)


def test_gan_layout_roundtrip(rng):
    raw = np.zeros((16, 4), np.float32)
    raw[:, 0] = rng.integers(36, 96, 16)
    raw[:, 2] = rng.uniform(0.25, 3.9, 16)
    raw[:, 3] = rng.integers(30, 120, 16)
    steps = rng.uniform(0.1, 3.5, 16)
    raw[:, 1] = np.cumsum(steps) - steps
    gan = raw_to_gan_normalized(raw)
    assert gan.min() >= -1 and gan.max() <= 1
    back = gan_normalized_to_raw(gan)
    np.testing.assert_allclose(back[:, 0], raw[:, 0], atol=1e-3)  # pitch
    np.testing.assert_allclose(back[:, 2], raw[:, 2], atol=1e-3)  # duration
    np.testing.assert_allclose(back[:, 1], raw[:, 1], atol=1e-2)  # start via steps


def test_key_analysis_discriminates_mode():
    # pure C-major scale vs A-minor-with-minor-third emphasis
    major = np.zeros((7, 4), np.float32)
    major[:, 0] = [60, 62, 64, 65, 67, 69, 71]
    major[:, 2] = 1.0
    strength, mode = key_analysis(major)
    assert strength > 0.5 and mode == 1.0


def test_numeric_features_schema():
    notes = np.zeros((4, 4), np.float32)
    notes[:, 0] = [60, 64, 67, 72]
    notes[:, 2] = 1.0
    notes[:, 3] = 64.0
    f = numeric_features_raw(notes, tempo=120.0)
    assert f.shape == (6,)
    assert f[0] == 120.0
    assert f[2] in (1.0, -1.0)
    assert abs(f[3] - 0.0) < 0.01  # velocity 64 → 64/64−1 = 0
    # mean pitch 65.75 → ≈ 364 Hz
    assert 300 < f[4] < 430
    assert f[5] == 0.0


def test_scaler_constant_feature():
    x = np.array([[1.0, 5.0], [3.0, 5.0], [5.0, 5.0]])
    sc = StandardScaler().fit(x)
    out = sc.transform(x)
    np.testing.assert_allclose(out[:, 1], 0.0)  # constant → 0
    np.testing.assert_allclose(out[:, 0].mean(), 0.0, atol=1e-7)
    back = sc.inverse_transform(out)
    np.testing.assert_allclose(back, x, atol=1e-5)


def test_reference_scaler_joblib_loads(reference_dir):
    path = os.path.join(reference_dir, "data/models/scaler.joblib")
    if not os.path.exists(path):
        pytest.skip("no scaler artifact")
    sc = StandardScaler.load(path)
    assert sc.mean_.shape == (6,)
    assert sc.n_samples_seen_ == 890
    assert abs(sc.mean_[0] - 119.5) < 1.0  # tempo mean
    assert abs(sc.mean_[4] - 339.65) < 1.0  # mean-pitch Hz


def test_epoch_batches_weighted(rng):
    labels = np.array([0] * 90 + [1] * 10)
    w = class_balance_weights(labels)
    picked = np.concatenate(list(epoch_batches(100, 10, rng, weights=w)))
    frac1 = (labels[picked] == 1).mean()
    assert 0.3 < frac1 < 0.7  # ~balanced despite 9:1 skew


def test_stack_gan_groups_covers_epoch(rng):
    n, b, g = 28, 4, 5  # mirrors 28 batches/epoch with critic_iters 5
    notes = np.arange(n, dtype=np.float32)[:, None, None] * np.ones((n, 8, 4), np.float32)
    emo = np.arange(n) % 4
    lat = np.zeros((n, 8), np.float32)
    num = np.zeros((n, 6), np.float32)
    groups, tail = stack_gan_groups(notes, emo, lat, num, batch_size=b, group=g, rng=rng)
    assert len(groups) == 1  # 28//4=7 batches → 1 group of 5 + tail of 2
    assert groups[0][0].shape == (5, 4, 8, 4)
    assert tail[0].shape == (2, 4, 8, 4)
    # every consumed index is unique (shuffle without replacement)
    seen = np.concatenate(
        [groups[0][0][..., 0, 0].ravel(), tail[0][..., 0, 0].ravel()]
    )
    assert len(np.unique(seen)) == len(seen)


def test_preprocess_reference_golden_midi(reference_dir, tmp_path):
    """The preprocessing pipeline must ingest the reference's real shipped
    .mid artifacts (pretty_midi-written, running-status, vel-0 offs)."""
    import glob

    from melogan_tpu.data.preprocess import preprocess_midi_file

    files = sorted(glob.glob(os.path.join(reference_dir, "good_gens1", "*.mid")))[:4]
    for path in files:
        emotion = os.path.basename(path).split("_")[1]
        sample, feats = preprocess_midi_file(path, emotion)
        assert sample.notes.shape == (512, 4)
        valid = sample.notes[:, 0] >= 0
        assert valid.sum() > 100  # golden files carry ~500 notes
        assert 36 - 11 <= sample.notes[valid, 0].min()
        assert sample.notes[valid, 0].max() <= 96
        assert (sample.notes[valid, 2] > 0).all()  # durations positive
        assert feats.shape == (6,)
        assert 60 <= feats[0] <= 180  # tempo within renderer clamp
        assert feats[5] == 0.0
