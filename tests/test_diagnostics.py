"""Diagnostics: data-sanity checks and t-SNE visualization."""
import os

import numpy as np

from melogan_tpu.data.datasets import SplitData
from melogan_tpu.diagnostics.diagnose import diagnose


def make_split(rng, n=16, differentiated=True):
    notes = np.zeros((n, 32, 4), np.float32)
    notes[:, :, 0] = rng.integers(40, 90, size=(n, 32))
    notes[:, :, 1] = np.cumsum(rng.uniform(0.2, 1.0, size=(n, 32)), axis=1)
    notes[:, :, 2] = rng.uniform(0.2, 2.0, size=(n, 32))
    notes[:, :, 3] = rng.integers(30, 110, size=(n, 32))
    emotions = np.asarray(["happy", "sad", "angry", "calm"] * (n // 4))
    numeric = rng.normal(0, 1, size=(n, 6)).astype(np.float32)
    if differentiated:
        for i in range(n):
            numeric[i, 0] += (i % 4) * 2.0  # strong per-emotion signal
    else:
        numeric[:] = 0.0
    return SplitData(notes_raw=notes, emotions=emotions, numeric=numeric,
                     filenames=[f"f{i}" for i in range(n)])


def test_diagnose_passes_on_good_data(rng):
    report = diagnose(make_split(rng), latents=rng.normal(size=(16, 8)))
    assert report["ok"], report
    names = {c["check"] for c in report["checks"]}
    assert {"notes_normalization", "numeric_feature_variance", "latent_collapse",
            "label_balance"} <= names


def test_diagnose_flags_constant_features(rng):
    report = diagnose(make_split(rng, differentiated=False))
    failing = {c["check"] for c in report["checks"] if not c["ok"]}
    assert "numeric_feature_variance" in failing
    assert not report["ok"]


def test_diagnose_flags_latent_collapse(rng):
    collapsed = np.zeros((16, 8), np.float32)  # all dims collapsed
    report = diagnose(make_split(rng), latents=collapsed)
    check = next(c for c in report["checks"] if c["check"] == "latent_collapse")
    assert not check["ok"]


def test_tsne_visualization(tmp_path, rng):
    from melogan_tpu.data.npz import Sample, save_sample
    from melogan_tpu.data.splits import create_splits
    from melogan_tpu.diagnostics.tsne import visualize_latents

    processed = tmp_path / "processed"
    rows = []
    for i in range(12):
        emotion = ["happy", "sad", "angry", "calm"][i % 4]
        key = f"k{i}"
        save_sample(
            str(processed / f"{key}.npz"),
            Sample(
                notes=np.zeros((32, 4), np.float32),
                mood=emotion,
                numeric_features=np.zeros(6, np.float32),
                tempo=120.0,
                filename=f"{key}.mid",
            ),
        )
        rows.append(dict(file_key=key, emotion=emotion, source="t", full_path=""))
    splits = create_splits(rows, str(tmp_path / "splits"), ratios=(1.0, 0.0, 0.0), seed=0)
    latents = rng.normal(size=(12, 8)).astype(np.float32)
    os.makedirs(tmp_path / "splits" / "train", exist_ok=True)
    np.save(tmp_path / "splits" / "train" / "encoder_feats.npy", latents)
    out = visualize_latents(
        str(tmp_path / "splits"), "train", str(processed), out_dir=str(tmp_path / "viz")
    )
    assert os.path.exists(out)
    assert out.endswith("train_latent_tsne_visualization.png")
