"""Data-sanity diagnostics (reference src/gan/diagnose.py:18-94 capability).

Checks per split:
- note normalization range (GAN layout must live in [−1, 1])
- numeric-feature variance per emotion (conditioning is learnable only when
  the per-emotion feature distributions differ)
- latent collapse (per-dimension std < 0.1 flags a collapsed VAE posterior)
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from melogan_tpu import EMOTIONS
from melogan_tpu.data.datasets import SplitData


def diagnose(data: SplitData, latents: Optional[np.ndarray] = None) -> Dict:
    report: Dict = {"n_samples": data.n, "checks": []}

    def check(name: str, ok: bool, detail: str):
        report["checks"].append({"check": name, "ok": bool(ok), "detail": detail})

    # 1. normalization range
    gan_notes = data.notes_gan()
    lo, hi = float(gan_notes.min()), float(gan_notes.max())
    check(
        "notes_normalization",
        -1.001 <= lo and hi <= 1.001,
        f"GAN-layout notes range [{lo:.3f}, {hi:.3f}] (expected within [-1, 1])",
    )

    # 2. numeric-feature variance across emotions
    idx = data.emotion_idx
    per_emotion_means = {}
    for e, i in zip(EMOTIONS, range(4)):
        mask = idx == i
        if mask.any():
            per_emotion_means[e] = data.numeric[mask].mean(axis=0)
    if len(per_emotion_means) >= 2:
        means = np.stack(list(per_emotion_means.values()))
        spread = float(means.std(axis=0).max())
        check(
            "numeric_feature_variance",
            spread > 0.05,
            f"max per-emotion feature-mean spread {spread:.4f} "
            "(≈0 means the model cannot learn emotion conditioning)",
        )
    else:
        check("numeric_feature_variance", False, "fewer than 2 emotions present")

    # 3. overall feature variance
    var = data.numeric.std(axis=0)
    dead = [i for i, v in enumerate(var) if v < 1e-6]
    check(
        "numeric_features_alive",
        len(dead) <= 1,  # feature 5 is constant by schema
        f"features with ~zero variance: {dead} (feature 5 is constant by design)",
    )

    # 4. latent collapse
    if latents is not None:
        stds = latents.std(axis=0)
        collapsed = [int(i) for i, s in enumerate(stds) if s < 0.1]
        check(
            "latent_collapse",
            len(collapsed) < latents.shape[1],
            f"latent dims with std<0.1: {collapsed} of {latents.shape[1]} "
            f"(min std {float(stds.min()):.4f})",
        )
    else:
        check("latent_collapse", True, "no latents provided; skipped")

    # 5. label balance
    counts = {e: int((idx == i).sum()) for i, e in enumerate(EMOTIONS)}
    nonzero = [c for c in counts.values() if c]
    balanced = bool(nonzero) and (min(nonzero) / max(nonzero) > 0.3)
    check("label_balance", balanced, f"per-emotion counts {counts}")

    report["ok"] = all(c["ok"] for c in report["checks"])
    return report
