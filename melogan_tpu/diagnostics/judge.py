"""Independent emotion-accuracy evaluation of generated music (VERDICT-r3
item 2).

The GAN's training loss contains a frozen ED trained on the TRAIN split
(reference src/gan/train_gan.py:121-133), so scoring generations with that
model measures the objective G optimized, not generalization. The judge here
is a second EmotionDiscriminator trained on the held-out VALIDATION split
with a different seed, never inside G's loss. Its per-emotion accuracy over
fresh samples is the quantitative form of what the reference's
``Loss/Generator_Emo`` curve (train_gan.py:264, 2.004 → 1.414) only proxies:
does generated music actually carry its target emotion?
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from melogan_tpu import EMOTIONS
from melogan_tpu.config import EDConfig
from melogan_tpu.data.datasets import SplitData

JUDGE_SEED_OFFSET = 1000  # decorrelate judge init/data-order from the in-loss ED


def judge_config(ed_cfg: EDConfig, epochs: Optional[int] = None) -> EDConfig:
    """Clone the ED config for the judge: different seed, own checkpoint/log
    dirs, notes mode (raw generations are scored — latent mode would need the
    VAE in the loop)."""
    return dataclasses.replace(
        ed_cfg,
        input_mode="notes",
        seed=ed_cfg.seed + JUDGE_SEED_OFFSET,
        num_epochs=epochs or ed_cfg.num_epochs,
        checkpoint_dir=os.path.join(os.path.dirname(ed_cfg.checkpoint_dir.rstrip("/")) or "data/models", "judge"),
        log_dir=os.path.join(os.path.dirname(ed_cfg.log_dir.rstrip("/")) or "experiments", "judge"),
        save_name="judge_best.pth",
    )


def train_judge(
    ed_cfg: EDConfig,
    judge_train: SplitData,
    judge_val: SplitData,
    workdir: Optional[str] = None,
    epochs: Optional[int] = None,
    verbose: bool = False,
) -> Tuple[EDConfig, "object"]:
    """Train the judge on held-out data (callers pass the val split as
    judge-train and the test split as judge-val so no GAN-train row is ever
    seen). Returns (judge_cfg, best_state)."""
    from melogan_tpu.train import ed_loop

    cfg = judge_config(ed_cfg, epochs)
    state, _ = ed_loop.train(
        cfg, judge_train, judge_val, workdir=workdir, verbose=verbose
    )
    return cfg, state


def judge_notes(cfg: EDConfig, state, notes: np.ndarray, labels: np.ndarray) -> Dict:
    """Classify (B, L, 4) generated note arrays; per-emotion accuracy report.

    ``labels``: target emotion indices the generator was conditioned on."""
    from melogan_tpu.models.ed import EmotionDiscriminator

    model = EmotionDiscriminator.from_config(cfg)
    variables = {"params": state.params}
    if getattr(state, "batch_stats", None):
        variables["batch_stats"] = state.batch_stats
    logits = np.asarray(
        jax.jit(lambda v, x: model.apply(v, x, train=False))(
            variables, jnp.asarray(notes)
        )
    )
    pred = logits.argmax(-1)
    labels = np.asarray(labels)
    per_emotion: Dict[str, Dict] = {}
    confusion = np.zeros((len(EMOTIONS), len(EMOTIONS)), np.int64)
    for t, p in zip(labels, pred):
        confusion[int(t), int(p)] += 1
    for i, emotion in enumerate(EMOTIONS):
        mask = labels == i
        per_emotion[emotion] = {
            "n": int(mask.sum()),
            "accuracy": float((pred[mask] == i).mean()) if mask.any() else None,
        }
    return {
        "n": int(len(labels)),
        "accuracy": float((pred == labels).mean()),
        "chance": 1.0 / len(EMOTIONS),
        "per_emotion": per_emotion,
        "confusion": confusion.tolist(),
    }


def judge_generated(
    cfg: EDConfig,
    state,
    sampler,
    n_per_emotion: int = 8,
    seed: int = 1234,
) -> Dict:
    """Generate fresh samples per emotion with ``sampler`` and judge them.

    Deterministic given (sampler weights, seed) — usable as a resumable gate
    metric like track-best's per-cadence scores."""
    prompts = [e for e in EMOTIONS for _ in range(n_per_emotion)]
    notes = sampler.sample_notes(prompts, seed=seed)
    labels = np.asarray([EMOTIONS.index(e) for e in prompts])
    report = judge_notes(cfg, state, notes, labels)
    report["n_per_emotion"] = n_per_emotion
    report["seed"] = seed
    return report
