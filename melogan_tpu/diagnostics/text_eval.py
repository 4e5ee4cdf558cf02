"""Measured accuracy for the offline text-emotion backends (VERDICT-r3
item 5: 'measure the lexicon, then beat it').

Evaluates any backend with the standard call contract
(``clf(text) -> [[{"label", "score"}]]``) on the held-out split of the
framework's labeled corpus (data/text_corpus.py: disjoint phrases AND
templates from the training split). Scoring happens at the 4-music-emotion
level — the granularity the serving path actually uses — via the reference's
28→4 map (textClassification/text.py:8-43).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

from melogan_tpu import EMOTIONS


def evaluate_text_backend(
    clf: Callable,
    seed: int = 0,
    limit: Optional[int] = None,
) -> Dict:
    """Accuracy report of a text backend over the held-out eval split."""
    from melogan_tpu.data.text_corpus import generate_text_corpus
    from melogan_tpu.models.text_emotion import (
        DEFAULT_EMOTION,
        TEXT_MODEL_TO_MY_EMOTIONS,
    )

    texts, categories = generate_text_corpus("eval", seed=seed)
    if limit:
        texts, categories = texts[:limit], categories[:limit]
    y_true = [TEXT_MODEL_TO_MY_EMOTIONS.get(c, DEFAULT_EMOTION) for c in categories]

    y_pred = []
    for t in texts:
        result = clf(t)
        label = result[0][0]["label"] if isinstance(result[0], list) else result[0]["label"]
        y_pred.append(TEXT_MODEL_TO_MY_EMOTIONS.get(str(label).lower(), DEFAULT_EMOTION))

    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    per_emotion = {}
    confusion = np.zeros((len(EMOTIONS), len(EMOTIONS)), np.int64)
    for t, p in zip(y_true, y_pred):
        confusion[EMOTIONS.index(t), EMOTIONS.index(p)] += 1
    for e in EMOTIONS:
        mask = y_true == e
        per_emotion[e] = {
            "n": int(mask.sum()),
            "accuracy": float((y_pred[mask] == e).mean()) if mask.any() else None,
        }
    counts = np.unique(y_true, return_counts=True)[1]
    return {
        "n": int(len(y_true)),
        "accuracy": float((y_pred == y_true).mean()),
        "chance": float(counts.max() / len(y_true)),
        "per_emotion": per_emotion,
        "confusion": confusion.tolist(),
    }


def compare_offline_backends(seed: int = 0, verbose: bool = True) -> Dict:
    """Lexicon vs the framework's own trained classifier on the same eval
    set. The winner ships as the default offline backend
    (models/text_emotion.py backend ladder); this function is the receipt."""
    from melogan_tpu.models.text_emotion import LexiconClassifier
    from melogan_tpu.models.text_mlp import load_or_train

    lex = evaluate_text_backend(LexiconClassifier(), seed=seed)
    own = evaluate_text_backend(load_or_train(), seed=seed)
    report = {"lexicon": lex, "text-mlp": own}
    if verbose:
        for name, r in report.items():
            per = " ".join(
                f"{e}:{v['accuracy']:.0%}" for e, v in r["per_emotion"].items()
            )
            print(f"[text-eval] {name:9s} accuracy {r['accuracy']:.1%} "
                  f"(n={r['n']}, chance {r['chance']:.0%}) | {per}")
    return report
