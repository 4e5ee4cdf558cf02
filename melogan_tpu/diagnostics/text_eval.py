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


def ceiling_study(seed: int = 0, verbose: bool = True) -> Dict:
    """How much 4-emotion accuracy the eval split supports at all
    (VERDICT-r4 item 5: 'add a ceiling study').

    Estimators, all label-free w.r.t. eval:
    - ``knn_ngram``: 1-NN over TRAIN texts by char-3–5-gram cosine — the
      ceiling of pure surface-form matching (no training, no model). What a
      classifier can beat this by is the value of learned features.
    - ``train_self``: the deployed classifier re-scored on ITS OWN training
      sentences — capacity sanity (≈100% means eval shortfall is a
      generalization gap, not underfitting).
    Also returns the eval confusion matrix and up to ``n_examples``
    human-readable misclassifications for error analysis."""
    import numpy as np

    from melogan_tpu.data.text_corpus import generate_text_corpus
    from melogan_tpu.models.text_emotion import (
        DEFAULT_EMOTION,
        TEXT_MODEL_TO_MY_EMOTIONS,
    )
    from melogan_tpu.models.text_mlp import _char_ngram_counts, load_or_train

    tr_texts, tr_cats = generate_text_corpus("train", seed=seed)
    ev_texts, ev_cats = generate_text_corpus("eval", seed=seed)
    to4 = lambda c: TEXT_MODEL_TO_MY_EMOTIONS.get(c, DEFAULT_EMOTION)  # noqa: E731
    tr4 = np.asarray([to4(c) for c in tr_cats])
    ev4 = np.asarray([to4(c) for c in ev_cats])

    # 1-NN by char-ngram cosine (numpy; 1210 x 4608 x 4096 via matmul)
    tr_ng = _char_ngram_counts(tr_texts)
    ev_ng = _char_ngram_counts(ev_texts)
    tr_n = tr_ng / np.maximum(np.linalg.norm(tr_ng, axis=1, keepdims=True), 1e-9)
    ev_n = ev_ng / np.maximum(np.linalg.norm(ev_ng, axis=1, keepdims=True), 1e-9)
    nn_idx = (ev_n @ tr_n.T).argmax(axis=1)
    knn_acc = float((tr4[nn_idx] == ev4).mean())

    clf = load_or_train()
    ev_report = evaluate_text_backend(clf, seed=seed)
    # capacity sanity on a deterministic subsample of train (speed)
    sub = np.random.default_rng(0).permutation(len(tr_texts))[:400]
    correct = 0
    examples = []
    for i in sub:
        pred = to4(str(clf(tr_texts[i])[0][0]["label"]).lower())
        correct += int(pred == tr4[i])
    train_self = correct / len(sub)

    # misclassified eval examples for the error-analysis table
    for t, c in zip(ev_texts, ev_cats):
        if len(examples) >= 12:
            break
        pred_cat = str(clf(t)[0][0]["label"]).lower()
        if to4(pred_cat) != to4(c):
            examples.append({"text": t, "true_category": c,
                             "true": to4(c), "predicted_category": pred_cat,
                             "predicted": to4(pred_cat)})

    report = {
        "eval": {"accuracy": ev_report["accuracy"],
                 "confusion": ev_report["confusion"],
                 "emotions": list(EMOTIONS)},
        "knn_ngram_ceiling": knn_acc,
        "train_self_accuracy": float(train_self),
        "misclassified_examples": examples,
    }
    if verbose:
        print(f"[text-ceiling] deployed eval {ev_report['accuracy']:.1%} | "
              f"1-NN char-ngram surface baseline {knn_acc:.1%} | "
              f"train-self {train_self:.1%}")
        print(f"[text-ceiling] confusion (rows=true {list(EMOTIONS)}):")
        for e, row in zip(EMOTIONS, ev_report["confusion"]):
            print(f"  {e:6s} {row}")
        for ex in examples[:6]:
            print(f"  miss: {ex['true']}->{ex['predicted']}: {ex['text']!r}")
    return report


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
