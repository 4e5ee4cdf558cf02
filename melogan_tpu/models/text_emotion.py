"""Text → emotion classifier.

Reference behavior (textClassification/text.py): a go_emotions 28-label
classifier whose top label is mapped to the four music emotions (happy / sad /
angry / calm, default calm).

Backends, in order:
1. the TPU-native JAX RoBERTa classifier (``models/roberta.py``) converted
   from a local HF checkpoint dir (``MELOGAN_TEXT_MODEL_DIR``) — the real
   go_emotions model running as one XLA program;
2. the HF transformers pipeline on the same local dir (torch CPU), if the
   JAX conversion fails;
3. the framework's OWN trained classifier (``models/text_mlp.py``: own-BPE
   embeddings + lexicon features, decision-level ensemble) — the default
   offline backend; beats the lexicon on the held-out eval set
   (MEASURED_EVAL_ACCURACY below);
4. the keyword lexicon — last resort, or forced via
   ``MELOGAN_TEXT_BACKEND=lexicon``.

All backends apply the identical 28→4 label map. No backend ever downloads
(the reference pulls ~500 MB from the hub at import time,
textClassification/text.py:48-58; this environment is offline by design).
"""
from __future__ import annotations

import os
import re
from typing import Dict

# 28-label → 4-emotion map (behavioral contract from the reference,
# textClassification/text.py:8-43).
TEXT_MODEL_TO_MY_EMOTIONS: Dict[str, str] = {
    "joy": "happy", "amusement": "happy", "excitement": "happy",
    "love": "happy", "optimism": "happy", "gratitude": "happy",
    "surprise": "happy", "approval": "happy",
    "sadness": "sad", "disappointment": "sad", "grief": "sad",
    "disgust": "sad", "remorse": "sad",
    "anger": "angry", "annoyance": "angry", "fear": "angry",
    "nervousness": "angry", "disapproval": "angry",
    "neutral": "calm", "caring": "calm", "relief": "calm",
    "pride": "calm", "admiration": "calm", "realization": "calm",
    "curiosity": "calm", "desire": "calm", "confusion": "calm",
}
DEFAULT_EMOTION = "calm"

# go_emotions category → trigger lexicon for the offline backend
_LEXICON: Dict[str, list] = {
    "joy": ["happy", "joy", "joyful", "glad", "delighted", "cheerful", "great", "wonderful", "yay"],
    "amusement": ["funny", "hilarious", "lol", "haha", "amusing", "laugh"],
    "excitement": ["excited", "thrilled", "stoked", "pumped", "can't wait", "awesome"],
    "love": ["love", "adore", "beloved", "darling", "sweetheart"],
    "optimism": ["hopeful", "optimistic", "bright", "looking forward", "promising"],
    "gratitude": ["thanks", "thank", "grateful", "appreciate"],
    "surprise": ["surprised", "wow", "unexpected", "astonish", "amazed"],
    "approval": ["agree", "approve", "well done", "nice", "good job", "perfect"],
    "sadness": ["sad", "unhappy", "depressed", "down", "crying", "cry", "tears", "miserable", "blue", "heartbroken"],
    "disappointment": ["disappointed", "letdown", "let down", "bummer", "shame"],
    "grief": ["grief", "mourning", "loss", "died", "passed away", "funeral"],
    "disgust": ["disgusting", "gross", "nasty", "revolting", "yuck"],
    "remorse": ["sorry", "regret", "apologize", "guilty", "my fault"],
    "anger": ["angry", "furious", "infuriating", "infuriated", "mad", "rage", "outraged", "hate", "livid"],
    "annoyance": ["annoyed", "irritating", "annoying", "bothers", "ugh", "frustrating", "frustrated"],
    "fear": ["afraid", "scared", "terrified", "fear", "frightened", "horror"],
    "nervousness": ["nervous", "anxious", "worried", "uneasy", "stress", "stressed"],
    "disapproval": ["disagree", "disapprove", "wrong", "bad idea", "terrible idea"],
    "neutral": [],
    "caring": ["care", "caring", "take care", "comfort", "support you"],
    "relief": ["relieved", "relief", "phew", "finally over"],
    "pride": ["proud", "pride", "accomplished", "achievement"],
    "admiration": ["admire", "impressive", "brilliant", "amazing", "incredible"],
    "realization": ["realize", "realized", "turns out", "i see now"],
    "curiosity": ["curious", "wonder", "wondering", "interested", "intrigued"],
    "desire": ["wish", "want", "crave", "longing", "hope to"],
    "confusion": ["confused", "confusing", "don't understand", "puzzled", "unclear"],
}


class LexiconClassifier:
    """Offline 28-category keyword scorer with the reference's 28→4 map."""

    def __init__(self):
        self._patterns = {
            label: [re.compile(r"\b" + re.escape(w).replace(r"\ ", r"\s+") + r"\b") for w in words]
            for label, words in _LEXICON.items()
        }

    def scores(self, text: str) -> Dict[str, int]:
        """Per-category keyword-hit counts (feature vector for the hybrid
        text-mlp backend, models/text_mlp.py)."""
        t = str(text).lower()
        return {
            label: sum(1 for p in pats if p.search(t))
            for label, pats in self._patterns.items()
        }

    def top_label(self, text: str) -> str:
        scores = self.scores(text)
        best = max(scores, key=lambda k: scores[k])
        return best if scores[best] > 0 else "neutral"

    def __call__(self, text: str):
        return [[{"label": self.top_label(text), "score": 1.0}]]


_classifier = None
_backend = None


def _load_classifier():
    global _classifier, _backend
    if _classifier is not None:
        return _classifier
    model_dir = os.environ.get("MELOGAN_TEXT_MODEL_DIR")
    forced = os.environ.get("MELOGAN_TEXT_BACKEND")  # 'text-mlp' | 'lexicon'
    if model_dir and forced not in ("text-mlp", "lexicon"):
        # preferred: TPU-native JAX RoBERTa (one XLA program per bucket shape)
        try:
            from melogan_tpu.models.roberta import RobertaTextClassifier  # noqa: PLC0415

            _classifier = RobertaTextClassifier(model_dir)
            _backend = "jax-roberta"
            return _classifier
        except Exception as e:  # noqa: BLE001
            print(f"[WARN] JAX RoBERTa backend unavailable ({e}); trying transformers")
        try:
            os.environ.setdefault("HF_HUB_OFFLINE", "1")
            os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
            from transformers import pipeline  # noqa: PLC0415

            _classifier = pipeline("text-classification", model=model_dir, top_k=1)
            _backend = "transformers"
            return _classifier
        except Exception as e:  # noqa: BLE001
            print(f"[WARN] transformers text model unavailable ({e}); "
                  "using the offline classifier")
    if forced != "lexicon":
        # default offline backend: the framework's own hybrid classifier —
        # it beats the lexicon on the held-out eval set on both overall and
        # macro accuracy (measured numbers in _BACKEND_NOTES /
        # diagnostics/text_eval.py; asserted by tests/test_text_emotion.py)
        try:
            from melogan_tpu.models.text_mlp import load_or_train  # noqa: PLC0415

            _classifier = load_or_train()
            _backend = "text-mlp"
            return _classifier
        except Exception as e:  # noqa: BLE001
            print(f"[WARN] text-mlp backend unavailable ({e}); using lexicon")
    _classifier = LexiconClassifier()
    _backend = "lexicon"
    return _classifier


def reset_backend() -> None:
    """Drop the cached classifier (tests / env change)."""
    global _classifier, _backend
    _classifier = None
    _backend = None


def backend_name() -> str:
    _load_classifier()
    return _backend or "lexicon"


# measured on the held-out eval split of the framework corpus
# (data/text_corpus.py; 1,210 sentences after the round-5 expansion to 28
# phrases/category, disjoint phrases AND templates from training;
# majority-class chance 33%). Re-derivable via
# diagnostics/text_eval.py::compare_offline_backends; tests assert the live
# measurement matches these constants and that text-mlp > lexicon on both.
# Context numbers from the same round's ceiling study (text-eval --ceiling):
# a 1-NN char-ngram surface matcher scores 46.1% on this split and the
# classifier scores ~100% on its own training sentences — the eval gap is
# generalization to unseen paraphrases, bounded by the from-scratch corpus.
MEASURED_EVAL_ACCURACY = {
    "text-mlp": {"overall": 0.510, "macro": 0.484},
    "lexicon": {"overall": 0.434, "macro": 0.358},
}

_BACKEND_NOTES = {
    "jax-roberta": "go_emotions RoBERTa running natively in JAX (reference-model accuracy)",
    "transformers": "go_emotions RoBERTa via the HF pipeline on torch CPU (reference-model accuracy)",
    "text-mlp": (
        "framework-trained hybrid classifier (own BPE embeddings + hashed "
        "char-ngrams + lexicon features, hierarchical category/4-emotion "
        "loss) — measured 51.0% overall / 48.4% macro 4-emotion accuracy "
        "on the held-out eval set (chance 33%/25%; lexicon scores 43.4%/35.8% "
        "there; a surface 1-NN baseline 46.1%). NOT go_emotions-model grade: "
        "set MELOGAN_TEXT_MODEL_DIR to a local go_emotions checkpoint for "
        "reference accuracy."
    ),
    "lexicon": (
        "keyword-lexicon fallback — measured 43.4% overall / 35.8% macro "
        "4-emotion accuracy on the held-out eval set (heavily calm-biased: "
        "97.5% on calm, 11-21% elsewhere; chance 33%/25%). Set "
        "MELOGAN_TEXT_MODEL_DIR to a local go_emotions checkpoint for "
        "model-grade text emotion."
    ),
}


def backend_info() -> Dict[str, object]:
    """Backend name, accuracy note, and (for the offline backends) the
    MEASURED eval-set accuracy — surfaced in /healthz so deployments state
    numbers, not caveat strings (VERDICT-r3 item 5)."""
    name = backend_name()
    info: Dict[str, object] = {"backend": name, "note": _BACKEND_NOTES.get(name, "")}
    if name in MEASURED_EVAL_ACCURACY:
        info["measured_eval_accuracy"] = MEASURED_EVAL_ACCURACY[name]
    return info


def predict_emotion(text: str) -> str:
    """Top-label prediction mapped to the four music emotions."""
    if not text or not str(text).strip():
        return DEFAULT_EMOTION
    clf = _load_classifier()
    try:
        result = clf(str(text))
        label = result[0][0]["label"] if isinstance(result[0], list) else result[0]["label"]
        return TEXT_MODEL_TO_MY_EMOTIONS.get(str(label).lower(), DEFAULT_EMOTION)
    except Exception:  # noqa: BLE001
        return DEFAULT_EMOTION
