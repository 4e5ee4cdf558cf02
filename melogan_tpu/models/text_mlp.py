"""Self-contained text-emotion classifier: own-BPE tokens → embedding →
masked mean-pool → MLP → 28 go_emotions logits.

The reference's text backend is a downloaded go_emotions RoBERTa
(textClassification/text.py:54-58) that cannot exist offline; round 3's
fallback was a keyword lexicon with an unmeasured-accuracy caveat
(VERDICT-r3 weak #4 / item 5). This model is the framework's own offline
backend: trained on the framework-owned labeled corpus
(data/text_corpus.py) with a BPE trained from scratch
(models/tokenizer.py::train_bpe) — fully deterministic, trains in seconds as
ONE fused XLA program, and is measured against the lexicon on a held-out
eval split (tests/test_text_emotion.py; numbers in diagnostics/text_eval.py).

Same 28-category output contract as every other backend; the 28→4 music map
is applied downstream (models/text_emotion.py).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

MAX_LEN = 32
CATEGORIES: Tuple[str, ...] = (
    "joy", "amusement", "excitement", "love", "optimism", "gratitude",
    "surprise", "approval", "sadness", "disappointment", "grief", "disgust",
    "remorse", "anger", "annoyance", "fear", "nervousness", "disapproval",
    "neutral", "caring", "relief", "pride", "admiration", "realization",
    "curiosity", "desire", "confusion",
)  # 27 trained categories (go_emotions minus the unused 'embarrassment' row:
# the corpus covers exactly the 27 categories the reference's 28→4 map plus
# 'neutral' needs — see data/text_corpus.py CATEGORY_PHRASES)


N_NGRAM_BUCKETS = 4096


def _char_ngram_counts(texts: Sequence[str], n_buckets: int = N_NGRAM_BUCKETS) -> np.ndarray:
    """Hashed bag of character 3–5-grams (fastText-style subword features).

    Char n-grams generalize across inflections ('thrill'/'thrilled') and
    templates in a way whole-token BPE embeddings cannot on a small corpus.
    Hashing is zlib.crc32 — deterministic across processes/runs (Python's
    ``hash`` is salted), so the trained classifier is cache-stable. (A
    word-uni/bigram variant was measured and did not beat char-only —
    50.3% vs 51.0% overall on the pre-expansion eval split.)"""
    import zlib

    out = np.zeros((len(texts), n_buckets), np.float32)
    for i, t in enumerate(texts):
        s = " " + " ".join(str(t).lower().split()) + " "
        b = s.encode("utf-8", "ignore")
        for n in (3, 4, 5):
            for j in range(len(b) - n + 1):
                out[i, zlib.crc32(b[j:j + n]) % n_buckets] += 1.0
    return np.log1p(out)


def _build_model(vocab_size: int, n_classes: int, dropout: float = 0.0):
    import flax.linen as nn
    import jax.numpy as jnp

    class TextEmotionMLP(nn.Module):
        """Hybrid of three feature channels: pooled own-BPE embeddings,
        hashed char-3–5-gram counts, and the lexicon's per-category
        keyword-hit counts. The lexicon channel guarantees the model starts
        from at-least-lexicon signal on keyword-bearing text; the char-ngram
        channel carries subword generalization to unseen phrasings; the BPE
        channel carries whole-token context. Dropout regularizes training
        only (a 300-epoch run without it memorizes the corpus to loss 0.000
        with no eval gain — measured ablation in diagnostics/text_eval.py)."""

        @nn.compact
        def __call__(self, ids, mask, lex, ngrams, train: bool = False):
            emb = nn.Embed(vocab_size, 64, name="embed")(ids)
            denom = jnp.maximum(mask.sum(axis=-1, keepdims=True), 1.0)
            pooled = (emb * mask[..., None]).sum(axis=1) / denom
            ng = nn.gelu(nn.Dense(128, name="ngram_proj")(ngrams))
            feats = jnp.concatenate([pooled, ng, lex], axis=-1)
            feats = nn.Dropout(dropout, deterministic=not train)(feats)
            h = nn.gelu(nn.Dense(256, name="fc1")(feats))
            h = nn.Dropout(dropout, deterministic=not train)(h)
            return nn.Dense(n_classes, name="head")(h)

    return TextEmotionMLP()


def _lexicon_features(texts: Sequence[str], categories: Sequence[str]) -> np.ndarray:
    from melogan_tpu.models.text_emotion import LexiconClassifier

    lex = LexiconClassifier()
    out = np.zeros((len(texts), len(categories)), np.float32)
    for i, t in enumerate(texts):
        s = lex.scores(t)
        out[i] = [float(s.get(c, 0)) for c in categories]
    return out


def _encode_batch(bpe, texts: Sequence[str], max_len: int = MAX_LEN):
    ids = np.full((len(texts), max_len), bpe.pad_id, np.int32)
    mask = np.zeros((len(texts), max_len), np.float32)
    for i, t in enumerate(texts):
        row = bpe.encode(t, max_length=max_len)[:max_len]
        ids[i, : len(row)] = row
        mask[i, : len(row)] = 1.0
    return ids, mask


class TextMLPClassifier:
    """Backend-interface wrapper (same call contract as LexiconClassifier /
    the HF pipeline: ``clf(text) -> [[{"label", "score"}]]``)."""

    def __init__(self, bpe, params, categories: Sequence[str] = CATEGORIES,
                 fingerprint: Optional[str] = None):
        import jax

        self.bpe = bpe
        self.params = params
        self.categories = tuple(categories)
        self.fingerprint = fingerprint
        model = _build_model(len(bpe.vocab), len(self.categories))
        self._apply = jax.jit(
            lambda p, ids, mask, lex, ng: model.apply(
                {"params": p}, ids, mask, lex, ng)
        )

    def top_label(self, text: str) -> Tuple[str, float]:
        """Decision rule: softmax(model logits) + keyword-hit counts.

        Counts are integers and probabilities sum to 1, so ANY category with
        a unique keyword hit outranks every no-hit category — trigger-worded
        text can never regress below the lexicon's call — while ties between
        equally-hit categories (and all keyword-free text) are decided by the
        trained model. Measured on the held-out eval set this dominates both
        components (diagnostics/text_eval.py)."""
        ids, mask = _encode_batch(self.bpe, [str(text)])
        lex = _lexicon_features([str(text)], self.categories)
        ng = _char_ngram_counts([str(text)])
        logits = np.asarray(self._apply(self.params, ids, mask, lex, ng))[0]
        probs = np.exp(logits - logits.max())
        probs /= probs.sum()
        score = probs + lex[0]
        k = int(score.argmax())
        return self.categories[k], float(probs[k])

    def __call__(self, text: str):
        label, score = self.top_label(text)
        return [[{"label": label, "score": score}]]

    # -- persistence --------------------------------------------------------
    def save(self, path: str) -> None:
        from flax import serialization

        from melogan_tpu.utils.atomic import atomic_write

        meta = {
            "vocab": self.bpe.vocab,
            "merges": [list(m) for m in self.bpe.ranks],
            "categories": list(self.categories),
            "add_prefix_space": self.bpe.add_prefix_space,
            "fingerprint": self.fingerprint,
        }
        blob = serialization.msgpack_serialize(
            {"meta": np.frombuffer(json.dumps(meta).encode(), np.uint8).copy(),
             "params": self.params}
        )
        atomic_write(path, lambda f: f.write(blob), mode="wb")

    @classmethod
    def load(cls, path: str) -> "TextMLPClassifier":
        from flax import serialization

        from melogan_tpu.models.tokenizer import ByteLevelBPE

        with open(path, "rb") as f:
            tree = serialization.msgpack_restore(f.read())
        meta = json.loads(bytes(np.asarray(tree["meta"], np.uint8)).decode())
        merges = sorted(meta["merges"], key=lambda m: meta["vocab"][m[0] + m[1]])
        bpe = ByteLevelBPE(
            meta["vocab"], [tuple(m) for m in merges],
            add_prefix_space=meta.get("add_prefix_space", False),
        )
        return cls(bpe, tree["params"], meta["categories"],
                   fingerprint=meta.get("fingerprint"))


def train_text_classifier(
    seed: int = 0,
    vocab_size: int = 600,
    epochs: int = 150,
    batch_size: int = 64,
    lr: float = 2e-3,
    verbose: bool = False,
    dropout: float = 0.0,
    label_smooth: float = 0.0,
    ce4_weight: float = 1.0,
) -> TextMLPClassifier:
    """Train the offline text classifier on the framework corpus.

    Deterministic (seeded data order + init); the whole run is one jitted
    ``lax.scan`` over epochs of minibatch steps — seconds on CPU.

    Loss is hierarchical: category cross-entropy plus a 4-music-emotion
    marginal cross-entropy (log-sum-exp of the group's logits). The serving
    path only consumes the 28→4 mapping
    (/root/reference/textClassification/text.py:8-43), so confusions inside
    a group (joy↔amusement) are free while cross-group errors are what the
    auxiliary term penalizes — it directly optimizes the deployed metric."""
    import jax
    import jax.numpy as jnp
    import optax

    from melogan_tpu import EMOTIONS
    from melogan_tpu.data.text_corpus import generate_text_corpus
    from melogan_tpu.models.text_emotion import (
        DEFAULT_EMOTION,
        TEXT_MODEL_TO_MY_EMOTIONS,
    )
    from melogan_tpu.models.tokenizer import train_bpe

    texts, labels = generate_text_corpus("train", seed=seed)
    cats = [c for c in CATEGORIES]
    missing = set(labels) - set(cats)
    if missing:
        raise ValueError(f"corpus categories missing from CATEGORIES: {missing}")
    bpe = train_bpe(texts, vocab_size=vocab_size)
    ids, mask = _encode_batch(bpe, texts)
    lex = _lexicon_features(texts, cats)
    ngrams = _char_ngram_counts(texts)
    y = np.asarray([cats.index(l) for l in labels], np.int32)
    # category index -> 4-emotion group index, and the per-sample group label
    group_of_cat = np.asarray(
        [EMOTIONS.index(TEXT_MODEL_TO_MY_EMOTIONS.get(c, DEFAULT_EMOTION))
         for c in cats], np.int32)
    y4 = group_of_cat[y]

    model = _build_model(len(bpe.vocab), len(cats), dropout=dropout)
    key = jax.random.PRNGKey(seed)
    params = model.init(key, ids[:1], mask[:1], lex[:1], ngrams[:1])["params"]
    opt = optax.adamw(lr, weight_decay=1e-4)
    opt_state = opt.init(params)

    n = len(texts)
    bs = min(batch_size, n)
    n_batches = n // bs
    rng = np.random.default_rng(seed + 1)
    order = np.stack([
        rng.permutation(n)[: n_batches * bs].reshape(n_batches, bs)
        for _ in range(epochs)
    ])

    ids_d, mask_d, y_d = jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(y)
    lex_d, ng_d, y4_d = jnp.asarray(lex), jnp.asarray(ngrams), jnp.asarray(y4)
    # (4, n_cats) one-hot group membership for the marginal logsumexp
    group_mask = jnp.asarray(
        (group_of_cat[None, :] == np.arange(len(EMOTIONS))[:, None]), jnp.float32)

    n_cats = len(cats)
    smooth = label_smooth

    def step(carry, idx_b):
        params, opt_state, drop_key = carry
        drop_key, k_drop = jax.random.split(drop_key)

        def loss_fn(p):
            logits = model.apply(
                {"params": p}, ids_d[idx_b], mask_d[idx_b], lex_d[idx_b],
                ng_d[idx_b], train=True, rngs={"dropout": k_drop})
            logp = jax.nn.log_softmax(logits)
            onehot = jax.nn.one_hot(y_d[idx_b], n_cats)
            soft = onehot * (1.0 - smooth) + smooth / n_cats
            ce_cat = -jnp.mean(jnp.sum(soft * logp, axis=-1))
            # group log-prob: logsumexp over member-category logits − total
            grouped = jax.nn.logsumexp(
                logits[:, None, :] + jnp.log(group_mask)[None], axis=-1)
            logp4 = grouped - jax.nn.logsumexp(logits, axis=-1, keepdims=True)
            ce_4 = -jnp.mean(
                jnp.take_along_axis(logp4, y4_d[idx_b][:, None], axis=1))
            return ce_cat + ce4_weight * ce_4

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, drop_key), loss

    @jax.jit
    def run(params, opt_state, drop_key, order):
        def epoch(carry, idx_e):
            carry, losses = jax.lax.scan(step, carry, idx_e)
            return carry, jnp.mean(losses)

        (params, opt_state, _), losses = jax.lax.scan(
            epoch, (params, opt_state, drop_key), order)
        return params, losses

    params, losses = run(params, opt_state, jax.random.PRNGKey(seed + 2),
                         jnp.asarray(order))
    if verbose:
        print(f"[text-mlp] {epochs} epochs, loss {float(losses[0]):.3f} -> "
              f"{float(losses[-1]):.3f}")
    fp = training_fingerprint(seed=seed, vocab_size=vocab_size,
                              epochs=epochs, lr=lr, dropout=dropout,
                              label_smooth=label_smooth,
                              ce4_weight=ce4_weight)
    return TextMLPClassifier(bpe, jax.device_get(params), cats, fingerprint=fp)


_DEFAULT_CACHE = os.path.join(
    os.path.expanduser("~"), ".cache", "melogan_tpu", "text_mlp.ckpt"
)

# Bump when the model architecture or training recipe changes in a way the
# fingerprint's hashed inputs don't capture.
_MODEL_VERSION = 3


def training_fingerprint(seed: int = 0, vocab_size: int = 600,
                         epochs: int = 150, lr: float = 2e-3,
                         dropout: float = 0.0, label_smooth: float = 0.0,
                         ce4_weight: float = 1.0) -> str:
    """Hash of everything that determines the trained classifier: the corpus
    (texts+labels), the category list, and the training hyperparameters.

    Stored in the cache meta so a stale cached classifier is retrained after
    the corpus or recipe changes instead of silently serving old weights
    while /healthz reports numbers measured for the new code (ADVICE-r4)."""
    import hashlib

    from melogan_tpu.data.text_corpus import generate_text_corpus

    texts, labels = generate_text_corpus("train", seed=seed)
    h = hashlib.sha256()
    h.update(json.dumps({
        "version": _MODEL_VERSION,
        "categories": list(CATEGORIES),
        "seed": seed, "vocab_size": vocab_size, "epochs": epochs, "lr": lr,
        "dropout": dropout, "label_smooth": label_smooth,
        "ce4_weight": ce4_weight, "n_buckets": N_NGRAM_BUCKETS,
        "corpus": list(zip(texts, labels)),
    }, sort_keys=True).encode())
    return h.hexdigest()[:16]


def load_or_train(cache_path: Optional[str] = None, verbose: bool = False) -> TextMLPClassifier:
    """Load the cached classifier or train it (seconds) and cache it.

    Cache location: ``MELOGAN_TEXT_MLP_CACHE`` env or ~/.cache/melogan_tpu/.
    Set the env var to ``0`` to disable caching (tests). A fingerprint of the
    corpus/categories/hyperparameters is checked at load time; mismatch (or a
    pre-fingerprint cache) retrains."""
    env = os.environ.get("MELOGAN_TEXT_MLP_CACHE")
    if env == "0":
        return train_text_classifier(verbose=verbose)
    path = cache_path or env or _DEFAULT_CACHE
    if os.path.exists(path):
        try:
            clf = TextMLPClassifier.load(path)
            if clf.fingerprint == training_fingerprint():
                return clf
            if verbose:
                print("[text-mlp] cache fingerprint mismatch; retraining")
        except Exception as e:  # noqa: BLE001 — stale/corrupt cache: retrain
            if verbose:
                print(f"[text-mlp] cache unreadable ({e}); retraining")
    clf = train_text_classifier(verbose=verbose)
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        clf.save(path)
    except OSError as e:
        if verbose:
            print(f"[text-mlp] could not cache to {path}: {e}")
    return clf
