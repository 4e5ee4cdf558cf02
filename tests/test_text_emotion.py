"""Offline text-emotion stack (VERDICT-r3 item 5): measured lexicon accuracy,
the framework's own trained classifier, and the backend ladder."""
import os

import numpy as np
import pytest

from melogan_tpu.data.text_corpus import (
    CATEGORY_PHRASES,
    generate_text_corpus,
)
from melogan_tpu.models import text_emotion


def test_corpus_splits_are_disjoint():
    tr_texts, tr_labels = generate_text_corpus("train")
    ev_texts, ev_labels = generate_text_corpus("eval")
    assert not set(tr_texts) & set(ev_texts)
    # every category appears in both splits
    assert set(tr_labels) == set(ev_labels) == set(CATEGORY_PHRASES)
    # phrase-level disjointness: no eval phrase is a substring of any train text
    tr_blob = "\n".join(tr_texts)
    cut_phrases = {p for ps in CATEGORY_PHRASES.values()
                   for p in ps[max(1, int(len(ps) * 0.7)):]}
    for p in cut_phrases:
        assert p not in tr_blob, f"eval phrase leaked into train: {p!r}"
    with pytest.raises(ValueError):
        generate_text_corpus("test")


def test_train_bpe_tokenizes_everything():
    from melogan_tpu.models.tokenizer import train_bpe

    texts = ["hello world", "the quick brown fox", "hello again, world"]
    bpe = train_bpe(texts, vocab_size=300)
    assert len(bpe.vocab) <= 300
    # any text tokenizes (full byte alphabet), including unseen characters
    for t in texts + ["völlig neu — ünseen ☃ input"]:
        ids = bpe.encode(t)
        assert ids[0] == bpe.bos_id and ids[-1] == bpe.eos_id
        assert all(isinstance(i, int) for i in ids)
    # merges actually compress: a repeated word becomes few tokens
    assert len(bpe.encode_text("hello")) < len("hello")


@pytest.fixture(scope="module")
def trained_clf():
    from melogan_tpu.models.text_mlp import train_text_classifier

    return train_text_classifier()


def test_own_classifier_beats_lexicon_on_heldout(trained_clf):
    """The shipped claim: text-mlp > lexicon on BOTH overall and macro
    accuracy over the held-out eval split, and the MEASURED_EVAL_ACCURACY
    constants match the live measurement (so the /healthz numbers can never
    drift from their derivation)."""
    from melogan_tpu.diagnostics.text_eval import evaluate_text_backend

    lex = evaluate_text_backend(text_emotion.LexiconClassifier())
    own = evaluate_text_backend(trained_clf)

    def macro(r):
        return float(np.mean([v["accuracy"] for v in r["per_emotion"].values()]))

    assert own["accuracy"] > lex["accuracy"]
    assert macro(own) > macro(lex)

    rec = text_emotion.MEASURED_EVAL_ACCURACY
    assert abs(own["accuracy"] - rec["text-mlp"]["overall"]) < 0.02
    assert abs(macro(own) - rec["text-mlp"]["macro"]) < 0.02
    assert abs(lex["accuracy"] - rec["lexicon"]["overall"]) < 0.02
    assert abs(macro(lex) - rec["lexicon"]["macro"]) < 0.02


def test_keyword_text_never_regresses_below_lexicon(trained_clf):
    """The decision rule guarantees trigger-worded text keeps the lexicon's
    call: on every eval sentence where the lexicon's top category is unique
    and correct, the ensemble is correct too."""
    lex = text_emotion.LexiconClassifier()
    checked = 0
    for split in ("eval", "train"):  # eval avoids triggers by design; train
        texts, cats = generate_text_corpus(split)  # exercises them heavily
        for t, c in zip(texts, cats):
            scores = lex.scores(t)
            top = max(scores, key=lambda k: scores[k])
            uniquely = scores[top] > 0 and sum(
                1 for v in scores.values() if v == scores[top]) == 1
            if uniquely and top == c:
                assert trained_clf(t)[0][0]["label"] == c, t
                checked += 1
    assert checked > 100  # the guarantee was actually exercised


def test_save_load_roundtrip(tmp_path, trained_clf):
    from melogan_tpu.models.text_mlp import TextMLPClassifier

    path = str(tmp_path / "clf.ckpt")
    trained_clf.save(path)
    loaded = TextMLPClassifier.load(path)
    for t in ("i can't stop smiling", "the meeting starts at nine",
              "my stomach is in knots"):
        assert loaded(t) == trained_clf(t)


def test_backend_ladder_and_forced_lexicon(monkeypatch, tmp_path):
    monkeypatch.delenv("MELOGAN_TEXT_MODEL_DIR", raising=False)
    monkeypatch.setenv("MELOGAN_TEXT_MLP_CACHE", str(tmp_path / "cache.ckpt"))
    text_emotion.reset_backend()
    try:
        assert text_emotion.backend_name() == "text-mlp"
        info = text_emotion.backend_info()
        assert info["measured_eval_accuracy"]["overall"] > 0.45
        assert "beats" not in info["note"]  # numbers, not slogans
        assert "51.0%" in info["note"]
        # cache was written; a fresh load uses it
        assert os.path.exists(tmp_path / "cache.ckpt")
        text_emotion.reset_backend()
        assert text_emotion.backend_name() == "text-mlp"

        monkeypatch.setenv("MELOGAN_TEXT_BACKEND", "lexicon")
        text_emotion.reset_backend()
        assert text_emotion.backend_name() == "lexicon"
        info = text_emotion.backend_info()
        assert "43.4%" in info["note"]
        assert info["measured_eval_accuracy"]["overall"] == pytest.approx(0.434)
    finally:
        text_emotion.reset_backend()


def test_text_eval_cli(capsys, monkeypatch, tmp_path):
    from melogan_tpu.cli import main

    monkeypatch.setenv("MELOGAN_TEXT_MLP_CACHE", str(tmp_path / "c.ckpt"))
    main(["text-eval"])
    out = capsys.readouterr().out
    assert "lexicon" in out and "text-mlp" in out
    assert "accuracy" in out
