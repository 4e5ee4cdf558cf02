"""TPU-native RoBERTa text backend: numerics vs torch, end-to-end pipeline.

The tests create a tiny randomly-initialized HF RobertaForSequenceClassification
checkpoint on disk (no downloads) and validate that the JAX reimplementation +
weight converter reproduce torch logits exactly, then run the full
tokenizer→XLA pipeline and the serving-level predict_emotion integration.
"""
import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from melogan_tpu.models.roberta import (
    RobertaConfig,
    RobertaTextClassifier,
    convert_hf_checkpoint,
    forward,
    init_params,
    position_ids_from_input_ids,
)

GO_EMOTIONS_LABELS = [
    "admiration", "amusement", "anger", "annoyance", "approval", "caring",
    "confusion", "curiosity", "desire", "disappointment", "disapproval",
    "disgust", "embarrassment", "excitement", "fear", "gratitude", "grief",
    "joy", "love", "nervousness", "optimism", "pride", "realization",
    "relief", "remorse", "sadness", "surprise", "neutral",
]


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    """Tiny random HF checkpoint + a hand-built offline tokenizer."""
    torch = pytest.importorskip("torch")
    from transformers import RobertaConfig as HFConfig
    from transformers import RobertaForSequenceClassification

    d = tmp_path_factory.mktemp("tiny_roberta")
    hf_cfg = HFConfig(
        vocab_size=64,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=66,
        pad_token_id=1,
        num_labels=28,
        id2label={i: l for i, l in enumerate(GO_EMOTIONS_LABELS)},
        label2id={l: i for i, l in enumerate(GO_EMOTIONS_LABELS)},
    )
    torch.manual_seed(0)
    model = RobertaForSequenceClassification(hf_cfg).eval()
    model.save_pretrained(str(d))

    # offline WordLevel tokenizer (same file the real checkpoint dir ships)
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from tokenizers.processors import TemplateProcessing

    words = ["i", "am", "so", "happy", "sad", "angry", "furious", "today",
             "feeling", "very", "down", "great", "it", "is", "calm"]
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    vocab.update({w: 4 + i for i, w in enumerate(words)})
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    tok.post_processor = TemplateProcessing(
        single="<s> $A </s>", special_tokens=[("<s>", 0), ("</s>", 2)]
    )
    tok.save(str(d / "tokenizer.json"))
    with open(d / "tokenizer_config.json", "w") as f:
        json.dump(
            {
                "tokenizer_class": "PreTrainedTokenizerFast",
                "pad_token": "<pad>",
                "unk_token": "<unk>",
                "bos_token": "<s>",
                "eos_token": "</s>",
                "model_max_length": 64,
            },
            f,
        )
    return str(d), model


def test_position_ids_match_hf():
    ids = jnp.asarray([[0, 5, 7, 2, 1, 1], [0, 9, 2, 1, 1, 1]], jnp.int32)
    pos = position_ids_from_input_ids(ids, pad_token_id=1)
    # HF create_position_ids_from_input_ids: pad stays at pad_token_id,
    # real tokens count up from pad_token_id + 1
    np.testing.assert_array_equal(
        np.asarray(pos), [[2, 3, 4, 5, 1, 1], [2, 3, 4, 1, 1, 1]]
    )


def test_logits_match_torch_exactly(tiny_ckpt, rng):
    """Converted weights + JAX forward ≡ HF torch forward (padding included)."""
    torch = pytest.importorskip("torch")
    model_dir, model = tiny_ckpt

    ids = rng.integers(4, 64, size=(3, 12)).astype(np.int64)
    mask = np.ones((3, 12), np.int64)
    ids[1, 8:], mask[1, 8:] = 1, 0  # padded row
    ids[2, 5:], mask[2, 5:] = 1, 0

    with torch.no_grad():
        t_logits = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()

    cfg = RobertaConfig.from_json(os.path.join(model_dir, "config.json"))
    assert cfg.num_labels == 28 and cfg.num_hidden_layers == 2
    params = convert_hf_checkpoint(model_dir)
    j_logits = np.asarray(
        forward(params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32))
    )
    np.testing.assert_allclose(j_logits, t_logits, atol=2e-5)


def test_padding_is_inert(tiny_ckpt, rng):
    """Extra padding must not change a row's logits (mask correctness)."""
    model_dir, _ = tiny_ckpt
    cfg = RobertaConfig.from_json(os.path.join(model_dir, "config.json"))
    params = convert_hf_checkpoint(model_dir)
    ids = rng.integers(4, 64, size=(1, 8)).astype(np.int32)
    mask = np.ones((1, 8), np.int32)
    base = np.asarray(forward(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    ids_p = np.concatenate([ids, np.full((1, 6), cfg.pad_token_id, np.int32)], 1)
    mask_p = np.concatenate([mask, np.zeros((1, 6), np.int32)], 1)
    padded = np.asarray(forward(params, cfg, jnp.asarray(ids_p), jnp.asarray(mask_p)))
    np.testing.assert_allclose(padded, base, atol=1e-5)


def test_classifier_pipeline_end_to_end(tiny_ckpt):
    """tokenizer → bucket pad → jitted forward → top go_emotions label."""
    model_dir, _ = tiny_ckpt
    clf = RobertaTextClassifier(model_dir)
    label = clf.top_label("i am so happy today")
    assert label in GO_EMOTIONS_LABELS
    result = clf("i am so happy today")
    assert result[0][0]["label"] == label
    assert 0.0 < result[0][0]["score"] < 1.0
    # batch of different lengths lands in one padded bucket
    logits = clf.logits(["i am happy", "i am feeling very very down today"])
    assert logits.shape == (2, 28)


def test_predict_emotion_uses_jax_backend(tiny_ckpt, monkeypatch):
    """Serving-level integration: MELOGAN_TEXT_MODEL_DIR → jax-roberta backend,
    predictions map 28 → 4 music emotions (reference text.py:96-104)."""
    from melogan_tpu.models import text_emotion

    model_dir, _ = tiny_ckpt
    monkeypatch.setenv("MELOGAN_TEXT_MODEL_DIR", model_dir)
    text_emotion.reset_backend()
    try:
        assert text_emotion.backend_name() == "jax-roberta"
        out = text_emotion.predict_emotion("i am so happy today")
        assert out in ("happy", "sad", "angry", "calm")
        assert text_emotion.predict_emotion("") == "calm"
    finally:
        text_emotion.reset_backend()


def test_init_params_forward_shapes(rng):
    """From-scratch init produces a runnable model (training substrate)."""
    import jax

    cfg = RobertaConfig(
        vocab_size=50, hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=32, max_position_embeddings=40, num_labels=4,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.asarray(rng.integers(4, 50, size=(2, 10)), jnp.int32)
    mask = jnp.ones((2, 10), jnp.int32)
    logits = forward(params, cfg, ids, mask)
    assert logits.shape == (2, 4)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_init_params_full_depth():
    """Full roberta-base depth (12 layers) must initialize — the key pool is
    sized from num_hidden_layers (a fixed 64-key pool exhausted at >7 layers)."""
    import jax

    cfg = RobertaConfig()  # 12 layers, 768 hidden
    params = init_params(cfg, jax.random.PRNGKey(0))
    assert params["layers"]["q_w"].shape == (12, 768, 768)
    n = sum(np.prod(np.shape(l)) for l in jax.tree_util.tree_leaves(params))
    assert n > 120e6  # roberta-base scale


# ---------------------------------------------------------------------------
# VERDICT-r2 #3: self-contained tokenizer — token-id-identical to
# AutoTokenizer, and the backend loads with transformers absent.
# ---------------------------------------------------------------------------

EDGE_CORPUS = [
    "I am so happy today!",
    "don't can't won't it's I'll we've you're he'd I'm",
    "HE'S SHOUTING'S WEIRD",
    "antidisestablishmentarianism pneumonoultramicroscopicsilicovolcanoconiosis",
    "naïve façade résumé Zürich übermäßig",
    "日本語のテキスト и русский текст và tiếng Việt",
    "emoji 🎵🎹 and more 🎶 music",
    "  leading and   multiple    spaces  ",
    "tabs\tand\nnewlines\r\nmixed \t whitespace",
    "numbers 12345 3.14159 1,000,000 0x1F",
    "punctuation!!! ??? ... --- ***(nested [brackets] {braces})***",
    "MixedCASE camelCase snake_case kebab-case",
    "trailing space ",
    " ",
    "",
    "a",
    "'quoted' \"double\" `backtick`",
    "url-ish http://example.com/path?q=1&r=2#frag",
    # U+001C-1F: isspace() in Python but NOT regex \s — they must glue to
    # punctuation runs (an apostrophe-separator pair "'\x1c" is ONE pre-token)
    "sep'\x1cconts\x1d\x1e\x1f done \x1c",
]


@pytest.fixture(scope="module")
def bpe_dir(tmp_path_factory):
    """A REAL byte-level BPE (trained merges, full byte alphabet) saved in the
    classic RoBERTa checkpoint layout: vocab.json + merges.txt."""
    from tokenizers.implementations import ByteLevelBPETokenizer

    d = tmp_path_factory.mktemp("bpe_tok")
    trainer_corpus = EDGE_CORPUS * 3 + [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "music generation with emotion conditioning",
    ]
    tok = ByteLevelBPETokenizer()
    tok.train_from_iterator(
        trainer_corpus, vocab_size=600, min_frequency=1,
        special_tokens=["<s>", "<pad>", "</s>", "<unk>", "<mask>"],
    )
    tok.save_model(str(d))
    with open(d / "tokenizer_config.json", "w") as f:
        json.dump({"tokenizer_class": "RobertaTokenizer", "model_max_length": 512}, f)
    return str(d)


def test_own_bpe_ids_identical_to_autotokenizer(bpe_dir):
    from transformers import AutoTokenizer

    from melogan_tpu.models.tokenizer import load_tokenizer

    hf = AutoTokenizer.from_pretrained(bpe_dir, local_files_only=True)
    own = load_tokenizer(bpe_dir)
    hf_ids = hf(EDGE_CORPUS, truncation=True, max_length=64, padding=False)["input_ids"]
    own_ids = own(EDGE_CORPUS, truncation=True, max_length=64, padding=False)["input_ids"]
    for text, a, b in zip(EDGE_CORPUS, hf_ids, own_ids):
        assert a == b, f"id mismatch on {text!r}:\n  hf : {a}\n  own: {b}"
    # truncation boundary exactness on a long text
    long = " ".join(EDGE_CORPUS) * 4
    for limit in (8, 16, 33):
        assert hf([long], truncation=True, max_length=limit)["input_ids"][0] == \
            own([long], truncation=True, max_length=limit)["input_ids"][0]


def test_own_wordlevel_ids_identical_to_tokenizers(tiny_ckpt):
    """The tokenizer.json (WordLevel) path matches the rust tokenizers lib."""
    import os as _os

    from tokenizers import Tokenizer

    from melogan_tpu.models.tokenizer import load_tokenizer

    model_dir, _ = tiny_ckpt
    rust = Tokenizer.from_file(_os.path.join(model_dir, "tokenizer.json"))
    own = load_tokenizer(model_dir)
    for text in ["i am so happy today", "it is calm", "unknown words here", ""]:
        assert own.encode(text) == rust.encode(text).ids, text


def test_backend_loads_with_transformers_absent(tiny_ckpt, monkeypatch):
    """The jax-roberta serving backend must be importable and functional with
    the transformers package missing entirely (reference text.py:48-58 is the
    dependency this replaces)."""
    import sys as _sys

    from melogan_tpu.models import text_emotion

    model_dir, _ = tiny_ckpt
    # make any `import transformers` raise ImportError
    monkeypatch.setitem(_sys.modules, "transformers", None)
    monkeypatch.setenv("MELOGAN_TEXT_MODEL_DIR", model_dir)
    text_emotion.reset_backend()
    try:
        assert text_emotion.backend_name() == "jax-roberta"
        assert text_emotion.predict_emotion("i am so happy today") in (
            "happy", "sad", "angry", "calm",
        )
    finally:
        text_emotion.reset_backend()


def test_pretokenize_matches_gpt2_regex():
    """The hand-written scanner is equivalent to the canonical GPT-2 pattern
    (alternation order, contraction set, whitespace lookahead semantics)."""
    regex = pytest.importorskip("regex")

    from melogan_tpu.models.tokenizer import pretokenize

    pat = regex.compile(
        r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
    )
    for text in EDGE_CORPUS + ["x  y", "a\n\nb", "  ", "\t\ta", "é'è", "1'2",
                               "'\x1c", "a\x1cb", "\x1c\x1c", " \x1c "]:
        assert pretokenize(text) == pat.findall(text), repr(text)
    # seeded fuzz incl. the U+001C-1F separators (isspace() yet not regex \s)
    import random

    rng = random.Random(7)
    pools = (
        list(range(0x09, 0x0E)) + list(range(0x1C, 0x21)) + [0x27, 0x85, 0xA0]
        + list(range(0x30, 0x3A)) + list(range(0x61, 0x7B))
        + list(range(0x2000, 0x200C)) + [0x0301, 0x00E9, 0x4E2D]
    )
    for _ in range(3000):
        s = "".join(chr(rng.choice(pools)) for _ in range(rng.randint(0, 12)))
        assert pretokenize(s) == pat.findall(s), ascii(s)


def test_wordlevel_split_matches_rust_whitespace():
    """WordLevel pre-tokenization must match the tokenizers library's
    Whitespace (\\w+|[^\\w\\s]+ with UNICODE \\w/\\s — NOT Python isalnum/
    isspace: superscript digits are isalnum but not \\w, combining marks are
    \\w but not isalnum, U+001C-1F are isspace but not White_Space)."""
    from tokenizers.pre_tokenizers import Whitespace

    from melogan_tpu.models.tokenizer import WordLevelTokenizer

    ws = Whitespace()
    corpus = EDGE_CORPUS + [
        "x\u00b2y",                    # superscript two: isalnum() yet not \\w
        "e\u0301clair e\u0301",       # NFD combining acute: \\w yet not isalnum()
        "\u0939\u093f\u0928\u094d\u0926\u0940",  # Hindi with matras (Mc/Mn)
        "\u0915\u094d\u200d\u0937",  # ZWJ conjunct (Join_Control)
        "\u2162 xii \u2163",          # roman numerals (Nl)
        "a_b __x",                       # connector punctuation
        "x\u00adco",                   # soft hyphen (Cf -> punctuation run)
        "\x1c\x1dweird",              # isspace() controls NOT White_Space
        "\u00a0nbsp\u2009thin\u3000ideo",  # unicode spaces
        "12\u00bd cups",               # vulgar fraction (No)
    ]
    for text in corpus:
        rust = [p for p, _ in ws.pre_tokenize_str(text)]
        assert WordLevelTokenizer._split(text) == rust, ascii(text)
    # seeded fuzz over mixed scripts/marks/spaces/controls
    import random

    rng = random.Random(0)
    pools = (
        list(range(0x20, 0x300)) + list(range(0x370, 0x500))
        + list(range(0x900, 0x9A0)) + list(range(0x2000, 0x2070))
        + list(range(0x3040, 0x30A0))
        + [0x200C, 0x200D, 0x1C, 0x85, 0xA0, 0x3000]
    )
    for _ in range(3000):
        s = "".join(chr(rng.choice(pools)) for _ in range(rng.randint(0, 12)))
        rust = [p for p, _ in ws.pre_tokenize_str(s)]
        assert WordLevelTokenizer._split(s) == rust, ascii(s)


def test_sequence_wrapped_byte_level_keeps_prefix_space(bpe_dir, tmp_path):
    """tokenizer.json serializations commonly wrap ByteLevel in a Sequence
    pre_tokenizer; add_prefix_space=true must survive the nesting (a silent
    False produces systematically different ids on every first word)."""
    from melogan_tpu.models.tokenizer import load_tokenizer

    with open(os.path.join(bpe_dir, "vocab.json"), encoding="utf-8") as f:
        vocab = json.load(f)
    with open(os.path.join(bpe_dir, "merges.txt"), encoding="utf-8") as f:
        merges = [line.rstrip("\n") for line in f
                  if line.strip() and not line.startswith("#version")]
    d = tmp_path / "seq_tok"
    d.mkdir()
    with open(d / "tokenizer.json", "w", encoding="utf-8") as f:
        json.dump({
            "model": {"type": "BPE", "vocab": vocab, "merges": merges,
                      "unk_token": "<unk>"},
            "pre_tokenizer": {
                "type": "Sequence",
                "pretokenizers": [
                    {"type": "ByteLevel", "add_prefix_space": True,
                     "trim_offsets": True, "use_regex": True},
                ],
            },
        }, f)
    own = load_tokenizer(str(d))
    assert own.add_prefix_space is True
    # flat (non-Sequence) form loads identically
    flat = tmp_path / "flat_tok"
    flat.mkdir()
    with open(flat / "tokenizer.json", "w", encoding="utf-8") as f:
        json.dump({
            "model": {"type": "BPE", "vocab": vocab, "merges": merges,
                      "unk_token": "<unk>"},
            "pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": True,
                              "trim_offsets": True, "use_regex": True},
        }, f)
    assert load_tokenizer(str(flat)).encode_text("so happy") == \
        own.encode_text("so happy")
    # and the prefix space actually changes the first word's ids
    assert own.encode_text("so happy") != \
        load_tokenizer(bpe_dir).encode_text("so happy")
