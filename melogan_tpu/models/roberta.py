"""TPU-native RoBERTa sequence classifier (the go_emotions text backend).

The reference classifies text with an HF pipeline around
``SamLowe/roberta-base-go_emotions`` (reference textClassification/text.py:48-58,
96-104). This module reimplements that model as a single jitted XLA program:

- functional forward over a parameter pytree (no framework Module machinery in
  the hot path)
- the encoder stack is ONE ``lax.scan`` over layer-stacked parameters —
  compile time is depth-independent and XLA tiles every matmul onto the MXU
- exact HF numerics: learned position ids offset past the pad token
  (``pad_token_id + cumsum(mask)``), post-LayerNorm residuals (eps 1e-5),
  erf GELU, tanh-pooled ``<s>``-token classification head
- a weight converter from a local HF checkpoint directory
  (model.safetensors / pytorch_model.bin), validated against torch
  numerics in tests on a tiny randomly-initialized checkpoint

No hub downloads ever happen here (the reference downloads ~500 MB at import
time; this environment is offline by design).
"""
from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    num_labels: int = 28

    @classmethod
    def from_json(cls, path: str) -> "RobertaConfig":
        with open(path) as f:
            raw = json.load(f)
        n_labels = len(raw.get("id2label", {})) or raw.get("num_labels", 28)
        return cls(
            vocab_size=raw["vocab_size"],
            hidden_size=raw["hidden_size"],
            num_hidden_layers=raw["num_hidden_layers"],
            num_attention_heads=raw["num_attention_heads"],
            intermediate_size=raw["intermediate_size"],
            max_position_embeddings=raw["max_position_embeddings"],
            type_vocab_size=raw.get("type_vocab_size", 1),
            layer_norm_eps=raw.get("layer_norm_eps", 1e-5),
            pad_token_id=raw.get("pad_token_id", 1),
            num_labels=n_labels,
        )


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------


def _layer_norm(x, scale, bias, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def position_ids_from_input_ids(input_ids, pad_token_id: int):
    """HF ``create_position_ids_from_input_ids``: positions count non-pad
    tokens, offset past the pad id; pad positions get ``pad_token_id``."""
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + pad_token_id


def forward(params: Dict[str, Any], cfg: RobertaConfig, input_ids, attention_mask):
    """(B, T) int32 token ids + (B, T) {0,1} mask → (B, num_labels) logits.

    One XLA program: embeddings → scan over the stacked encoder layers →
    classification head.
    """
    emb = params["embeddings"]
    pos_ids = position_ids_from_input_ids(input_ids, cfg.pad_token_id)
    x = (
        jnp.take(emb["word"], input_ids, axis=0)
        + jnp.take(emb["position"], pos_ids, axis=0)
        + emb["token_type"][0]
    )
    x = _layer_norm(x, emb["ln_scale"], emb["ln_bias"], cfg.layer_norm_eps)

    h = cfg.num_attention_heads
    dh = cfg.hidden_size // h
    # additive attention bias: 0 for real tokens, large negative for padding
    bias = (1.0 - attention_mask.astype(x.dtype))[:, None, None, :] * jnp.finfo(x.dtype).min

    def layer(x, lp):
        def heads(t):  # (B, T, H) → (B, h, T, dh)
            b, tlen, _ = t.shape
            return jnp.transpose(t.reshape(b, tlen, h, dh), (0, 2, 1, 3))

        q = heads(x @ lp["q_w"] + lp["q_b"])
        k = heads(x @ lp["k_w"] + lp["k_b"])
        v = heads(x @ lp["v_w"] + lp["v_b"])
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(dh) + bias
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        b, _, tlen, _ = ctx.shape
        ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(b, tlen, cfg.hidden_size)
        attn_out = ctx @ lp["attn_out_w"] + lp["attn_out_b"]
        x = _layer_norm(
            x + attn_out, lp["attn_ln_scale"], lp["attn_ln_bias"], cfg.layer_norm_eps
        )
        inter = jax.nn.gelu(x @ lp["inter_w"] + lp["inter_b"], approximate=False)
        ffn_out = inter @ lp["out_w"] + lp["out_b"]
        x = _layer_norm(x + ffn_out, lp["out_ln_scale"], lp["out_ln_bias"], cfg.layer_norm_eps)
        return x, None

    x, _ = jax.lax.scan(layer, x, params["layers"])

    # RobertaClassificationHead: <s> token → dense → tanh → out_proj
    head = params["head"]
    pooled = jnp.tanh(x[:, 0] @ head["dense_w"] + head["dense_b"])
    return pooled @ head["out_w"] + head["out_b"]


# ---------------------------------------------------------------------------
# Initialization (tests / from-scratch training)
# ---------------------------------------------------------------------------


def init_params(cfg: RobertaConfig, key) -> Dict[str, Any]:
    """Random N(0, 0.02) init in the HF layout (for tests; real use converts
    a trained checkpoint)."""
    # one key per gaussian-initialized tensor: 3 embeddings + 8 weight
    # matrices per layer + 2 head matrices (biases/norms are constant-init)
    ks = iter(jax.random.split(key, 8 * cfg.num_hidden_layers + 8))

    def n(*shape):
        return 0.02 * jax.random.normal(next(ks), shape, jnp.float32)

    def z(*shape):
        return jnp.zeros(shape, jnp.float32)

    def o(*shape):
        return jnp.ones(shape, jnp.float32)

    H, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers

    def stack(f):
        return jnp.stack([f() for _ in range(L)])

    return {
        "embeddings": {
            "word": n(cfg.vocab_size, H),
            "position": n(cfg.max_position_embeddings, H),
            "token_type": n(cfg.type_vocab_size, H),
            "ln_scale": o(H),
            "ln_bias": z(H),
        },
        "layers": {
            "q_w": stack(lambda: n(H, H)), "q_b": stack(lambda: z(H)),
            "k_w": stack(lambda: n(H, H)), "k_b": stack(lambda: z(H)),
            "v_w": stack(lambda: n(H, H)), "v_b": stack(lambda: z(H)),
            "attn_out_w": stack(lambda: n(H, H)), "attn_out_b": stack(lambda: z(H)),
            "attn_ln_scale": stack(lambda: o(H)), "attn_ln_bias": stack(lambda: z(H)),
            "inter_w": stack(lambda: n(H, I)), "inter_b": stack(lambda: z(I)),
            "out_w": stack(lambda: n(I, H)), "out_b": stack(lambda: z(H)),
            "out_ln_scale": stack(lambda: o(H)), "out_ln_bias": stack(lambda: z(H)),
        },
        "head": {
            "dense_w": n(H, H), "dense_b": z(H),
            "out_w": n(H, cfg.num_labels), "out_b": z(cfg.num_labels),
        },
    }


# ---------------------------------------------------------------------------
# HF checkpoint conversion (offline, local dir)
# ---------------------------------------------------------------------------


def _load_hf_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    """Read an HF torch checkpoint from a local directory: safetensors
    preferred, pytorch_model.bin fallback. Returns numpy arrays."""
    st_path = os.path.join(model_dir, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        return load_file(st_path)
    bin_path = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.exists(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(
        f"no model.safetensors or pytorch_model.bin in {model_dir}"
    )


def convert_hf_checkpoint(model_dir: str) -> Dict[str, Any]:
    """HF RobertaForSequenceClassification state dict → our stacked pytree.

    Torch ``nn.Linear`` stores (out, in); our matmuls are x @ W with
    (in, out) — every weight matrix is transposed here, once, at load time.
    """
    sd = _load_hf_state_dict(model_dir)

    def get(name):
        # older checkpoints prefix with the model class attribute name
        for k in (name, f"roberta.{name}"):
            if k in sd:
                return np.asarray(sd[k])
        raise KeyError(f"missing tensor {name!r} in checkpoint (have {len(sd)} keys)")

    def lin_w(name):
        return get(name).T.astype(np.float32)

    n_layers = 0
    while any(
        k.endswith(f"encoder.layer.{n_layers}.attention.self.query.weight") for k in sd
    ):
        n_layers += 1
    if n_layers == 0:
        raise ValueError("checkpoint contains no roberta encoder layers")

    def stack(fmt, transpose):
        arrs = []
        for i in range(n_layers):
            a = get(fmt.format(i=i)).astype(np.float32)
            arrs.append(a.T if transpose else a)
        return jnp.asarray(np.stack(arrs))

    E = "embeddings"
    L = "encoder.layer.{i}"
    params = {
        "embeddings": {
            "word": jnp.asarray(get(f"{E}.word_embeddings.weight").astype(np.float32)),
            "position": jnp.asarray(get(f"{E}.position_embeddings.weight").astype(np.float32)),
            "token_type": jnp.asarray(get(f"{E}.token_type_embeddings.weight").astype(np.float32)),
            "ln_scale": jnp.asarray(get(f"{E}.LayerNorm.weight").astype(np.float32)),
            "ln_bias": jnp.asarray(get(f"{E}.LayerNorm.bias").astype(np.float32)),
        },
        "layers": {
            "q_w": stack(f"{L}.attention.self.query.weight", True),
            "q_b": stack(f"{L}.attention.self.query.bias", False),
            "k_w": stack(f"{L}.attention.self.key.weight", True),
            "k_b": stack(f"{L}.attention.self.key.bias", False),
            "v_w": stack(f"{L}.attention.self.value.weight", True),
            "v_b": stack(f"{L}.attention.self.value.bias", False),
            "attn_out_w": stack(f"{L}.attention.output.dense.weight", True),
            "attn_out_b": stack(f"{L}.attention.output.dense.bias", False),
            "attn_ln_scale": stack(f"{L}.attention.output.LayerNorm.weight", False),
            "attn_ln_bias": stack(f"{L}.attention.output.LayerNorm.bias", False),
            "inter_w": stack(f"{L}.intermediate.dense.weight", True),
            "inter_b": stack(f"{L}.intermediate.dense.bias", False),
            "out_w": stack(f"{L}.output.dense.weight", True),
            "out_b": stack(f"{L}.output.dense.bias", False),
            "out_ln_scale": stack(f"{L}.output.LayerNorm.weight", False),
            "out_ln_bias": stack(f"{L}.output.LayerNorm.bias", False),
        },
        "head": {
            "dense_w": jnp.asarray(lin_w("classifier.dense.weight")),
            "dense_b": jnp.asarray(get("classifier.dense.bias").astype(np.float32)),
            "out_w": jnp.asarray(lin_w("classifier.out_proj.weight")),
            "out_b": jnp.asarray(get("classifier.out_proj.bias").astype(np.float32)),
        },
    }
    return params


def load_id2label(model_dir: str) -> Dict[int, str]:
    with open(os.path.join(model_dir, "config.json")) as f:
        raw = json.load(f)
    id2label = raw.get("id2label")
    if not id2label:
        raise ValueError(f"{model_dir}/config.json has no id2label map")
    return {int(k): v for k, v in id2label.items()}


# ---------------------------------------------------------------------------
# Inference pipeline (tokenize → padded bucket → jitted forward)
# ---------------------------------------------------------------------------

_BUCKETS = (16, 32, 64, 128, 256, 512)


def _bucket_len(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return _BUCKETS[-1]


class RobertaTextClassifier:
    """End-to-end text classifier over a local HF checkpoint directory.

    Tokenization is host-side via the framework's own byte-level BPE /
    WordLevel implementation (``melogan_tpu.models.tokenizer`` — no
    ``transformers`` import anywhere in this stack; token-id equality with
    AutoTokenizer is asserted in tests/test_roberta.py); the model forward
    is one jitted XLA program per (batch, bucket) shape — sequence lengths
    are padded to a small set of buckets so recompiles are bounded.
    """

    def __init__(self, model_dir: str):
        from melogan_tpu.models.tokenizer import load_tokenizer

        self.cfg = RobertaConfig.from_json(os.path.join(model_dir, "config.json"))
        self.params = convert_hf_checkpoint(model_dir)
        self.id2label = load_id2label(model_dir)
        self.tokenizer = load_tokenizer(model_dir)
        # position table must cover pad_token_id + seq_len (HF offsets past pad)
        self._max_len = min(
            _BUCKETS[-1], self.cfg.max_position_embeddings - self.cfg.pad_token_id - 1
        )
        self._fwd = jax.jit(lambda p, ids, mask: forward(p, self.cfg, ids, mask))

    def logits(self, texts) -> np.ndarray:
        enc = self.tokenizer(
            list(texts), truncation=True, max_length=self._max_len, padding=False
        )["input_ids"]
        tlen = min(_bucket_len(max(len(x) for x in enc)), self._max_len)
        ids = np.full((len(enc), tlen), self.cfg.pad_token_id, np.int32)
        mask = np.zeros((len(enc), tlen), np.int32)
        for i, row in enumerate(enc):
            ids[i, : len(row)] = row[:tlen]
            mask[i, : len(row)] = 1
        return np.asarray(self._fwd(self.params, jnp.asarray(ids), jnp.asarray(mask)))

    def top_label(self, text: str) -> str:
        logits = self.logits([str(text)])[0]
        return self.id2label[int(np.argmax(logits))]

    def __call__(self, text: str):
        # HF-pipeline-compatible result shape (top_k=1)
        logits = self.logits([str(text)])[0]
        # go_emotions is multi-label: HF applies sigmoid; argmax is unaffected
        probs = 1.0 / (1.0 + np.exp(-logits))
        i = int(np.argmax(probs))
        return [[{"label": self.id2label[i], "score": float(probs[i])}]]
