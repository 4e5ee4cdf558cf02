"""Reference torch checkpoint ↔ framework param-tree conversion.

``convert_*`` lets a user of the reference bring their trained ``.pth``
checkpoints (``ae_best.pth``, ``ed_best.pth``, ``gan_final.pth`` — SURVEY.md
§5 layouts) into this framework; ``export_*`` is the exact inverse, writing
framework param trees back out as reference-layout state dicts so artifacts
trained here load into the reference's torch modules (migration is two-way,
``import(export(x)) ≡ x``). Pure key/shape mapping:

- Linear: torch ``weight`` (out, in) → ``kernel`` (in, out) transposed
- Conv1d: torch ``weight`` (out, in, k) → HIO ``kernel`` (k, in, out)
- ConvTranspose1d: torch ``weight`` (in, out, k) → HIO ``kernel`` (k, in, out)
- BatchNorm1d: weight/bias/running_mean/running_var →
  scale/bias + batch_stats {mean, var}

Works directly on torch ``state_dict`` objects (tensors or numpy arrays) —
torch itself is only needed by the caller to ``torch.load`` the file.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _linear(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _conv1d(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": np.transpose(_np(sd[f"{prefix}.weight"]), (2, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _convt1d(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": np.transpose(_np(sd[f"{prefix}.weight"]), (2, 0, 1))}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _bn(sd: Dict, prefix: str) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    params = {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
    }
    stats = {
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def _ln(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


# ---------------------------------------------------------------------------
# VAE (reference src/ae/model.py module names)
# ---------------------------------------------------------------------------


def convert_vae(sd: Dict) -> Dict[str, Any]:
    """torch VAE state_dict → {'params': ..., 'batch_stats': ...}."""
    params: Dict[str, Any] = {"encoder": {}, "decoder": {}}
    stats: Dict[str, Any] = {"encoder": {}, "decoder": {}}

    # encoder: conv.{0,3,6} convs, conv.{1,4,7} BNs, _linear.1 dense
    for i, t in enumerate((0, 3, 6)):
        params["encoder"][f"Conv1d_{i}"] = _conv1d(sd, f"encoder.conv.{t}")
    for i, t in enumerate((1, 4, 7)):
        p, s = _bn(sd, f"encoder.conv.{t}")
        params["encoder"][f"TorchBatchNorm_{i}"] = p
        stats["encoder"][f"TorchBatchNorm_{i}"] = s
    params["encoder"]["TorchLinear_0"] = _linear(sd, "encoder._linear.1")

    params["fc_mu"] = _linear(sd, "fc_mu")
    params["fc_log_var"] = _linear(sd, "fc_log_var")

    # decoder: pre.{0,2} dense, deconv.{0,3,6} convTs, deconv.{1,4} BNs
    params["decoder"]["TorchLinear_0"] = _linear(sd, "decoder.pre.0")
    params["decoder"]["TorchLinear_1"] = _linear(sd, "decoder.pre.2")
    for i, t in enumerate((0, 3, 6)):
        params["decoder"][f"ConvTranspose1d_{i}"] = _convt1d(sd, f"decoder.deconv.{t}")
    for i, t in enumerate((1, 4)):
        p, s = _bn(sd, f"decoder.deconv.{t}")
        params["decoder"][f"TorchBatchNorm_{i}"] = p
        stats["decoder"][f"TorchBatchNorm_{i}"] = s

    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# Emotion discriminator (reference src/emotion_discriminator/ed_model.py)
# ---------------------------------------------------------------------------


def convert_ed(sd: Dict, notes_blocks: int = 4, mlp_hidden: int = 2) -> Dict[str, Any]:
    params: Dict[str, Any] = {"classifier": {}}
    stats: Dict[str, Any] = {}

    if any(k.startswith("encoder.") for k in sd):
        enc: Dict[str, Any] = {}
        enc_stats: Dict[str, Any] = {}
        for i in range(notes_blocks):
            block: Dict[str, Any] = {}
            block["Conv1d_0"] = _conv1d(sd, f"encoder.conv.{i}.net.0")
            p, s = _bn(sd, f"encoder.conv.{i}.net.1")
            block["TorchBatchNorm_0"] = p
            enc[f"ConvBlock1D_{i}"] = block
            enc_stats[f"ConvBlock1D_{i}"] = {"TorchBatchNorm_0": s}
        enc["TorchLinear_0"] = _linear(sd, "encoder.project")
        params["encoder"] = enc
        stats["encoder"] = enc_stats

    # classifier.net.{0,3,...} hidden linears, classifier.head
    for i in range(mlp_hidden):
        params["classifier"][f"TorchLinear_{i}"] = _linear(sd, f"classifier.net.{i * 3}")
    params["classifier"][f"TorchLinear_{mlp_hidden}"] = _linear(sd, "classifier.head")

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


# ---------------------------------------------------------------------------
# GAN (reference src/gan/models.py + feature_encoder.py)
# ---------------------------------------------------------------------------


def convert_generator(sd: Dict) -> Dict[str, Any]:
    params: Dict[str, Any] = {
        "noise_to_latent": {
            "TorchLinear_0": _linear(sd, "noise_to_latent.net.0"),
            "TorchLinear_1": _linear(sd, "noise_to_latent.net.2"),
        },
        "decoder": {
            "TorchLinear_0": _linear(sd, "decoder.pre.0"),
            "TorchLinear_1": _linear(sd, "decoder.pre.2"),
        },
    }
    stats: Dict[str, Any] = {"decoder": {}}
    for i, t in enumerate((0, 3, 6)):
        params["decoder"][f"ConvTranspose1d_{i}"] = _convt1d(sd, f"decoder.deconv.{t}")
    for i, t in enumerate((1, 4)):
        p, s = _bn(sd, f"decoder.deconv.{t}")
        params["decoder"][f"TorchBatchNorm_{i}"] = p
        stats["decoder"][f"TorchBatchNorm_{i}"] = s
    return {"params": params, "batch_stats": stats}


def convert_critic(sd: Dict) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    for i, t in enumerate((0, 2, 4)):
        params[f"Conv1d_{i}"] = _conv1d(sd, f"conv.{t}")
    params["TorchLinear_0"] = _linear(sd, "fc.1")
    params["TorchLinear_1"] = _linear(sd, "real_fake")
    return {"params": params}


def convert_feature_encoder(sd: Dict, hidden_layers: int = 2) -> Dict[str, Any]:
    params: Dict[str, Any] = {"TorchLayerNorm_0": _ln(sd, "net.0")}
    # net: [LayerNorm, (Linear, GELU, Dropout) × hidden, Linear]
    for i in range(hidden_layers):
        params[f"TorchLinear_{i}"] = _linear(sd, f"net.{1 + i * 3}")
    params[f"TorchLinear_{hidden_layers}"] = _linear(sd, f"net.{1 + hidden_layers * 3}")
    return {"params": params}


def convert_gan_final(ckpt: Dict) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference ``gan_final.pth`` ({'G': ..., 'E_num': ...}) → sampler vars."""
    return convert_generator(ckpt["G"]), convert_feature_encoder(ckpt["E_num"])


# ---------------------------------------------------------------------------
# Export: framework param trees → reference-layout torch state dicts
# (the exact inverse of the convert_* mappings above)
# ---------------------------------------------------------------------------


def _exp_linear(p: Dict, prefix: str, sd: Dict) -> None:
    sd[f"{prefix}.weight"] = _np(p["kernel"]).T
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np(p["bias"])


def _exp_conv1d(p: Dict, prefix: str, sd: Dict) -> None:
    # HIO kernel (k, in, out) → torch Conv1d weight (out, in, k)
    sd[f"{prefix}.weight"] = np.transpose(_np(p["kernel"]), (2, 1, 0))
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np(p["bias"])


def _exp_convt1d(p: Dict, prefix: str, sd: Dict) -> None:
    # HIO kernel (k, in, out) → torch ConvTranspose1d weight (in, out, k)
    sd[f"{prefix}.weight"] = np.transpose(_np(p["kernel"]), (1, 2, 0))
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np(p["bias"])


def _exp_bn(p: Dict, s: Dict, prefix: str, sd: Dict) -> None:
    sd[f"{prefix}.weight"] = _np(p["scale"])
    sd[f"{prefix}.bias"] = _np(p["bias"])
    sd[f"{prefix}.running_mean"] = _np(s["mean"])
    sd[f"{prefix}.running_var"] = _np(s["var"])
    # torch BatchNorm1d state dicts carry this counter; the value is not used
    # at eval time but strict=True loads into the reference modules require it
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def _exp_ln(p: Dict, prefix: str, sd: Dict) -> None:
    sd[f"{prefix}.weight"] = _np(p["scale"])
    sd[f"{prefix}.bias"] = _np(p["bias"])


def export_vae(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """{'params', 'batch_stats'} → torch state_dict keyed per src/ae/model.py."""
    p, st = variables["params"], variables["batch_stats"]
    sd: Dict[str, np.ndarray] = {}
    for i, t in enumerate((0, 3, 6)):
        _exp_conv1d(p["encoder"][f"Conv1d_{i}"], f"encoder.conv.{t}", sd)
    for i, t in enumerate((1, 4, 7)):
        _exp_bn(
            p["encoder"][f"TorchBatchNorm_{i}"],
            st["encoder"][f"TorchBatchNorm_{i}"],
            f"encoder.conv.{t}",
            sd,
        )
    _exp_linear(p["encoder"]["TorchLinear_0"], "encoder._linear.1", sd)
    _exp_linear(p["fc_mu"], "fc_mu", sd)
    _exp_linear(p["fc_log_var"], "fc_log_var", sd)
    _exp_linear(p["decoder"]["TorchLinear_0"], "decoder.pre.0", sd)
    _exp_linear(p["decoder"]["TorchLinear_1"], "decoder.pre.2", sd)
    for i, t in enumerate((0, 3, 6)):
        _exp_convt1d(p["decoder"][f"ConvTranspose1d_{i}"], f"decoder.deconv.{t}", sd)
    for i, t in enumerate((1, 4)):
        _exp_bn(
            p["decoder"][f"TorchBatchNorm_{i}"],
            st["decoder"][f"TorchBatchNorm_{i}"],
            f"decoder.deconv.{t}",
            sd,
        )
    return sd


def export_ed(
    variables: Dict[str, Any],
    notes_blocks: int | None = None,
    mlp_hidden: int | None = None,
) -> Dict[str, np.ndarray]:
    """ED variables → torch state_dict keyed per ed_model.py module names.

    Layer counts default to what the tree itself contains, so any ED
    checkpoint exports without needing its config alongside."""
    p = variables["params"]
    st = variables.get("batch_stats", {})
    if mlp_hidden is None:
        mlp_hidden = sum(1 for k in p["classifier"] if k.startswith("TorchLinear_")) - 1
    sd: Dict[str, np.ndarray] = {}
    if "encoder" in p:
        if notes_blocks is None:
            notes_blocks = sum(1 for k in p["encoder"] if k.startswith("ConvBlock1D_"))
        for i in range(notes_blocks):
            block = p["encoder"][f"ConvBlock1D_{i}"]
            _exp_conv1d(block["Conv1d_0"], f"encoder.conv.{i}.net.0", sd)
            _exp_bn(
                block["TorchBatchNorm_0"],
                st["encoder"][f"ConvBlock1D_{i}"]["TorchBatchNorm_0"],
                f"encoder.conv.{i}.net.1",
                sd,
            )
        _exp_linear(p["encoder"]["TorchLinear_0"], "encoder.project", sd)
    for i in range(mlp_hidden):
        _exp_linear(p["classifier"][f"TorchLinear_{i}"], f"classifier.net.{i * 3}", sd)
    _exp_linear(p["classifier"][f"TorchLinear_{mlp_hidden}"], "classifier.head", sd)
    return sd


def export_generator(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Generator variables → torch state_dict keyed per src/gan/models.py."""
    p, st = variables["params"], variables["batch_stats"]
    sd: Dict[str, np.ndarray] = {}
    _exp_linear(p["noise_to_latent"]["TorchLinear_0"], "noise_to_latent.net.0", sd)
    _exp_linear(p["noise_to_latent"]["TorchLinear_1"], "noise_to_latent.net.2", sd)
    _exp_linear(p["decoder"]["TorchLinear_0"], "decoder.pre.0", sd)
    _exp_linear(p["decoder"]["TorchLinear_1"], "decoder.pre.2", sd)
    for i, t in enumerate((0, 3, 6)):
        _exp_convt1d(p["decoder"][f"ConvTranspose1d_{i}"], f"decoder.deconv.{t}", sd)
    for i, t in enumerate((1, 4)):
        _exp_bn(
            p["decoder"][f"TorchBatchNorm_{i}"],
            st["decoder"][f"TorchBatchNorm_{i}"],
            f"decoder.deconv.{t}",
            sd,
        )
    return sd


def export_critic(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Critic variables → torch state_dict keyed per src/gan/models.py:132-169."""
    p = variables["params"]
    sd: Dict[str, np.ndarray] = {}
    for i, t in enumerate((0, 2, 4)):
        _exp_conv1d(p[f"Conv1d_{i}"], f"conv.{t}", sd)
    _exp_linear(p["TorchLinear_0"], "fc.1", sd)
    _exp_linear(p["TorchLinear_1"], "real_fake", sd)
    return sd


def export_feature_encoder(
    variables: Dict[str, Any], hidden_layers: int | None = None
) -> Dict[str, np.ndarray]:
    """FeatureEncoder variables → torch state_dict (feature_encoder.py:5-45)."""
    p = variables["params"]
    if hidden_layers is None:
        hidden_layers = sum(1 for k in p if k.startswith("TorchLinear_")) - 1
    sd: Dict[str, np.ndarray] = {}
    _exp_ln(p["TorchLayerNorm_0"], "net.0", sd)
    for i in range(hidden_layers):
        _exp_linear(p[f"TorchLinear_{i}"], f"net.{1 + i * 3}", sd)
    _exp_linear(p[f"TorchLinear_{hidden_layers}"], f"net.{1 + hidden_layers * 3}", sd)
    return sd


def export_gan_final(gen_vars: Dict[str, Any], fe_vars: Dict[str, Any]) -> Dict[str, Any]:
    """Sampler vars → reference ``gan_final.pth`` layout (train_gan.py:279-282)."""
    return {"G": export_generator(gen_vars), "E_num": export_feature_encoder(fe_vars)}
