"""mini-Xception FER classifier as a single XLA program.

JAX port of the reference's Keras FER-2013 model (camera/mini_xception.h5,
loaded in camera/camera.py:49-51): two valid-padded 3×3 convs, four residual
blocks (2× separable conv + SAME 3×3/2 max-pool vs a 1×1/2 projection
shortcut, each conv BN'd, eps 1e-3), a 3×3 conv to 7 logits, global average
pool, softmax. Weights are converted directly from the shipped .h5 (Keras
layout is already HWIO/channels-last, matching ``lax.conv_general_dilated``
NHWC convention; SAME padding follows the TF convention XLA implements).

7 FER labels → 4 music emotions via the reference map (camera/camera.py:22-32).
"""
from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

MINI_XCEPTION_LABELS = ("angry", "disgust", "fear", "happy", "sad", "surprise", "neutral")

# 7→4 emotion map (behavioral contract, camera/camera.py:24-32)
XCEPTION_TO_MY_EMOTIONS: Dict[str, str] = {
    "happy": "happy",
    "sad": "sad",
    "angry": "angry",
    "neutral": "calm",
    "fear": "angry",
    "surprise": "happy",
    "disgust": "sad",
}

_BLOCKS = ((1, 16), (2, 32), (3, 64), (4, 128))  # (index, filters)


def load_mini_xception_weights(h5_path: str) -> Dict[str, np.ndarray]:
    """Flatten the Keras h5 weight groups into a {name: array} dict."""
    import h5py

    out: Dict[str, np.ndarray] = {}
    with h5py.File(h5_path, "r") as f:
        def walk(group, prefix=""):
            for key in group:
                item = group[key]
                if hasattr(item, "keys"):
                    walk(item, prefix + key + "/")
                else:
                    # 'conv2d_1/conv2d_1_1/kernel:0' → 'conv2d_1/kernel'
                    name = (prefix + key).split(":")[0]
                    parts = name.split("/")
                    out[f"{parts[0]}/{parts[-1]}"] = np.asarray(item)

        walk(f["model_weights"])
    return out


def _conv(x, w, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(w),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def _sepconv(x, dw, pw):
    cin = x.shape[-1]
    # Keras depthwise kernel layout (H, W, Cin, mult) → grouped-conv HWIO
    # (H, W, Cin/groups=1, Cout=Cin)
    dw = np.transpose(np.asarray(dw), (0, 1, 3, 2))
    depth = jax.lax.conv_general_dilated(
        x, jnp.asarray(dw),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=cin,
        preferred_element_type=jnp.float32,
    )
    return _conv(depth, pw, 1, "SAME")


def _bn(x, weights, idx):
    g = jnp.asarray(weights[f"batch_normalization_{idx}/gamma"])
    b = jnp.asarray(weights[f"batch_normalization_{idx}/beta"])
    m = jnp.asarray(weights[f"batch_normalization_{idx}/moving_mean"])
    v = jnp.asarray(weights[f"batch_normalization_{idx}/moving_variance"])
    return (x - m) * jax.lax.rsqrt(v + 1e-3) * g + b


def _maxpool_same(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "SAME"
    )


def mini_xception_forward(weights: Dict[str, np.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    """(B, 64, 64, 1) in [0, 1] → (B, 7) softmax probabilities."""
    h = _conv(x, weights["conv2d_1/kernel"], 1, "VALID")
    h = jax.nn.relu(_bn(h, weights, 1))
    h = _conv(h, weights["conv2d_2/kernel"], 1, "VALID")
    h = jax.nn.relu(_bn(h, weights, 2))

    # residual blocks; Keras layer numbering: block i uses sepconvs 2i−1, 2i,
    # BNs (3i+1, 3i+2) on the sepconvs and BN 3i on the shortcut conv (i+2)
    for i, filters in _BLOCKS:
        shortcut = _conv(h, weights[f"conv2d_{i + 2}/kernel"], 2, "SAME")
        shortcut = _bn(shortcut, weights, 3 * i)

        r = _sepconv(
            h,
            weights[f"separable_conv2d_{2 * i - 1}/depthwise_kernel"],
            weights[f"separable_conv2d_{2 * i - 1}/pointwise_kernel"],
        )
        r = jax.nn.relu(_bn(r, weights, 3 * i + 1))
        r = _sepconv(
            r,
            weights[f"separable_conv2d_{2 * i}/depthwise_kernel"],
            weights[f"separable_conv2d_{2 * i}/pointwise_kernel"],
        )
        r = _bn(r, weights, 3 * i + 2)
        r = _maxpool_same(r)
        h = r + shortcut

    h = _conv(h, weights["conv2d_7/kernel"], 1, "SAME") + jnp.asarray(
        weights["conv2d_7/bias"]
    )
    logits = jnp.mean(h, axis=(1, 2))
    return jax.nn.softmax(logits, axis=-1)


def _host_resize_bilinear(x: np.ndarray, size: int) -> np.ndarray:
    """(B, H, W, C) → (B, size, size, C) two-tap bilinear with half-pixel
    centers — exactly cv2.resize INTER_LINEAR, which is what the reference
    camera loop applies to face crops (camera/camera.py:97; NB unlike
    jax.image.resize this does not anti-alias on minification, matching cv2).
    Runs on the host so the jitted FER program
    compiles for exactly ONE input shape — camera face crops change size
    nearly every frame, and resizing in-graph would force a full XLA
    recompile per frame."""
    b, h, w, c = x.shape
    if h == size and w == size:
        return x

    def axis(n_in: int, n_out: int):
        coords = np.clip((np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5, 0, n_in - 1)
        lo = np.floor(coords).astype(np.int64)
        hi = np.minimum(lo + 1, n_in - 1)
        return lo, hi, (coords - lo).astype(np.float32)

    ylo, yhi, fy = axis(h, size)
    xlo, xhi, fx = axis(w, size)
    fx = fx[None, None, :, None]
    rows_t, rows_b = x[:, ylo], x[:, yhi]
    top = rows_t[:, :, xlo] * (1 - fx) + rows_t[:, :, xhi] * fx
    bot = rows_b[:, :, xlo] * (1 - fx) + rows_b[:, :, xhi] * fx
    fy = fy[None, :, None, None]
    return top * (1 - fy) + bot * fy


class FERClassifier:
    """Batched XLA inference wrapper: grayscale face crop → music emotion."""

    def __init__(self, weights: Dict[str, np.ndarray], input_size: int = 64):
        self.weights = weights
        self.input_size = input_size
        # normalize + CNN is ONE jitted program with a FIXED input shape
        # (B, input_size, input_size, 1): the camera loop pays one device
        # dispatch per frame and one compile per batch size, never per
        # crop resolution (crops are resized on the host)
        self._pipeline = jax.jit(self._run)

    def _run(self, x):
        # [0,255] input → /255 (camera.py:99); branchless so it stays in-graph
        x = jnp.where(jnp.max(x) > 1.5, x / 255.0, x)
        return mini_xception_forward(self.weights, x)

    def predict_proba(self, frames: np.ndarray) -> np.ndarray:
        """(B, H, W) or (B, H, W, 1) grayscale in [0, 255] or [0, 1] → (B, 7)."""
        x = np.asarray(frames, np.float32)
        if x.ndim == 3:
            x = x[..., None]
        x = _host_resize_bilinear(x, self.input_size)
        return np.asarray(self._pipeline(jnp.asarray(x)))

    def predict_emotion(self, frame: np.ndarray) -> str:
        """Single grayscale frame → one of happy/sad/angry/calm."""
        probs = self.predict_proba(np.asarray(frame)[None])
        label = MINI_XCEPTION_LABELS[int(probs[0].argmax())]
        return XCEPTION_TO_MY_EMOTIONS[label]


DEFAULT_H5_CANDIDATES = (
    os.environ.get("MELOGAN_FER_H5", ""),
    "data/models/fer/mini_xception.h5",
    "/root/reference/camera/mini_xception.h5",
)


def load_default_fer() -> Optional[FERClassifier]:
    for path in DEFAULT_H5_CANDIDATES:
        if path and os.path.exists(path):
            return FERClassifier(load_mini_xception_weights(path))
    return None
