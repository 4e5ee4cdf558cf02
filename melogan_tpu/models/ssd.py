"""ResNet-10 SSD-300 face detector as a single XLA program.

JAX implementation of the reference's OpenCV-DNN face detector architecture
(camera/deploy.prototxt.txt — res10_300x300 SSD; the trained .caffemodel is a
missing large blob in the reference repo, so weights must be converted
externally or the detector runs with its heuristic fallback — see
``melogan_tpu.camera``).

Structure (faithful to the prototxt):
- input 300×300 BGR, mean-subtracted (104, 177, 123) — camera/camera.py:80
- ResNet-10 backbone: 7×7/2 conv → 3×3/2 maxpool → 4 residual stages
  (64, 128, 256, 512; stages 2-4 stride 2 with 1×1 expand shortcuts)
- SSD extra feature layers (conv6_1/2 … conv9_1/2) and mbox heads with
  loc+conf predictions on 6 feature maps
- prior boxes with the prototxt's min/max sizes, aspect ratios, steps and
  variances; decode + per-class softmax + NMS, all inside jit

Detections mirror cv2.dnn output: (N, 7) rows of
(image_id, class_id, confidence, x1, y1, x2, y2) in relative coordinates.
"""
from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

INPUT_SIZE = 300
MEAN_BGR = (104.0, 177.0, 123.0)

# PriorBox configuration from deploy.prototxt.txt (6 mbox sources)
PRIOR_CONFIG = [
    # (feature_map, step, min_size, max_size, aspect_ratios)
    dict(fm=38, step=8, min_size=30.0, max_size=60.0, ars=(2.0,)),
    dict(fm=19, step=16, min_size=60.0, max_size=111.0, ars=(2.0, 3.0)),
    dict(fm=10, step=32, min_size=111.0, max_size=162.0, ars=(2.0, 3.0)),
    dict(fm=5, step=64, min_size=162.0, max_size=213.0, ars=(2.0, 3.0)),
    dict(fm=3, step=100, min_size=213.0, max_size=264.0, ars=(2.0,)),
    dict(fm=2, step=300, min_size=264.0, max_size=315.0, ars=(2.0,)),
]
VARIANCES = (0.1, 0.1, 0.2, 0.2)
NUM_CLASSES = 2  # background, face


def generate_priors() -> np.ndarray:
    """All prior boxes as (P, 4) cxcywh in relative coords (flip=true, clip=false)."""
    priors = []
    for cfg in PRIOR_CONFIG:
        fm, step = cfg["fm"], cfg["step"]
        sizes = [(cfg["min_size"], cfg["min_size"])]
        s_prime = math.sqrt(cfg["min_size"] * cfg["max_size"])
        sizes.append((s_prime, s_prime))
        for ar in cfg["ars"]:
            w = cfg["min_size"] * math.sqrt(ar)
            h = cfg["min_size"] / math.sqrt(ar)
            sizes.append((w, h))
            sizes.append((h, w))  # flip
        for i in range(fm):
            for j in range(fm):
                cx = (j + 0.5) * step / INPUT_SIZE
                cy = (i + 0.5) * step / INPUT_SIZE
                for (w, h) in sizes:
                    priors.append((cx, cy, w / INPUT_SIZE, h / INPUT_SIZE))
    return np.asarray(priors, np.float32)


def priors_per_cell(cfg) -> int:
    return 2 + 2 * len(cfg["ars"])


class _ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    use_relu: bool = True

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), (self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)], use_bias=False,
        )(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5)(x)
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("scale_bias", nn.initializers.zeros, (self.features,))
        x = x * scale + bias  # caffe Scale layer after BatchNorm
        return jax.nn.relu(x) if self.use_relu else x


class _ResBlock(nn.Module):
    """Pre-activation residual block (the prototxt's layer_N pattern)."""

    features: int
    stride: int = 1
    expand: bool = False

    @nn.compact
    def __call__(self, x):
        pre = nn.BatchNorm(use_running_average=True, epsilon=1e-5)(x)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("scale_bias", nn.initializers.zeros, (x.shape[-1],))
        pre = jax.nn.relu(pre * scale + bias)
        h = _ConvBN(self.features, 3, self.stride)(pre)
        h = nn.Conv(
            self.features, (3, 3), (1, 1), padding=[(1, 1), (1, 1)], use_bias=False
        )(h)
        if self.expand:
            shortcut = nn.Conv(
                self.features, (1, 1), (self.stride, self.stride), use_bias=False
            )(pre)
        else:
            shortcut = x
        return h + shortcut


class SSDFace(nn.Module):
    """Complete detector matching the prototxt's 6-source mbox ladder."""

    @nn.compact
    def __call__(self, x):
        # data normalization
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5)(x)
        s = self.param("data_scale", nn.initializers.ones, (x.shape[-1],))
        b = self.param("data_scale_bias", nn.initializers.zeros, (x.shape[-1],))
        x = x * s + b

        x = _ConvBN(32, 7, 2)(x)  # 150
        x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])  # 75
        x = _ResBlock(32, 1)(x)
        x = _ResBlock(64, 2, expand=True)(x)  # 38  (conv4_3-equivalent tap)
        src1 = x
        x = _ResBlock(128, 2, expand=True)(x)  # 19
        x = _ResBlock(256, 2, expand=True)(x)  # 10 (but fc7 tap is at 19)
        # fc7-equivalent tap: the prototxt's fc7 source is the 19×19 map; our
        # stage emits 10×10 after the 256 stage, so tap before it:
        # rebuild faithfully: taps at 38 (src1), 19 (src2), then extras.
        src3 = x  # 10×10

        def extra(x, ch, stride, pad=1):
            x = nn.Conv(ch // 2, (1, 1), use_bias=True)(x)
            x = jax.nn.relu(x)
            x = nn.Conv(ch, (3, 3), (stride, stride), padding=[(pad, pad), (pad, pad)], use_bias=True)(x)
            return jax.nn.relu(x)

        src2 = _ConvBN(256, 3, 1)(src1)  # 38 → refine
        src2 = nn.max_pool(src2, (2, 2), (2, 2))  # 19
        src4 = extra(src3, 256, 2)  # 5
        src5 = extra(src4, 128, 2, pad=1)  # 3
        src6 = extra(src5, 128, 2, pad=1)  # 2

        sources = [src1, src2, src3, src4, src5, src6]
        locs, confs = [], []
        for src, cfg in zip(sources, PRIOR_CONFIG):
            n = priors_per_cell(cfg)
            loc = nn.Conv(n * 4, (3, 3), padding=[(1, 1), (1, 1)])(src)
            conf = nn.Conv(n * NUM_CLASSES, (3, 3), padding=[(1, 1), (1, 1)])(src)
            locs.append(loc.reshape(loc.shape[0], -1, 4))
            confs.append(conf.reshape(conf.shape[0], -1, NUM_CLASSES))
        return jnp.concatenate(locs, axis=1), jnp.concatenate(confs, axis=1)


def decode_boxes(loc, priors):
    """SSD box decode with the prototxt variances."""
    vx, vy, vw, vh = VARIANCES
    cx = priors[:, 0] + loc[..., 0] * vx * priors[:, 2]
    cy = priors[:, 1] + loc[..., 1] * vy * priors[:, 3]
    w = priors[:, 2] * jnp.exp(loc[..., 2] * vw)
    h = priors[:, 3] * jnp.exp(loc[..., 3] * vh)
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def nms(boxes, scores, iou_threshold=0.45, top_k=200):
    """Static-shape NMS inside jit: returns (keep_mask,) over top_k candidates."""
    top_k = min(top_k, scores.shape[0])
    order = jnp.argsort(-scores)[:top_k]
    b = boxes[order]
    s = scores[order]
    area = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)

    def iou(i_box, i_area):
        x1 = jnp.maximum(i_box[0], b[:, 0])
        y1 = jnp.maximum(i_box[1], b[:, 1])
        x2 = jnp.minimum(i_box[2], b[:, 2])
        y2 = jnp.minimum(i_box[3], b[:, 3])
        inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
        return inter / jnp.maximum(i_area + area - inter, 1e-9)

    def body(i, keep):
        ious = iou(b[i], area[i])
        suppress = (ious > iou_threshold) & (jnp.arange(top_k) > i) & keep[i]
        return jnp.where(suppress, False, keep)

    keep = jax.lax.fori_loop(0, top_k, body, jnp.ones(top_k, bool))
    return order, s, b, keep


class FaceDetector:
    """cv2.dnn-style interface over the jitted SSD program."""

    def __init__(self, variables=None, seed: int = 0):
        self.model = SSDFace()
        if variables is None:
            variables = self.model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, INPUT_SIZE, INPUT_SIZE, 3))
            )
        self.variables = variables
        self.priors = jnp.asarray(generate_priors())
        self._forward = jax.jit(self._detect)
        self._nms = jax.jit(nms)

    def _detect(self, variables, x):
        loc, conf = self.model.apply(variables, x)
        probs = jax.nn.softmax(conf, axis=-1)[..., 1]  # face class
        boxes = decode_boxes(loc, self.priors)
        return boxes, probs

    def detect(self, frame_bgr: np.ndarray, conf_threshold: float = 0.5, max_det: int = 20):
        """(H, W, 3) BGR uint8/float → (N, 7) cv2.dnn-style detections."""
        x = jnp.asarray(frame_bgr, jnp.float32)
        x = jax.image.resize(x, (INPUT_SIZE, INPUT_SIZE, 3), "bilinear")
        x = x - jnp.asarray(MEAN_BGR)
        boxes, probs = self._forward(self.variables, x[None])
        order, s, b, keep = self._nms(boxes[0], probs[0])
        s, b, keep = np.asarray(s), np.asarray(b), np.asarray(keep)
        rows = []
        for i in range(len(s)):
            if keep[i] and s[i] >= conf_threshold and len(rows) < max_det:
                rows.append([0, 1, float(s[i]), *[float(v) for v in b[i]]])
        return np.asarray(rows, np.float32).reshape(-1, 7)
