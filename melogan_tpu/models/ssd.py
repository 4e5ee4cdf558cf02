"""ResNet-10 SSD-300 face detector: prototxt-exact topology, one XLA program.

Faithful JAX implementation of the reference's OpenCV-DNN face detector
(camera/camera.py:37, camera/deploy.prototxt.txt — res10_300x300 SSD). The
graph below follows the prototxt layer-for-layer (112 layers):

- data_bn/data_scale input normalization
- conv1_h 7×7/2 (+BN/Scale/ReLU) → 3×3/2 ceil-mode max-pool  (300→150→75)
- layer_64_1: plain residual block, 32ch, stride 1           (75)
- layer_128_1: pre-act block, 128ch, stride 2, 1×1 expand    (38)
- layer_256_1: pre-act block, 256ch, stride 2, 1×1 expand    (19)
  · the 38×38 pre-activation (layer_256_1_bn1+scale+relu) is the
    conv4_3_norm tap, through an L2 Normalize layer (scale init 20)
- layer_512_1: pre-act block, stride 1 with DILATED 3×3 (pad 2, dilation 2),
  128→256, 1×1 expand; + last_bn_h/scale/relu → fc7          (19)
- extras conv6_1/2 (→10), conv7_1/2 (→5), conv8_1/2 and conv9_1/2 at
  stride 1 (feature maps STAY 5×5 — unlike classic VGG-SSD)
- six mbox loc/conf 3×3 heads; PriorBox min/max/aspect/step per prototxt
  (8892 priors), softmax over 2 classes, CENTER_SIZE decode with variances
  (0.1, 0.1, 0.2, 0.2), NMS 0.45 / top_k 400 / keep 200

Weights load directly from a user-supplied ``.caffemodel`` via
``melogan_tpu.models.caffe`` (the reference's own trained blob is missing
from its repo, .MISSING_LARGE_BLOBS:1 — the loader is validated against
synthetic caffemodel files in tests). Detections mirror cv2.dnn output:
(N, 7) rows of (image_id, class_id, confidence, x1, y1, x2, y2).
"""
from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from melogan_tpu.models.caffe import CaffeLayer, read_caffemodel

INPUT_SIZE = 300
MEAN_BGR = (104.0, 177.0, 123.0)
BN_EPS = 1e-5  # caffe BatchNormParameter default
NORM_EPS = 1e-10  # caffe NormalizeLayer eps

# PriorBox configuration straight from deploy.prototxt.txt. Feature-map sizes
# follow caffe conv arithmetic (conv8/9 are stride 1 ⇒ fm stays 5).
PRIOR_CONFIG = [
    dict(src="conv4_3_norm", fm=38, step=8, min_size=30.0, max_size=60.0, ars=(2.0,)),
    dict(src="fc7", fm=19, step=16, min_size=60.0, max_size=111.0, ars=(2.0, 3.0)),
    dict(src="conv6_2_h", fm=10, step=32, min_size=111.0, max_size=162.0, ars=(2.0, 3.0)),
    dict(src="conv7_2_h", fm=5, step=64, min_size=162.0, max_size=213.0, ars=(2.0, 3.0)),
    dict(src="conv8_2_h", fm=5, step=100, min_size=213.0, max_size=264.0, ars=(2.0,)),
    dict(src="conv9_2_h", fm=5, step=300, min_size=264.0, max_size=315.0, ars=(2.0,)),
]
VARIANCES = (0.1, 0.1, 0.2, 0.2)
NUM_CLASSES = 2  # background, face
# DetectionOutput params (deploy.prototxt.txt detection_out layer)
NMS_THRESHOLD = 0.45
NMS_TOP_K = 400
KEEP_TOP_K = 200


def priors_per_cell(cfg) -> int:
    # caffe PriorBox: min box + sqrt(min·max) box + (ar, 1/ar) per aspect
    return 2 + 2 * len(cfg["ars"])


def generate_priors() -> np.ndarray:
    """(P, 4) cxcywh priors in relative coords, caffe generation order
    (min, sqrt(min·max), then ar/flip pairs; offset 0.5, clip=false)."""
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


# ---------------------------------------------------------------------------
# Declarative conv table: drives init, the caffemodel loader, and shape tests.
# (name, in_ch, out_ch, kernel, stride, pad, dilation, bias)
# ---------------------------------------------------------------------------

_head = lambda cfg, kind: priors_per_cell(cfg) * (4 if kind == "loc" else NUM_CLASSES)

CONV_SPECS = [
    ("conv1_h", 3, 32, 7, 2, 3, 1, True),
    ("layer_64_1_conv1_h", 32, 32, 3, 1, 1, 1, False),
    ("layer_64_1_conv2_h", 32, 32, 3, 1, 1, 1, False),
    ("layer_128_1_conv1_h", 32, 128, 3, 2, 1, 1, False),
    ("layer_128_1_conv2", 128, 128, 3, 1, 1, 1, False),
    ("layer_128_1_conv_expand_h", 32, 128, 1, 2, 0, 1, False),
    ("layer_256_1_conv1", 128, 256, 3, 2, 1, 1, False),
    ("layer_256_1_conv2", 256, 256, 3, 1, 1, 1, False),
    ("layer_256_1_conv_expand", 128, 256, 1, 2, 0, 1, False),
    ("layer_512_1_conv1_h", 256, 128, 3, 1, 1, 1, False),
    ("layer_512_1_conv2_h", 128, 256, 3, 1, 2, 2, False),  # dilated
    ("layer_512_1_conv_expand_h", 256, 256, 1, 1, 0, 1, False),
    ("conv6_1_h", 256, 128, 1, 1, 0, 1, True),
    ("conv6_2_h", 128, 256, 3, 2, 1, 1, True),
    ("conv7_1_h", 256, 64, 1, 1, 0, 1, True),
    ("conv7_2_h", 64, 128, 3, 2, 1, 1, True),
    ("conv8_1_h", 128, 64, 1, 1, 0, 1, True),
    ("conv8_2_h", 64, 128, 3, 1, 1, 1, True),
    ("conv9_1_h", 128, 64, 1, 1, 0, 1, True),
    ("conv9_2_h", 64, 128, 3, 1, 1, 1, True),
    ("conv4_3_norm_mbox_loc", 128, _head(PRIOR_CONFIG[0], "loc"), 3, 1, 1, 1, True),
    ("conv4_3_norm_mbox_conf", 128, _head(PRIOR_CONFIG[0], "conf"), 3, 1, 1, 1, True),
    ("fc7_mbox_loc", 256, _head(PRIOR_CONFIG[1], "loc"), 3, 1, 1, 1, True),
    ("fc7_mbox_conf", 256, _head(PRIOR_CONFIG[1], "conf"), 3, 1, 1, 1, True),
    ("conv6_2_mbox_loc", 256, _head(PRIOR_CONFIG[2], "loc"), 3, 1, 1, 1, True),
    ("conv6_2_mbox_conf", 256, _head(PRIOR_CONFIG[2], "conf"), 3, 1, 1, 1, True),
    ("conv7_2_mbox_loc", 128, _head(PRIOR_CONFIG[3], "loc"), 3, 1, 1, 1, True),
    ("conv7_2_mbox_conf", 128, _head(PRIOR_CONFIG[3], "conf"), 3, 1, 1, 1, True),
    ("conv8_2_mbox_loc", 128, _head(PRIOR_CONFIG[4], "loc"), 3, 1, 1, 1, True),
    ("conv8_2_mbox_conf", 128, _head(PRIOR_CONFIG[4], "conf"), 3, 1, 1, 1, True),
    ("conv9_2_mbox_loc", 128, _head(PRIOR_CONFIG[5], "loc"), 3, 1, 1, 1, True),
    ("conv9_2_mbox_conf", 128, _head(PRIOR_CONFIG[5], "conf"), 3, 1, 1, 1, True),
]

# BatchNorm/Scale pairs: (bn_name, scale_name, channels)
BN_SPECS = [
    ("data_bn", "data_scale", 3),
    ("conv1_bn_h", "conv1_scale_h", 32),
    ("layer_64_1_bn2_h", "layer_64_1_scale2_h", 32),
    ("layer_128_1_bn1_h", "layer_128_1_scale1_h", 32),
    ("layer_128_1_bn2", "layer_128_1_scale2", 128),
    ("layer_256_1_bn1", "layer_256_1_scale1", 128),
    ("layer_256_1_bn2", "layer_256_1_scale2", 256),
    ("layer_512_1_bn1", "layer_512_1_scale1", 256),
    ("layer_512_1_bn2_h", "layer_512_1_scale2_h", 128),
    ("last_bn_h", "last_scale_h", 256),
]


def init_params(seed: int = 0) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Random msra-style init with every tensor in its converted-weight shape
    (weights: HWIO). Real use loads a trained caffemodel instead."""
    rng = np.random.default_rng(seed)
    params: Dict[str, Dict[str, jnp.ndarray]] = {}
    for name, cin, cout, k, _s, _p, _d, bias in CONV_SPECS:
        fan_in = cin * k * k
        w = rng.normal(0.0, math.sqrt(2.0 / fan_in), (k, k, cin, cout))
        entry = {"w": jnp.asarray(w, jnp.float32)}
        if bias:
            entry["b"] = jnp.zeros((cout,), jnp.float32)
        params[name] = entry
    for bn, sc, ch in BN_SPECS:
        params[bn] = {
            "mean": jnp.zeros((ch,), jnp.float32),
            "var": jnp.ones((ch,), jnp.float32),
        }
        params[sc] = {
            "gamma": jnp.ones((ch,), jnp.float32),
            "beta": jnp.zeros((ch,), jnp.float32),
        }
    params["conv4_3_norm"] = {"scale": jnp.full((128,), 20.0, jnp.float32)}
    return params


def load_caffemodel(path: str) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Convert a res10 SSD ``.caffemodel`` into the forward's param pytree.

    Caffe blob layouts handled: Convolution (out,in,kh,kw)→HWIO (+bias);
    BatchNorm [mean_sum, var_sum, scale_factor] with the moving-average
    scale-factor fold; Scale [gamma, beta]; Normalize [per-channel scale].
    """
    layers = read_caffemodel(path)

    def need(name: str) -> CaffeLayer:
        if name not in layers:
            raise KeyError(f"caffemodel is missing layer {name!r}")
        return layers[name]

    params: Dict[str, Dict[str, jnp.ndarray]] = {}
    for name, cin, cout, k, _s, _p, _d, bias in CONV_SPECS:
        layer = need(name)
        w = np.asarray(layer.blobs[0], np.float32).reshape(cout, cin, k, k)
        entry = {"w": jnp.asarray(w.transpose(2, 3, 1, 0))}
        if bias:
            if len(layer.blobs) < 2:
                raise ValueError(f"conv layer {name!r} expected a bias blob")
            entry["b"] = jnp.asarray(np.asarray(layer.blobs[1], np.float32).reshape(cout))
        params[name] = entry
    for bn, sc, ch in BN_SPECS:
        blobs = need(bn).blobs
        sf = float(np.asarray(blobs[2]).reshape(-1)[0]) if len(blobs) > 2 else 1.0
        inv = 1.0 / sf if sf != 0 else 0.0
        params[bn] = {
            "mean": jnp.asarray(np.asarray(blobs[0], np.float32).reshape(ch) * inv),
            "var": jnp.asarray(np.asarray(blobs[1], np.float32).reshape(ch) * inv),
        }
        sblobs = need(sc).blobs
        params[sc] = {
            "gamma": jnp.asarray(np.asarray(sblobs[0], np.float32).reshape(ch)),
            "beta": jnp.asarray(np.asarray(sblobs[1], np.float32).reshape(ch)),
        }
    params["conv4_3_norm"] = {
        "scale": jnp.asarray(np.asarray(need("conv4_3_norm").blobs[0], np.float32).reshape(128))
    }
    return params


def to_caffe_layers(params) -> List[CaffeLayer]:
    """Inverse of ``load_caffemodel`` (round-trip tests / export)."""
    out: List[CaffeLayer] = []
    for name, cin, cout, k, _s, _p, _d, bias in CONV_SPECS:
        blobs = [np.asarray(params[name]["w"]).transpose(3, 2, 0, 1)]
        if bias:
            blobs.append(np.asarray(params[name]["b"]))
        out.append(CaffeLayer(name=name, type="Convolution", blobs=blobs))
    for bn, sc, ch in BN_SPECS:
        out.append(
            CaffeLayer(
                name=bn,
                type="BatchNorm",
                blobs=[
                    np.asarray(params[bn]["mean"]),
                    np.asarray(params[bn]["var"]),
                    np.asarray([1.0], np.float32),
                ],
            )
        )
        out.append(
            CaffeLayer(
                name=sc,
                type="Scale",
                blobs=[np.asarray(params[sc]["gamma"]), np.asarray(params[sc]["beta"])],
            )
        )
    out.append(
        CaffeLayer(
            name="conv4_3_norm",
            type="Normalize",
            blobs=[np.asarray(params["conv4_3_norm"]["scale"])],
        )
    )
    return out


# ---------------------------------------------------------------------------
# Forward graph (prototxt order)
# ---------------------------------------------------------------------------

_CONV_GEOM = {name: (s, p, d) for name, _i, _o, _k, s, p, d, _b in CONV_SPECS}


def _conv(params, name, x):
    stride, pad, dil = _CONV_GEOM[name]
    y = jax.lax.conv_general_dilated(
        x,
        params[name]["w"],
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    b = params[name].get("b")
    return y + b if b is not None else y


def _bn_scale(params, bn, sc, x):
    p, q = params[bn], params[sc]
    return (x - p["mean"]) * jax.lax.rsqrt(p["var"] + BN_EPS) * q["gamma"] + q["beta"]


def _bn_scale_relu(params, bn, sc, x):
    return jax.nn.relu(_bn_scale(params, bn, sc, x))


def forward(params, x):
    """(B, 300, 300, 3) mean-subtracted BGR → (loc (B, P, 4), conf (B, P, 2))."""
    x = _bn_scale(params, "data_bn", "data_scale", x)
    x = _bn_scale_relu(params, "conv1_bn_h", "conv1_scale_h", _conv(params, "conv1_h", x))
    # conv1_pool: caffe ceil-mode 3×3/2 max-pool (150 → 75): pad hi by 1
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (0, 1), (0, 1), (0, 0)],
    )

    # layer_64_1: plain residual (no pre-activation on the trunk input)
    y = _bn_scale_relu(
        params, "layer_64_1_bn2_h", "layer_64_1_scale2_h",
        _conv(params, "layer_64_1_conv1_h", x),
    )
    x = _conv(params, "layer_64_1_conv2_h", y) + x

    # layer_128_1: pre-activation, stride 2, 1×1 expand shortcut
    pre = _bn_scale_relu(params, "layer_128_1_bn1_h", "layer_128_1_scale1_h", x)
    y = _conv(params, "layer_128_1_conv1_h", pre)
    y = _bn_scale_relu(params, "layer_128_1_bn2", "layer_128_1_scale2", y)
    y = _conv(params, "layer_128_1_conv2", y)
    x = y + _conv(params, "layer_128_1_conv_expand_h", pre)

    # layer_256_1 — its pre-activation (38×38×128) is the conv4_3_norm tap
    pre256 = _bn_scale_relu(params, "layer_256_1_bn1", "layer_256_1_scale1", x)
    y = _conv(params, "layer_256_1_conv1", pre256)
    y = _bn_scale_relu(params, "layer_256_1_bn2", "layer_256_1_scale2", y)
    y = _conv(params, "layer_256_1_conv2", y)
    x = y + _conv(params, "layer_256_1_conv_expand", pre256)

    # layer_512_1: stride 1, dilated 3×3 (pad 2, dilation 2)
    pre = _bn_scale_relu(params, "layer_512_1_bn1", "layer_512_1_scale1", x)
    y = _conv(params, "layer_512_1_conv1_h", pre)
    y = _bn_scale_relu(params, "layer_512_1_bn2_h", "layer_512_1_scale2_h", y)
    y = _conv(params, "layer_512_1_conv2_h", y)
    x = y + _conv(params, "layer_512_1_conv_expand_h", pre)

    fc7 = _bn_scale_relu(params, "last_bn_h", "last_scale_h", x)  # 19×19×256

    c6 = jax.nn.relu(_conv(params, "conv6_2_h", jax.nn.relu(_conv(params, "conv6_1_h", fc7))))
    c7 = jax.nn.relu(_conv(params, "conv7_2_h", jax.nn.relu(_conv(params, "conv7_1_h", c6))))
    c8 = jax.nn.relu(_conv(params, "conv8_2_h", jax.nn.relu(_conv(params, "conv8_1_h", c7))))
    c9 = jax.nn.relu(_conv(params, "conv9_2_h", jax.nn.relu(_conv(params, "conv9_1_h", c8))))

    # conv4_3_norm: per-position L2 normalize across channels × learned scale
    norm = jnp.sqrt(jnp.sum(jnp.square(pre256), axis=-1, keepdims=True)) + NORM_EPS
    n43 = pre256 / norm * params["conv4_3_norm"]["scale"]

    sources = {"conv4_3_norm": n43, "fc7": fc7, "conv6_2_h": c6,
               "conv7_2_h": c7, "conv8_2_h": c8, "conv9_2_h": c9}
    locs, confs = [], []
    for cfg in PRIOR_CONFIG:
        src = sources[cfg["src"]]
        head = "conv4_3_norm" if cfg["src"] == "conv4_3_norm" else cfg["src"].removesuffix("_h")
        loc = _conv(params, f"{head}_mbox_loc", src)
        conf = _conv(params, f"{head}_mbox_conf", src)
        locs.append(loc.reshape(loc.shape[0], -1, 4))
        confs.append(conf.reshape(conf.shape[0], -1, NUM_CLASSES))
    return jnp.concatenate(locs, axis=1), jnp.concatenate(confs, axis=1)


def decode_boxes(loc, priors):
    """CENTER_SIZE decode with the prototxt variances."""
    vx, vy, vw, vh = VARIANCES
    cx = priors[:, 0] + loc[..., 0] * vx * priors[:, 2]
    cy = priors[:, 1] + loc[..., 1] * vy * priors[:, 3]
    w = priors[:, 2] * jnp.exp(loc[..., 2] * vw)
    h = priors[:, 3] * jnp.exp(loc[..., 3] * vh)
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def nms_host(boxes: np.ndarray, scores: np.ndarray, iou_threshold=NMS_THRESHOLD) -> np.ndarray:
    """Greedy NMS on the host over score-sorted candidates → keep mask.

    Exact greedy suppression is inherently sequential; over the ≤400
    DetectionOutput candidates it costs well under a millisecond in numpy,
    whereas the equivalent on-device ``fori_loop`` costs ~140 ms of serial
    scalar latency per frame (measured) — so the detector's single device
    program ends at the sorted top-k and this runs on the CPU.
    """
    n = len(scores)
    keep = np.ones(n, bool)
    # untrained/degenerate weights can decode to inf/NaN/huge boxes; sanitize
    # in f64 with a hard clip so the suppression arithmetic stays defined and
    # overflow-free (degenerate candidates get suppressed/ignored)
    boxes = np.nan_to_num(boxes.astype(np.float64), nan=0.0, posinf=1e6, neginf=-1e6)
    boxes = np.clip(boxes, -1e6, 1e6)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    for i in range(n):
        if not keep[i]:
            continue
        xx1 = np.maximum(x1[i], x1[i + 1:])
        yy1 = np.maximum(y1[i], y1[i + 1:])
        xx2 = np.minimum(x2[i], x2[i + 1:])
        yy2 = np.minimum(y2[i], y2[i + 1:])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        iou = inter / np.maximum(area[i] + area[i + 1:] - inter, 1e-9)
        keep[i + 1:] &= iou <= iou_threshold
    return keep


def nms(boxes, scores, iou_threshold=NMS_THRESHOLD, top_k=NMS_TOP_K):
    """Static-shape NMS inside jit over the top_k candidates (for fully
    on-device deployments; the serving detector uses ``nms_host``)."""
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
    """cv2.dnn-style interface over the jitted SSD program.

    ``params`` may come from ``load_caffemodel(path)``; without trained
    weights the detector is topology-complete but unscored (the camera
    pipeline falls back to its heuristic localizer on empty detections).
    """

    def __init__(self, params=None, seed: int = 0, variables=None):
        if params is None and variables is not None:  # legacy kwarg
            params = variables
        self.params = params if params is not None else init_params(seed)
        self.priors = jnp.asarray(generate_priors())
        # resize → mean-sub → backbone → decode → NMS as ONE jitted program
        # per input resolution (eager pre/post ops were 5 dispatch round
        # trips per frame through the device tunnel)
        self._pipeline = jax.jit(self._run)

    @classmethod
    def from_caffemodel(cls, path: str) -> "FaceDetector":
        return cls(params=load_caffemodel(path))

    def _run(self, params, frame):
        x = jax.image.resize(frame, (INPUT_SIZE, INPUT_SIZE, 3), "bilinear")
        x = x - jnp.asarray(MEAN_BGR)
        loc, conf = forward(params, x[None])
        probs = jax.nn.softmax(conf, axis=-1)[..., 1]  # face class
        boxes = decode_boxes(loc, self.priors)
        order = jnp.argsort(-probs[0])[:NMS_TOP_K]
        return boxes[0][order], probs[0][order]

    def detect(self, frame_bgr: np.ndarray, conf_threshold: float = 0.5, max_det: int = 20):
        """(H, W, 3) BGR uint8/float → (N, 7) cv2.dnn-style detections."""
        frame = jnp.asarray(np.asarray(frame_bgr, np.float32))
        b, s = jax.device_get(self._pipeline(self.params, frame))
        keep = nms_host(b, s)
        rows = []
        max_det = min(max_det, KEEP_TOP_K)
        for i in range(len(s)):
            if keep[i] and s[i] >= conf_threshold and len(rows) < max_det:
                rows.append([0, 1, float(s[i]), *[float(v) for v in b[i]]])
        return np.asarray(rows, np.float32).reshape(-1, 7)
