"""SSD face detector: prototxt-exact topology, caffemodel loader round-trip,
prior generation, and the cv2.dnn-style detect interface."""
import os

import struct

import numpy as np
import pytest

import jax.numpy as jnp

from melogan_tpu.models.caffe import parse_prototxt, read_caffemodel, write_caffemodel
from melogan_tpu.models.ssd import (
    BN_SPECS,
    CONV_SPECS,
    PRIOR_CONFIG,
    FaceDetector,
    forward,
    generate_priors,
    init_params,
    load_caffemodel,
    priors_per_cell,
    to_caffe_layers,
)

PROTOTXT = "/root/reference/camera/deploy.prototxt.txt"


def test_conv_specs_match_prototxt_exactly(reference_dir):
    """Walk every Convolution layer of the reference prototxt and assert our
    declarative spec reproduces it: num_output, kernel, stride, pad,
    dilation, bias — layer-for-layer (VERDICT r1 item 4)."""
    layers = parse_prototxt(PROTOTXT)
    convs = [l for l in layers if l.type == "Convolution"]
    spec = {name: (cin, cout, k, s, p, d, b) for name, cin, cout, k, s, p, d, b in CONV_SPECS}
    assert len(convs) == len(spec), (
        f"prototxt has {len(convs)} convs, spec has {len(spec)}"
    )
    for l in convs:
        assert l.name in spec, f"missing conv {l.name}"
        cin, cout, k, s, p, d, bias = spec[l.name]
        assert int(l.params["num_output"][0]) == cout, l.name
        assert int(l.params["kernel_size"][0]) == k, l.name
        assert int(l.params.get("stride", ["1"])[0]) == s, l.name
        assert int(l.params.get("pad", ["0"])[0]) == p, l.name
        assert int(l.params.get("dilation", ["1"])[0]) == d, l.name
        proto_bias = l.params.get("bias_term", ["true"])[0] == "true"
        assert proto_bias == bias, l.name

    # BatchNorm/Scale pairs present and paired in prototxt order
    proto_bns = [l.name for l in layers if l.type == "BatchNorm"]
    assert proto_bns == [bn for bn, _sc, _ch in BN_SPECS]
    proto_scales = [l.name for l in layers if l.type == "Scale"]
    assert proto_scales == [sc for _bn, sc, _ch in BN_SPECS]


def test_priorbox_params_match_prototxt(reference_dir):
    layers = parse_prototxt(PROTOTXT)
    pbs = [l for l in layers if l.type == "PriorBox"]
    assert len(pbs) == len(PRIOR_CONFIG)
    for l, cfg in zip(pbs, PRIOR_CONFIG):
        assert float(l.params["min_size"][0]) == cfg["min_size"], l.name
        assert float(l.params["max_size"][0]) == cfg["max_size"], l.name
        assert int(l.params["step"][0]) == cfg["step"], l.name
        ars = tuple(float(a) for a in l.params["aspect_ratio"])
        assert ars == cfg["ars"], l.name


def test_prior_count_and_geometry():
    priors = generate_priors()
    expected = sum(c["fm"] ** 2 * priors_per_cell(c) for c in PRIOR_CONFIG)
    assert expected == 8892  # 38²·4 + 19²·6 + 10²·6 + 5²·6 + 5²·4 + 5²·4
    assert priors.shape == (8892, 4)
    assert (priors[:, 2:] > 0).all()
    # first cell of the first source: centered at (0.5·8/300, 0.5·8/300)
    np.testing.assert_allclose(priors[0, :2], [4 / 300, 4 / 300], atol=1e-6)
    np.testing.assert_allclose(priors[0, 2:], [30 / 300, 30 / 300], atol=1e-6)
    # second prior: sqrt(min·max)
    np.testing.assert_allclose(priors[1, 2], np.sqrt(30 * 60) / 300, atol=1e-6)


def test_forward_emits_one_logit_per_prior():
    params = init_params(seed=0)
    x = jnp.zeros((1, 300, 300, 3), jnp.float32)
    loc, conf = forward(params, x)
    assert loc.shape == (1, 8892, 4)
    assert conf.shape == (1, 8892, 2)
    assert np.all(np.isfinite(np.asarray(loc)))


def test_caffemodel_roundtrip(tmp_path):
    """init → export to caffemodel bytes → parse → load: identical pytrees.
    This validates the loader against the exact blob layouts a trained
    res10 caffemodel ships (weights OIHW, BN mean/var/scale-factor, Scale,
    Normalize)."""
    params = init_params(seed=3)
    path = str(tmp_path / "synthetic.caffemodel")
    write_caffemodel(path, to_caffe_layers(params))
    assert os.path.getsize(path) > 1000

    raw = read_caffemodel(path)
    assert "conv1_h" in raw and raw["conv1_h"].type == "Convolution"
    assert raw["conv1_h"].blobs[0].shape == (32, 3, 7, 7)  # caffe OIHW

    loaded = load_caffemodel(path)
    assert set(loaded) == set(params)
    for name in params:
        for key in params[name]:
            np.testing.assert_allclose(
                np.asarray(loaded[name][key]), np.asarray(params[name][key]),
                atol=1e-6, err_msg=f"{name}.{key}",
            )


def test_caffemodel_missing_layer_raises(tmp_path):
    params = init_params(seed=0)
    layers = [l for l in to_caffe_layers(params) if l.name != "fc7_mbox_loc"]
    path = str(tmp_path / "broken.caffemodel")
    write_caffemodel(path, layers)
    with pytest.raises(KeyError, match="fc7_mbox_loc"):
        load_caffemodel(path)


def test_detector_from_caffemodel_stable_boxes(tmp_path, rng):
    """Detector built from a (synthetic) caffemodel produces deterministic,
    well-formed detections end-to-end."""
    params = init_params(seed=1)
    path = str(tmp_path / "weights.caffemodel")
    write_caffemodel(path, to_caffe_layers(params))
    det = FaceDetector.from_caffemodel(path)

    frame = rng.integers(0, 255, (240, 320, 3)).astype(np.uint8)
    out1 = det.detect(frame, conf_threshold=0.0, max_det=5)
    out2 = det.detect(frame, conf_threshold=0.0, max_det=5)
    assert out1.shape[1] == 7 and out1.shape[0] > 0
    np.testing.assert_array_equal(out1, out2)  # deterministic
    assert np.all(np.isfinite(out1))
    assert (out1[:, 1] == 1).all()  # face class
    assert ((out1[:, 2] >= 0) & (out1[:, 2] <= 1)).all()
    # high threshold filters
    assert det.detect(frame, conf_threshold=1.1).shape == (0, 7)


def test_detect_interface_random_weights(rng):
    det = FaceDetector(seed=0)
    frame = rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
    out = det.detect(frame, conf_threshold=0.99)
    assert out.shape[1] == 7


def test_caffemodel_fuzz_malformed_bytes_fail_cleanly(tmp_path, rng):
    """Corrupt/truncated caffemodel blobs must raise clean Python exceptions
    (ValueError/struct.error/IndexError), never hang or crash — the serving
    camera path loads operator-supplied files."""
    from melogan_tpu.models.caffe import read_caffemodel

    # a small valid file to mutate
    from melogan_tpu.models.caffe import CaffeLayer, write_caffemodel

    path = str(tmp_path / "m.caffemodel")
    write_caffemodel(
        path, [CaffeLayer("conv", "Convolution", [np.ones((2, 3), np.float32)])])
    valid = open(path, "rb").read()

    cases = []
    for cut in (1, len(valid) // 2, len(valid) - 1):  # truncations
        cases.append(valid[:cut])
    for _ in range(300):  # random byte flips
        b = bytearray(valid)
        for _ in range(rng.integers(1, 6)):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        cases.append(bytes(b))
    cases.append(b"\xff" * 64)  # pure garbage
    cases.append(b"")           # empty

    bad = str(tmp_path / "bad.caffemodel")
    for payload in cases:
        with open(bad, "wb") as f:
            f.write(payload)
        try:
            read_caffemodel(bad)  # parsing garbage MAY succeed vacuously...
        except Exception as e:
            # ...but any failure must be a clean, typed Python exception
            assert isinstance(e, (ValueError, KeyError, IndexError,
                                  EOFError, struct.error)), (type(e), payload[:40])


def test_prototxt_fuzz_malformed_text(tmp_path, rng, reference_dir):
    """Mutated/truncated prototxt text must parse partially or fail with a
    typed exception — never hang or crash."""
    src = os.path.join(reference_dir, "camera", "deploy.prototxt.txt")
    if not os.path.exists(src):
        pytest.skip("reference prototxt not available")
    valid = open(src, "rb").read()

    cases = [valid[:c] for c in (1, len(valid) // 3, len(valid) - 2)]
    for _ in range(100):
        b = bytearray(valid)
        for _ in range(rng.integers(1, 8)):
            b[rng.integers(0, len(b))] = rng.integers(32, 127)
        cases.append(bytes(b))
    cases.append(b"{{{{")
    cases.append(b"")

    bad = tmp_path / "bad.prototxt"
    for payload in cases:
        bad.write_bytes(payload)
        try:
            layers = parse_prototxt(str(bad))
            assert isinstance(layers, list)
        except Exception as e:
            assert isinstance(e, (ValueError, KeyError, IndexError)), (
                type(e), payload[:40])
