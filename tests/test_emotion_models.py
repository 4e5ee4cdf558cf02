"""Emotion-input models: text classifier maps, mini-Xception port, SSD
detector, camera pipeline."""
import os

import numpy as np
import pytest

from melogan_tpu.camera import CameraEmotion, heuristic_face_box, rgb_to_gray
from melogan_tpu.models.text_emotion import (
    TEXT_MODEL_TO_MY_EMOTIONS,
    predict_emotion,
)
from melogan_tpu.models.xception import (
    MINI_XCEPTION_LABELS,
    XCEPTION_TO_MY_EMOTIONS,
    load_default_fer,
)


def test_text_label_map_covers_28_goemotions():
    assert len(TEXT_MODEL_TO_MY_EMOTIONS) == 27  # 28 labels; 'embarrassment' maps to default
    assert set(TEXT_MODEL_TO_MY_EMOTIONS.values()) == {"happy", "sad", "angry", "calm"}
    assert TEXT_MODEL_TO_MY_EMOTIONS["neutral"] == "calm"
    assert TEXT_MODEL_TO_MY_EMOTIONS["joy"] == "happy"
    assert TEXT_MODEL_TO_MY_EMOTIONS["fear"] == "angry"


@pytest.mark.parametrize(
    "text,expected",
    [
        ("I'm so happy and excited about this!", "happy"),
        ("This is absolutely infuriating", "angry"),
        ("I feel heartbroken and depressed", "sad"),
        ("just an ordinary day", "calm"),
        ("", "calm"),
        ("   ", "calm"),
    ],
)
def test_predict_emotion(text, expected):
    assert predict_emotion(text) == expected


def test_xception_label_map():
    assert set(XCEPTION_TO_MY_EMOTIONS) == set(MINI_XCEPTION_LABELS)
    assert XCEPTION_TO_MY_EMOTIONS["neutral"] == "calm"
    assert XCEPTION_TO_MY_EMOTIONS["fear"] == "angry"
    assert XCEPTION_TO_MY_EMOTIONS["surprise"] == "happy"
    assert XCEPTION_TO_MY_EMOTIONS["disgust"] == "sad"


def test_mini_xception_forward(rng):
    fer = load_default_fer()
    if fer is None:
        pytest.skip("no mini_xception.h5 available")
    frames = rng.uniform(0, 255, size=(3, 64, 64)).astype(np.float32)
    probs = fer.predict_proba(frames)
    assert probs.shape == (3, 7)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)
    # deterministic
    np.testing.assert_array_equal(probs, fer.predict_proba(frames))
    # non-square input resizes
    emotion = fer.predict_emotion(rng.uniform(0, 255, size=(48, 80)).astype(np.float32))
    assert emotion in ("happy", "sad", "angry", "calm")


def test_fer_no_recompile_across_crop_shapes(rng):
    """Camera crops change size every frame; the jitted FER program must be
    traced once per BATCH size only (resize happens on the host), or the
    live camera path degrades to one XLA compile per frame."""
    fer = load_default_fer()
    if fer is None:
        pytest.skip("no mini_xception.h5 available")
    fer.predict_proba(rng.uniform(0, 255, size=(1, 64, 64)).astype(np.float32))
    baseline = fer._pipeline._cache_size()
    for shape in ((1, 40, 56), (1, 90, 70), (1, 17, 123)):
        fer.predict_proba(rng.uniform(0, 255, size=shape).astype(np.float32))
    assert fer._pipeline._cache_size() == baseline


def test_rgb_to_gray(rng):
    frame = rng.uniform(0, 255, size=(32, 32, 3)).astype(np.float32)
    gray = rgb_to_gray(frame)
    assert gray.shape == (32, 32)
    expected = frame @ np.array([0.299, 0.587, 0.114], np.float32)
    np.testing.assert_allclose(gray, expected, atol=1e-3)


def test_heuristic_face_box_prefers_structure():
    gray = np.zeros((120, 160), np.float32)
    gray[30:90, 50:110] = np.random.default_rng(0).uniform(0, 255, (60, 60))
    x1, y1, x2, y2 = heuristic_face_box(gray)
    # the detected window overlaps the textured region
    assert x1 < 110 and x2 > 50 and y1 < 90 and y2 > 30


def test_camera_pipeline_end_to_end(rng):
    cam = CameraEmotion()
    frame = rng.uniform(0, 255, size=(120, 160, 3)).astype(np.float32)
    emotion = cam.process_frame(frame)
    assert emotion in ("happy", "sad", "angry", "calm")
    assert cam.current_emotion == emotion
    emotions = list(cam.generate_emotions(iter([frame, frame])))
    assert len(emotions) == 2


def test_ssd_priors_and_detect_interface(rng):
    from melogan_tpu.models.ssd import PRIOR_CONFIG, FaceDetector, generate_priors, priors_per_cell

    priors = generate_priors()
    expected = sum(c["fm"] ** 2 * priors_per_cell(c) for c in PRIOR_CONFIG)
    assert priors.shape == (expected, 4)
    assert (priors[:, 2:] > 0).all()

    det = FaceDetector(seed=0)
    out = det.detect(rng.uniform(0, 255, (60, 80, 3)).astype(np.float32), conf_threshold=0.0)
    assert out.shape[1] == 7
    assert (out[:, 2] >= 0).all() and (out[:, 2] <= 1).all()
