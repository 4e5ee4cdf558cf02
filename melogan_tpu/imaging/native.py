"""ctypes bridge to the native JPEG encoder (native/jpeg_codec.cpp).

The Python encoder in ``imaging/jpeg.py`` is the reference implementation;
the native twin runs the entropy coder + DCT in C++ (~2 ms per 320×240 frame
vs ~170 ms — the difference between a real-time MJPEG stream and a slideshow).
Output equality between the two is enforced in tests. Built on demand (g++,
cached); everything degrades gracefully to pure Python.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native"
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmelojpeg.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "jpeg_codec.cpp")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB_PATH, _SRC_PATH],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("MELOGAN_NATIVE_JPEG", "1") == "0":
        return None
    if not os.path.exists(_LIB_PATH) or (
        os.path.exists(_SRC_PATH)
        and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_LIB_PATH)
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.melo_jpeg_encode.restype = ctypes.c_long
        lib.melo_jpeg_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
        ]
        _lib = lib
    except Exception:  # noqa: BLE001
        _lib = None
    return _lib


def encode_jpeg_native(img: np.ndarray, quality: int = 80) -> Optional[bytes]:
    """(H, W, 3) uint8 RGB → JFIF bytes via the C++ encoder, or None when the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    cap = h * w * 3 + 65536
    out = (ctypes.c_uint8 * cap)()
    n = lib.melo_jpeg_encode(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, int(quality), out, cap,
    )
    if n <= 0:
        return None
    return bytes(bytearray(out[:n]))
