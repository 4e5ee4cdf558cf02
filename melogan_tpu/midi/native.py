"""ctypes bridge to the native MIDI encoder (native/midi_codec.cpp).

The Python writer is the reference implementation; the native path eliminates
the per-note Python object churn on the serving/sampling hot path. Byte
equality between the two is enforced in tests. The shared library is built on
demand (g++, cached) and everything degrades gracefully to pure Python."""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native"
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmelomidi.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "midi_codec.cpp")

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
    if not os.path.exists(_LIB_PATH) or (
        os.path.exists(_SRC_PATH)
        and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_LIB_PATH)
    ):
        if not (os.path.exists(_SRC_PATH) and _build()):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.melomidi_write.restype = ctypes.c_int64
        lib.melomidi_write.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def encode_song_native(
    pitch: np.ndarray,
    velocity: np.ndarray,
    start_tick: np.ndarray,
    end_tick: np.ndarray,
    program: int,
    channel: int,
    tempo_us: int,
    division: int,
) -> Optional[bytes]:
    """Single-instrument song → SMF bytes via the native encoder (None if
    the native library is unavailable)."""
    lib = get_lib()
    if lib is None:
        return None
    p = np.ascontiguousarray(pitch, np.int32)
    v = np.ascontiguousarray(velocity, np.int32)
    st = np.ascontiguousarray(start_tick, np.int64)
    en = np.ascontiguousarray(end_tick, np.int64)
    n = p.shape[0]
    cap = 64 + 2 * 5 * max(n, 1) + 64
    out = np.empty(cap, np.uint8)
    written = lib.melomidi_write(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        st.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        en.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        int(program),
        int(channel),
        int(tempo_us),
        int(division),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap,
    )
    if written < 0:
        if written == -1:
            return None
        cap = -written
        out = np.empty(cap, np.uint8)
        written = lib.melomidi_write(
            p.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            st.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            en.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n,
            int(program),
            int(channel),
            int(tempo_us),
            int(division),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cap,
        )
        if written < 0:
            return None
    return out[:written].tobytes()
