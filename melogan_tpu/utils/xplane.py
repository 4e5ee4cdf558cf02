"""Minimal XSpace/XPlane protobuf reader for ``jax.profiler`` device traces.

``jax.profiler.start_trace`` writes ``*.xplane.pb`` files (the tsl.profiler
XSpace schema). TensorBoard's profile plugin (and TensorFlow itself) are not
in this image, so — like the caffemodel loader (models/caffe.py) — the
framework carries its own wire-format reader: a generic varint/length-
delimited walker plus the few message shapes the MFU attribution needs.

Schema (tensorflow/tsl/profiler/protobuf/xplane.proto):
  XSpace   { repeated XPlane planes = 1; }
  XPlane   { int64 id=1; string name=2; repeated XLine lines=3;
             map<int64, XEventMetadata> event_metadata=4;
             map<int64, XStatMetadata> stat_metadata=5; }
  XLine    { int64 id=1; string name=2; int64 timestamp_ns=3;
             repeated XEvent events=4; }
  XEvent   { int64 metadata_id=1; int64 offset_ps=2; int64 duration_ps=3;
             repeated XStat stats=4; }
  XEventMetadata { int64 id=1; string name=2; bytes metadata=3;
                   string display_name=4; }
  XStat    { int64 metadata_id=1; double double_value=2; uint64 uint64=3;
             int64 int64_value=4; string str_value=5; bytes bytes=6; }
Map entries serialize as submessages {key=1, value=2}.
"""
from __future__ import annotations

import glob
import os
from typing import Dict, Iterator, List, Optional, Tuple


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a serialized message.
    Wire types: 0 varint (int), 1 fixed64 (bytes), 2 length-delimited
    (bytes), 5 fixed32 (bytes)."""
    pos, end = 0, len(buf)
    while pos < end:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 1:
            val, pos = buf[pos:pos + 8], pos + 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val, pos = buf[pos:pos + ln], pos + ln
        elif wire == 5:
            val, pos = buf[pos:pos + 4], pos + 4
        else:  # group wire types (3/4) never appear in xplane
            raise ValueError(f"unsupported wire type {wire} at {pos}")
        yield field, wire, val


def _zigzag_ok_int(v: int) -> int:
    # xplane int64s are plain varints (no zigzag); keep as-is but fold
    # negative two's-complement encodings back to signed.
    return v - (1 << 64) if v >= (1 << 63) else v


class XEvent:
    __slots__ = ("metadata_id", "offset_ps", "duration_ps")

    def __init__(self, metadata_id: int, offset_ps: int, duration_ps: int):
        self.metadata_id = metadata_id
        self.offset_ps = offset_ps
        self.duration_ps = duration_ps


class XLine:
    __slots__ = ("name", "timestamp_ns", "events")

    def __init__(self):
        self.name = ""
        self.timestamp_ns = 0
        self.events: List[XEvent] = []


class XPlane:
    __slots__ = ("name", "lines", "event_names")

    def __init__(self):
        self.name = ""
        self.lines: List[XLine] = []
        self.event_names: Dict[int, str] = {}


def _parse_event(buf: bytes) -> XEvent:
    mid = off = dur = 0
    for field, wire, val in _fields(buf):
        if field == 1 and wire == 0:
            mid = val
        elif field == 2 and wire == 0:
            off = _zigzag_ok_int(val)
        elif field == 3 and wire == 0:
            dur = _zigzag_ok_int(val)
    return XEvent(mid, off, dur)


def _parse_line(buf: bytes) -> XLine:
    line = XLine()
    for field, wire, val in _fields(buf):
        if field == 2 and wire == 2:
            line.name = val.decode("utf-8", "replace")
        elif field == 3 and wire == 0:
            line.timestamp_ns = _zigzag_ok_int(val)
        elif field == 4 and wire == 2:
            line.events.append(_parse_event(val))
    return line


def _parse_event_metadata(buf: bytes) -> Tuple[int, str]:
    mid, name, display = 0, "", ""
    for field, wire, val in _fields(buf):
        if field == 1 and wire == 0:
            mid = val
        elif field == 2 and wire == 2:
            name = val.decode("utf-8", "replace")
        elif field == 4 and wire == 2:
            display = val.decode("utf-8", "replace")
    return mid, (display or name)


def _parse_plane(buf: bytes) -> XPlane:
    plane = XPlane()
    for field, wire, val in _fields(buf):
        if field == 2 and wire == 2:
            plane.name = val.decode("utf-8", "replace")
        elif field == 3 and wire == 2:
            plane.lines.append(_parse_line(val))
        elif field == 4 and wire == 2:
            # map entry {key=1, value=2(XEventMetadata)}
            key, meta = 0, b""
            for f2, w2, v2 in _fields(val):
                if f2 == 1 and w2 == 0:
                    key = v2
                elif f2 == 2 and w2 == 2:
                    meta = v2
            mid, name = _parse_event_metadata(meta)
            plane.event_names[mid or key] = name
    return plane


def parse_xspace(path: str) -> List[XPlane]:
    with open(path, "rb") as f:
        buf = f.read()
    planes = []
    for field, wire, val in _fields(buf):
        if field == 1 and wire == 2:
            planes.append(_parse_plane(val))
    return planes


def find_xplane_files(logdir: str) -> List[str]:
    return sorted(glob.glob(
        os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))


def device_op_totals(
    logdir: str,
    plane_substring: str = "TPU",
    line_name: str = "XLA Ops",
) -> Dict[str, Dict]:
    """Aggregate per-op device time from a jax.profiler trace directory.

    Returns {op_name: {"total_ps": int, "count": int}} summed over every
    matching device plane's ``line_name`` line (each event is one executed
    HLO op instance). Use :func:`summarize_ops` for a category rollup."""
    totals: Dict[str, Dict] = {}
    for path in find_xplane_files(logdir):
        for plane in parse_xspace(path):
            if plane_substring not in plane.name:
                continue
            for line in plane.lines:
                if line.name != line_name:
                    continue
                for ev in line.events:
                    name = plane.event_names.get(ev.metadata_id,
                                                 f"op_{ev.metadata_id}")
                    t = totals.setdefault(name, {"total_ps": 0, "count": 0})
                    t["total_ps"] += ev.duration_ps
                    t["count"] += 1
    return totals


def available_lines(logdir: str) -> List[Tuple[str, str, int]]:
    """(plane, line, n_events) inventory — for picking the right line name
    on an unfamiliar backend."""
    out = []
    for path in find_xplane_files(logdir):
        for plane in parse_xspace(path):
            for line in plane.lines:
                out.append((plane.name, line.name, len(line.events)))
    return out


def _category(op_name: str) -> str:
    n = op_name.lower()
    for key, cat in (
        ("conv", "convolution"), ("dot", "matmul"), ("fusion", "fusion"),
        ("all-reduce", "collective"), ("all-gather", "collective"),
        ("reduce-scatter", "collective"), ("collective", "collective"),
        ("copy", "copy"), ("transpose", "transpose"), ("reduce", "reduce"),
        ("scatter", "scatter"), ("gather", "gather"), ("rng", "rng"),
        ("while", "control"), ("condition", "control"), ("call", "control"),
        ("infeed", "infeed"), ("outfeed", "outfeed"),
    ):
        if key in n:
            return cat
    return "other"


def summarize_ops(totals: Dict[str, Dict], top_n: int = 25) -> Dict:
    """Rollup: total device time, per-category shares, top-N ops."""
    grand = sum(t["total_ps"] for t in totals.values())
    cats: Dict[str, int] = {}
    for name, t in totals.items():
        cats[_category(name)] = cats.get(_category(name), 0) + t["total_ps"]
    top = sorted(totals.items(), key=lambda kv: -kv[1]["total_ps"])[:top_n]
    return {
        "total_device_ms": grand / 1e9,
        "categories_ms": {k: v / 1e9 for k, v in
                          sorted(cats.items(), key=lambda kv: -kv[1])},
        "top_ops": [
            {"op": name, "ms": t["total_ps"] / 1e9, "count": t["count"]}
            for name, t in top
        ],
    }
