"""Metrics: structured JSONL logging + self-contained TensorBoard event files.

The reference logs scalars via torch's SummaryWriter (SURVEY.md §5). This
writer reproduces the same scalar tags in genuine tfevents format — encoded
from scratch (TFRecord framing with masked CRC32C, Event/Summary protos
hand-serialized) so the metrics path has no torch/tensorflow dependency —
plus a JSONL stream for programmatic consumption.
"""
from __future__ import annotations

import json
import os
import struct
import time
from typing import Dict, Optional

# ---------------------------------------------------------------------------
# CRC32C (Castagnoli), required by the TFRecord framing
# ---------------------------------------------------------------------------

_CRC_TABLE = []


def _build_table():
    poly = 0x82F63B78
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
        _CRC_TABLE.append(crc)


_build_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return ((crc >> 15) | (crc << 17)) + 0xA282EAD8 & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Minimal protobuf wire-format encoding for Event{Summary{Value{tag,
# simple_value}}} — field numbers from the public event.proto/summary.proto.
# ---------------------------------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _len_delimited(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


def _double_field(num: int, value: float) -> bytes:
    return _field(num, 1) + struct.pack("<d", value)


def _float_field(num: int, value: float) -> bytes:
    return _field(num, 5) + struct.pack("<f", value)


def _varint_field(num: int, value: int) -> bytes:
    return _field(num, 0) + _varint(value)


def _scalar_event(tag: str, value: float, step: int, wall_time: float) -> bytes:
    # summary.Value: tag=1 (string), simple_value=2 (float)
    value_msg = _len_delimited(1, tag.encode()) + _float_field(2, float(value))
    summary = _len_delimited(1, value_msg)  # Summary.value = 1 (repeated)
    # Event: wall_time=1 (double), step=2 (int64), summary=5
    return _double_field(1, wall_time) + _varint_field(2, step) + _len_delimited(5, summary)


def _file_version_event(wall_time: float) -> bytes:
    # Event.file_version = 3 (string)
    return _double_field(1, wall_time) + _len_delimited(3, b"brain.Event:2")


def _tfrecord(payload: bytes) -> bytes:
    header = struct.pack("<Q", len(payload))
    return (
        header
        + struct.pack("<I", _masked_crc(header))
        + payload
        + struct.pack("<I", _masked_crc(payload))
    )


class MetricsWriter:
    """Scalar metrics → `events.out.tfevents.*` + `metrics.jsonl` in log_dir."""

    def __init__(self, log_dir: str, enable_tfevents: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tf = None
        if enable_tfevents:
            t = time.time()
            name = f"events.out.tfevents.{int(t)}.melogan"
            self._tf = open(os.path.join(log_dir, name), "wb")
            self._tf.write(_tfrecord(_file_version_event(t)))
            self._tf.flush()

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        t = time.time()
        self._jsonl.write(json.dumps({"tag": tag, "value": float(value), "step": int(step), "time": t}) + "\n")
        if self._tf is not None:
            self._tf.write(_tfrecord(_scalar_event(tag, float(value), int(step), t)))

    def add_scalars(self, scalars: Dict[str, float], step: int) -> None:
        for tag, value in scalars.items():
            self.add_scalar(tag, value, step)

    def flush(self) -> None:
        self._jsonl.flush()
        if self._tf is not None:
            self._tf.flush()

    def close(self) -> None:
        self.flush()
        self._jsonl.close()
        if self._tf is not None:
            self._tf.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
