"""Metrics: tfevents writer/reader round-trip and parsing the reference's
shipped training log (the BASELINE ground-truth numbers)."""
import os

import numpy as np
import pytest

from melogan_tpu.utils.metrics import MetricsWriter, crc32c, read_tfevents


def test_crc32c_known_values():
    # RFC 3720 test vector: 32 bytes of zeros
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"123456789") == 0xE3069283


def test_writer_reader_roundtrip(tmp_path):
    with MetricsWriter(str(tmp_path)) as w:
        w.add_scalar("Loss/Critic", 3.25, 1)
        w.add_scalars({"a": -1.5, "b": 2.0}, 2)
    event_files = [f for f in os.listdir(tmp_path) if f.startswith("events.out")]
    assert len(event_files) == 1
    events = read_tfevents(str(tmp_path / event_files[0]))
    assert ("Loss/Critic", 3.25, 1) in events
    assert any(t == "a" and s == 2 for t, v, s in events)
    # JSONL stream exists alongside
    assert (tmp_path / "metrics.jsonl").exists()


def test_reference_training_log_parses(reference_dir):
    """The shipped 50-epoch GAN run must decode to the BASELINE.md numbers."""
    path = os.path.join(
        reference_dir,
        "experiments/gan/logs/events.out.tfevents.1763478210.kaushik-Dell-G15-5511.505186.0",
    )
    if not os.path.exists(path):
        pytest.skip("reference tfevents log not present")
    events = read_tfevents(path)
    critic = {s: v for t, v, s in events if t == "Loss/Critic"}
    adv = {s: v for t, v, s in events if t == "Loss/Generator_Adv"}
    emo = {s: v for t, v, s in events if t == "Loss/Generator_Emo"}
    assert len(critic) == 50
    np.testing.assert_allclose(critic[1], 9.923, atol=1e-3)
    np.testing.assert_allclose(critic[50], -2.761, atol=1e-3)
    np.testing.assert_allclose(adv[1], 0.00389, atol=1e-4)
    np.testing.assert_allclose(adv[50], -14.432, atol=1e-3)
    np.testing.assert_allclose(emo[1], 2.004, atol=1e-3)
    np.testing.assert_allclose(emo[50], 1.414, atol=1e-3)


def test_read_tfevents_fuzz_malformed_bytes(tmp_path, rng):
    """Corrupt/truncated tfevents files must fail cleanly (typed exception)
    or parse partially — never hang or crash. `melogan logs` reads
    operator-supplied files."""
    import struct

    from melogan_tpu.utils.metrics import MetricsWriter, read_tfevents

    w = MetricsWriter(str(tmp_path / "logs"))
    for i in range(4):
        w.add_scalars({"loss/x": float(i)}, step=i)
    w.close()
    import os

    log_dir = str(tmp_path / "logs")
    events = [f for f in os.listdir(log_dir) if f.startswith("events.out")]
    valid = open(os.path.join(log_dir, events[0]), "rb").read()

    cases = [valid[:c] for c in (1, 7, 13, len(valid) // 2, len(valid) - 1)]
    for _ in range(300):
        b = bytearray(valid)
        for _ in range(rng.integers(1, 6)):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        cases.append(bytes(b))
    cases.append(b"\xff" * 64)
    cases.append(b"")

    bad = tmp_path / "bad.tfevents"
    for payload in cases:
        bad.write_bytes(payload)
        try:
            out = read_tfevents(str(bad))
            assert isinstance(out, list)  # partial parse is fine
        except Exception as e:
            assert isinstance(e, (ValueError, IndexError, struct.error)), (
                type(e), payload[:40])
