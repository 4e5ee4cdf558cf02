"""Ops tooling: roll-to-midi, artifact cleaner, profiling utilities."""
import json
import os

import numpy as np

from melogan_tpu.midi.codec import raw_roll_to_song
from melogan_tpu.midi.midifile import read_midi
from melogan_tpu.utils.cleaner import bulk_delete, plan
from melogan_tpu.utils.profiling import StepTimer, device_trace


def test_raw_roll_to_song_clamps(tmp_path, rng):
    roll = np.zeros((8, 4), np.float32)
    roll[:, 0] = [60, 200, -5, 64, 70, 72, 75, 80]  # pitch (clipped 0-127)
    roll[:, 1] = [64, 0, 300, 80, 90, 100, 110, 120]  # velocity (1..127)
    roll[:, 2] = [0.5, 0.01, 1.0, 0.25, 0.5, 0.5, 0.5, 0.5]  # duration ≥ 0.05
    roll[:, 3] = [0.0, -1.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0]  # start ≥ 0
    song = raw_roll_to_song(roll, bpm=120)
    path = tmp_path / "roll.mid"
    song.write(str(path))
    back = read_midi(str(path))
    arr = back.note_array()
    assert arr[:, 0].max() <= 127 and arr[:, 0].min() >= 0
    assert arr[:, 1].min() >= 1
    assert (arr[:, 3] - arr[:, 2]).min() >= 0.04  # duration floor survives ticks


def test_cleaner_dry_run_and_delete(tmp_path):
    (tmp_path / "experiments" / "gan").mkdir(parents=True)
    (tmp_path / "experiments" / "gan" / "x.ckpt").write_text("x")
    (tmp_path / "generated_tests").mkdir()
    (tmp_path / "generated_tests" / "a.mid").write_text("m")
    (tmp_path / "melogan_tpu").mkdir()  # source-like dir must never be touched

    report = bulk_delete(str(tmp_path), dry_run=True)
    assert any("experiments" in p for p in report["planned"])
    assert not report["deleted"]
    assert (tmp_path / "experiments" / "gan" / "x.ckpt").exists()

    report = bulk_delete(str(tmp_path), dry_run=False, confirm=True)
    assert not (tmp_path / "generated_tests").exists()
    assert (tmp_path / "melogan_tpu").exists()
    log = (tmp_path / "bulk_delete_log.jsonl").read_text().strip().splitlines()
    assert len(log) == len(report["deleted"])
    json.loads(log[0])


def test_cleaner_requires_confirm(tmp_path):
    (tmp_path / "generated_tests").mkdir()
    report = bulk_delete(str(tmp_path), dry_run=False, confirm=False)
    assert not report["deleted"]
    assert (tmp_path / "generated_tests").exists()


def test_step_timer():
    t = StepTimer()
    for _ in range(10):
        with t:
            pass
    s = t.summary()
    assert s["steps"] == 10
    assert s["p50_ms"] >= 0 and s["steps_per_sec"] > 0


def test_device_trace_noop():
    with device_trace(None):
        pass
