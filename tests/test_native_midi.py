"""Native (C++) MIDI encoder: byte equality with the Python writer, golden
artifacts included."""
import glob
import os

import numpy as np
import pytest

from melogan_tpu.midi.codec import piano_roll_to_song
from melogan_tpu.midi.midifile import MidiSong, read_midi
from melogan_tpu.midi.native import native_available

needs_native = pytest.mark.skipif(
    not native_available(), reason="native MIDI codec not buildable (no g++?)"
)


@needs_native
def test_native_matches_python_random(rng):
    for seed in range(5):
        notes = np.random.default_rng(seed).normal(0, 0.8, size=(256, 4)).astype(np.float32)
        song = piano_roll_to_song(notes, bpm=97 + seed * 13, scale="minor")
        native = song.to_bytes(allow_native=True)
        python = song.to_bytes(allow_native=False)
        assert native == python


@needs_native
def test_native_matches_python_golden(reference_dir):
    files = sorted(glob.glob(os.path.join(reference_dir, "good_gens1", "*.mid")))
    for path in files:
        song = read_midi(path)
        rebuilt = MidiSong(
            initial_tempo=song.initial_tempo,
            resolution=song.resolution,
            instruments=song.instruments,
            tempo_us=song.tempo_us,
        )
        with open(path, "rb") as f:
            golden = f.read()
        assert rebuilt.to_bytes(allow_native=True) == golden
        assert rebuilt.to_bytes(allow_native=False) == golden


@needs_native
def test_native_empty_song():
    song = MidiSong(initial_tempo=120.0)
    from melogan_tpu.midi.midifile import MidiInstrument

    song.instruments.append(MidiInstrument(program=0))
    assert song.to_bytes(allow_native=True) == song.to_bytes(allow_native=False)


@needs_native
def test_native_speedup(rng):
    import time

    notes = rng.normal(0, 0.8, size=(512, 4)).astype(np.float32)
    song = piano_roll_to_song(notes, bpm=120)

    def timeit(fn, iters=50):
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        return (time.perf_counter() - t0) / iters

    t_native = timeit(lambda: song.to_bytes(allow_native=True))
    t_python = timeit(lambda: song.to_bytes(allow_native=False))
    # informative, not strict: native should not be slower
    assert t_native <= t_python * 1.5, (t_native, t_python)


def test_render_to_bytes_matches_object_path(rng):
    from melogan_tpu.midi.codec import render_to_bytes, save_piano_roll_to_midi
    import tempfile, os

    notes = rng.normal(0, 0.8, size=(300, 4)).astype(np.float32)
    fast = render_to_bytes(notes, bpm=133, scale="dorian")
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "x.mid")
        save_piano_roll_to_midi(notes, path, bpm=133, scale="dorian", verbose=False)
        slow = open(path, "rb").read()
    assert fast == slow
