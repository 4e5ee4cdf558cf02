"""MIDI codec tests: SMF byte-level round-trips, golden-artifact byte
compatibility, and renderer semantics vs a straightforward scalar model of the
reference renderer (src/gan/utils.py:95-161)."""
import glob
import os

import numpy as np
import pytest

from melogan_tpu.midi import smf
from melogan_tpu.midi.codec import (
    SCALES,
    VELOCITY_THRESHOLD,
    MAX_BEAT_TIME,
    render_piano_roll,
    render_piano_roll_jax,
    save_piano_roll_to_midi,
    scale_snap_table,
)
from melogan_tpu.midi.midifile import MidiSong, read_midi


# ---------------------------------------------------------------------------
# varlen + track encoding
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "value,expected",
    [
        (0, b"\x00"),
        (0x40, b"\x40"),
        (0x7F, b"\x7f"),
        (0x80, b"\x81\x00"),
        (0x2000, b"\xc0\x00"),
        (0x3FFF, b"\xff\x7f"),
        (0x4000, b"\x81\x80\x00"),
        (0x0FFFFFFF, b"\xff\xff\xff\x7f"),
    ],
)
def test_varlen_known_values(value, expected):
    assert smf.encode_varlen(value) == expected
    decoded, pos = smf.decode_varlen(expected, 0)
    assert decoded == value and pos == len(expected)


def test_varlen_roundtrip_random(rng):
    for v in rng.integers(0, 1 << 28, size=200):
        enc = smf.encode_varlen(int(v))
        dec, _ = smf.decode_varlen(enc, 0)
        assert dec == int(v)


# ---------------------------------------------------------------------------
# Golden byte-compatibility: parse each shipped artifact, rebuild a song from
# the parsed note content, re-serialize, and require identical bytes.
# ---------------------------------------------------------------------------


def _golden_files(reference_dir):
    files = sorted(
        glob.glob(os.path.join(reference_dir, "good_gens1", "*.mid"))
        + glob.glob(os.path.join(reference_dir, "generated_tests", "*.mid"))
    )
    if not files:
        pytest.skip("no golden .mid artifacts")
    return files


def test_golden_byte_roundtrip(reference_dir):
    files = _golden_files(reference_dir)
    assert len(files) == 16
    for path in files:
        with open(path, "rb") as f:
            golden = f.read()
        song = read_midi(golden)
        assert len(song.instruments) == 1
        rebuilt = MidiSong(
            initial_tempo=song.initial_tempo,
            resolution=song.resolution,
            instruments=song.instruments,
            tempo_us=song.tempo_us,
        )
        assert rebuilt.to_bytes() == golden, f"byte mismatch for {path}"


def test_golden_note_stats(reference_dir):
    # shipped artifacts: ~500 notes each, pitches within the renderer clamp
    for path in _golden_files(reference_dir):
        song = read_midi(path)
        arr = song.note_array()
        assert 400 <= arr.shape[0] <= 560
        assert arr[:, 0].min() >= 36 - 11  # snap can move below the clamp floor
        assert arr[:, 0].max() <= 96


# ---------------------------------------------------------------------------
# Renderer semantics: vectorized implementation vs a direct scalar model
# ---------------------------------------------------------------------------


def _scalar_render(notes_array, bpm, scale, root_key=0):
    """Straightforward per-row model of the reference renderer's arithmetic."""
    bpm = max(60, min(bpm, 180))
    spb = 60.0 / bpm
    intervals = SCALES.get(scale, SCALES["chromatic"])
    allowed = sorted((i + root_key) % 12 for i in intervals)

    out = []
    t_beats = 0.0
    for row in np.asarray(notes_array, dtype=np.float32):
        p, v, d, s = (np.float32(x) for x in row)
        step = max(0.1, ((s + np.float32(1.0)) / np.float32(2.0)) * np.float32(MAX_BEAT_TIME))
        if v < VELOCITY_THRESHOLD:
            t_beats += float(step)
            continue
        pitch = int((p + np.float32(1.0)) * np.float32(63.5))
        pitch = int(np.clip(pitch, 36, 96))
        octave, pc = pitch // 12, pitch % 12
        closest = min(allowed, key=lambda x: abs(x - pc))
        pitch = octave * 12 + closest
        vel = int(np.float32(60.0) + ((v - np.float32(VELOCITY_THRESHOLD)) / np.float32(1.2)) * np.float32(67.0))
        vel = int(np.clip(vel, 0, 127))
        dur = max(0.25, ((d + np.float32(1.0)) / np.float32(2.0)) * np.float32(MAX_BEAT_TIME))
        out.append((pitch, vel, t_beats * spb, (t_beats + float(dur)) * spb))
        t_beats += float(step)
    return out


def test_renderer_matches_scalar_model(rng):
    notes = rng.normal(0, 0.8, size=(512, 4)).astype(np.float32)
    for scale in ("major", "minor", "blues", "chromatic"):
        for bpm in (55, 70, 120, 151, 200):
            expected = _scalar_render(notes, bpm, scale)
            pitch, vel, start, end = render_piano_roll(notes, bpm, scale)
            assert len(expected) == len(pitch)
            for i, (ep, ev, es, ee) in enumerate(expected):
                assert pitch[i] == ep
                assert vel[i] == ev
                np.testing.assert_allclose(start[i], es, rtol=0, atol=1e-9)
                np.testing.assert_allclose(end[i], ee, rtol=0, atol=1e-9)


def test_scale_snap_tie_breaks_low():
    # pitch class 1 in C major: distance 1 to both 0 and 2 -> snaps to 0
    table = scale_snap_table("major", 0)
    assert table[1] == 0
    assert table[3] == 2
    # allowed classes map to themselves
    for pc in SCALES["major"]:
        assert table[pc] == pc


def test_rest_rows_advance_time(rng):
    notes = np.zeros((4, 4), dtype=np.float32)
    notes[:, 3] = 0.0  # step -> 2.0 beats each
    notes[1, 1] = -0.9  # rest
    pitch, vel, start, end = render_piano_roll(notes, bpm=120)
    assert len(pitch) == 3
    # rests still advance the clock: starts at beats 0, 4, 6 (0.5 s/beat)
    np.testing.assert_allclose(start, [0.0, 2.0, 3.0])


def test_render_jax_matches_numpy(rng):
    notes = rng.normal(0, 0.8, size=(512, 4)).astype(np.float32)
    np_p, np_v, np_s, np_e = render_piano_roll(notes, bpm=120, scale="minor")
    j_p, j_v, j_s, j_e, keep = render_piano_roll_jax(notes, bpm=120, scale="minor")
    keep = np.asarray(keep)
    np.testing.assert_array_equal(np.asarray(j_p)[keep], np_p)
    np.testing.assert_array_equal(np.asarray(j_v)[keep], np_v)
    np.testing.assert_allclose(np.asarray(j_s)[keep], np_s, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_e)[keep], np_e, atol=1e-4)


def test_save_piano_roll_scale_type_kwarg(tmp_path, rng):
    # the reference serving path passes scale_type= (app.py:113); must not crash
    notes = rng.normal(0, 0.5, size=(64, 4)).astype(np.float32)
    out = tmp_path / "t.mid"
    save_piano_roll_to_midi(notes, str(out), bpm=140, scale_type="minor", verbose=False)
    song = read_midi(str(out))
    assert song.instruments
    # scale= must win over scale_type=
    out2 = tmp_path / "t2.mid"
    save_piano_roll_to_midi(
        notes, str(out2), bpm=140, scale="minor", scale_type="major", verbose=False
    )
    assert (out2.read_bytes()) == (out.read_bytes())


def test_write_read_roundtrip(tmp_path, rng):
    notes = rng.normal(0, 0.8, size=(256, 4)).astype(np.float32)
    path = tmp_path / "rt.mid"
    song = save_piano_roll_to_midi(notes, str(path), bpm=97, scale="dorian", verbose=False)
    back = read_midi(str(path))
    assert abs(back.initial_tempo - 97.0) < 0.01
    orig = song.note_array()
    parsed = back.note_array()
    # zero-length notes (start tick == end tick) are dropped by the reader
    assert parsed.shape[0] <= orig.shape[0]
    # re-serialization of the parsed song is byte-stable
    rebuilt = MidiSong(
        initial_tempo=back.initial_tempo,
        resolution=back.resolution,
        instruments=back.instruments,
    )
    assert rebuilt.to_bytes() == path.read_bytes()


def test_parser_rejects_garbage(rng):
    from melogan_tpu.midi.midifile import read_midi

    with pytest.raises(ValueError):
        read_midi(b"not a midi file at all")
    # truncated header: ValueError specifically — the parser wraps all
    # structural failures so user-file callers catch ONE exception type
    with pytest.raises(ValueError):
        read_midi(b"MThd\x00\x00\x00\x06\x00\x01")


def test_parser_survives_truncated_track(reference_dir):
    """A file cut mid-track must raise ValueError, not hang or leak
    IndexError/struct.error, and not return garbage silently."""
    import glob
    from melogan_tpu.midi.midifile import read_midi

    path = sorted(glob.glob(os.path.join(reference_dir, "good_gens1", "*.mid")))[0]
    data = open(path, "rb").read()
    with pytest.raises(ValueError):
        read_midi(data[: len(data) // 2])


def test_parser_every_truncation_prefix(reference_dir):
    """EVERY prefix of a real file either parses or raises ValueError — never
    IndexError/struct.error/ZeroDivisionError (the diagnostics CLIs feed
    user-supplied files straight into read_midi)."""
    import glob
    from melogan_tpu.midi.midifile import read_midi

    path = sorted(glob.glob(os.path.join(reference_dir, "good_gens1", "*.mid")))[0]
    data = open(path, "rb").read()
    for cut in list(range(0, min(len(data), 600))) + list(range(600, len(data), 37)):
        try:
            read_midi(data[:cut])
        except ValueError:
            pass


def test_parser_byte_flip_fuzz(reference_dir, rng):
    """Seeded single/multi-byte corruption of a real file: parse must either
    succeed or raise ValueError — no other exception type, no hang."""
    import glob
    from melogan_tpu.midi.midifile import read_midi

    path = sorted(glob.glob(os.path.join(reference_dir, "good_gens1", "*.mid")))[1]
    data = bytearray(open(path, "rb").read())
    for _ in range(500):
        mutated = bytearray(data)
        for _ in range(int(rng.integers(1, 4))):
            mutated[int(rng.integers(0, len(mutated)))] = int(rng.integers(0, 256))
        try:
            read_midi(bytes(mutated))
        except ValueError:
            pass


def test_parser_random_bytes_fuzz(rng):
    """Pure random bytes (with and without a plausible MThd prefix) never
    leak a non-ValueError failure."""
    from melogan_tpu.midi.midifile import read_midi

    header = b"MThd\x00\x00\x00\x06\x00\x01\x00\x02\x00\xdc"
    for _ in range(300):
        blob = rng.integers(0, 256, size=int(rng.integers(0, 200))).astype("uint8").tobytes()
        for candidate in (blob, header + blob, header + b"MTrk" + blob):
            try:
                read_midi(candidate)
            except ValueError:
                pass


@pytest.mark.parametrize(
    "blob,what",
    [
        (b"MThd\x00\x00\x00\x06\x00\x01\x00\x00\x00\x00", "zero division field"),
        (b"MThd\x00\x00\x00\x06\x00\x01\x00\x00\xe2\x50", "SMPTE division"),
        (b"MThd\x00\x00\x00\x02\x00\x01\x00\x00\x00\xdc", "short MThd length"),
        (
            # declared MTrk length far beyond EOF
            b"MThd\x00\x00\x00\x06\x00\x01\x00\x01\x00\xdc"
            b"MTrk\x7f\xff\xff\xff\x00\xff\x2f\x00",
            "MTrk length exceeds file",
        ),
        (
            # VLQ bomb: endless continuation bytes, then EOF
            b"MThd\x00\x00\x00\x06\x00\x01\x00\x01\x00\xdc"
            b"MTrk\x00\x00\x00\x20" + b"\xff" * 32,
            "VLQ continuation run to EOF",
        ),
        (
            # tempo event with 0 us/beat -> would be an inf-bpm song
            b"MThd\x00\x00\x00\x06\x00\x01\x00\x01\x00\xdc"
            b"MTrk\x00\x00\x00\x0b"
            b"\x00\xff\x51\x03\x00\x00\x00"
            b"\x00\xff\x2f\x00",
            "zero tempo",
        ),
    ],
)
def test_parser_rejects_malformed_structures(blob, what):
    from melogan_tpu.midi.midifile import read_midi

    with pytest.raises(ValueError):
        read_midi(blob)
