"""MIDI subsystem: self-contained Standard MIDI File codec + vectorized note renderer.

The reference delegates MIDI file I/O to pretty_midi/mido (src/gan/utils.py:95-161,
src/ae/midi_utils.py, tools/roll_to_midi.py). This package implements the same
output format from scratch — byte-compatible with the reference's shipped
artifacts (good_gens1/, generated_tests/) — plus the vectorized notes(512,4) →
MIDI-event transform that defines output fidelity.
"""

from melogan_tpu.midi.midifile import MidiNote, MidiInstrument, MidiSong, read_midi
from melogan_tpu.midi.codec import (
    SCALES,
    NOTE_NAMES,
    render_piano_roll,
    save_piano_roll_to_midi,
    notes_array_to_song,
    save_recon_midi,
)

__all__ = [
    "MidiNote",
    "MidiInstrument",
    "MidiSong",
    "read_midi",
    "SCALES",
    "NOTE_NAMES",
    "render_piano_roll",
    "save_piano_roll_to_midi",
    "notes_array_to_song",
    "save_recon_midi",
]
