"""Diagnostics: data-sanity checks, MIDI statistics, latent-space visualization
(reference: src/gan/diagnose.py, src/gan/analyze_midi.py, tsne.py)."""
