"""Serving/sampling behavioral-contract constants, importable without jax.

One home for the emotion→bpm map (reference app.py:110) and the cli sampling
bpm jitter so the quality gate (`diagnostics/quality.py::derive_bands`) and
the emitters (`sampling.py`, `cli.py::cmd_sample`) can never disagree: the
gate's tempo bands must admit whatever `melogan sample`/`/generate` can
legitimately emit, so both sides read the same values. This module stays
dependency-free because the gate runs in jax-less host tooling.
"""
from __future__ import annotations

from typing import Dict

# Serving bpm map (reference app.py:110).
EMOTION_BPM: Dict[str, float] = {"happy": 140.0, "sad": 70.0, "angry": 160.0, "calm": 90.0}

# `melogan sample --jitter-bpm` draws bpm ~ U(bpm·(1−J), bpm·(1+J)).
BPM_JITTER = 0.15
