"""Generation-quality gate: per-emotion acceptance bands from the golden
reference artifacts.

The reference ships 16 golden generations (good_gens1/ + generated_tests/,
2 per emotion each) as its de-facto output regression target (SURVEY.md §2.9).
The bands below were measured over ALL 16 with ``analyze_midi`` and widened
by a safety margin; ``tests/test_quality.py`` re-derives the golden stats from
the artifacts and asserts every one falls inside these bands, so the constants
can never drift from their source.

Key band: ``n_notes ≥ 450`` of 512 events sounding. The rest rule
(velocity < −0.2 ⇒ skip, reference src/gan/utils.py:135-137) means a generator
trained on padding-heavy data collapses to rests — the round-1 demo run
emitted only ~200 sounding notes per sample because the synthetic corpus used
256-note songs (256 padding rows per (512,4) array). The corpus now defaults
to full 512-note songs to match the golden density.
"""
from __future__ import annotations

import os
from typing import Dict, List, Tuple

from melogan_tpu.diagnostics.analyze_midi import analyze_file

# bands common to every emotion (measured golden ranges in comments)
COMMON_BANDS: Dict[str, Tuple[float, float]] = {
    "n_notes": (450, 512),        # golden: 499–512
    "avg_pitch": (42.0, 62.0),    # golden: 46.9–56.7
    "min_pitch": (30, 50),        # golden: 34–41 (renderer clamps ≥36)
    "max_pitch": (52, 96),        # golden: 59–77 (renderer clamps ≤96)
    "avg_velocity": (70.0, 95.0), # golden: 78.9–84.4
}

# per-emotion bands: bpm (serving map ± the ±15% sampling jitter; wide enough
# for good_gens1's 120-bpm default-tempo artifacts) and notes/sec
# (tempo-coupled density)
EMOTION_BANDS: Dict[str, Dict[str, Tuple[float, float]]] = {
    "happy": {"tempo_bpm": (105, 170), "notes_per_sec": (1.5, 16.0)},
    "sad": {"tempo_bpm": (55, 125), "notes_per_sec": (0.6, 9.0)},
    "angry": {"tempo_bpm": (110, 195), "notes_per_sec": (2.5, 22.0)},
    "calm": {"tempo_bpm": (65, 130), "notes_per_sec": (0.8, 5.0)},
}


def check_stats(stats: Dict, emotion: str) -> List[str]:
    """Band check over one file's ``analyze_midi`` stats → violations list."""
    if "error" in stats:
        return [f"unreadable: {stats['error']}"]
    violations = []
    bands = dict(COMMON_BANDS)
    bands.update(EMOTION_BANDS.get(emotion, {}))
    for key, (lo, hi) in bands.items():
        v = stats.get(key)
        if v is None:
            violations.append(f"{key}: missing")
        elif not (lo <= v <= hi):
            violations.append(f"{key}: {v} outside [{lo}, {hi}]")
    return violations


def infer_emotion(filename: str) -> str:
    base = os.path.basename(filename).lower()
    for emotion in ("happy", "sad", "angry", "calm"):
        if emotion in base:
            return emotion
    return "calm"


def quality_gate(paths: List[str]) -> Dict:
    """Gate a set of generated .mid files against the golden bands.

    Returns {"ok": bool, "files": {name: {"emotion", "violations", stats...}}}.
    """
    report: Dict = {"ok": True, "files": {}}
    for path in paths:
        stats = analyze_file(path)
        emotion = infer_emotion(path)
        violations = check_stats(stats, emotion)
        name = os.path.basename(path)
        if name in report["files"]:  # same basename from different dirs
            name = os.path.join(os.path.basename(os.path.dirname(path)), name)
        report["files"][name] = {
            "emotion": emotion,
            "violations": violations,
            **{k: v for k, v in stats.items()},
        }
        if violations:
            report["ok"] = False
    return report


def gate_directory(directory: str) -> Dict:
    paths = sorted(
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if f.endswith(".mid")
    )
    if not paths:
        return {"ok": False, "files": {}, "error": f"no .mid files in {directory}"}
    return quality_gate(paths)
