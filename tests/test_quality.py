"""Golden-band generation quality gate (VERDICT r1 item 6).

The bands in diagnostics/quality.py are constants derived from the 16 golden
reference artifacts; these tests re-measure the artifacts and assert every
one falls inside the bands (so the constants cannot drift from their source),
then exercise the gate's failure modes — including the round-1 note-density
regression (rest-collapsed ~200-note samples must FAIL).
"""
import glob
import os

import numpy as np
import pytest

from melogan_tpu.diagnostics.quality import (
    COMMON_BANDS,
    EMOTION_BANDS,
    check_stats,
    gate_directory,
    infer_emotion,
    quality_gate,
)


def golden_paths(reference_dir):
    paths = sorted(
        glob.glob(os.path.join(reference_dir, "good_gens1", "*.mid"))
        + glob.glob(os.path.join(reference_dir, "generated_tests", "*.mid"))
    )
    if len(paths) < 16:
        pytest.skip("golden artifacts unavailable")
    return paths


def test_all_16_golden_artifacts_pass_the_gate(reference_dir):
    report = quality_gate(golden_paths(reference_dir))
    failures = {
        n: e["violations"] for n, e in report["files"].items() if e["violations"]
    }
    assert report["ok"], f"golden artifacts violate their own bands: {failures}"
    assert len(report["files"]) == 16


def test_emotion_inference_from_filenames(reference_dir):
    for p in golden_paths(reference_dir):
        assert infer_emotion(p) in EMOTION_BANDS
        assert infer_emotion(p) in os.path.basename(p)


def test_rest_collapsed_sample_fails():
    """A 200-sounding-note generation (the round-1 density regression) must
    be rejected by the n_notes band."""
    stats = {
        "tempo_bpm": 140.0, "duration_sec": 60.0, "n_notes": 205,
        "avg_pitch": 52.0, "min_pitch": 38, "max_pitch": 70,
        "unique_pitches": 15, "avg_velocity": 82.0, "notes_per_sec": 3.4,
        "avg_note_duration": 0.5,
    }
    violations = check_stats(stats, "happy")
    assert any(v.startswith("n_notes") for v in violations)


def test_out_of_band_bpm_and_velocity_fail():
    base = {
        "tempo_bpm": 140.0, "duration_sec": 60.0, "n_notes": 510,
        "avg_pitch": 52.0, "min_pitch": 38, "max_pitch": 70,
        "unique_pitches": 15, "avg_velocity": 82.0, "notes_per_sec": 3.4,
        "avg_note_duration": 0.5,
    }
    assert check_stats(base, "happy") == []
    assert any(v.startswith("tempo_bpm") for v in check_stats({**base, "tempo_bpm": 60.0}, "happy"))
    assert any(v.startswith("avg_velocity") for v in check_stats({**base, "avg_velocity": 20.0}, "happy"))
    assert any(v.startswith("notes_per_sec") for v in check_stats({**base, "notes_per_sec": 30.0}, "happy"))
    assert check_stats({"error": "boom"}, "happy") == ["unreadable: boom"]


def test_band_breakdown():
    """The per-metric breakdown (VERDICT-r4 item 2) reports signed distances
    to the nearest band edge and aggregates failing files per metric."""
    from melogan_tpu.diagnostics.quality import band_breakdown

    base = {
        "tempo_bpm": 140.0, "duration_sec": 60.0, "n_notes": 510,
        "avg_pitch": 52.0, "min_pitch": 38, "max_pitch": 70,
        "unique_pitches": 15, "avg_velocity": 82.0, "notes_per_sec": 3.4,
        "avg_note_duration": 0.5,
    }
    report = {"files": {
        "a_happy.mid": {"emotion": "happy", "violations": [], **base},
        # avg_pitch 40 is below the strict lo 46.9 by -6.9
        "b_happy.mid": {"emotion": "happy", "violations": ["x"],
                        **{**base, "avg_pitch": 40.0}},
    }}
    bd = band_breakdown(report, tier="strict")
    m = bd["per_metric"]["avg_pitch"]
    assert m["n_fail"] == 1 and m["failing_files"] == ["b_happy.mid"]
    assert m["worst_delta"] == pytest.approx(40.0 - 46.9, abs=1e-6)
    row = next(r for r in bd["rows"]
               if r["file"] == "b_happy.mid" and r["metric"] == "avg_pitch")
    assert not row["ok"] and row["delta"] < 0
    # a metric fully in band aggregates as zero failures
    assert bd["per_metric"]["n_notes"]["n_fail"] == 0
    # default tier uses the wider bands: avg_pitch 40 is inside (41.7..) — no:
    # 40 < 41.7, still out, but by less
    bd_d = band_breakdown(report, tier="default")
    assert abs(bd_d["per_metric"]["avg_pitch"]["worst_delta"]) < abs(m["worst_delta"])


def test_gate_survives_corrupt_file(reference_dir, tmp_path):
    """One malformed .mid in a directory must be reported as unreadable, not
    crash the scan; the healthy files still get gated."""
    import shutil

    good = golden_paths(reference_dir)[0]
    shutil.copy(good, tmp_path / os.path.basename(good))
    (tmp_path / "test_happy_corrupt.mid").write_bytes(b"MThd\x00\x00\x00\x06garbage")
    report = gate_directory(str(tmp_path))
    assert not report["ok"]
    bad = report["files"]["test_happy_corrupt.mid"]
    assert any(v.startswith("unreadable:") for v in bad["violations"])
    healthy = report["files"][os.path.basename(good)]
    assert not healthy["violations"]


def test_gate_directory_empty(tmp_path):
    report = gate_directory(str(tmp_path))
    assert not report["ok"] and "error" in report


def test_synthetic_corpus_matches_golden_density(tmp_path, rng):
    """The synthetic training corpus (demo pipeline input) must produce
    (512, 4) arrays that are nearly padding-free, so a trained generator
    does not learn the rest collapse."""
    from melogan_tpu.data.preprocess import preprocess_midi_file
    from melogan_tpu.data.synthetic import synth_song

    for emotion in ("happy", "sad", "angry", "calm"):
        song = synth_song(emotion, rng)
        path = str(tmp_path / f"{emotion}.mid")
        song.write(path)
        sample, _feats = preprocess_midi_file(path, mood=emotion, max_notes=512)
        notes = np.asarray(sample.notes)
        assert notes.shape == (512, 4)
        sounding = int((notes[:, 0] > 0).sum())
        assert sounding >= 500, f"{emotion}: only {sounding}/512 sounding rows"


def test_cli_quality_gate_subcommand(reference_dir, tmp_path, capsys):
    import shutil

    from melogan_tpu.cli import main as cli

    src = golden_paths(reference_dir)[:4]
    for p in src:
        shutil.copy(p, tmp_path / os.path.basename(p))
    cli(["quality-gate", str(tmp_path)])
    out = capsys.readouterr().out
    assert "[PASS] quality gate (default tier): 4/4" in out

    # the strict tier admits the golden artifacts too (their own envelope)
    cli(["quality-gate", str(tmp_path), "--tier", "strict"])
    out = capsys.readouterr().out
    assert "[PASS] quality gate (strict tier): 4/4" in out

    # strict gate exits nonzero on an empty dir
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(SystemExit):
        cli(["quality-gate", str(empty)])
    cli(["quality-gate", str(empty), "--no-strict"])  # non-strict: no raise


def test_bands_are_exactly_the_derivation_output(reference_dir):
    """VERDICT-r2 weak #7: the band constants must equal derive_bands() over
    the 16 golden artifacts — margins are a rule, not eyeballed numbers."""
    from melogan_tpu.diagnostics.analyze_midi import analyze_file
    from melogan_tpu.diagnostics.quality import derive_bands

    stats = []
    for p in golden_paths(reference_dir):
        s = analyze_file(p)
        s["emotion"] = infer_emotion(p)
        stats.append(s)
    common, emotion = derive_bands(stats)
    assert common == COMMON_BANDS
    assert emotion == EMOTION_BANDS

    from melogan_tpu.diagnostics.quality import (
        STRICT_COMMON_BANDS,
        STRICT_EMOTION_BANDS,
    )

    s_common, s_emotion = derive_bands(stats, tier="strict")
    assert s_common == STRICT_COMMON_BANDS
    assert s_emotion == STRICT_EMOTION_BANDS
    # strict is genuinely tighter on every common metric
    for m in COMMON_BANDS:
        lo, hi = COMMON_BANDS[m]
        slo, shi = STRICT_COMMON_BANDS[m]
        assert slo >= lo and shi <= hi
        assert (shi - slo) < (hi - lo)


def test_all_16_golden_artifacts_pass_the_strict_gate(reference_dir):
    report = quality_gate(golden_paths(reference_dir), tier="strict")
    assert report["ok"], {
        n: e["violations"] for n, e in report["files"].items() if e["violations"]
    }


@pytest.mark.slow
def test_untrained_generator_fails_the_gate(tmp_path):
    """VERDICT-r3 weak #3: 8/8 would be weak evidence if garbage could pass.
    A randomly-initialized generator at full reference shapes must FAIL the
    DEFAULT gate on every file (and a fortiori the strict tier)."""
    from melogan_tpu.config import GANConfig
    from melogan_tpu.constants import EMOTION_BPM
    from melogan_tpu.sampling import Sampler

    cfg = GANConfig()
    sampler = Sampler(cfg, seed=0)  # no checkpoint: random weights
    prompts, paths, bpms = [], [], []
    for emotion in ("happy", "sad", "angry", "calm"):
        for i in (1, 2):
            prompts.append(emotion)
            paths.append(str(tmp_path / f"test_{emotion}_{i}.mid"))
            bpms.append(float(EMOTION_BPM[emotion]))
    sampler.generate_many(prompts, paths, seed=1, bpms=bpms)
    report = quality_gate(paths)
    failing = sum(1 for e in report["files"].values() if e["violations"])
    assert failing == len(paths), (
        f"only {failing}/{len(paths)} random-generator files failed the gate"
    )
    assert not report["ok"]
    strict = quality_gate(paths, tier="strict")
    assert not strict["ok"]
