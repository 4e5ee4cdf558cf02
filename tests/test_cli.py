"""CLI surface: parser coverage and light end-to-end subcommands."""
import json
import os

import numpy as np

from melogan_tpu.cli import build_parser, main


def test_parser_has_all_subcommands():
    p = build_parser()
    subs = p._subparsers._group_actions[0].choices
    expected = {
        "synth-data", "preprocess", "make-splits", "split-arrays",
        "train-ae", "encode", "train-ed", "eval-ed", "train-gan",
        "sample", "pipeline", "diagnose", "analyze-midi", "tsne",
        "serve", "bench", "roll-to-midi", "clean",
    }
    assert expected <= set(subs)


def test_roll_to_midi_cli(tmp_path, rng, capsys):
    roll = np.zeros((16, 4), np.float32)
    roll[:, 0] = rng.integers(40, 90, 16)
    roll[:, 1] = rng.integers(30, 120, 16)
    roll[:, 2] = rng.uniform(0.1, 1.0, 16)
    roll[:, 3] = np.arange(16) * 0.5
    npy = tmp_path / "roll.npy"
    np.save(npy, roll)
    out = tmp_path / "out.mid"
    main(["roll-to-midi", str(npy), "--out", str(out), "--bpm", "96"])
    from melogan_tpu.midi.midifile import read_midi

    song = read_midi(str(out))
    assert abs(song.initial_tempo - 96.0) < 0.01
    assert len(song.note_array()) == 16


def test_sample_cli_random_weights(tmp_path, capsys):
    main([
        "sample", "--emotion", "happy", "--samples", "2", "--seed", "5",
        "--config", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs/gan.yaml"),
        "--workdir", str(tmp_path), "--out", str(tmp_path / "gen"),
    ])
    files = sorted(os.listdir(tmp_path / "gen"))
    assert files == ["test_happy_1.mid", "test_happy_2.mid"]


def test_analyze_midi_cli(tmp_path, rng, capsys):
    from melogan_tpu.midi.codec import save_piano_roll_to_midi

    notes = rng.normal(0, 0.6, size=(64, 4)).astype(np.float32)
    path = tmp_path / "x.mid"
    save_piano_roll_to_midi(notes, str(path), bpm=120, scale="major", verbose=False)
    capsys.readouterr()
    main(["analyze-midi", str(path)])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    stats = json.loads(out)
    assert stats["file"] == "x.mid"
    assert stats["n_notes"] > 0 and "avg_pitch" in stats


def test_clean_cli_dry_run(tmp_path, capsys):
    (tmp_path / "generated_tests").mkdir()
    main(["clean", "--workdir", str(tmp_path)])
    out = capsys.readouterr().out
    assert "DRY RUN" in out
    assert (tmp_path / "generated_tests").exists()


def test_host_only_fns_exist():
    """_HOST_ONLY_FNS gates the compile-cache/jax-import skip by function
    name; a renamed handler must not silently fall out of the set."""
    from melogan_tpu import cli

    for name in cli._HOST_ONLY_FNS:
        assert callable(getattr(cli, name, None)), f"{name} is not a cli handler"
    # every registered subcommand handler is either host-only or jax-bound;
    # the parser must only reference real functions
    parser = cli.build_parser()
    for action in parser._subparsers._group_actions[0].choices.values():
        fn = action.get_default("fn")
        assert callable(fn)
