"""Bounded CI version of the randomized kill/resume fault injection
(VERDICT-r3 item 8; the full harness is scripts/fault_inject.py).

One uninterrupted reference pipeline + one SIGKILL trial (which targets a
mid-atomic-write ``*.tmp`` window when it can) — final artifacts must be
byte-identical after ``pipeline --resume``. Runs with the persistent compile
cache DISABLED: XLA:CPU AOT-cache loads are numerically different from fresh
JITs (docs/operations.md, "CPU cache determinism"), which is an XLA
artifact, not a resume property. The multi-trial sweep is
``python scripts/fault_inject.py`` (run standalone each round).
"""
import pytest


@pytest.mark.slow
def test_randomized_kill_resume_artifacts_identical(tmp_path):
    import scripts.fault_inject as fi

    reports = fi.main(str(tmp_path), trials=1, seed=3)
    assert len(reports) == 1
    assert all(r["ok"] for r in reports)
    # the trial must have actually killed a running pipeline
    assert not reports[0]["completed_before_kill"], reports
