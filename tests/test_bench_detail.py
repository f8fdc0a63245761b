"""Per-round bench detail persistence (VERDICT r11 #3): bench.py writes
BENCH_DETAIL_r{N}.json alongside the overwritten BENCH_DETAIL.json, with
N inferred as the round the driver is ABOUT to record (max existing
BENCH_r*.json + 1 — the driver writes its BENCH_rN.json after the
sweep). These tests pin the inference without running the sweep."""

from __future__ import annotations

import bench


def test_current_round_is_max_recorded_plus_one(tmp_path):
    for n in (1, 2, 7):
        (tmp_path / f"BENCH_r{n:02d}.json").write_text("{}")
    assert bench.current_round(str(tmp_path)) == 8


def test_current_round_ignores_detail_files_and_handles_empty(tmp_path):
    assert bench.current_round(str(tmp_path)) == 1
    # per-round detail copies and the rolling detail must not count
    (tmp_path / "BENCH_DETAIL.json").write_text("{}")
    (tmp_path / "BENCH_DETAIL_r11.json").write_text("{}")
    assert bench.current_round(str(tmp_path)) == 1
    (tmp_path / "BENCH_r03.json").write_text("{}")
    assert bench.current_round(str(tmp_path)) == 4


def test_repo_history_infers_round_consistently():
    """On the real repo the inferred round must be exactly one past the
    newest recorded bench — a regression here means the per-round detail
    copy would overwrite some OTHER round's history."""
    import glob
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    recorded = [
        int(re.search(r"BENCH_r(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(repo, "BENCH_r*.json"))
    ]
    assert bench.current_round(repo) == max(recorded) + 1
