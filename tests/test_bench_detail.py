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
        int(m.group(1))
        for p in glob.glob(os.path.join(repo, "BENCH_r*.json"))
        # Same guard as bench.current_round: the driver also records
        # off-default-cpu sweeps as BENCH_rNN_c{cpus}.json, which must not
        # count as (or crash) the round inference.
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    assert bench.current_round(repo) == max(recorded) + 1


def test_per_round_detail_path_suffixes_off_default_cpus(tmp_path):
    """VERDICT r16 #4: an off-default-cpu sweep (the driver's scaling
    run) must not shadow the canonical full-core per-round record."""
    import os

    (tmp_path / "BENCH_r16.json").write_text("{}")
    full = os.cpu_count() or 8
    assert bench.per_round_detail_path(str(tmp_path), full).endswith(
        "BENCH_DETAIL_r17.json"
    )
    assert bench.per_round_detail_path(str(tmp_path), 8 if full != 8 else 4).endswith(
        f"BENCH_DETAIL_r17_c{8 if full != 8 else 4}.json"
    )


def test_sentinel_block_computes_box_factor():
    """VERDICT r15 #4: the calibration factor is the present-sentinel
    total over the pinned r14 baseline — and only when the run is at
    the baseline's sf with EVERY sentinel present (a partial set would
    silently skew the factor)."""
    short = {k: v * 2 for k, v in bench.SENTINEL_BASELINE.items()}
    short["q99"] = 1.0
    blk = bench.sentinel_block(short, 0.1)
    assert abs(blk["box_factor"] - 2.0) < 1e-6
    assert blk["sentinels"] == {
        k: v * 2 for k, v in bench.SENTINEL_BASELINE.items()
    }
    # off-sf: no factor (the baseline is an sf0.1 measurement)
    assert bench.sentinel_block(short, 0.01)["box_factor"] is None
    # a missing sentinel: refuse rather than skew
    short.pop("q70")
    assert bench.sentinel_block(short, 0.1)["box_factor"] is None


def test_sentinels_are_registered_queries():
    """A retired or renamed sentinel would silently disable calibration
    on every future run — fail here instead."""
    from reddit_big_data_spark.registry import all_queries

    prefixes = {name.split("_", 1)[0] for name in all_queries()}
    missing = set(bench.SENTINEL_BASELINE) - prefixes
    assert not missing, f"sentinel queries no longer registered: {missing}"
