"""Pin the mechanical window-rotation calculator (rotation.py) against
the committed driver window: computed from the CORRECTNESS_r*.json
history the window was derived from and the current registry, it must
reproduce queries/__init__.WINDOW_ORDER byte-for-byte. From round 12 on
the window IS rotation.py's output (VERDICT r11 #1), so this pin is the
"diff is empty" proof the changelog claims.

Also turns the <=3-round staleness invariant (a) into CI (VERDICT r11
#5): test_no_query_exceeds_staleness_limit fails when any registered
query would exceed 3 rounds of driver-staleness if the committed
WINDOW_ORDER ran green next round — the invariant used to live only in
changelog prose."""

from __future__ import annotations

import json
import os

import rotation
from reddit_big_data_spark.queries import WINDOW_ORDER
from reddit_big_data_spark.registry import all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The round whose window is committed: the r16 window was computed from
# CORRECTNESS_r01..r15. Bump alongside WINDOW_ORDER each round; later
# CORRECTNESS files, once the driver writes them, feed the NEXT
# rotation, not this pin.
WINDOW_ROUND = 16


def _history_through(last_round: int) -> dict[str, list[int]]:
    return {
        name: [r for r in rounds if r <= last_round]
        for name, rounds in rotation.load_green_history(REPO).items()
    }


def test_rotation_reproduces_committed_window():
    history = _history_through(WINDOW_ROUND - 1)
    registered = sorted(all_queries())
    assert rotation.compute_window(registered, history) == WINDOW_ORDER


def test_no_query_exceeds_staleness_limit():
    """Invariant (a) as CI: if the committed window runs (green) in
    round WINDOW_ROUND, every registered query's driver-staleness stays
    <= 3 rounds — i.e. every query NOT in the window must already have
    a driver-green row in one of the three preceding rounds, and every
    never-green query must be IN the window."""
    history = _history_through(WINDOW_ROUND - 1)
    window = set(WINDOW_ORDER)
    violations = []
    for name in sorted(all_queries()):
        if name in window:
            continue  # green at WINDOW_ROUND => staleness 0
        last_green = max(history.get(name, []), default=0)
        if last_green < WINDOW_ROUND - 3:
            violations.append((name, last_green))
    assert not violations, (
        f"queries >3 rounds driver-stale if WINDOW_ORDER runs next: "
        f"{violations}"
    )


def test_rotation_clauses():
    """The three invariant clauses on a synthetic history."""
    registered = ["q01_a", "q02_b", "q03_c", "q04_d", "q05_e"]
    history = {
        "q01_a": [1, 2, 3],   # freshest, most greens
        "q02_b": [1, 3],
        "q03_c": [1],         # stalest green
        "q04_d": [2],
        # q05_e never green
    }
    # never-green leads; then last-green ascending; greens break ties
    assert rotation.compute_window(registered, history, cap=5) == [
        "q05_e", "q03_c", "q04_d", "q02_b", "q01_a"
    ]
    assert rotation.compute_window(registered, history, cap=2) == [
        "q05_e", "q03_c"
    ]


def test_green_semantics_match_verdict_tally():
    """hash_match null (rows-only check) still counts as green;
    hash_match false does not — via compute_window over a pre-built
    history (parsing itself is pinned by test_load_green_history...)."""
    assert rotation.compute_window(
        ["q01_x", "q02_y"],
        {"q01_x": [1]},  # as if q02_y's rows were never green
        cap=1,
    ) == ["q02_y"]


def test_load_green_history_parses_hash_match_semantics(tmp_path):
    """ADVICE r11: exercise load_green_history's actual JSON parsing —
    hash_match true and null (rows-only check) count as green, false
    and rows/schema mismatches do not, and rounds accumulate across
    files in round order."""
    row = {"rows_match": True, "schema_match": True, "spark_rows": 1,
           "oracle_rows": 1, "err": None}
    r1 = {
        "q01_full_green": {**row, "hash_match": True},
        "q02_rows_only_green": {**row, "hash_match": None},
        "q03_hash_red": {**row, "hash_match": False},
        "q04_rows_red": {**row, "rows_match": False, "hash_match": True},
        "q05_schema_red": {**row, "schema_match": False, "hash_match": True},
    }
    r2 = {"q01_full_green": {**row, "hash_match": True}}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(r1))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps(r2))
    hist = rotation.load_green_history(str(tmp_path))
    assert hist == {
        "q01_full_green": [1, 2],
        "q02_rows_only_green": [1],
    }
