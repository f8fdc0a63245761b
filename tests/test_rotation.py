"""Pin the mechanical window-rotation calculator (rotation.py) against
the hand-derived round-11 rotation: computed from CORRECTNESS_r01..r10
and the current registry, it must reproduce queries/__init__.WINDOW_ORDER
byte-for-byte. Future rounds derive their window by running rotation.py
instead of redoing the cohort arithmetic by hand."""

from __future__ import annotations

import os

import rotation
from reddit_big_data_spark.queries import WINDOW_ORDER
from reddit_big_data_spark.registry import all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_rotation_reproduces_round11_window():
    # Restrict history to the rounds the r11 rotation was derived from
    # (r01..r10); later CORRECTNESS files, once the driver writes them,
    # feed the NEXT rotation, not this pin.
    history = {
        name: [r for r in rounds if r <= 10]
        for name, rounds in rotation.load_green_history(REPO).items()
    }
    # q167/q168 landed past the r11 cap AFTER the window froze; the r11
    # rotation was computed over the 166-query registry of that moment.
    registered = [
        n for n in sorted(all_queries())
        if n not in ("q167_boosted_trees", "q168_onehot_semantics")
    ]
    assert rotation.compute_window(registered, history) == WINDOW_ORDER


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
    hash_match false does not."""
    assert rotation.compute_window(
        ["q01_x", "q02_y"],
        {"q01_x": [1]},  # as if q02_y's rows were never green
        cap=1,
    ) == ["q02_y"]
