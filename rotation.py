"""Driver-window rotation calculator: computes the next round's
WINDOW_ORDER mechanically from the CORRECTNESS_r*.json history, so the
per-round rotation (hand-derived and hand-checked since round 6) cannot
slip an arithmetic mistake.

THE TOTAL ORDER (the rotation invariant, queries/__init__.py):

    sort registered queries by (last_green_round ASC,
                                cumulative_greens ASC,
                                query number ASC)
    window = first `cap` (50)

which reproduces the three invariant clauses exactly:

- never-driver-green queries have last_green_round 0 and cumulative 0,
  so they lead unconditionally (invariant (c), birth order = number);
- the oldest-stale cohort comes next in full (invariant (a): with
  capacity (K+1)*cap >= R, taking cohorts oldest-first guarantees no
  query's staleness exceeds K rounds);
- within a cohort, fewest-cumulative-greens first then number — the
  tie-break every rotation since r6 used.

tests/test_rotation.py pins that this function reproduces the
hand-derived round-11 WINDOW_ORDER byte-for-byte from CORRECTNESS_r01..
r10 + the round-11 registry, so future rounds can trust it blind:

    python rotation.py          # prints the NEXT window, one name/line

A "green" row is rows_match AND schema_match AND hash_match-not-false
(rows-only queries record hash_match null — the driver's weaker check
still counts as its green, exactly how the VERDICT tallies it).
"""

from __future__ import annotations

import glob
import json
import os
import re


def load_green_history(repo_root: str) -> dict[str, list[int]]:
    """{query_name: [rounds with a green driver row]} over every
    CORRECTNESS_r*.json in the repo root."""
    hist: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)\.json$", path).group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, v in rows.items():
            green = (
                bool(v.get("rows_match"))
                and bool(v.get("schema_match"))
                and v.get("hash_match") is not False
            )
            if green:
                hist.setdefault(name, []).append(rnd)
    return hist


def query_number(name: str) -> int:
    m = re.match(r"q(\d+)", name)
    return int(m.group(1)) if m else 10**9


def compute_window(
    registered: list[str],
    history: dict[str, list[int]],
    cap: int = 50,
) -> list[str]:
    """The next driver window: first `cap` names in the invariant's
    total order."""

    def key(name: str):
        greens = history.get(name, [])
        return (max(greens, default=0), len(greens), query_number(name))

    return sorted(registered, key=key)[:cap]


def main() -> int:
    from reddit_big_data_spark.registry import all_queries

    repo_root = os.path.dirname(os.path.abspath(__file__))
    window = compute_window(
        sorted(all_queries()), load_green_history(repo_root)
    )
    for name in window:
        print(name)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
