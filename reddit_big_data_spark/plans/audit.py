"""Multi-consumer recompute audit: count LIVE parquet scans per table in
a DataFrame's executed plan — scans that will actually re-read (and
re-derive everything above) at execution time, excluding subtrees served
by a cached InMemoryRelation.

Why this exists: Spark re-executes a shared subtree once PER CONSUMER
unless it is persisted/checkpointed — the single most common silent perf
bug in this package's history (round 6 fixed q70/q96/q101/q115/q116;
round 9's sweep caught q111's double trigram explosion, q38/q49's triple
regex-normalize, and q66's double winnowing pass). The lint-style sweep
in tests/test_scan_audit.py pins every registered query's live-scan
counts so a new consumer of an unpersisted expensive subtree fails CI
instead of shipping a 2x query.

Counting subtlety: ``executedPlan().toString()`` REPEATS the full
InMemoryRelation subtree (including its FileScan line) at every reuse
site, so naive FileScan-line counting overcounts cached plans. The walk
below climbs each FileScan's ancestor chain by tree-art depth and drops
scans under an InMemoryRelation. Pure tree-art lines (only ``:``/``|``
columns) and wrapped node text carry no ``+-`` marker and are skipped —
treating them as depth-0 roots was the bug in the first version of this
walker (it marked every cached scan live).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_TABLE_RE = re.compile(r"/(\w+)\.parquet")


def _depth_or_none(line: str) -> int | None:
    """Tree depth of a plan line's NODE marker, or None for non-node
    lines (pure art columns, wrapped node text)."""
    i = line.find("+-")
    if i >= 0:
        return i
    s = line.strip()
    if not s or set(s) <= set(":| "):
        return None  # pure tree art
    if line.startswith((" ", ":")):
        return None  # continuation of a wrapped node's text
    return 0  # an unindented root-level node


def live_file_scans(df: DataFrame) -> dict[str, int]:
    """table name -> number of LIVE FileScans in the final plan (scans
    under a cached InMemoryRelation excluded; AQE's repeated
    '== Initial Plan ==' section excluded)."""
    plan = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    lines = plan.splitlines()
    counts: dict[str, int] = {}
    for idx, ln in enumerate(lines):
        if "FileScan" not in ln:
            continue
        d = _depth_or_none(ln)
        if d is None:  # pragma: no cover - FileScan always a node line
            continue
        cached = False
        for j in range(idx - 1, -1, -1):
            dj = _depth_or_none(lines[j])
            if dj is None:
                continue
            if dj < d:
                if "InMemoryRelation" in lines[j]:
                    cached = True
                    break
                d = dj
                if d == 0:
                    break
        if not cached:
            m = _TABLE_RE.search(ln)
            t = m.group(1) if m else "other"
            counts[t] = counts.get(t, 0) + 1
    return counts
