"""Local mirror of the driver's t2 check: run a registered Spark query and
its DuckDB oracle on the same parquet tables, compare row count, column
names, and order-insensitive canonicalized values.

Stricter in diagnostics than a hash (reports the first differing row), and
tolerant only of last-ulp float noise — query-side rounding is still
required for aggregates.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal


def _canon_cell(v):
    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, (np.integer,)):
        v = int(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, _dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.date):
        return ("date", v.isoformat())
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return ("f", v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return ("arr", tuple(_canon_cell(x) for x in v))
    return v


def _sort_key(row):
    # Pair rows primarily on non-float columns; floats participate last and
    # at coarse precision only, so last-ulp noise can't mispair rows that a
    # non-float column already distinguishes.
    hard, soft = [], []
    for c in row:
        if isinstance(c, tuple) and c and c[0] == "f":
            x = c[1]
            # Numeric coarse bucket first (a %.6e STRING key sorted
            # negatives backwards), FULL value as tie-break: rows that
            # genuinely differ but agree at 7 sig figs still pair
            # deterministically on both sides (ADVICE r1/r2).
            soft.append((float(f"{x:.6e}"), x))
        else:
            hard.append((str(type(c)), str(c)))
    return (hard, soft)


def _cells_equal(a, b) -> bool:
    if isinstance(a, tuple) and isinstance(b, tuple) and a and b and a[0] == b[0] == "f":
        x, y = a[1], b[1]
        return math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, tuple) and isinstance(b, tuple) and a and b and a[0] == b[0] == "arr":
        return len(a[1]) == len(b[1]) and all(_cells_equal(x, y) for x, y in zip(a[1], b[1]))
    return a == b


def compare_frames(spark_pdf, duck_pdf, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    errors: list[str] = []
    s_cols = sorted(spark_pdf.columns)
    d_cols = sorted(duck_pdf.columns)
    if s_cols != d_cols:
        return [f"{name}: column names differ: spark={s_cols} duck={d_cols}"]
    if len(spark_pdf) != len(duck_pdf):
        errors.append(f"{name}: row count differs: spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return errors

    # Extract column-wise (never iterrows: it upcasts mixed-dtype rows to a
    # common float dtype, laundering int-vs-float divergences that the
    # driver's exact hash would catch).
    def _rows(pdf, cols):
        series = [pdf[c] for c in cols]
        return [tuple(_canon_cell(s.iloc[i]) for s in series) for i in range(len(pdf))]

    s_rows = sorted(_rows(spark_pdf, s_cols), key=_sort_key)
    d_rows = sorted(_rows(duck_pdf, d_cols), key=_sort_key)
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        if not all(_cells_equal(a, b) for a, b in zip(sr, dr)):
            errors.append(
                f"{name}: row {i} differs (cols {s_cols}):\n  spark={sr}\n  duck ={dr}"
            )
            if len(errors) >= 3:
                break
    return errors


_CORPUS_DIGESTS: dict[str, str] = {}


def rotating_audit_pick() -> str | None:
    """ONE fixture-backed query per suite run re-derives its truth LIVE
    and cross-checks the fixture against it (ADVICE r14): the sidecar
    md5 catches corruption, but a wrong fixture regenerated TOGETHER
    with its sidecar would pass both the mirror and the rot guard
    forever. Rotating a live re-derivation (each live oracle is <=30 s
    at sf0.01 — measured r15) bounds how long a consistently-wrong pair
    can persist to one rotation cycle (8 fixtures => 8 rounds).

    Deterministic per ROUND, not per wall-clock: the index rotates on
    the number of recorded CORRECTNESS_r*.json files, so a round's CI
    reruns audit the same fixture and the pick advances exactly when
    the driver closes a round. Deliberately NOT memoized: tests
    monkeypatch FIXTURE_DIR, and the listing is microseconds —
    determinism (not caching) is what keeps it to one live
    re-derivation per suite run."""
    import glob
    import os

    import oracle_sweep as _osw

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        names = sorted(
            {
                f.split(".")[0]
                for f in os.listdir(_osw.FIXTURE_DIR)
                if f.endswith(".parquet")
            }
        )
    except FileNotFoundError:
        names = []
    rounds = len(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    return names[rounds % len(names)] if names else None


def _load_truth_fixture(query, sf_dir: str):
    """The sweep's content-checksummed truth fixture for (query, corpus),
    or None. Same rot discipline as oracle_sweep.py: the filename embeds
    the corpus md5 + oracle-SQL md5 (a regeneration or an oracle edit
    misses the key) and the sidecar pins the parquet bytes; a checksum
    miss falls back to the live DuckDB run, never a silent compare, and
    the CI rot guard (test_oracle_sweep.py) flags the corrupt file.

    Using the fixture keeps the mirror's rigor — it compares Spark
    against the SAME DuckDB-derived truth — while taking the quadratic
    oracles (q35/q130 ~23 s each at sf0.01) out of every suite run
    (VERDICT r13 #4's wall-time budget)."""
    import os

    import pandas as pd

    from oracle_sweep import corpus_digest, fixture_content_ok, fixture_path

    if sf_dir not in _CORPUS_DIGESTS:
        _CORPUS_DIGESTS[sf_dir] = corpus_digest(sf_dir)
    fpath = fixture_path(query.name, query.oracle, _CORPUS_DIGESTS[sf_dir])
    if os.path.exists(fpath) and fixture_content_ok(fpath):
        return pd.read_parquet(fpath)
    return None


# Ceiling on the rotating live audit's DuckDB re-derivation (ADVICE
# r15): fixtures exist precisely because some oracles are slow, and a
# quadratic oracle whose sf0.01 runtime grows past the measured ~30 s
# would otherwise charge every suite run that picks it an unbounded
# cost. Past the budget the audit degrades LOUDLY to the fixture path
# (sidecar checksum still guards byte rot; the full cross-check happens
# in the unbounded oracle_sweep run) instead of stalling the suite.
LIVE_AUDIT_BUDGET_SECS = 120.0


def run_and_compare(spark, duck, query, sf_dir: str) -> list[str]:
    sdf = query.fn(spark, sf_dir).toPandas()
    ddf = _load_truth_fixture(query, sf_dir)
    if ddf is not None and query.name == rotating_audit_pick():
        # this run's rotating live audit: re-derive the truth from
        # DuckDB and fail loudly if the committed fixture has drifted
        # from it — THEN compare Spark against the live truth
        import duckdb as _duckdb

        from oracle_sweep import _fetch_oracle

        try:
            live = _fetch_oracle(duck, query.oracle, LIVE_AUDIT_BUDGET_SECS)
        except _duckdb.InterruptException:
            import warnings

            warnings.warn(
                f"{query.name}: rotating live audit exceeded "
                f"{LIVE_AUDIT_BUDGET_SECS:.0f}s — comparing against the "
                "checksummed fixture only this run; re-derive via "
                f"`python oracle_sweep.py {sf_dir} --only {query.name}`",
                stacklevel=2,
            )
            live = None
        if live is not None:
            rot = compare_frames(live, ddf, f"{query.name}[fixture-audit]")
            if rot:
                return [
                    f"{query.name}: committed truth fixture disagrees with "
                    "a live oracle re-derivation — regenerate it via "
                    "oracle_sweep.py:"
                ] + rot
            ddf = live
    if ddf is None:
        ddf = duck.execute(query.oracle).fetchdf()
    return compare_frames(sdf, ddf, query.name)
