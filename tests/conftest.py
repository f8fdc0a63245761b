from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
# The 10x corpus where the r12 LSH corpus-gap pin lives; tests that need
# it skip (not fail) on checkouts without the large testdata (ADVICE r12).
SF_LARGE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@pytest.fixture(scope="session")
def spark():
    from reddit_big_data_spark.session import get_spark

    s = get_spark("rbds-tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s
    s.stop()


@pytest.fixture(autouse=True)
def _drop_cached_blocks(request):
    """Operators that persist() internally (minhash signatures, IVF
    assignment, global-rank offsets) cannot unpersist what their consumer
    has not materialized yet; without cleanup the cached blocks accumulate
    across the several-hundred-test session and distort memory/timings
    (ADVICE r2). Mirror of bench.py's between-query clearCache +
    localCheckpoint release (VERDICT r6 #5).

    FIXTURE HAZARD (ADVICE r7): the localCheckpoint release is
    IRREVERSIBLE — checkpointing truncated the lineage, so a released
    block cannot be recomputed. This autouse fixture therefore forbids a
    pattern: no session- or module-scoped fixture may hand out a frame
    that was localCheckpoint'd, because this mop-up would destroy its
    data after the first test that uses it. Per-test frames are safe
    (released after their last consumer)."""
    yield
    if "spark" in request.fixturenames:
        from reddit_big_data_spark.plans.cache import (
            release_local_checkpoints,
        )

        s = request.getfixturevalue("spark")
        s.catalog.clearCache()
        release_local_checkpoints(s)


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_ORACLE}/{name}.parquet')"
        )
    yield con
    con.close()
