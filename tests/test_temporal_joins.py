"""Edge cases for sessionize/asof_join beyond the oracle queries: exact
boundaries, tie timestamps, unmatched rows, forward direction."""

from __future__ import annotations

import datetime as dt

from reddit_big_data_spark.operators.temporal_joins import asof_join, sessionize

_T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return _T0 + dt.timedelta(minutes=minutes)


def test_sessionize_gap_boundary(spark):
    # gaps: 30min exactly -> SAME session (break requires strictly greater)
    df = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(30)), (1, _ts(61)), (2, _ts(0))],
        "user_id: int, ts: timestamp",
    )
    got = {
        (r["user_id"], r["ts"]): r["session_id"]
        for r in sessionize(df, "user_id", "ts", "30 minutes").collect()
    }
    assert got[(1, _ts(0))] == 1
    assert got[(1, _ts(30))] == 1  # exactly the gap: same session
    assert got[(1, _ts(61))] == 2  # 31 min later: new session
    assert got[(2, _ts(0))] == 1  # sessions are per-user


def test_asof_backward_ties_and_misses(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "p1"), (1, _ts(5), "p2"), (2, _ts(1), "p3")],
        "k: int, ts: timestamp, tag: string",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 50.0), (1, _ts(9), 90.0), (2, _ts(2), 20.0)],
        "k: int, rts: timestamp, v: double",
    )
    got = {
        r["tag"]: (r["rts"], r["v"])
        for r in asof_join(left, right, "k", "ts", "rts", ["rts", "v"]).collect()
    }
    assert got["p1"] == (_ts(9), 90.0)  # latest <= 10
    assert got["p2"] == (_ts(5), 50.0)  # tie: equal ts matches
    assert got["p3"] == (None, None)  # nothing at or before ts=1


def test_asof_forward(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "p1"), (1, _ts(95), "p2")], "k: int, ts: timestamp, tag: string"
    )
    right = spark.createDataFrame(
        [(1, _ts(12), 12.0), (1, _ts(90), 90.0)], "k: int, rts: timestamp, v: double"
    )
    got = {
        r["tag"]: r["v"]
        for r in asof_join(
            left, right, "k", "ts", "rts", ["v"], direction="forward"
        ).collect()
    }
    assert got["p1"] == 12.0  # earliest >= 10
    assert got["p2"] is None  # nothing at or after 95


def test_asof_plan_single_shuffle_no_cartesian(spark):
    left = spark.createDataFrame([(1, _ts(1), "a")], "k: int, ts: timestamp, t: string")
    right = spark.createDataFrame([(1, _ts(0), 1.0)], "k: int, rts: timestamp, v: double")
    out = asof_join(left, right, "k", "ts", "rts", ["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # the union+window strategy shuffles on the key once, never range-joins
    assert plan.count("Exchange hashpartitioning") <= 2
