"""bucketed_range_join: boundary semantics ([lo, hi) half-open), ranges
spanning many buckets, and the no-nested-loop plan guarantee."""

from __future__ import annotations

from reddit_big_data_spark.operators.range_join import bucketed_range_join


def _fixture(spark):
    points = spark.createDataFrame(
        [(1, 0.0), (2, 49.99), (3, 50.0), (4, 250.0), (5, 999.0)],
        "id: int, v: double",
    )
    ranges = spark.createDataFrame(
        [(0.0, 50.0, "a"), (50.0, 300.0, "b"), (300.0, 1000.0, "c")],
        "lo: double, hi: double, tag: string",
    )
    return points, ranges


def test_half_open_boundaries(spark):
    points, ranges = _fixture(spark)
    out = bucketed_range_join(points, ranges, "v", "lo", "hi", bucket_width=25.0)
    got = {r["id"]: r["tag"] for r in out.collect()}
    assert got == {1: "a", 2: "a", 3: "b", 4: "b", 5: "c"}  # hi exclusive, lo inclusive


def test_wide_range_no_duplicate_matches(spark):
    points, ranges = _fixture(spark)
    # tiny buckets: range "b" spans 10 buckets; point 4 must match ONCE
    out = bucketed_range_join(points, ranges, "v", "lo", "hi", bucket_width=25.0)
    assert out.count() == 5


def test_plan_has_no_nested_loop(spark):
    points, ranges = _fixture(spark)
    out = bucketed_range_join(points, ranges, "v", "lo", "hi", bucket_width=50.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_range_edge_on_bucket_edge(spark):
    # a range ending exactly on a bucket boundary must not claim that bucket
    points = spark.createDataFrame([(1, 50.0)], "id: int, v: double")
    ranges = spark.createDataFrame([(0.0, 50.0, "a")], "lo: double, hi: double, tag: string")
    out = bucketed_range_join(points, ranges, "v", "lo", "hi", bucket_width=50.0)
    assert out.count() == 0


def test_hi_just_inside_next_bucket(spark):
    # ADVICE r2 regression: hi strictly inside (N*w, N*w + 1e-9) — the old
    # epsilon subtraction computed hi_b = N-1 and silently dropped points
    # sitting in bucket N that the range legitimately covers.
    points = spark.createDataFrame([(1, 50.0)], "id: int, v: double")
    ranges = spark.createDataFrame(
        [(0.0, 50.0 + 5e-10, "a")], "lo: double, hi: double, tag: string"
    )
    out = bucketed_range_join(points, ranges, "v", "lo", "hi", bucket_width=50.0)
    assert [r["tag"] for r in out.collect()] == ["a"]


def test_large_magnitude_hi_epsilon_vanishes(spark):
    # at |hi| ~ 1e12 a 1e-9 epsilon is below float64 ULP; the fix must not
    # depend on it. hi exactly on a bucket edge stays exclusive.
    base = 1.0e12
    points = spark.createDataFrame(
        [(1, base), (2, base - 1.0)], "id: int, v: double"
    )
    ranges = spark.createDataFrame(
        [(base - 50.0, base, "a")], "lo: double, hi: double, tag: string"
    )
    out = bucketed_range_join(points, ranges, "v", "lo", "hi", bucket_width=50.0)
    assert {r["id"] for r in out.collect()} == {2}
