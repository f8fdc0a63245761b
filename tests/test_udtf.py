"""Python UDTF surface (functions/udtfs.py): lateral fan-out, 0-based
ordinality, empty-token and NULL semantics — plus the GROUPED_AGG
pandas UDF corner of §2.11 (scalar: q68; grouped-map: q65; table
function: q74; grouped-agg: here)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from reddit_big_data_spark.functions.udtfs import register_udtfs


def _explode(spark, rows):
    register_udtfs(spark)
    spark.createDataFrame(rows, "id int, text string").createOrReplaceTempView(
        "__udtf_t"
    )
    return spark.sql(
        "SELECT t.id, s.pos, s.token FROM __udtf_t t, LATERAL pos_tokens(t.text) s"
    ).collect()


def test_pos_tokens_ordinality(spark):
    got = sorted(
        (r["id"], r["pos"], r["token"]) for r in _explode(spark, [(1, "a bb ccc")])
    )
    assert got == [(1, 0, "a"), (1, 1, "bb"), (1, 2, "ccc")]


def test_pos_tokens_consecutive_delimiters_keep_empty_tokens(spark):
    # Mirrors split(text, ' ') exactly — the oracle-matching contract.
    got = sorted((r["pos"], r["token"]) for r in _explode(spark, [(1, "a  b")]))
    assert got == [(0, "a"), (1, ""), (2, "b")]


def test_pos_tokens_null_text_yields_no_rows(spark):
    assert _explode(spark, [(1, None)]) == []


def test_pos_tokens_lateral_preserves_input_row_columns(spark):
    got = {
        (r["id"], r["pos"], r["token"])
        for r in _explode(spark, [(1, "x"), (2, "y z")])
    }
    assert got == {(1, 0, "x"), (2, 0, "y"), (2, 1, "z")}


def test_grouped_agg_pandas_udf_matches_native(spark):
    """GROUPED_AGG pandas UDF — the sanctioned custom-aggregate surface
    (SURVEY.md §2.11). Pinned against the native closed form so the demo
    stays honest: use it only for aggregates Spark genuinely lacks."""

    @pandas_udf("double")
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:
        return float((v * w).sum() / w.sum())

    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 3.0, 3.0), ("b", 10.0, 2.0), ("b", 20.0, 0.5)],
        "k string, v double, w double",
    )
    got = {
        r["k"]: r["wm"]
        for r in df.groupBy("k").agg(weighted_mean("v", "w").alias("wm")).collect()
    }
    want = {
        r["k"]: r["wm"]
        for r in df.groupBy("k")
        .agg((F.sum(F.col("v") * F.col("w")) / F.sum("w")).alias("wm"))
        .collect()
    }
    assert got.keys() == want.keys()
    for k in got:
        assert abs(got[k] - want[k]) < 1e-12
