"""q65 — the grouped-map applyInPandas per-group OLS fit, split from
queries/mlq.py so its registration sits inside the driver's 50-query
window without dragging the (round-3-green) q60-q63 repeats along.
See queries/__init__.py for the rotation policy."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_big_data_spark.registry import register
from reddit_big_data_spark.sources.io import read_table


# --------------------------------------------------------------------------
# q65 — grouped-map applyInPandas: per-event-type OLS trend (value ~ days
# since epoch origin) fitted inside an Arrow-batched grouped map — the
# "custom per-group model fit" escape hatch the built-in aggregates can't
# express (here it CAN be, which is what makes it oracle-checkable: the
# DuckDB twin computes the identical closed form). x is shifted by a FIXED
# literal origin and day-scaled in both engines, so conditioning is
# controlled and no engine-dependent mean-centering noise enters; slope =
# (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), intercept = (Sy - slope*Sx)/n.
# Scale: one group per executor task, state bounded by the largest group
# (sub-partition by time shard at 100 TB).
# --------------------------------------------------------------------------
_OLS_X0 = 1704067200.0  # 2024-01-01 UTC, the testdata origin


@register(
    "q65_grouped_ols",
    oracle=f"""
    WITH s AS (
      SELECT event_type,
             (epoch(ts) - {_OLS_X0}) / 86400.0 AS x,
             value AS y
      FROM events
    ),
    agg AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM s GROUP BY 1
    )
    SELECT event_type, n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope_per_day,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
             AS intercept
    FROM agg
    ORDER BY event_type
    """,
    doc="per-group OLS fit via grouped-map applyInPandas (oracle = closed form)",
)
def q65_grouped_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        # ts is TIMESTAMP_NTZ (parquet isAdjustedToUTC=false); Spark refuses a
        # direct NTZ->double cast, so hop through LTZ first — value-preserving
        # because the session timezone is pinned to UTC, and it keeps the
        # sub-second precision DuckDB's epoch() also returns.
        (
            (F.col("ts").cast("timestamp_ltz").cast("double") - _OLS_X0) / 86400.0
        ).alias("x"),
        F.col("value").alias("y"),
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x, y = pdf["x"].to_numpy(), pdf["y"].to_numpy()
        n = float(len(x))
        sx, sy, sxy, sxx = x.sum(), y.sum(), (x * y).sum(), (x * x).sum()
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [int(n)],
                # no rounding here: python round() is half-even while the
                # oracle's ROUND is half-away — F.round below matches it
                "slope_per_day": [slope],
                "intercept": [(sy - slope * sx) / n],
            }
        )

    return (
        ev.groupBy("event_type")
        .applyInPandas(
            fit,
            "event_type string, n bigint, slope_per_day double, intercept double",
        )
        .select(
            "event_type",
            "n",
            F.round("slope_per_day", 6).alias("slope_per_day"),
            F.round("intercept", 6).alias("intercept"),
        )
        .orderBy("event_type")
    )
