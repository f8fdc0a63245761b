"""Higher-order temporal operators the DataFrame API lacks as built-ins:
sessionization (gaps-and-islands) and as-of joins. Both are implemented
as compositions of partitioned windows — no UDFs, no state stores — so
they parallelize by key and survive 100x data.

The reference is purely batch with no temporal joins; these are the
capability extensions the builder brief names ("as-of join, range join,
hypertable rollup").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Assign session ids: a session breaks when the gap to the previous
    event (same user) exceeds `gap`. Classic gaps-and-islands:
    lag -> boundary flag -> running sum, both windows partitioned by user
    (parallel across users; no global sort).

    Returns df + session_id (long, 1-based per user).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_expr = F.expr(f"INTERVAL {gap}")
    prev = F.lag(ts_col).over(w)
    is_new = F.when(
        prev.isNull() | (F.col(ts_col) > prev + gap_expr), 1
    ).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_id", F.sum(is_new).over(run))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row picks the right row with the greatest
    right_ts <= left_ts (direction='backward'; 'forward' = smallest
    right_ts >= left_ts), per `on` key.

    Implementation: UNION the two inputs tagged by side, then a
    last(..., ignorenulls) window ordered by timestamp carries the most
    recent right-side values onto each left row — one shuffle on the key,
    no range-join explosion, no per-key driver loops. DuckDB's native
    ASOF JOIN serves as the oracle.
    """
    lt, rt = F.col(left_ts), F.col(right_ts)
    tagged_left = left.select(
        F.col(on).alias("__k"),
        lt.alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    tagged_right = right.select(
        F.col(on).alias("__k"),
        rt.alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(tagged_left.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    if direction == "backward":
        # right rows sort BEFORE a left row at the same ts (ties match)
        w = Window.partitionBy("__k").orderBy(
            F.col("__ts").asc(), F.col("__is_left").asc()
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    elif direction == "forward":
        w = Window.partitionBy("__k").orderBy(
            F.col("__ts").desc(), F.col("__is_left").asc()
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    else:
        raise ValueError(f"unknown direction {direction!r}")
    carried = unioned.select(
        "__is_left",
        "__l",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__rv_{c}")
            for c in right_cols
        ],
    ).filter(F.col("__is_left") == 1)
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__rv_{c}").alias(c) for c in right_cols]
    return carried.select(*out_cols)
