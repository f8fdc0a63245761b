"""Range join: points matched into [lo, hi) interval dims without a
nested-loop join.

Spark plans a raw `point >= lo AND point < hi` join condition as
BroadcastNestedLoopJoin — every point row tested against every range at
100 TB. The scale rewrite: quantize both sides into fixed-width buckets
(each range row explodes into the buckets it overlaps; each point has
exactly one bucket), hash-equi-join on the bucket, then apply the exact
range predicate. Join cost becomes |points| x (ranges overlapping its
bucket) — data-local and shuffle-free when the range side broadcasts.

A point matches a range through exactly ONE bucket (its own), so no
dedup pass is needed even when ranges span many buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to the range rows with lo <= point < hi.

    `ranges` must be the small side (it is broadcast after bucket
    explosion); bucket_width should be on the order of typical range
    width — too small multiplies the broadcast, too large multiplies the
    per-bucket candidate count.
    """
    w = float(bucket_width)
    pb = points.withColumn("__bucket", F.floor(F.col(point_col) / w))
    lo_b = F.floor(F.col(lo_col) / w)
    # floor(hi/w) unconditionally: when hi lands exactly on a bucket edge
    # the range claims one extra bucket, whose candidates the exact
    # predicate below removes anyway. An epsilon-subtraction "exclusive"
    # trick would silently DROP matches for any hi strictly inside
    # (N*w, N*w + eps] — and the epsilon itself vanishes for
    # large-magnitude hi under float64.
    hi_b = F.floor(F.col(hi_col) / w)
    rb = ranges.withColumn(
        "__bucket", F.explode(F.sequence(lo_b.cast("long"), hi_b.cast("long")))
    )
    joined = pb.join(F.broadcast(rb), "__bucket", how).filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    )
    return joined.drop("__bucket")
