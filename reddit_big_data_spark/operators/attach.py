"""J3/U3/U5 rewrites: the reference's unsafe or Python-bound column-
attachment patterns, re-expressed as single-pass native transforms.

- J3 (zip-join): the reference attaches derived columns by zipping two
  DataFrames on monotonically_increasing_id
  (code/nlp/Sentiment_Analysis.py:112-115; code/ml/
  Cleaning&Prepping_Data_ML.py:72-75). That id is PARTITION-DEPENDENT —
  the join only aligns when both frames inherited identical partitioning,
  a documented Spark footgun. The rewrite: derive the columns on the SAME
  DataFrame with withColumns — zero joins, zero ids, identical rows.
- U3 (label-mapper UDFs): map_targets-style Python UDFs
  (code/ml/ML_Modeling.py:287-294,380-387) become a when/otherwise chain.
- U5 (driver-side pandas apply, code/eda/project_eda.py:746-747): the
  same attach_derived call, executed before any collect.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def attach_derived(df: DataFrame, derived: Mapping[str, Column]) -> DataFrame:
    """J3 done right: attach derived columns in one pass on one plan.

    Equivalent to the reference's build-second-frame-then-zip-join, minus
    the join, the shuffle, and the id-alignment hazard.
    """
    return df.withColumns(dict(derived))


def map_labels(
    col: Column | str,
    mapping: Mapping[object, object],
    default: object = None,
) -> Column:
    """U3 done right: a dict -> when/otherwise chain (native, codegen'd),
    replacing row-at-a-time Python label-mapper UDFs."""
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for k, v in mapping.items():
        expr = F.when(c == k, v) if expr is None else expr.when(c == k, v)
    if expr is None:
        return F.lit(default)
    return expr.otherwise(default)


def with_constant_key(frame: DataFrame, key_name: str = "__k") -> DataFrame:
    """Prefix a one-row frame with the int-0 key `attach_constant_row`
    expects, derived NON-FOLDABLY from the frame's first column — a
    plain lit(0) constant-folds and degrades the attach to a
    BroadcastNestedLoopJoin (the q161 lesson, r10). Shared by every
    scalar-assembly site so the foldability rule lives in one place."""
    first = frame.columns[0]
    return frame.select(
        F.pmod(F.xxhash64(F.col(first)), F.lit(1)).cast("int").alias(key_name),
        "*",
    )


def attach_constant_row(df: DataFrame, frame: DataFrame, key_col: str) -> DataFrame:
    """Attach a ONE-ROW constants frame (LSH planes, centroids, PQ
    codebooks) to every row of `df` via a constant-key BROADCAST HASH
    join. `frame`'s FIRST column must be its int key (value 0).

    Why not crossJoin: a BroadcastNestedLoopJoin node is
    indistinguishable from an accidental all-pairs join in the plan lint,
    and the strict no-BNLJ assertions guard the candidate generators.
    Why hash a real column for the probe key: a `lit(0) == lit(0)`
    condition constant-folds to `true` and Catalyst degrades the join
    right back to a nested loop; `pmod(xxhash64(col), 1)` is always 0
    but not foldable. One definition serves every constants-as-data site
    (similarity planes, clustering centroids, PQ codebooks)."""
    key_field = frame.columns[0]
    probe = F.pmod(F.xxhash64(F.col(key_col)), F.lit(1)).cast("int")
    return df.withColumn(key_field, probe).join(F.broadcast(frame), key_field)
