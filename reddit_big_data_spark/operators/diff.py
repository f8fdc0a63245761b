"""Snapshot diff — dataset-versioning support for training-data pipelines.

A 100 TB corpus is rebuilt periodically; the operational question is
"what changed between snapshot A and snapshot B" WITHOUT shipping either
snapshot to the driver. ``snapshot_diff`` classifies every key as
added / removed / changed / unchanged via a single key-partitioned
full-outer join: both sides shuffle on the key once (sort-merge join),
no broadcast of corpus-sized data, no driver involvement. Comparisons
are null-safe, so a value flipping to/from NULL counts as 'changed'.

The reference has no versioning story (its notebooks overwrite parquet
in place, e.g. code/eda/project_eda.py write sites); this is part of the
§2-beyond LLM-pipeline extension alongside dedup and decontamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_IN_OLD = "__diff_in_old"
_IN_NEW = "__diff_in_new"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff of two snapshots sharing a key.

    Returns one row per key present in either side with columns:
    ``*keys, change_type, old_<c>, new_<c>`` for each compare column.
    ``change_type`` ∈ {'added', 'removed', 'changed', 'unchanged'}
    (added = key only in ``new``). Presence is tracked with literal
    marker columns, NOT value-null checks — a legitimately NULL compare
    value must not masquerade as a missing row.
    """
    o = old.select(
        *keys, *[F.col(c).alias(f"old_{c}") for c in compare_cols]
    ).withColumn(_IN_OLD, F.lit(True))
    n = new.select(
        *keys, *[F.col(c).alias(f"new_{c}") for c in compare_cols]
    ).withColumn(_IN_NEW, F.lit(True))

    # Join on the key-name list: Spark coalesces the key columns, and the
    # equi-join keys let the planner pick a shuffle sort-merge join —
    # both snapshots partitioned by key, streamed once.
    joined = o.join(n, on=keys, how="full_outer")

    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))

    change = (
        F.when(F.col(_IN_OLD).isNull(), F.lit("added"))
        .when(F.col(_IN_NEW).isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.withColumn("change_type", change).drop(_IN_OLD, _IN_NEW)


def scd2_history(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
    t_old: str,
    t_new: str,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from two snapshots.

    Builds on `snapshot_diff`'s classification (one key-partitioned
    full-outer join — the only shuffle):

    - unchanged  -> one OPEN row (valid_from = t_old, current)
    - changed    -> the old version CLOSED at t_new + a new OPEN row
    - removed    -> the old version CLOSED at t_new
    - added      -> a new OPEN row (valid_from = t_new)

    Returns ``*keys, *compare_cols, valid_from, valid_to, is_current``;
    valid_to is NULL on open rows. The two-rows-for-changed expansion is
    an explode of a conditionally built array — no second join, no second
    pass over either snapshot.
    """
    d = snapshot_diff(old, new, keys, compare_cols)
    old_version = F.struct(
        *[F.col(f"old_{c}").alias(c) for c in compare_cols],
        F.lit(t_old).alias("valid_from"),
        F.lit(t_new).alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    new_version = F.struct(
        *[F.col(f"new_{c}").alias(c) for c in compare_cols],
        F.lit(t_new).alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    open_old = F.struct(
        *[F.col(f"old_{c}").alias(c) for c in compare_cols],
        F.lit(t_old).alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    versions = (
        F.when(F.col("change_type") == "unchanged", F.array(open_old))
        .when(F.col("change_type") == "removed", F.array(old_version))
        .when(F.col("change_type") == "added", F.array(new_version))
        .otherwise(F.array(old_version, new_version))  # changed
    )
    return (
        d.select(*keys, F.explode(versions).alias("__v"))
        .select(*keys, "__v.*")
    )
