"""Distributed global ranking — no single-partition window.

``Window.orderBy(...)`` with no ``partitionBy`` funnels the whole table
through ONE task: fine at sf0.01, fatal at 100 TB. The scale-safe pattern
(classic two-phase distributed ranking):

1. ``repartitionByRange`` on the order columns — partitions hold disjoint,
   ascending key ranges (partition ids ascend with the ranges).
2. rank locally inside each partition (``row_number`` over a
   ``partitionBy(partition_id)`` window — fully parallel).
3. collect ONE tiny row per partition (its row count), prefix-sum on the
   driver, broadcast the offsets back.
4. global_rank = partition_offset + local_rank.

NTILE is then pure arithmetic on (rank, N): with N rows and n buckets,
the first ``N % n`` buckets get ``N // n + 1`` rows, the rest ``N // n``
(SQL-standard NTILE semantics, matching Spark's and DuckDB's builtin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from reddit_big_data_spark.sources.io import local_df

_PID = "__rank_pid"
_LOCAL_RN = "__rank_local_rn"


def with_global_rank(
    df: DataFrame,
    order_cols: list[str | Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 1-based dense global ``row_number`` ordered by ``order_cols``
    without a single-partition sort.

    The order must be total (include a unique tie-break column) for the
    rank to be deterministic. Only per-partition counts are collected to
    the driver — one row per shuffle partition, never data rows.
    """
    out, _total = _global_rank_with_total(df, order_cols, rank_col, num_partitions)
    return out


def range_partitioned(
    df: DataFrame,
    order_cols: list[str | Column],
    num_partitions: int | None = None,
) -> DataFrame:
    """Phase-1 of the two-phase global rank: range-repartition on the
    order columns and stamp each row's partition id. Shared with the
    scaling harness (scaling.py measures THIS stage's balance) so the
    measurement cannot drift from the production path."""
    n_part = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartitionByRange(n_part, *order_cols).withColumn(
        _PID, F.spark_partition_id()
    )


def partition_sizes(ranged: DataFrame, pid_col: str = _PID) -> dict[int, int]:
    """Per-partition row counts of a ``range_partitioned`` frame — ONE
    tiny row per partition to the driver, never data rows. Production
    uses it for the offset prefix-sum; the scaling harness for the
    balance (max/ideal) curve."""
    return {
        r[pid_col]: r["cnt"]
        for r in ranged.groupBy(pid_col).agg(F.count("*").alias("cnt")).collect()
    }


def _global_rank_with_total(
    df: DataFrame,
    order_cols: list[str | Column],
    rank_col: str,
    num_partitions: int | None,
) -> tuple[DataFrame, int]:
    """``with_global_rank`` plus the total row count — already known from
    the per-partition size pass, so callers that need N (NTILE) must not
    pay a second execution of the ranked plan for ``.count()``."""
    # Re-computing `ranged` later must reproduce identical partition
    # boundaries; RangePartitioner's reservoir sampling is seeded per
    # partition, so it is deterministic for a fixed input — but persist()
    # removes even that assumption for the two passes below. (Released by
    # the caller's between-query clearCache — an internal unpersist would
    # fire before the consumer materializes.)
    ranged = range_partitioned(df, order_cols, num_partitions).persist()
    sizes = partition_sizes(ranged)
    offsets, acc = [], 0
    for pid in sorted(sizes):
        offsets.append((pid, acc))
        acc += sizes[pid]

    w = Window.partitionBy(_PID).orderBy(*order_cols)
    local = ranged.withColumn(_LOCAL_RN, F.row_number().over(w))
    if len(offsets) <= 64:
        # Few partitions: fold the offsets into a shallow when-chain —
        # constant-folded into the existing codegen stage, no extra
        # exchange/join nodes to compile or execute.
        offset_expr: Column = F.lit(0)
        for pid, off in offsets:
            offset_expr = F.when(F.col(_PID) == pid, F.lit(off)).otherwise(offset_expr)
        out = local.withColumn(
            rank_col, (offset_expr + F.col(_LOCAL_RN)).cast("long")
        ).drop(_PID, _LOCAL_RN)
        return out, acc
    # Many partitions: a when-chain this deep is a Catalyst
    # expression-tree hazard (deep recursion in every transform pass);
    # a 1-row-per-partition broadcast hash join is flat (VERDICT r2).
    offset_df = local_df(
        df.sparkSession, offsets, f"{_PID} int, __rank_offset long"
    )
    out = (
        local.join(F.broadcast(offset_df), _PID)
        .withColumn(rank_col, (F.col("__rank_offset") + F.col(_LOCAL_RN)).cast("long"))
        .drop(_PID, _LOCAL_RN, "__rank_offset")
    )
    return out, acc


def ntile_from_rank(rank: Column, total_rows: int, n: int) -> Column:
    """SQL-standard NTILE(n) computed from a 1-based global rank.

    First ``m = N % n`` buckets have ``q+1 = N//n + 1`` rows each.
    """
    q, m = divmod(total_rows, n)
    big = F.lit(q + 1)
    cutoff = F.lit(m * (q + 1))
    in_big = F.ceil(rank / big)
    in_small = F.lit(m) + F.ceil((rank - cutoff) / F.lit(max(q, 1)))
    return F.when(rank <= cutoff, in_big).otherwise(in_small).cast("int")


def with_global_ntile(
    df: DataFrame,
    order_cols: list[str | Column],
    n: int,
    ntile_col: str = "ntile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Scale-safe NTILE(n) over a total order — the library default in
    place of ``ntile(n).over(Window.orderBy(...))`` (which Spark executes
    as a single-partition sort)."""
    ranked, total = _global_rank_with_total(
        df, order_cols, rank_col="__global_rank", num_partitions=num_partitions
    )
    return ranked.withColumn(
        ntile_col, ntile_from_rank(F.col("__global_rank"), total, n)
    ).drop("__global_rank")
