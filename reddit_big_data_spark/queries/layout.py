"""Data-layout operators: Z-order clustering keys and Bloom-filter
semi-join pruning — the two levers that decide how much of a 100 TB scan
a query actually reads.

The reference inherits Databricks' OPTIMIZE ZORDER and runtime-filter
behavior implicitly; here both are first-class, engine-owned operators:

- q83 computes a Morton (bit-interleaved) Z-value over two quantized
  dimensions entirely with native bit arithmetic. Writing a table sorted
  by this key gives multi-dimensional data skipping: every file's
  min/max footer range covers a small rectangle of (x, y) space, so a
  predicate on EITHER dimension prunes files. The query reports per-
  Z-bucket bounding boxes — exactly the footer stats a writer would get.
- q84 builds a Bloom filter over a filtered dimension's keys as a
  two-level distributed aggregate (bit positions -> packed 64-bit words
  -> one map row), broadcasts the KB-sized bitmap to the fact scan, and
  prunes before the exact join. At 100 TB this is the semi-join
  runtime-filter pattern: the bitmap costs kilobytes where a broadcast
  of the dim would cost gigabytes, and only surviving fact rows enter
  the shuffle. False positives are removed by the exact join, so the
  result — and the oracle, written as the plain join — is exact.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_big_data_spark.operators.exact import exact_sum
from reddit_big_data_spark.registry import register
from reddit_big_data_spark.sources.io import read_table

_ZBITS = 4  # 4 bits per dimension -> 8-bit Z-value, 16 buckets of 16


def _quantize(col: Column, lo: float, hi: float, bits: int = _ZBITS) -> Column:
    """Fixed-range quantizer to [0, 2^bits): floor((v-lo)/(hi-lo) * 2^bits),
    clamped. Identical IEEE double math in both engines."""
    cells = 1 << bits
    q = F.floor((col - F.lit(lo)) / F.lit(hi - lo) * F.lit(cells))
    return F.least(F.lit(cells - 1), F.greatest(F.lit(0), q)).cast("int")


def _interleave(x: Column, y: Column, bits: int = _ZBITS) -> Column:
    """Morton code: bit i of x -> bit 2i, bit i of y -> bit 2i+1."""
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(1), 2 * i))
        parts.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(1), 2 * i + 1))
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def _quantize_sql(col: str, lo: float, hi: float, bits: int = _ZBITS) -> str:
    cells = 1 << bits
    return (
        f"CAST(LEAST({cells - 1}, GREATEST(0, "
        f"FLOOR(({col} - {lo}) / {hi - lo} * {cells}))) AS INTEGER)"
    )


def _interleave_sql(x: str, y: str, bits: int = _ZBITS) -> str:
    parts = []
    for i in range(bits):
        parts.append(f"((({x} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(parts)


# --------------------------------------------------------------------------
# q83 — Z-order layout audit: bucket lineitem by the Morton code of
# (quantity, price) and report each bucket's bounding box. Tight,
# non-overlapping boxes are what make Z-sorted files skippable in BOTH
# dimensions; a linear sort would give tight boxes in one dimension and
# full-range boxes in the other.
# --------------------------------------------------------------------------
_QTY_LO, _QTY_HI = 1.0, 51.0
_PRICE_LO, _PRICE_HI = 900.0, 105000.0


@register(
    "q83_zorder_layout",
    oracle=f"""
    WITH q AS (
      SELECT {_quantize_sql('l_quantity', _QTY_LO, _QTY_HI)} AS qx,
             {_quantize_sql('l_extendedprice', _PRICE_LO, _PRICE_HI)} AS qy,
             l_quantity, l_extendedprice
      FROM lineitem
    ),
    z AS (
      SELECT ({_interleave_sql('qx', 'qy')}) // 16 AS z_bucket,
             l_quantity, l_extendedprice
      FROM q
    )
    SELECT z_bucket, COUNT(*) AS n,
           MIN(l_quantity) AS qty_min, MAX(l_quantity) AS qty_max,
           ROUND(MIN(l_extendedprice), 2) AS price_min,
           ROUND(MAX(l_extendedprice), 2) AS price_max
    FROM z GROUP BY z_bucket ORDER BY z_bucket
    """,
    doc="Morton/Z-order clustering key + per-bucket bounding-box audit",
)
def q83_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_extendedprice"
    )
    qx = _quantize(F.col("l_quantity"), _QTY_LO, _QTY_HI)
    qy = _quantize(F.col("l_extendedprice"), _PRICE_LO, _PRICE_HI)
    z = li.select(
        (_interleave(qx, qy) / 16).cast("int").alias("z_bucket"),
        "l_quantity",
        "l_extendedprice",
    )
    return (
        z.groupBy("z_bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("l_quantity").alias("qty_min"),
            F.max("l_quantity").alias("qty_max"),
            F.round(F.min("l_extendedprice"), 2).alias("price_min"),
            F.round(F.max("l_extendedprice"), 2).alias("price_max"),
        )
        .orderBy("z_bucket")
    )


# --------------------------------------------------------------------------
# q84 — Bloom-filter semi-join: revenue from "premium" suppliers. The
# Spark plan builds the bitmap distributed (positions -> words -> one map
# row), broadcasts it, prunes the lineitem scan, THEN does the exact join
# — so the oracle is simply the plain join, and a pytest asserts the
# bitmap really prunes non-premium keys.
# --------------------------------------------------------------------------
_BLOOM_M = 8192  # bits
_BLOOM_K = 3  # hash functions
# Threshold chosen to select a real subset at EVERY test scale (sf0.001's
# 10 suppliers top out near 6000 — an 8000 cut selected nobody there and
# made the smoke/property tests vacuous).
_PREMIUM_BAL = 4000.0


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """One-row DataFrame holding the packed bitmap: map<word_idx, word>.

    Two-level aggregate: explode k positions per key, pack bit -> 64-bit
    word per word index, collect the (sparse) words into a map. Bitmap
    size is m/8 bytes regardless of key count — the whole point vs
    broadcasting the keys."""
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(_BLOOM_M))
                    for i in range(_BLOOM_K)
                ]
            )
        ).alias("pos")
    )
    # SQL form: the DataFrame shiftleft() only takes a literal bit count.
    words = pos.groupBy((F.col("pos") / 64).cast("int").alias("w")).agg(
        F.bit_or(F.expr("shiftleft(1L, CAST(pos % 64 AS INT))")).alias("mask")
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "mask"))).alias("bloom")
    )


def bloom_might_contain(key_sql: str, bloom_col: str = "bloom") -> Column:
    """True iff all k bit positions for the key expression are set (false
    positives possible, false negatives impossible). Built as a SQL
    expression because the Python shiftright() only accepts a literal bit
    count; the SQL function takes full expressions."""
    conds = []
    for i in range(_BLOOM_K):
        # NB: the seed literal must be INT to match bloom_build's F.lit(i)
        # — xxhash64 folds operand TYPES into the hash, so an INT seed on
        # one side and a BIGINT on the other would never agree.
        p = f"pmod(xxhash64({key_sql}, {i}), {_BLOOM_M})"
        word = f"element_at({bloom_col}, CAST({p} / 64 AS INT))"
        conds.append(
            f"coalesce((shiftright({word}, CAST({p} % 64 AS INT)) & 1) = 1, false)"
        )
    return F.expr(" AND ".join(conds))


@register(
    "q84_bloom_semi_join",
    oracle=f"""
    SELECT s_nationkey, COUNT(*) AS n_items,
           -- exact-unit revenue (operators/exact.py): 4dp product, no
           -- 2dp ROUND tie
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                    AS BIGINT)) / 10000.0 AS revenue
    FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
    WHERE s_acctbal > {_PREMIUM_BAL}
    GROUP BY s_nationkey ORDER BY s_nationkey
    """,
    doc="Bloom-filter runtime prune + exact join (semi-join pushdown pattern)",
)
def q84_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = (
        read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > _PREMIUM_BAL)
        .select("s_suppkey", "s_nationkey")
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    bloom = bloom_build(supp, "s_suppkey")
    pruned = li.crossJoin(F.broadcast(bloom)).filter(
        bloom_might_contain("l_suppkey")
    )
    # Exact join AFTER the prune; deliberately a shuffle join (no broadcast
    # hint) — the bloom is what keeps the shuffle small, which is the
    # at-scale contract when the dim side is too big to broadcast.
    return (
        pruned.join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_items"),
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("revenue"),
        )
        .orderBy("s_nationkey")
    )
