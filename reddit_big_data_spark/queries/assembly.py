"""Corpus-assembly operators: the packaging steps between a cleaned,
deduped document set and the files a trainer actually reads.

Two first-class LLM-pipeline operations (builder brief; neither exists
in the reference, whose pipeline ends at notebook analytics):

- q113 DETERMINISTIC OUTPUT SHARDING: every document is routed to a
  shard by a content-independent hash of its id, and the query emits the
  shard MANIFEST (docs/tokens/chars per shard) a writer job would emit
  next to the files. Hash routing (not round-robin) is what makes the
  layout reproducible across reruns and engines, appendable (new docs
  never reshuffle old ones), and balanced in expectation at any corpus
  size. The manifest doubles as the skew check: at 100 TB, a hot shard
  in this report is found BEFORE a 1000-executor write, not after.

- q114 TEMPERATURE-SCALED MIXTURE WEIGHTS: the sampling weights trainers
  use to rebalance domains (Pile/XLM-R style): weight_lang ∝
  tokens_lang^alpha with alpha in (0, 1) flattening the natural
  distribution toward uniform. Emits per-language weights, the token
  share of a fixed epoch budget, and the upsample ratio (target/actual —
  >1 means the language repeats within an epoch).

Scale shape: both are one narrow projection + one map-side-combined
groupBy; q114's second level aggregates |languages| rows (driver-sized).
Float discipline for q114 follows q101: per-language pow() rounds to 9dp
first, the cross-language normalizer folds the 9dp values in LANGUAGE
ORDER in both engines (sort_array fold vs list_sum(list ORDER BY)), and
outputs round far above last-ulp libm differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_big_data_spark.registry import register
from reddit_big_data_spark.sources.io import read_table

_N_SHARDS = 16
_ALPHA = 0.7
_EPOCH_TOKENS = 100_000


# --------------------------------------------------------------------------
# q113 — hash-sharded output layout manifest.
# --------------------------------------------------------------------------
@register(
    "q113_shard_manifest",
    oracle=f"""
    WITH assigned AS (
      SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % {_N_SHARDS} AS shard,
             len(string_split(text, ' ')) AS n_tok,
             length(text) AS n_chars
      FROM documents
    )
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars
    FROM assigned
    GROUP BY shard ORDER BY shard
    """,
    doc="deterministic hash-routed shard manifest (docs/tokens/chars per shard)",
)
def q113_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _N_SHARDS
    )
    return (
        docs.select(
            shard.alias("shard"),
            F.size(F.split("text", " ")).alias("n_tok"),
            F.length("text").alias("n_chars"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
        .orderBy("shard")
    )


# --------------------------------------------------------------------------
# q114 — temperature-scaled language mixture weights.
# --------------------------------------------------------------------------
@register(
    "q114_mixture_weights",
    oracle=f"""
    WITH per_lang AS (
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    scaled AS (
      SELECT *, ROUND(POW(n_tokens, {_ALPHA}), 9) AS pa FROM per_lang
    ),
    tot AS (
      SELECT list_sum(list(pa ORDER BY lang)) AS z FROM scaled
    )
    SELECT lang, n_docs, n_tokens,
           ROUND(pa / z, 6) AS weight,
           CAST(FLOOR(pa / z * {_EPOCH_TOKENS}) AS BIGINT) AS target_tokens,
           ROUND(pa / z * {_EPOCH_TOKENS} / n_tokens, 4) AS upsample_ratio
    FROM scaled CROSS JOIN tot
    ORDER BY lang
    """,
    doc="temperature-scaled (tokens^alpha) per-language sampling weights",
)
def q114_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
    )
    scaled = per_lang.withColumn(
        "pa", F.round(F.pow(F.col("n_tokens").cast("double"), F.lit(_ALPHA)), 9)
    )
    # normalizer folded in language order (|languages| rows — driver-sized
    # agg state), replicated exactly by the oracle's list(... ORDER BY
    # lang); attached via the shared constant-row broadcast-HASH join
    # (operators/attach.py) — a bare crossJoin would be a BNLJ the plan
    # lint rightly rejects
    from reddit_big_data_spark.operators.attach import attach_constant_row

    z = scaled.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("lang", "pa"))),
            F.lit(0.0),
            lambda a, s: a + s["pa"],
        ).alias("z"),
    ).select(
        # key derives non-foldably from the aggregate (always 0): a plain
        # lit(0) would constant-fold and degrade the hash join to a BNLJ
        # (see attach_constant_row's probe-side note)
        F.pmod(F.xxhash64(F.col("z")), F.lit(1)).cast("int").alias("__ck"),
        "z",
    )
    return (
        attach_constant_row(scaled, z, "lang")
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            F.round(F.col("pa") / F.col("z"), 6).alias("weight"),
            F.floor(F.col("pa") / F.col("z") * _EPOCH_TOKENS)
            .cast("long")
            .alias("target_tokens"),
            F.round(
                F.col("pa") / F.col("z") * _EPOCH_TOKENS / F.col("n_tokens"), 4
            ).alias("upsample_ratio"),
        )
        .orderBy("lang")
    )
