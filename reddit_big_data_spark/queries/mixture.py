"""Training-mixture construction: fill per-domain token budgets with a
deterministic document order.

The last step of a pretraining data pipeline: given cleaned, deduped
documents and a target mixture (so many tokens per language/domain),
select documents until each domain's budget is full. Selection order is
a content-independent deterministic hash (md5 of doc_id) — the same
"hash-gated, no RNG state" discipline as q47's stratified sampler, so
reruns and engines agree exactly.

Scale shape: one narrow projection, one window cumsum PARTITIONED BY
the domain (never a global window — state per partition is one running
sum), one filter, one rollup. At 100 TB this is the textbook windowed
scan: tokens-per-doc comes from the same pass, and the only shuffle is
the hash partition by domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reddit_big_data_spark.registry import register
from reddit_big_data_spark.sources.io import read_table

# Target mixture: tokens per language (en-heavy, like any web corpus cut).
_BUDGETS = {"en": 8000, "de": 3000, "es": 3000, "fr": 3000, "zh": 3000}


def _budget_case_sql() -> str:
    arms = " ".join(f"WHEN '{k}' THEN {v}" for k, v in _BUDGETS.items())
    return f"CASE lang {arms} ELSE 0 END"


# --------------------------------------------------------------------------
# q85 — token-budget mixture sampling: deterministic-hash order, windowed
# cumulative token count, keep docs while the domain budget allows.
# --------------------------------------------------------------------------
@register(
    "q85_mixture_sample",
    oracle=f"""
    WITH d AS (
      SELECT lang, doc_id,
             len(string_split(text, ' ')) AS n_tok,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    c AS (
      SELECT lang, n_tok,
             SUM(n_tok) OVER (PARTITION BY lang ORDER BY h, doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum,
             {_budget_case_sql()} AS budget
      FROM d
    )
    SELECT lang, ANY_VALUE(budget) AS budget,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS tokens
    FROM c WHERE cum <= budget
    GROUP BY lang ORDER BY lang
    """,
    doc="per-domain token-budget fill in deterministic hash order",
)
def q85_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "lang",
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tok"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    budget = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in _BUDGETS.items()],
        F.lit(0),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = docs.select(
        "lang",
        "n_tok",
        F.sum("n_tok").over(w).alias("cum"),
        budget.alias("budget"),
    )
    return (
        c.filter(F.col("cum") <= F.col("budget"))
        .groupBy("lang")
        .agg(
            F.first("budget").alias("budget"),
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("tokens"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# q91 — exact k-per-group sampling: every group contributes EXACTLY
# min(k, |group|) rows, chosen by deterministic hash rank — the
# group-balanced counterpart of q47's fraction-based stratified sampler
# (a fraction sampler under-covers small groups; evaluation sets and
# per-domain audits want fixed counts). One partitioned window, no RNG
# state, rerun- and engine-stable.
# --------------------------------------------------------------------------
@register(
    "q91_k_per_group_sample",
    oracle="""
    WITH r AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY md5(CAST(o_orderkey AS VARCHAR)),
                                         o_orderkey) AS rn
      FROM orders
    )
    SELECT o_orderpriority, COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS sample_value
    FROM r WHERE rn <= 20
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="deterministic-hash exact k-per-group sample (window rank, no RNG)",
)
def q91_k_per_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.md5(F.col("o_orderkey").cast("string")), "o_orderkey"
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sample_value"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# q99 — weighted sampling WITHOUT replacement (Efraimidis & Spirakis,
# IPL 2006 "Weighted random sampling with a reservoir"): each doc draws
# a deterministic uniform u from md5(doc_id) and scores key = ln(u)/w
# (monotone twin of u^(1/w)); the top-k keys ARE a weighted-without-
# replacement sample with inclusion proportional to w at every step.
# Weight here = document length, the "sample long docs more" curriculum
# knob. No RNG state: u is a hash, so reruns and engines agree — the
# oracle replays the identical arithmetic and the driver row checks
# VALUES, not just shape.
#
# Scale shape: one narrow projection + one TakeOrdered(k) — no shuffle
# beyond the final top-k reduction; at 100 TB this is a single scan.
# Keys round to 9dp before ranking on BOTH engines so a last-ulp ln()
# difference cannot flip a rank (ties then break by doc_id).
# --------------------------------------------------------------------------
_U48 = float(1 << 48)


@register(
    "q99_weighted_sample",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, length(text) AS n_chars,
             ROUND(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                       + 0.5) / {_U48}) / length(text), 9) AS es_key
      FROM documents
      WHERE length(text) > 0
    )
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars, es_key
    FROM scored
    ORDER BY es_key DESC, doc_id
    LIMIT 50
    """,
    doc="Efraimidis-Spirakis weighted sampling w/o replacement (hash-uniform, "
    "exact-value oracle)",
)
def q99_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    w = F.length("text")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("double")
        + 0.5
    ) / _U48
    return (
        docs.filter(w > 0)
        .select(
            "doc_id",
            "lang",
            w.cast("long").alias("n_chars"),
            F.round(F.log(u) / w, 9).alias("es_key"),
        )
        .orderBy(F.desc("es_key"), "doc_id")
        .limit(50)
    )


# --------------------------------------------------------------------------
# q106 — group-aware train/val/test split with a leakage proof: every
# SOURCE (site/domain) lands wholly in one split, so near-duplicate
# documents from the same origin can never straddle train and eval — the
# leakage failure mode a row-wise randomSplit (M13) cannot prevent.
# Assignment is a pure hash of the group key (md5, no RNG state): 10
# buckets -> 0-7 train, 8 val, 9 test. The leaked_groups column COMPUTES
# (not assumes) the guarantee: groups appearing in more than one split —
# structurally zero here, and the driver row pins it.
#
# Scale shape: one narrow scan; the split is a per-row expression (no
# shuffle to assign), one map-side-combined rollup per (split, source),
# one tiny re-aggregate. At 100 TB this is the cheapest possible split:
# no sampling pass, no global sort, rerun-stable across engines.
# --------------------------------------------------------------------------
@register(
    "q106_group_split",
    oracle="""
    WITH assigned AS (
      SELECT source, doc_id,
             len(string_split(text, ' ')) AS n_tok,
             CASE WHEN ('0x' || substr(md5(source), 1, 7))::BIGINT % 10 <= 7
                  THEN 'train'
                  WHEN ('0x' || substr(md5(source), 1, 7))::BIGINT % 10 = 8
                  THEN 'val' ELSE 'test' END AS split
      FROM documents
    ),
    per_group AS (
      SELECT source, split, COUNT(*) AS n_docs, SUM(n_tok) AS n_tok
      FROM assigned GROUP BY 1, 2
    ),
    straddlers AS (
      SELECT COUNT(*) AS leaked FROM (
        SELECT source FROM per_group GROUP BY source
        HAVING COUNT(DISTINCT split) > 1
      )
    )
    SELECT split, COUNT(*) AS n_groups,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           (SELECT leaked FROM straddlers) AS leaked_groups
    FROM per_group
    GROUP BY split ORDER BY split
    """,
    doc="hash-of-group train/val/test split with computed leakage proof",
)
def q106_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5("source"), 1, 7), 16, 10).cast("long") % 10
    )
    assigned = docs.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tok"),
        F.when(bucket <= 7, F.lit("train"))
        .when(bucket == 8, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    per_group = assigned.groupBy("source", "split").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tok")
    )
    leaked = (
        per_group.groupBy("source")
        .agg(F.countDistinct("split").alias("__ns"))
        .filter(F.col("__ns") > 1)
        .count()
    )
    return (
        per_group.groupBy("split")
        .agg(
            F.count("*").alias("n_groups"),
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .withColumn("leaked_groups", F.lit(leaked).cast("long"))
        .orderBy("split")
    )


# --------------------------------------------------------------------------
# q140 — DSIR-style importance resampling weights (Xie et al. 2023, "Data
# Selection for Language Models via Importance Resampling"): score every
# raw-pool document by how much more likely its tokens are under the
# TARGET domain's unigram distribution than under the raw pool's own —
# log w(x) = sum over token occurrences ln(p_target(t) / p_raw(t)) —
# then keep the top-weighted docs. The published method hashes n-grams
# into buckets; the testdata's vocabulary is small enough that plain
# unigrams are the same estimator without the hash collision noise.
# source='src0' plays the target domain (the q105 convention).
#
# Float discipline (q101's proven recipe, bit-equal cross-engine): each
# token's log-ratio rounds to 9dp FIRST; a document's addends then sum
# in the canonical TWO-LEVEL order both engines replicate (bucket by
# floor(lr), sorted fold within, bucket-ordered fold across); the
# output rounds to 4dp on bit-equal sums.
#
# Scale shape: ONE counting pass builds the unigram table with target /
# raw counts side by side (map-side combined, distinct-vocab-sized —
# NEVER broadcast, same as q101's bigram table); the three model
# scalars (N_target, N_raw, V) are one constant-size aggregate; scoring
# is ONE shuffle equi-join of raw-pool token occurrences against the
# unigram table; the fold is bounded per (doc, bucket). At 100 TB the
# target counts would come from a separately-trained table — nothing
# here assumes self-training (the q101 contract).
# --------------------------------------------------------------------------
@register(
    "q140_dsir_importance",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             string_split(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    occ AS (
      SELECT doc_id, source, unnest(t) AS w FROM toks
    ),
    occ_ne AS (SELECT * FROM occ WHERE w <> ''),
    counts AS (
      SELECT w,
             SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ct,
             SUM(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS cr
      FROM occ_ne GROUP BY w
    ),
    model AS (
      SELECT SUM(ct) AS nt, SUM(cr) AS nr, COUNT(*) AS v FROM counts
    ),
    scored AS (
      SELECT o.doc_id,
             ROUND(LN(((c.ct + 0.5) * (m.nr + 0.5 * m.v))
                      / ((c.cr + 0.5) * (m.nt + 0.5 * m.v))), 9) AS lr
      FROM occ_ne o JOIN counts c USING (w) CROSS JOIN model m
      WHERE o.source <> 'src0'
    ),
    bagg AS (
      SELECT doc_id, FLOOR(lr) AS b, COUNT(*) AS nb,
             list_sum(list_sort(list(lr))) AS bsum
      FROM scored GROUP BY doc_id, FLOOR(lr)
    ),
    agg AS (
      SELECT doc_id, CAST(SUM(nb) AS BIGINT) AS n_tokens,
             list_sum(list(bsum ORDER BY b)) AS total_lw
      FROM bagg GROUP BY doc_id
    )
    SELECT a.doc_id, d.source, a.n_tokens,
           ROUND(a.total_lw / a.n_tokens, 4) AS avg_log_weight
    FROM agg a JOIN documents d USING (doc_id)
    ORDER BY avg_log_weight DESC, doc_id
    LIMIT 15
    """,
    doc="DSIR-style unigram importance-resampling weights: raw-pool docs "
    "ranked by mean ln(p_target/p_raw) toward the src0 target domain",
)
def q140_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.operators.text import normalize
    from reddit_big_data_spark.sources.io import spread

    docs = spread(read_table(spark, sf_dir, "documents"))
    occ = (
        docs.select(
            "doc_id", "source", F.explode(F.split(normalize("text"), " ")).alias("w")
        )
        .filter(F.col("w") != "")
    )
    # ONE counting pass: target and raw counts side by side per token
    # (map-side combine; distinct-vocab-sized, the q101 checkpoint rule)
    counts = (
        occ.groupBy("w")
        .agg(
            F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias("ct"),
            F.sum(F.when(F.col("source") != "src0", 1).otherwise(0)).alias("cr"),
        )
        .localCheckpoint()
    )
    nt, nr, v = counts.agg(
        F.sum("ct"), F.sum("cr"), F.count("*")
    ).first()
    if nt is None or nr is None:
        # SUM over zero rows is NULL; float(None) below would surface as
        # an opaque TypeError instead of naming the actual problem
        raise ValueError(
            "DSIR weighting requires a corpus with at least one token"
        )
    # one LN per token over a single ratio — the identical expression the
    # oracle evaluates, rounded to 9dp before any summation
    lr = F.round(
        F.log(
            ((F.col("ct") + 0.5) * (float(nr) + 0.5 * float(v)))
            / ((F.col("cr") + 0.5) * (float(nt) + 0.5 * float(v)))
        ),
        9,
    )
    # source rides the scoring rows (one value per doc) so the report
    # needs NO second corpus scan to re-attach it (review r9 scan audit:
    # 2 documents scans -> 1 in the final plan)
    scored = (
        occ.filter(F.col("source") != "src0")
        .join(counts, "w")
        .select("doc_id", "source", lr.alias("lr"))
    )
    # two-level canonical sum (q101's recipe): per-(doc, floor(lr))
    # sorted folds, then bucket sums folded in bucket order
    bagg = scored.groupBy("doc_id", F.floor("lr").alias("b")).agg(
        F.first("source").alias("source"),
        F.count("*").alias("nb"),
        F.aggregate(
            F.sort_array(F.collect_list("lr")),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("bsum"),
    )
    agg = bagg.groupBy("doc_id").agg(
        F.first("source").alias("source"),
        F.sum("nb").alias("n_tokens"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("b", "bsum"))),
            F.lit(0.0),
            lambda a, s: a + s["bsum"],
        ).alias("total_lw"),
    )
    return (
        agg.select(
            "doc_id",
            "source",
            "n_tokens",
            F.round(F.col("total_lw") / F.col("n_tokens"), 4).alias(
                "avg_log_weight"
            ),
        )
        .orderBy(F.desc("avg_log_weight"), "doc_id")
        .limit(15)
    )
