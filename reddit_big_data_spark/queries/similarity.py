"""Similarity-search queries over `embeddings` (vec_id, embedding
array<float>, label): exact brute-force cosine top-k with a full DuckDB
oracle, the LSH approximate variant (rows-only: bucket membership is not
SQL-portable), and a label-centroid similarity matrix.

Oracle alignment: both engines cast float->double per element BEFORE
multiplying and fold sums sequentially, so cosine values match to the
last bit; outputs round to 6dp and order by the rounded value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_big_data_spark.operators.similarity import (
    brute_force_topk,
    dot,
    lsh_topk,
)
from reddit_big_data_spark.registry import register
from reddit_big_data_spark.sources.io import read_table


# --------------------------------------------------------------------------
# q40 — exact ANN baseline: cosine top-5 neighbors for a 10-probe batch
# against the whole corpus. Query side broadcast; corpus scanned once.
# --------------------------------------------------------------------------
@register(
    "q40_cosine_topk",
    oracle="""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
      FROM embeddings
    ),
    q AS (SELECT * FROM v WHERE vec_id < 10),
    scored AS (
      SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
             ROUND(list_sum(list_transform(generate_series(1, len(q.e)),
                                           i -> q.e[i] * v.e[i]))
                   / (q.nrm * v.nrm), 6) AS cosine_sim
      FROM q JOIN v ON v.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cosine_sim, CAST(rn AS INTEGER) AS rn
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id) AS rn
      FROM scored
    )
    WHERE rn <= 5
    ORDER BY query_id, rn
    """,
    doc="brute-force cosine top-k, broadcast probe batch (ANN exact baseline)",
)
def q40_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(emb, queries, k=5).orderBy("query_id", "rn")


# --------------------------------------------------------------------------
# q41 — LSH-bucketed approximate top-k: the 100 TB path (bucket join prunes
# the pair space; exact cosine reranks). Rows-only: LSH membership is
# implementation-defined; tests/test_similarity_ops.py pins recall >= 0.8
# on planted clusters vs the brute-force truth.
# --------------------------------------------------------------------------
@register(
    "q41_lsh_ann",
    oracle=None,
    doc="random-hyperplane LSH ANN (approximate; recall pinned in unit tests)",
)
def q41_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return lsh_topk(emb, queries, k=5, n_planes=8, n_tables=4).orderBy(
        "query_id", "rn"
    )


# --------------------------------------------------------------------------
# q42 — embedding aggregation: per-label centroid (element-wise mean via
# aggregate over zipped arrays) and each label's centroid self-dot — the
# "cluster summary" shape (A8's correlation-matrix cousin for vectors).
# --------------------------------------------------------------------------
@register(
    "q42_label_centroids",
    oracle="""
    WITH flat AS (
      SELECT label, i AS dim, e[i] AS x
      FROM (SELECT label, embedding::DOUBLE[] AS e FROM embeddings),
           generate_series(1, 64) AS g(i)
    ),
    cent AS (
      SELECT label, dim, AVG(x) AS c FROM flat GROUP BY 1, 2
    )
    SELECT label,
           COUNT(*) AS dims,
           ROUND(SUM(c * c), 6) AS centroid_sq_norm,
           ROUND(AVG(c), 6) AS centroid_mean
    FROM cent
    GROUP BY label
    ORDER BY label
    """,
    doc="per-label centroid via posexplode + element-wise mean (vector agg)",
)
def q42_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "label", F.posexplode(F.col("embedding"))
    ).select(
        "label", (F.col("pos") + 1).alias("dim"), F.col("col").cast("double").alias("x")
    )
    cent = flat.groupBy("label", "dim").agg(F.avg("x").alias("c"))
    return (
        cent.groupBy("label")
        .agg(
            F.count("*").alias("dims"),
            F.round(F.sum(F.col("c") * F.col("c")), 6).alias("centroid_sq_norm"),
            F.round(F.avg("c"), 6).alias("centroid_mean"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# q43 — IVF approximate top-k: coarse-quantize the corpus into cells
# (broadcast centroids), probe only the query's nprobe nearest cells.
# Rows-only (cell routing is implementation-defined); recall vs brute
# force pinned in tests/test_similarity_ops.py.
# --------------------------------------------------------------------------
@register(
    "q43_ivf_ann",
    oracle=None,
    doc="IVF coarse-quantized ANN (nprobe cell search; recall pinned in tests)",
)
def q43_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.operators.similarity import ivf_topk

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(emb, queries, k=5, n_cells=16, nprobe=6).orderBy(
        "query_id", "rn"
    )
