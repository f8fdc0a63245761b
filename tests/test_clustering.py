"""k-means operator tests: planted-cluster recovery, k > n degeneracy,
and determinism across runs."""

from __future__ import annotations

from reddit_big_data_spark.operators.clustering import kmeans_assign


def _planted(spark, per_cluster=20):
    """3 well-separated clusters in 4-d (centers 0, 10, 20 per dim), ids
    STRIDED so the deterministic first-k init draws one seed per planted
    cluster (first-k init from a single blob legitimately fails to split
    distant blobs — that's Lloyd's, not a bug)."""
    rows = []
    for c in range(3):
        base = 10.0 * c
        for i in range(per_cluster):
            jitter = 0.01 * (i % 7)
            rows.append((c + 3 * i, [base + jitter] * 4))
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")


def test_recovers_planted_clusters(spark):
    df = _planted(spark)
    out = kmeans_assign(df, "vec_id", "embedding", k=3, iters=4)
    rows = out.collect()
    # all members of a planted cluster share one label, distinct across
    by_plant = {}
    for r in rows:
        by_plant.setdefault(r["vec_id"] % 3, set()).add(r["cluster"])
    assert all(len(s) == 1 for s in by_plant.values())
    assert len(set.union(*by_plant.values())) == 3
    assert all(r["sq_dist"] < 1.0 for r in rows)


def test_k_exceeding_corpus_degrades_gracefully(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [5.0, 5.0])], "vec_id: long, embedding: array<double>"
    )
    out = kmeans_assign(df, "vec_id", "embedding", k=10, iters=2).collect()
    assert len(out) == 2
    assert {r["cluster"] for r in out} == {0, 1}  # each point its own centroid
    assert all(r["sq_dist"] == 0.0 for r in out)


def test_empty_cluster_dropped_not_zombie(spark):
    # ADVICE r2: duplicate init vectors -> the argmin tie sends every point
    # to the lower cid, emptying cluster 1 in round 1. The old code kept
    # cluster 1's INIT centroid, which then beat the moved cluster-0 mean
    # in the final assignment (d=0 for the duplicate points) — a cid the
    # oracle's members-only centroid CTE can never assign. Emptied
    # clusters must be dropped.
    df = spark.createDataFrame(
        [(1, [5.0]), (2, [5.0]), (3, [7.0])],
        "vec_id: long, embedding: array<double>",
    )
    out = kmeans_assign(df, "vec_id", "embedding", k=2, iters=2).collect()
    assert {r["cluster"] for r in out} == {0}


def test_surviving_clusters_keep_cid_labels(spark):
    # cluster 0 empties (duplicate inits tie to it... construct the inverse:
    # ids 1,2 duplicate => cluster 1 empties; cluster 2's far blob must
    # keep label 2, not be renumbered to 1, after the drop.
    rows = [(1, [5.0]), (2, [5.0]), (3, [100.0]), (4, [101.0]), (5, [99.0])]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    out = {r["vec_id"]: r["cluster"]
           for r in kmeans_assign(df, "vec_id", "embedding", k=3, iters=3).collect()}
    assert out[1] == 0 and out[2] == 0
    assert out[3] == out[4] == out[5] == 2


def test_deterministic_across_runs(spark):
    df = _planted(spark, per_cluster=10)
    a = sorted((r["vec_id"], r["cluster"]) for r in
               kmeans_assign(df, "vec_id", "embedding", k=3, iters=3).collect())
    b = sorted((r["vec_id"], r["cluster"]) for r in
               kmeans_assign(df, "vec_id", "embedding", k=3, iters=3).collect())
    assert a == b


def test_empty_corpus_fails_loud(spark):
    import pytest

    from reddit_big_data_spark.operators.clustering import kmeans_centers

    df = spark.createDataFrame(
        [], "vec_id: long, embedding: array<double>"
    )
    with pytest.raises(ValueError, match="non-empty corpus"):
        kmeans_centers(df, "vec_id", "embedding", k=2, iters=2)
