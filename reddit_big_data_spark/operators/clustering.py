"""Distributed k-means (Lloyd's algorithm) over an embedding column.

The shape Spark MLlib's KMeans itself uses: centroids live on the DRIVER
(k x dim doubles — a few KB at any corpus scale) and are shipped into the
assignment pass each round as a broadcast one-row frame; the per-round work on
the cluster is one narrow pass (argmin over k fold-distances, native HOFs,
no UDF) plus one posexplode + groupBy(cid, dim) average whose result — at
most k*dim rows — is collected back. Nothing data-sized ever reaches the
driver, and the heavy stage is whole-stage-codegen arithmetic.

Determinism (for the oracle twin): init = the vectors of the k smallest
ids (cid = rank by id), fixed iteration count, ties in the argmin broken
toward the lowest cid (array_position returns the FIRST minimum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reddit_big_data_spark.sources.io import local_df


def _assign(
    df: DataFrame,
    vec_col: str,
    centers: list[list[float]],
    cids: list[int] | None = None,
    key_col: str | None = None,
) -> DataFrame:
    """Add `cluster` (int, argmin of squared L2) and `sq_dist` columns.
    `cids` maps center positions back to stable cluster ids (centers of
    emptied clusters are dropped between rounds, so position != id)."""
    if cids is None:
        cids = list(range(len(centers)))
    # Centroids travel as a broadcast ONE-ROW frame, not an F.lit tree: at
    # k=16 x dim=64 the literal encoding put 1024 Literal nodes in the
    # plan, re-walked by Catalyst for every analysis pass of every Lloyd
    # round (same blowup the LSH planes hit; see similarity._planes_frame).
    from reddit_big_data_spark.operators.attach import attach_constant_row

    spark = df.sparkSession
    cframe = local_df(
        spark,
        [(0, [[float(x) for x in c] for c in centers], [int(c) for c in cids])],
        "__ck: int, __cents: array<array<double>>, __cids: array<int>",
    )
    vec = F.col(vec_col).cast("array<double>")
    dists = F.transform(
        F.col("__cents"),
        lambda c: F.aggregate(
            F.zip_with(vec, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ),
    )
    # Bind the distance array ONCE via the one-element-transform trick —
    # referencing a projected alias three times would let CollapseProject
    # re-inline the k-fold computation into every consumer.
    # array_position returns the FIRST minimum (1-based); cids ascend, so
    # ties break toward the lowest cid — same as the oracle's ORDER BY d, cid.
    packed = F.element_at(
        F.transform(
            F.array(dists),
            lambda d: F.struct(
                F.element_at(
                    F.col("__cids"),
                    F.array_position(d, F.array_min(d)).cast("int"),
                ).alias("cluster"),
                F.array_min(d).alias("sq_dist"),
            ),
        ),
        1,
    )
    return (
        attach_constant_row(df, cframe, key_col or df.columns[0])
        .withColumn("__packed", packed)
        .select(
            *df.columns,
            F.col("__packed.cluster").alias("cluster"),
            F.col("__packed.sq_dist").alias("sq_dist"),
        )
    )


def kmeans_centers(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    iters: int = 2,
) -> list[tuple[int, list[float]]]:
    """The Lloyd's iteration itself: seed with the vectors of the k
    smallest ids, run `iters - 1` centroid updates, return the final
    [(cid, center)] list (driver-sized: k x dim doubles).

    A cluster that empties in an update round is DROPPED (its centroid
    does not survive as a zombie that could win later argmins); surviving
    clusters keep their original ids. This matches the q45 oracle, whose
    per-round centroid CTE only contains cids with members (ADVICE r2) —
    e.g. duplicate init vectors tie-break every point to the lower cid,
    emptying the higher one immediately."""
    # Every Lloyd round re-reads the corpus (assign + centroid update),
    # plus the dim probe and seed collect below — cache it once for the
    # DURATION OF THE LOOP only (ADVICE r4: don't lean on callers'
    # clearCache to mop up). Callers (kmeans_assign, ivf_topk) do run one
    # more assignment pass over the same input AFTER this returns; that
    # pass deliberately re-reads the source — a cheap columnar scan, and
    # the lazy consumer could otherwise never safely unpersist. At scale
    # you would not cache a corpus for a single final pass anyway.
    df = df.persist()
    try:
        init = (
            df.orderBy(id_col)
            .limit(k)
            .select(F.col(vec_col).cast("array<double>").alias("e"))
            .collect()
        )
        # dim comes from the seed rows themselves (r16): the old separate
        # `select(size(vec)).first()` probe cost one extra job per
        # k-means build — one of 3-4 sequential driver barriers that
        # dominated the clustering queries' construction wall. Same
        # loud contract: empty corpus / NULL seed vectors raise a named
        # error instead of an opaque TypeError downstream.
        dims = [len(r["e"]) for r in init if r["e"] is not None]
        if len(dims) != len(init):
            # ADVICE r16: a PARTIALLY-NULL seed set used to slip past the
            # all-NULL check and die one line later with an opaque
            # TypeError at list(r["e"]).
            raise ValueError(
                "k-means needs a non-empty corpus with non-NULL vectors "
                f"({len(init) - len(dims)} of {len(init)} seed vectors "
                "are NULL)"
            )
        if not dims:
            raise ValueError(
                "k-means needs a non-empty corpus with non-NULL vectors"
            )
        dim = dims[0]
        centers = [list(r["e"]) for r in init]
        cids = list(range(len(centers)))  # < k rows: every point its own centroid
        for _ in range(iters - 1):
            assigned = _assign(df, vec_col, centers, cids, key_col=id_col)
            flat = assigned.select(
                "cluster", F.posexplode(F.col(vec_col).cast("array<double>"))
            )
            rows = (
                flat.groupBy("cluster", "pos")
                .agg(F.avg("col").alias("c"))
                .collect()
            )
            by_cid: dict[int, list[float]] = {}
            for r in rows:
                by_cid.setdefault(r["cluster"], [0.0] * dim)[r["pos"]] = r["c"]
            # emptied clusters vanish; survivors keep their cid labels
            cids = sorted(by_cid)
            centers = [by_cid[c] for c in cids]
        return list(zip(cids, centers))
    finally:
        df.unpersist()


def kmeans_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    iters: int = 2,
) -> DataFrame:
    """Run `iters` assignment passes (so iters - 1 centroid updates in
    between); return df + (cluster, sq_dist) under the final centroids.
    See kmeans_centers for the empty-cluster contract."""
    pairs = kmeans_centers(df, id_col, vec_col, k, iters)
    return _assign(
        df, vec_col, [c for _, c in pairs], [cid for cid, _ in pairs], key_col=id_col
    )


# --------------------------------------------------------------------------
# Shared FAISS-style sample training (one definition for the PQ codebook
# and IVF coarse-quantizer builds — pq.train_pq_codebooks and
# similarity.make_centroids — so the determinism contract cannot drift
# between the two call sites).
# --------------------------------------------------------------------------
def sample_train_matrix(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    train_rows: int = 4096,
    seed: int = 41,
):
    """Hash-deterministic <= `train_rows` training sample as an id-sorted
    float64 numpy matrix: the rows with the smallest (xxhash64(id, seed),
    id) keys — one takeOrdered collect, never a corpus scan to the driver.
    Raises ValueError (instead of an opaque numpy IndexError downstream)
    when the sample is empty: an empty corpus, or every vector dropped
    upstream (e.g. all-zero embeddings removed by pq._normalized)."""
    import numpy as np

    rows = (
        df.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
        .orderBy(F.xxhash64(F.col("__id"), F.lit(seed)), F.col("__id"))
        .limit(int(train_rows))
        .collect()
    )
    if not rows:
        raise ValueError(
            "no training vectors: corpus is empty or every vector was "
            "dropped upstream (e.g. all-zero embeddings)"
        )
    rows.sort(key=lambda r: r["__id"])
    return np.asarray([r["__v"] for r in rows], dtype=np.float64)


def lloyd_rounds(x, centers, iters: int):
    """Driver-side numpy Lloyd's under the shared determinism contract:
    argmin ties break to the lowest code (numpy returns the first
    minimum), an emptied cluster keeps its previous centroid (it can win
    again later; dropping it would shrink the code alphabet mid-train),
    and numpy reductions are order-stable. `x` is (n, d); `centers` is
    the (k, d) seed matrix, returned updated after `iters` rounds."""
    centers = centers.copy()
    for _ in range(max(0, int(iters))):
        d2 = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        code = d2.argmin(axis=1)
        for c in range(len(centers)):
            mask = code == c
            if mask.any():
                centers[c] = x[mask].mean(axis=0)
    return centers
