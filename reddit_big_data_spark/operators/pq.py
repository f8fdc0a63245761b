"""Product quantization (PQ) for embedding ANN — the memory-bound scale
path FAISS-style IVF-PQ systems use (Jegou, Douze, Schmid: "Product
Quantization for Nearest Neighbor Search", TPAMI 2011).

Not in the reference (no vector data there); LLM-pipeline extension per
the builder brief, completing the ANN family: exact (brute force), LSH
(hyperplane buckets), IVF (coarse cells), int8 (scalar quantization) —
and now PQ, the 100 TB memory lever: each D-dim float vector compresses
to m small codes (m bytes at ksub<=256), and queries scan CODES with
per-subspace lookup tables (ADC — asymmetric distance computation)
instead of float arrays. 64-dim float32 -> 8 bytes is a 32x scan-size
reduction; at 100 TB of embeddings that is the difference between an
in-memory index and an I/O-bound one.

Design (all native expressions; constants travel as broadcast DATA, not
F.lit trees — see similarity._planes_frame for why):

- TRAIN: FAISS practice — codebooks are fit on a bounded,
  hash-deterministic sample (<= `train_rows` rows, pinned seed) collected
  to the driver ONCE, with Lloyd's run driver-side in numpy over all m
  subspaces. One takeOrdered collect replaces per-round distributed
  assignment/average jobs entirely: at bench scale the old path's
  wall-clock was SEQUENTIAL JOB BARRIERS (VERDICT r5), and at 100 TB a
  codebook fit never needs more than ~10^5 training rows (Jegou et al.
  §V train on learning subsets; faiss defaults cap train points per
  centroid). Deterministic: the sample is the train_rows smallest
  (xxhash64(id, seed), id) keys, subspace j seeds with the subvectors of
  the ksub smallest sampled ids, numpy argmin ties break to the lowest
  code, and numpy reductions are order-stable.
- Zero vectors: a zero embedding has no direction, so `_normalized`
  DROPS it deterministically (norm nullif-guarded -> null vector ->
  filtered) instead of letting NaN codes and NaN ADC scores propagate
  silently (ADVICE r5). Zero-vector QUERIES likewise produce no output
  rows.
- ENCODE: one narrow pass, no explode: codes[j] = argmin_c
  ||subvec_j - centers[j][c]||^2 with the codebooks attached via a
  one-row broadcast hash join.
- SEARCH (ADC): each probe precomputes its m x ksub inner-product table
  against the codebooks (probe-side work: m*ksub dots, independent of
  corpus size); the corpus scan then scores a row with m table lookups
  + adds — the probe batch is broadcast exactly like brute_force_topk,
  but each row costs m lookups instead of D multiplies. The approximate
  top `rerank` survivors re-join their float vectors and exact cosine
  re-ranks, so emitted scores are bit-identical to the sequential-fold
  oracle arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from reddit_big_data_spark.operators.attach import attach_constant_row
from reddit_big_data_spark.operators.similarity import exact_rerank, norm

from reddit_big_data_spark.sources.io import local_df


def _normalized(
    df: DataFrame, id_col: str, emb_col: str, normalize: bool = True
) -> DataFrame:
    """(id, array<double> vector), unit-norm by default. PQ for cosine
    works on the unit sphere: cosine(q, x) = <q_n, x_n>, so ADC tables
    hold plain inner products. `normalize=False` passes vectors through
    as doubles — the RESIDUAL path (ivfpq) quantizes x_n - c, which must
    NOT be re-normalized or the <q, c> + <q, r> decomposition breaks."""
    if not normalize:
        return df.select(
            F.col(id_col), F.col(emb_col).cast("array<double>").alias("__vec")
        )
    # Bind the norm ONCE per row (one-element-transform trick): referencing
    # the norm fold inside the per-element division lambda would re-inline
    # the O(d) fold into each of the d elements — O(d^2) per row on the
    # corpus-wide hot path. The nullif turns a zero norm into a null
    # vector (via the when), and the filter drops it — deterministic
    # removal instead of silent NaN propagation (module docstring).
    n = F.nullif(norm(F.col(emb_col)), F.lit(0.0))
    unit = F.element_at(
        F.transform(
            F.array(n),
            lambda nn: F.when(
                nn.isNotNull(),
                F.transform(F.col(emb_col), lambda x: x.cast("double") / nn),
            ),
        ),
        1,
    )
    return df.select(F.col(id_col), unit.alias("__vec")).filter(
        F.col("__vec").isNotNull()
    )


def _subvec(vec: Column, j: Column | int, dsub: int) -> Column:
    jj = F.lit(j) if isinstance(j, int) else j
    return F.slice(vec, jj * dsub + 1, dsub)


def train_pq_codebooks(
    df: DataFrame,
    id_col: str,
    emb_col: str,
    dims: int,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    normalize: bool = True,
    train_rows: int = 4096,
    train_seed: int = 41,
) -> list[list[list[float]]]:
    """Driver-sized codebooks: centers[j][c] is the c-th centroid of
    subspace j (m x ksub x dims/m doubles — a few KB at any corpus
    scale). Fit FAISS-style on a bounded deterministic sample (module
    docstring): ONE takeOrdered collect via
    clustering.sample_train_matrix, then clustering.lloyd_rounds
    driver-side per subspace — no per-round distributed jobs, and the
    sample/tie-break/empty-cluster contract is shared with the IVF
    coarse-quantizer build (similarity.make_centroids). Seeds: the
    subvectors of the ksub smallest sampled ids."""
    from reddit_big_data_spark.operators.clustering import (
        lloyd_rounds,
        sample_train_matrix,
    )

    if dims % m:
        raise ValueError(f"dims={dims} not divisible by m={m}")
    dsub = dims // m
    nv = _normalized(df, id_col, emb_col, normalize)
    x = sample_train_matrix(nv, id_col, "__vec", train_rows, train_seed)
    centers = [
        lloyd_rounds(
            x[:, j * dsub : (j + 1) * dsub],
            x[: min(ksub, len(x)), j * dsub : (j + 1) * dsub],
            iters - 1,
        )
        for j in range(m)
    ]
    return [[[float(v) for v in c] for c in cb] for cb in centers]


def _assign_code(sv: Column, cb: Column) -> Column:
    """argmin_c ||sv - cb[c]||^2 as a 0-based code; first minimum wins
    (deterministic tie-break to the lowest code). The distance array is
    lambda-bound once so min/position don't re-inline the fold."""
    dists = F.transform(
        cb,
        lambda c: F.aggregate(
            F.zip_with(sv, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, d: a + d,
        ),
    )
    return F.element_at(
        F.transform(
            F.array(dists),
            lambda d: F.array_position(d, F.array_min(d)).cast("int") - 1,
        ),
        1,
    )


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """(id, codes array<int>): m codes per vector — the compressed index
    a 100 TB deployment would persist instead of the float vectors."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    spark = df.sparkSession
    cframe = local_df(
        spark, [(0, codebooks)], "__ck: int, __cb: array<array<array<double>>>"
    )
    nv = _normalized(df, id_col, emb_col, normalize)
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: _assign_code(
            _subvec(F.col("__vec"), j, dsub),
            F.element_at(F.col("__cb"), j.cast("int") + 1),
        ),
    )
    return attach_constant_row(nv, cframe, id_col).select(
        F.col(id_col), codes.alias("codes")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
    dims: int = 64,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    rerank: int = 50,
) -> DataFrame:
    """Approximate cosine top-k via PQ/ADC + exact re-rank of the top
    `rerank` code-scored survivors. Returns (query_id, neighbor_id,
    cosine_sim, rn) with cosine_sim computed EXACTLY (sequential-fold
    dot on the original vectors), so only the candidate CHOICE is
    approximate — same contract as lsh_topk/ivf_topk.

    Cache contract (same as ivfpq_topk): the corpus is normalized ONCE
    and persisted — the training sample collect and the returned scan
    plan both read it (ADVICE r5: the old shape normalized the corpus
    separately for train and encode). The session clearCache (bench/
    conftest run it between queries) is the mop-up point; an in-function
    unpersist would evict state the returned DataFrame still needs."""
    nx = _normalized(corpus, id_col, emb_col).persist()
    cb = train_pq_codebooks(
        nx, id_col, "__vec", dims, m, ksub, iters, normalize=False
    )
    codes = pq_encode(nx, cb, id_col, "__vec", normalize=False)
    spark = corpus.sparkSession
    cframe = local_df(
        spark, [(0, cb)], "__ck: int, __cb: array<array<array<double>>>"
    )
    # probe-side ADC tables: tab[j][c] = <q_subvec_j, cb[j][c]>
    qn = _normalized(queries, id_col, emb_col)
    dsub = dims // m
    tab = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.transform(
            F.element_at(F.col("__cb"), j.cast("int") + 1),
            lambda c: F.aggregate(
                F.zip_with(
                    _subvec(F.col("__vec"), j, dsub), c, lambda x, y: x * y
                ),
                F.lit(0.0),
                lambda a, v: a + v,
            ),
        ),
    )
    probes = attach_constant_row(qn, cframe, id_col).select(
        F.col(id_col).alias("query_id"), tab.alias("__tab")
    )
    # corpus scan: m lookups + adds per (row, probe) — the ADC hot loop
    approx = (
        codes.join(F.broadcast(probes), F.col(id_col) != F.col("query_id"))
        .withColumn(
            "__score",
            F.aggregate(
                F.zip_with(
                    F.col("codes"),
                    F.col("__tab"),
                    lambda c, t: F.element_at(t, c + 1),
                ),
                F.lit(0.0),
                lambda a, v: a + v,
            ),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("__score").desc(), F.col(id_col)
    )
    cand = (
        approx.withColumn("__arn", F.row_number().over(wa))
        .filter(F.col("__arn") <= rerank)
        .select("query_id", F.col(id_col).alias("neighbor_id"))
    )
    return exact_rerank(cand, corpus, queries, id_col, emb_col, k)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
    dims: int = 64,
    n_cells: int = 16,
    nprobe: int = 6,
    m: int = 16,
    ksub: int = 16,
    iters: int = 2,
    cell_iters: int = 1,
    rerank: int = 100,
) -> DataFrame:
    """IVF-PQ: the canonical combined FAISS index (coarse inverted file +
    product-quantized RESIDUALS). Coarse cells come from deterministic
    Lloyd's over the unit-normalized vectors; each vector stores its cell
    plus PQ codes of r = x_n - c_cell. A probe visits only its `nprobe`
    nearest cells, and scores a candidate as

        <q_n, x_n>  ~=  <q_n, c_cell>  +  sum_j tab[j][code_j]

    — exact in the first term (one dot per probed CELL), quantized only
    in the residual. Unlike flat PQ (pq_topk), the scan side is a CELL
    EQUI-JOIN: at 100 TB only nprobe/n_cells of the code table is ever
    read per probe, and the codes are m bytes per vector. The approximate
    top `rerank` per probe re-join their float vectors for an exact
    sequential-fold cosine re-rank, same contract as the other ANN ops."""
    from reddit_big_data_spark.operators.similarity import ivf_assign, make_centroids

    # Cache contract (same as ivf_topk): nx/cents/residuals persist for
    # the life of the returned lazy plan — they feed BOTH the training
    # collects and the returned scan — so the session's clearCache (bench/
    # conftest run it between queries) is the mop-up point; an in-function
    # unpersist would evict state the returned DataFrame still needs.
    # Wall-clock at bench scale is dominated by SEQUENTIAL JOB BARRIERS
    # (each training collect is a job), not row work — so no gratuitous
    # materializing counts here: cents is driver-built data already, and
    # the PQ training-sample collect materializes `residuals` into its
    # cache on first touch. `cell_iters` defaults to ONE Lloyd round for the
    # coarse cells: cell balance barely moves after round one, residual
    # PQ absorbs coarse error, and the exact re-rank guards recall.
    nx = _normalized(corpus, id_col, emb_col).persist()
    cents = make_centroids(
        nx, id_col, "__vec", k=n_cells, train_iters=cell_iters
    ).persist()
    # (id, __vec, nrm, cell) — nrm is ~1 here (input pre-normalized)
    assigned = ivf_assign(nx, cents, id_col, "__vec")
    cvecs = cents.select(
        F.col("cell"), F.col("__vec").alias("__cvec")
    )
    residuals = (
        assigned.join(F.broadcast(cvecs), "cell")
        .select(
            F.col(id_col),
            F.col("cell"),
            F.zip_with(
                F.col("__vec"), F.col("__cvec"), lambda x, c: x - c
            ).alias("__res"),
        )
    ).persist()
    cb = train_pq_codebooks(
        residuals, id_col, "__res", dims, m, ksub, iters, normalize=False
    )
    codes = pq_encode(residuals, cb, id_col, "__res", normalize=False).join(
        residuals.select(id_col, "cell"), id_col
    )

    # probe routing + per-(probe, cell) exact centroid term
    qn = _normalized(queries, id_col, emb_col)
    spark = corpus.sparkSession
    cbframe = local_df(
        spark, [(0, cb)], "__ck: int, __cb: array<array<array<double>>>"
    )
    dsub = dims // m
    tab = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.transform(
            F.element_at(F.col("__cb"), j.cast("int") + 1),
            lambda c: F.aggregate(
                F.zip_with(
                    _subvec(F.col("__vec"), j, dsub), c, lambda x, y: x * y
                ),
                F.lit(0.0),
                lambda a, v: a + v,
            ),
        ),
    )
    qc = F.aggregate(
        F.zip_with(F.col("__vec"), F.col("__cvec"), lambda x, c: x * c),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    # Rank cells by COSINE to the centroid — the same metric ivf_assign
    # used to place corpus vectors — not by the raw inner product __qc:
    # Lloyd means have unequal norms, and raw-IP ranking would route
    # probes toward large-norm cells their neighbors were never assigned
    # to. __qc itself stays raw: the score decomposition needs <q, c>.
    wr = Window.partitionBy("query_id").orderBy(F.col("__croute").desc(), "cell")
    routed = (
        attach_constant_row(qn, cbframe, id_col)
        .join(F.broadcast(cvecs), F.lit(True))
        .select(
            F.col(id_col).alias("query_id"),
            F.col("cell"),
            qc.alias("__qc"),
            (qc / norm(F.col("__cvec"))).alias("__croute"),
            tab.alias("__tab"),
        )
        .withColumn("__rn", F.row_number().over(wr))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "cell", "__qc", "__tab")
    )
    # scan: CELL equi-join; score = centroid term + residual lookups
    approx = (
        codes.join(F.broadcast(routed), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "__score",
            F.col("__qc")
            + F.aggregate(
                F.zip_with(
                    F.col("codes"),
                    F.col("__tab"),
                    lambda c, t: F.element_at(t, c + 1),
                ),
                F.lit(0.0),
                lambda a, v: a + v,
            ),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("__score").desc(), F.col(id_col)
    )
    cand = (
        approx.withColumn("__arn", F.row_number().over(wa))
        .filter(F.col("__arn") <= rerank)
        .select("query_id", F.col(id_col).alias("neighbor_id"))
    )
    return exact_rerank(cand, corpus, queries, id_col, emb_col, k)
