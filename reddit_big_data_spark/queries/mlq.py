"""ML-family queries (M1-M15) over `customer`: feature indexing (with a
SQL oracle pinning StringIndexer's frequencyDesc semantics), class-weight
derivation (oracle), a native pairwise correlation matrix (A8 with an
oracle — stronger than the reference's collect-based matrix), and the
trainable surface under the seeded-snapshot oracle discipline (training
is not SQL-expressible, but every pipeline here is a fixed function of
the sf0.01 data, so the oracle is a VALUES snapshot verified
byte-identical across sessions and cpu counts): q60 RF pipeline, q138
hashed-feature quality classifier, q165 OneVsRest-LinearSVC (M6/M8),
q166 CrossValidator grid search (M10).
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_big_data_spark.registry import register
from reddit_big_data_spark.sources.io import local_df, read_table


# --------------------------------------------------------------------------
# q61 — StringIndexer semantics, oracle-pinned: frequencyDesc index order
# (ties broken alphabetically — Spark sorts (-count, label)). The oracle
# recomputes the same ranking in SQL, proving the indexer is just a
# groupBy+rank in disguise (M1; reference ML_Sentiment.py:158,162-166).
# --------------------------------------------------------------------------
@register(
    "q61_string_indexer",
    oracle="""
    WITH counts AS (
      SELECT c_mktsegment, COUNT(*) AS cnt FROM customer GROUP BY 1
    )
    SELECT c_mktsegment, cnt,
           CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, c_mktsegment) - 1 AS DOUBLE)
             AS seg_index
    FROM counts
    ORDER BY c_mktsegment
    """,
    doc="StringIndexer frequencyDesc order pinned against a SQL rank (M1)",
)
def q61_string_indexer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.ml.features import string_indexers

    cust = read_table(spark, sf_dir, "customer")
    idx = string_indexers(["c_mktsegment"])[0].setHandleInvalid("error")
    model = idx.fit(cust)
    return (
        model.transform(cust)
        .groupBy("c_mktsegment", "c_mktsegment_idx")
        .agg(F.count("*").alias("cnt"))
        .select(
            "c_mktsegment",
            "cnt",
            F.col("c_mktsegment_idx").alias("seg_index"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# q62 — balanced class weights n/(k*cnt), fully distributed (M15/A13;
# replaces the driver-side loop at reference ML_Sentiment.py:96-121).
# --------------------------------------------------------------------------
@register(
    "q62_class_weights",
    oracle="""
    WITH counts AS (
      SELECT c_mktsegment, COUNT(*) AS cnt FROM customer GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n, CAST(COUNT(*) AS DOUBLE) AS k FROM counts)
    SELECT c_mktsegment, cnt,
           ROUND(tot.n / (tot.k * cnt), 6) AS weight
    FROM counts, tot
    ORDER BY c_mktsegment
    """,
    doc="balanced class-weight derivation, distributed (M15+A13)",
)
def q62_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.ml.features import with_class_weights

    cust = read_table(spark, sf_dir, "customer")
    weighted = with_class_weights(cust, "c_mktsegment")
    return (
        weighted.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.first("weight"), 6).alias("weight"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# q63 — pairwise Pearson correlation matrix in ONE distributed pass (A8):
# n*(n-1)/2 corr aggregates over one scan, long format — no VectorAssembler
# round-trip, no driver-side matrix (reference feature_correlation.py:40-49
# collects a DenseMatrix).
# --------------------------------------------------------------------------
_CORR_COLS = ["c_acctbal", "c_nationkey", "c_custkey"]


@register(
    "q63_corr_matrix",
    oracle="""
    SELECT 'c_acctbal' AS col_a, 'c_nationkey' AS col_b,
           ROUND(CORR(c_acctbal, c_nationkey), 6) AS corr FROM customer
    UNION ALL
    SELECT 'c_acctbal', 'c_custkey', ROUND(CORR(c_acctbal, c_custkey), 6) FROM customer
    UNION ALL
    SELECT 'c_nationkey', 'c_custkey', ROUND(CORR(c_nationkey, c_custkey), 6) FROM customer
    ORDER BY col_a, col_b
    """,
    doc="pairwise correlation matrix in one pass, long format (A8)",
)
def q63_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    pairs = [
        (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1 :]
    ]
    aggs = [
        F.round(F.corr(a, b), 6).alias(f"{a}|{b}") for a, b in pairs
    ]
    wide = cust.agg(*aggs)
    # unpivot via stack — still one aggregation job
    stack_expr = ", ".join(f"'{a}', '{b}', `{a}|{b}`" for a, b in pairs)
    return (
        wide.selectExpr(
            f"stack({len(pairs)}, {stack_expr}) AS (col_a, col_b, corr)"
        )
        .orderBy("col_a", "col_b")
    )


# --------------------------------------------------------------------------
# q60 — end-to-end classification pipeline (M1+M2+M4+M7+M12+M13+M14+M15):
# index label -> assemble numeric features -> class weights -> seeded
# split -> RandomForest -> Spark-side confusion matrix.
#
# Oracle (VERDICT r4 #6): tree training is not SQL-expressible, but the
# whole pipeline is seeded and the sf0.01 confusion matrix is a FIXED
# function of the data — verified byte-identical across separate sessions
# and cpus in {4, 8, 16, 32} (randomSplit depends on input partitioning,
# which for the single sf0.01 customer file is one partition at any
# thread count). The oracle is therefore a VALUES snapshot of those 25
# counts. If the driver ever regenerates the testdata with different
# CONTENT, this row goes red by design — every other oracle would shift
# with it, so a lone q60 red means "snapshot stale", not "pipeline broken".
# --------------------------------------------------------------------------
_Q60_SNAPSHOT = """
    SELECT CAST(col0 AS INTEGER) AS label,
           CAST(col1 AS INTEGER) AS prediction,
           CAST(col2 AS BIGINT) AS cnt
    FROM (VALUES
      (0,0,9),(0,1,14),(0,2,12),(0,3,17),(0,4,11),
      (1,0,8),(1,1,21),(1,2,20),(1,3,12),(1,4,7),
      (2,0,12),(2,1,10),(2,2,17),(2,3,12),(2,4,9),
      (3,0,13),(3,1,14),(3,2,12),(3,3,14),(3,4,12),
      (4,0,8),(4,1,18),(4,2,15),(4,3,21),(4,4,11)
    ) t(col0, col1, col2)
    ORDER BY label, prediction
    """


@register(
    "q60_rf_pipeline",
    oracle=_Q60_SNAPSHOT,
    sf_pinned=True,
    doc="StringIndexer->VectorAssembler->weighted RF->confusion matrix (M*), "
    "seeded-deterministic snapshot oracle",
)
def q60_rf_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.ml.eval import confusion_matrix
    from reddit_big_data_spark.ml.features import (
        assembler,
        string_indexers,
        with_class_weights,
    )
    from reddit_big_data_spark.ml.models import rf_classifier, train_test_split

    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    cust = with_class_weights(cust, "c_mktsegment")
    train, test = train_test_split(cust, 0.75, seed=42)
    pipe = Pipeline(
        stages=[
            *string_indexers(["c_mktsegment"]),
            assembler(["c_nationkey", "c_acctbal"]),
            rf_classifier(
                label_col="c_mktsegment_idx", num_trees=20, weight_col="weight"
            ),
        ]
    )
    model = pipe.fit(train)
    preds = model.transform(test)
    return (
        confusion_matrix(preds, "c_mktsegment_idx", "prediction")
        .select(
            F.col("c_mktsegment_idx").cast("int").alias("label"),
            F.col("prediction").cast("int").alias("prediction"),
            "cnt",
        )
        .orderBy("label", "prediction")
    )


# --------------------------------------------------------------------------
# q125 — LABEL-NOISE screening via centroid disagreement (the
# confident-learning-lite pass an embedding-labeled dataset gets before
# training): flag vectors whose nearest LABEL CENTROID is not their own
# label. Centroids are per-label dimension means (q42's vector agg),
# collected driver-side (|labels| x dim — constant) and shipped back as
# a broadcast constants frame for one native argmin pass (the
# kmeans_assign shape); ties break to the lowest label. Exactly
# replayable in SQL: AVG centroids + per-vector squared-distance argmin.
# --------------------------------------------------------------------------
@register(
    "q125_label_noise",
    oracle="""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
    flat AS (
      SELECT vec_id, label, i AS dim, e[i] AS x
      FROM v, generate_series(1, 64) AS g(i)
    ),
    cent AS (
      SELECT label AS clabel, dim, AVG(x) AS c FROM flat GROUP BY 1, 2
    ),
    dist AS (
      SELECT f.vec_id, f.label, c.clabel,
             SUM((f.x - c.c) * (f.x - c.c)) AS d
      FROM flat f JOIN cent c USING (dim)
      GROUP BY 1, 2, 3
    ),
    pred AS (
      SELECT vec_id, label, clabel AS pred_label FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY d, clabel) AS rn
        FROM dist) WHERE rn = 1
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CASE WHEN pred_label <> label THEN 1 ELSE 0 END)
                AS BIGINT) AS flagged,
           -- unrounded integer ratio (r12): bit-equal by construction;
           -- ROUND@4 was a structural tie for 2,5-smooth label counts
           CAST(SUM(CASE WHEN pred_label <> label THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS flag_rate
    FROM pred
    GROUP BY label ORDER BY label
    """,
    doc="label-noise screen: vectors nearer another label's centroid "
    "(centroid-disagreement flag rate per label)",
)
def q125_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.operators.clustering import _assign

    emb = read_table(spark, sf_dir, "embeddings")
    cent_rows = (
        emb.select(
            "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x")
        )
        .groupBy("label", "dim")
        .agg(F.avg("x").alias("c"))
        .collect()
    )
    by_label: dict[int, dict[int, float]] = {}
    for r in cent_rows:
        by_label.setdefault(r["label"], {})[r["dim"]] = r["c"]
    labels = sorted(by_label)
    centers = [
        [by_label[lb][d] for d in sorted(by_label[lb])] for lb in labels
    ]
    assigned = _assign(
        emb.select("vec_id", "label", "embedding"),
        "embedding",
        centers,
        cids=labels,
        key_col="vec_id",
    )
    flagged = (F.col("cluster") != F.col("label")).cast("long")
    return (
        assigned.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum(flagged).alias("flagged"),
            # unrounded integer ratio (see the oracle comment)
            (F.sum(flagged).cast("double") / F.count("*")).alias("flag_rate"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# q138 — MODEL-BASED quality classifier (fastText-style; VERDICT r7 #4):
# the standard CCNet/LLaMA-pipeline quality gate alongside the rule
# filters (q76) and the LM perplexity score (q101). Joulin et al., "Bag
# of Tricks for Efficient Text Classification" (EACL 2017) + the hashing
# trick of Weinberger et al. (ICML 2009): documents featurize as HASHED
# char 3-gram counts (murmur3 buckets — no vocabulary to build or ship),
# and a linear classifier distills a WEAK RULE LABEL — q76's stopword
# stage (stop_ratio >= 0.03, the Gopher "natural language" signal) —
# into a model. The label rule READS word statistics the features never
# see directly, yet stopwords leave char-3-gram fingerprints ("the",
# " th", "nd "), so the model genuinely learns (92% test accuracy at
# sf0.01), unlike a length-band label a linear model cannot express.
#
# Everything is Spark-native AND row-local before the split: the label
# derives from filter(split(...)) array ops on the row itself (NO join —
# a pre-split join would make randomSplit's row order, and therefore the
# snapshot, shuffle-nondeterministic), the char 3-grams are a native
# transform(sequence(...)) — no UDF — HashingTF is a JVM-side bucket
# count, and LogisticRegression trains via distributed treeAggregate.
#
# Oracle (q60's proven pattern): training is not SQL-expressible, but the
# whole pipeline is a FIXED function of the sf0.01 data — the weak label
# is deterministic, randomSplit(seed=42) depends only on the input
# partitioning (one file -> one partition at sf0.01 at any thread
# count), murmur3 hashing is fixed, and L-BFGS over a fixed partition
# layout reduces deterministically — verified byte-identical across
# separate sessions and cpus in {4, 8, 32}. The oracle is a VALUES
# snapshot of the test-split confusion matrix; a lone q138 red after a
# testdata regeneration means "snapshot stale", not "pipeline broken"
# (every other oracle would shift with it).
#
# 100 TB posture: feature extraction is embarrassingly parallel with a
# FIXED feature dimension (no vocab shuffle, the hashing trick's whole
# point at corpus scale); L-BFGS is one treeAggregate per iteration
# (gradient partials merge map-side); scoring is a broadcast of one
# 512-float coefficient vector.
# --------------------------------------------------------------------------
_Q138_SNAPSHOT = """
    SELECT CAST(col0 AS INTEGER) AS label,
           CAST(col1 AS INTEGER) AS prediction,
           CAST(col2 AS BIGINT) AS cnt
    FROM (VALUES
      (0,0,9),(0,1,5),
      (1,0,3),(1,1,83)
    ) t(col0, col1, col2)
    ORDER BY label, prediction
    """


@register(
    "q138_quality_classifier",
    oracle=_Q138_SNAPSHOT,
    sf_pinned=True,
    doc="fastText-style quality classifier: hashed char-3-gram features "
    "-> LogisticRegression distilling the Gopher stopword-ratio rule "
    "(q76's stop_ratio >= 0.03 stage); "
    "seeded-deterministic confusion-matrix snapshot oracle",
)
def q138_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    from reddit_big_data_spark.ml.eval import confusion_matrix
    from reddit_big_data_spark.ml.models import train_test_split

    from reddit_big_data_spark.queries.cleaning import _STOPS

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    # weak rule label, ROW-LOCAL (no join before randomSplit — see the
    # block comment): a q76-STYLE stop_ratio over split-on-space words,
    # with empty tokens excluded (q76's denominator counts the empty
    # strings consecutive spaces produce; the snapshot oracle pins
    # q138's own output, so the divergence is deliberate, not drift)
    stops_sql = ", ".join(f"'{s}'" for s in _STOPS)
    words = F.expr("filter(split(text, ' '), t -> t <> '')")
    stops = F.expr(
        f"filter(split(text, ' '), t -> t <> '' AND t IN ({stops_sql}))"
    )
    ratio = F.when(
        F.size(words) > 0, F.size(stops) / F.size(words)
    ).otherwise(F.lit(0.0))
    # native char 3-grams: one row stays one row (array column), no UDF.
    # The <3-char guard matters: sequence(1, 0) would DESCEND ([1, 0]),
    # not return empty.
    grams = docs.withColumn(
        "grams",
        F.when(
            F.length("text") >= 3,
            F.expr(
                "transform(sequence(1, length(text) - 2),"
                " i -> substring(text, i, 3))"
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    labeled = grams.withColumn("label", (ratio >= 0.03).cast("double"))
    train, test = train_test_split(labeled, 0.75, seed=42)
    pipe = Pipeline(
        stages=[
            HashingTF(
                inputCol="grams", outputCol="features", numFeatures=512
            ),
            LogisticRegression(
                maxIter=25, regParam=0.01, labelCol="label"
            ),
        ]
    )
    model = pipe.fit(train)
    preds = model.transform(test)
    return (
        confusion_matrix(preds, "label", "prediction")
        .select(
            F.col("label").cast("int").alias("label"),
            F.col("prediction").cast("int").alias("prediction"),
            "cnt",
        )
        .orderBy("label", "prediction")
    )


# --------------------------------------------------------------------------
# q165 — OneVsRest LinearSVC (M8), promoted from tests-only to an oracle
# query (VERDICT r10 #4): the reference's second classifier family
# (reference code/ml/ML_Sentiment.py:385 wraps LinearSVC in OneVsRest).
# Same shape as q60: index label -> assemble numeric features -> class
# weights -> seeded split -> 5 one-vs-rest hinge-loss fits -> Spark-side
# confusion matrix.
#
# Oracle (q60's proven pattern): SVC training is not SQL-expressible, but
# the whole pipeline is a FIXED function of the sf0.01 data —
# randomSplit(seed=42) depends only on input partitioning (one customer
# file -> one partition at any thread count) and OWLQN over a fixed
# partition layout reduces deterministically; verified byte-identical
# across separate sessions and cpus in {4, 32}. The oracle is a VALUES
# snapshot of the 25 confusion counts; a lone q165 red after a testdata
# regeneration means "snapshot stale", not "pipeline broken".
#
# 100 TB posture: each of the 5 binary fits is one treeAggregate per
# iteration (gradient partials merge map-side); scoring broadcasts 5
# coefficient vectors. Identical scaling story to q60/q138.
# --------------------------------------------------------------------------
_Q165_SNAPSHOT = """
    SELECT CAST(col0 AS INTEGER) AS label,
           CAST(col1 AS INTEGER) AS prediction,
           CAST(col2 AS BIGINT) AS cnt
    FROM (VALUES
      (0,0,22),(0,2,37),(0,3,2),(0,4,2),
      (1,0,18),(1,2,39),(1,3,3),(1,4,8),
      (2,0,15),(2,2,33),(2,3,7),(2,4,5),
      (3,0,26),(3,2,33),(3,3,4),(3,4,2),
      (4,0,14),(4,2,45),(4,3,7),(4,4,7)
    ) t(col0, col1, col2)
    ORDER BY label, prediction
    """


@register(
    "q165_ovr_svc",
    oracle=_Q165_SNAPSHOT,
    sf_pinned=True,
    doc="OneVsRest LinearSVC with class weights (M8), seeded-deterministic "
    "confusion-matrix snapshot oracle",
)
def q165_ovr_svc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.ml.eval import confusion_matrix
    from reddit_big_data_spark.ml.features import (
        assembler,
        scaler,
        string_indexers,
        with_class_weights,
    )
    from reddit_big_data_spark.ml.models import ovr_linear_svc, train_test_split

    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    cust = with_class_weights(cust, "c_mktsegment")
    train, test = train_test_split(cust, 0.75, seed=42)
    pipe = Pipeline(
        stages=[
            *string_indexers(["c_mktsegment"]),
            assembler(["c_nationkey", "c_acctbal"]),
            # M6 gains its driver-checkable row here. (LinearSVC also
            # standardizes internally by default, so this stage changes
            # the feature column, not the optimum; breeze OWLQN's one
            # "Resetting history" message is part of the deterministic
            # iteration sequence, not a nondeterminism source.)
            scaler("features", "features_scaled"),
            # max_iter=10 probed and kept (the q138 precedent): trimming
            # to 5/8 iterations halves the ~14s sf0.1 bench cost but
            # degrades the demonstration — at 5 the model collapses to a
            # constant predictor (5-cell matrix), at 8 it predicts only
            # 3 of 5 classes; at 10 it spreads over 4. The cost is the
            # inherent 5-fit OVR treeAggregate loop, not plan waste.
            # No explicit persist before fit (VERDICT r11 #7b, probed
            # r12 with a storage watcher during fit): OneVsRest itself
            # persists the projected (label, features, weight) frame
            # when its input is uncached — the cached plan was observed
            # live during the fit — so the five class fits already share
            # ONE materialization of the scan+index+assemble+scale chain
            # and an outer persist would only duplicate the blocks.
            ovr_linear_svc(
                label_col="c_mktsegment_idx",
                features_col="features_scaled",
                weight_col="weight",
                max_iter=10,
            ),
        ]
    )
    model = pipe.fit(train)
    preds = model.transform(test)
    return (
        confusion_matrix(preds, "c_mktsegment_idx", "prediction")
        .select(
            F.col("c_mktsegment_idx").cast("int").alias("label"),
            F.col("prediction").cast("int").alias("prediction"),
            "cnt",
        )
        .orderBy("label", "prediction")
    )


# --------------------------------------------------------------------------
# q166 — CrossValidator + ParamGridBuilder (M10), promoted from tests-only
# to an oracle query (VERDICT r10 #4): the reference grid-searches its
# classifiers with CrossValidator (reference code/ml/ML_Modeling.py:210-232,
# ML_Sentiment.py:~400). 3-fold CV over a 2x2 RF grid (numTrees x
# maxDepth) on the q60 feature pipeline; output is one row per grid
# point with the fold-averaged f1 and its rank.
#
# Oracle (q60's proven pattern): 12 seeded fits + the metric fold-average
# are a FIXED function of the sf0.01 data — CV's fold split is
# seed-deterministic and depends only on input partitioning (one customer
# file -> one partition at any thread count); verified byte-identical
# across separate sessions and cpus in {4, 32}. avg f1 is rounded to 6dp
# on BOTH sides (VALUES stores the rounded literal CAST AS DOUBLE; Spark
# rounds with F.round — both land on the nearest double of the same
# decimal string). A lone q166 red after a testdata regeneration means
# "snapshot stale", not "CV broken".
#
# 100 TB posture: CV is folds x grid INDEPENDENT fits — Spark runs them
# concurrently (parallelism=4; the reference runs them serially), each
# fit the same treeAggregate-per-iteration shape as q60. Nothing here is
# corpus-quadratic; the grid is the multiplier you budget explicitly.
# --------------------------------------------------------------------------
_Q166_SNAPSHOT = """
    SELECT CAST(col0 AS INTEGER) AS num_trees,
           CAST(col1 AS INTEGER) AS max_depth,
           CAST(col2 AS DOUBLE) AS avg_f1,
           CAST(col3 AS INTEGER) AS rank
    FROM (VALUES
      (5,3,0.164704,4),
      (5,5,0.182054,2),
      (10,3,0.175844,3),
      (10,5,0.187642,1)
    ) t(col0, col1, col2, col3)
    ORDER BY num_trees, max_depth
    """


@register(
    "q166_cross_validation",
    oracle=_Q166_SNAPSHOT,
    sf_pinned=True,
    doc="CrossValidator 3-fold x 2x2 RF grid (M10), seeded-deterministic "
    "fold-averaged-f1 snapshot oracle",
)
def q166_cross_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.ml.eval import multiclass_evaluator
    from reddit_big_data_spark.ml.features import (
        assembler,
        string_indexers,
        with_class_weights,
    )
    from reddit_big_data_spark.ml.models import (
        cross_validate,
        param_grid,
        rf_classifier,
    )

    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    cust = with_class_weights(cust, "c_mktsegment")
    rf = rf_classifier(
        label_col="c_mktsegment_idx", num_trees=5, weight_col="weight"
    )
    pipe = Pipeline(
        stages=[
            *string_indexers(["c_mktsegment"]),
            assembler(["c_nationkey", "c_acctbal"]),
            rf,
        ]
    )
    grid = param_grid(rf, numTrees=[5, 10], maxDepth=[3, 5])
    cv = cross_validate(
        pipe,
        grid,
        multiclass_evaluator("f1", label_col="c_mktsegment_idx"),
        folds=3,
        seed=42,
    )
    cv_model = cv.fit(cust)
    # grid-point params + fold-averaged metric, ranked: small constant
    # rows (|grid|), assembled driver-side like any k x k model report.
    rows = [
        (
            int(pm[rf.numTrees]),
            int(pm[rf.maxDepth]),
            float(m),
        )
        for pm, m in zip(grid, cv_model.avgMetrics)
    ]
    out = local_df(spark, rows, "num_trees int, max_depth int, avg_f1 double")
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("avg_f1"), "num_trees", "max_depth")
    return (
        out.withColumn("rank", F.row_number().over(w).cast("int"))
        .select(
            "num_trees",
            "max_depth",
            F.round("avg_f1", 6).alias("avg_f1"),
            "rank",
        )
        .orderBy("num_trees", "max_depth")
    )


# --------------------------------------------------------------------------
# q167 — gradient-boosted trees (M9), promoted from tests-only to an
# oracle query: the reference's XGBoost classifier slot (reference
# code/ml/ML_Modeling.py:202-207 imports xgboost.spark), which this repo
# fills with the SURVEY §7 fallback contract — SparkXGB when the optional
# dep exists, GBTClassifier otherwise (this container: GBT). Binary task
# (GBT is binary-only): does the customer belong to a BUILDING/AUTOMOBILE
# segment, from (nationkey, acctbal) — deliberately weak features; the
# surface under demonstration is the boosted-ensemble fit mechanics.
#
# Oracle: q60's seeded-snapshot pattern (fixed function of the sf0.01
# data; verified byte-identical across separate sessions and cpus
# {4, 32}). NB the snapshot pins the GBT FALLBACK's trees — in an
# environment with the optional xgboost.spark dep installed,
# boosted_trees would return SparkXGB whose trees the snapshot does NOT
# pin, so the query build detects the backend and FAILS LOUDLY there
# (VERDICT r11 #4: a named error beats an opaque driver hash mismatch;
# swap the snapshot when pinning an xgboost environment).
# 100 TB posture: each boosting iteration fits one tree =
# one pass of distributed impurity aggregation; 10 iterations = 10
# sequential tree fits, embarrassingly parallel WITHIN each tree.
# --------------------------------------------------------------------------
_Q167_SNAPSHOT = """
    SELECT CAST(col0 AS INTEGER) AS label,
           CAST(col1 AS INTEGER) AS prediction,
           CAST(col2 AS BIGINT) AS cnt
    FROM (VALUES
      (0,0,142),(0,1,59),
      (1,0,91),(1,1,37)
    ) t(col0, col1, col2)
    ORDER BY label, prediction
    """


@register(
    "q167_boosted_trees",
    oracle=_Q167_SNAPSHOT,
    sf_pinned=True,
    doc="gradient-boosted trees binary classifier (M9, GBT fallback for "
    "the optional XGBoost slot), seeded-deterministic snapshot oracle",
)
def q167_boosted_trees(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.ml.eval import confusion_matrix
    from reddit_big_data_spark.ml.features import assembler
    from reddit_big_data_spark.ml.models import (
        boosted_trees,
        boosted_trees_backend,
        train_test_split,
    )

    backend = boosted_trees_backend()
    if backend != "gbt":
        raise RuntimeError(
            "q167_boosted_trees: snapshot oracle is pinned for the GBT "
            f"fallback, but boosted_trees resolves to the {backend!r} "
            "backend in this environment (optional xgboost.spark is "
            "installed). Re-pin _Q167_SNAPSHOT against the xgboost "
            "backend's seeded output before registering it here."
        )

    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.col("c_mktsegment")
        .isin("BUILDING", "AUTOMOBILE")
        .cast("double")
        .alias("label"),
    )
    train, test = train_test_split(cust, 0.75, seed=42)
    pipe = Pipeline(
        stages=[
            assembler(["c_nationkey", "c_acctbal"]),
            boosted_trees(kind="classifier", label_col="label", max_iter=10),
        ]
    )
    model = pipe.fit(train)
    preds = model.transform(test)
    return (
        confusion_matrix(preds, "label", "prediction")
        .select(
            F.col("label").cast("int").alias("label"),
            F.col("prediction").cast("int").alias("prediction"),
            "cnt",
        )
        .orderBy("label", "prediction")
    )


# --------------------------------------------------------------------------
# q168 — OneHotEncoder + IndexToString semantics (M2 + M3), promoted from
# tests-only to an oracle query with a GENUINE SQL oracle (no snapshot
# needed — one-hot encoding is just a GROUP BY in disguise, which is the
# point this query pins): index c_mktsegment (frequencyDesc, ties
# alphabetical), one-hot encode, explode the vector, and report the
# one-hot COLUMN SUMS per nation — slot j's sum over a nation's rows IS
# the count of that nation's customers in segment-rank j. IndexToString
# decodes each slot back to its label (the M3 round-trip), so a wrong
# labels array or slot order breaks the hash. Zero cells are kept
# (posexplode emits every slot for every row), pinning the VECTOR SIZE:
# with the indexer's handleInvalid="keep", the encoder's category count
# includes the unknown slot and default dropLast=True drops exactly
# that, so all 5 real labels keep slots 0-4 (a dropped real label would
# shrink the report to 4 slots and hash-mismatch).
#
# Reference anchor: ML_Sentiment.py:170-174 (OHE), 189-191
# (IndexToString). 100 TB posture: the encode is row-local (no shuffle);
# the report is one groupBy over (nation, slot) — 25 x 5 cells.
# --------------------------------------------------------------------------
@register(
    "q168_onehot_semantics",
    oracle="""
    WITH ranks AS (
      SELECT c_mktsegment,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, c_mktsegment) - 1
               AS slot
      FROM customer GROUP BY c_mktsegment
    ),
    cells AS (
      SELECT n.c_nationkey, r.slot, r.c_mktsegment
      FROM (SELECT DISTINCT c_nationkey FROM customer) n, ranks r
    ),
    counts AS (
      SELECT c.c_nationkey, r.slot, COUNT(*) AS oh_count
      FROM customer c JOIN ranks r USING (c_mktsegment)
      GROUP BY 1, 2
    )
    SELECT cells.c_nationkey,
           CAST(cells.slot AS INTEGER) AS slot,
           cells.c_mktsegment AS segment,
           CAST(COALESCE(counts.oh_count, 0) AS BIGINT) AS oh_count
    FROM cells LEFT JOIN counts USING (c_nationkey, slot)
    ORDER BY c_nationkey, slot
    """,
    doc="OneHotEncoder column sums per nation == GROUP BY counts (M2), "
    "IndexToString slot->label round-trip (M3); zero cells pin the "
    "dropLast/unknown-slot vector size",
)
def q168_onehot_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.functions import vector_to_array

    from reddit_big_data_spark.ml.features import (
        index_to_string,
        one_hot_encoders,
        string_indexers,
    )

    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    pipe = Pipeline(
        stages=[
            *string_indexers(["c_mktsegment"]),
            *one_hot_encoders(["c_mktsegment"]),
        ]
    )
    model = pipe.fit(cust)
    labels = model.stages[0].labels
    cells = (
        model.transform(cust)
        .select(
            "c_nationkey",
            F.posexplode(vector_to_array("c_mktsegment_oh")).alias(
                "slot", "v"
            ),
        )
        .groupBy("c_nationkey", "slot")
        .agg(F.sum("v").cast("long").alias("oh_count"))
    )
    decode = index_to_string("slot_d", "segment", labels)
    return (
        decode.transform(cells.withColumn("slot_d", F.col("slot").cast("double")))
        .select(
            "c_nationkey",
            F.col("slot").cast("int").alias("slot"),
            "segment",
            "oh_count",
        )
        .orderBy("c_nationkey", "slot")
    )
