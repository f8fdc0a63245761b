"""ML-family unit tests (M2/M3/M5/M6/M8/M9/M10/M11/M13/S11 + P12-P15):
the stages q60/q61/q62 don't already oracle-check, on small seeded
fixtures."""

from __future__ import annotations

import tempfile

from pyspark.ml import Pipeline
from pyspark.sql import functions as F

from reddit_big_data_spark.ml.eval import (
    confusion_matrix,
    multiclass_evaluator,
    regression_evaluator,
)
from reddit_big_data_spark.ml.features import (
    assembler,
    index_to_string,
    one_hot_encoders,
    scaler,
    string_indexers,
    with_class_weights,
)
from reddit_big_data_spark.ml.models import (
    boosted_trees,
    cross_validate,
    load_pipeline,
    ovr_linear_svc,
    param_grid,
    rf_classifier,
    save_pipeline,
    train_test_split,
)


def _toy(spark, n=200):
    # separable 3-class toy data: label = f(x) with noise-free mapping
    rows = [
        (i, float(i % 10), float((i * 7) % 5), ["lo", "mid", "hi"][min(i % 10 // 4, 2)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id: long, x1: double, x2: double, cat: string")


def test_ohe_scaler_pipeline_shapes(spark):
    df = _toy(spark)
    pipe = Pipeline(
        stages=[
            *string_indexers(["cat"]),
            *one_hot_encoders(["cat"]),
            assembler(["x1", "x2", "cat_oh"]),
            scaler(),
        ]
    )
    out = pipe.fit(df).transform(df)
    row = out.select("features", "features_scaled").first()
    assert row["features"].size == row["features_scaled"].size >= 3


def test_index_to_string_roundtrip(spark):
    df = _toy(spark)
    idx = string_indexers(["cat"])[0].fit(df)
    back = index_to_string("cat_idx", "cat_back", list(idx.labels))
    out = back.transform(idx.transform(df))
    assert out.filter(F.col("cat") != F.col("cat_back")).count() == 0


def test_ovr_svc_trains_and_predicts(spark):
    df = with_class_weights(_toy(spark), "cat")
    pipe = Pipeline(
        stages=[
            *string_indexers(["cat"]),
            assembler(["x1", "x2"]),
            ovr_linear_svc(label_col="cat_idx", max_iter=10),
        ]
    )
    preds = pipe.fit(df).transform(df)
    assert preds.select("prediction").distinct().count() >= 2


def test_boosted_trees_fallback_binary(spark):
    df = _toy(spark).withColumn("label", (F.col("x1") > 4.5).cast("double"))
    feat = assembler(["x1", "x2"]).transform(df)
    model = boosted_trees("classifier", max_iter=5).fit(feat)
    preds = model.transform(feat)
    acc = multiclass_evaluator("accuracy").evaluate(
        preds.withColumnRenamed("label", "label")
    )
    assert acc > 0.9  # x1 alone separates perfectly


def test_boosted_trees_backend_detection_both_ways(monkeypatch, spark):
    """VERDICT r11 #4: q167's snapshot pins the GBT fallback's trees, so
    the backend must be DETECTED at query-build time — with a fake
    xgboost.spark installed, boosted_trees_backend() reports 'xgboost',
    boosted_trees() returns the fake class, and q167 fails with a loud
    named error INSTEAD of an opaque driver hash mismatch; with the dep
    absent (forced, matching this container), everything resolves to the
    GBT fallback and the guard is a no-op."""
    import sys
    import types

    import pytest
    from pyspark.ml.classification import GBTClassifier

    from reddit_big_data_spark.ml import models
    from reddit_big_data_spark.queries.mlq import q167_boosted_trees

    class FakeXGB:
        def __init__(self, **kwargs):
            self.kwargs = kwargs

    fake_root = types.ModuleType("xgboost")
    fake_spark = types.ModuleType("xgboost.spark")
    fake_spark.SparkXGBClassifier = FakeXGB
    fake_spark.SparkXGBRegressor = FakeXGB
    fake_root.spark = fake_spark
    monkeypatch.setitem(sys.modules, "xgboost", fake_root)
    monkeypatch.setitem(sys.modules, "xgboost.spark", fake_spark)
    assert models.boosted_trees_backend() == "xgboost"
    assert isinstance(models.boosted_trees("classifier"), FakeXGB)
    with pytest.raises(RuntimeError, match="pinned for the GBT"):
        # the guard fires before any table read — sf_dir never touched
        q167_boosted_trees(spark, "unused")

    # dep absent (a None sys.modules entry forces ImportError): GBT path
    monkeypatch.setitem(sys.modules, "xgboost", None)
    monkeypatch.setitem(sys.modules, "xgboost.spark", None)
    assert models.boosted_trees_backend() == "gbt"
    assert isinstance(models.boosted_trees("classifier"), GBTClassifier)


def test_boosted_trees_fallback_regressor(spark):
    # M9's other half: the regressor also auto-falls-back to GBT when the
    # xgboost.spark extra is absent (this container), and learns a linear
    # target well enough to beat a constant predictor by a wide margin.
    df = _toy(spark).withColumn("y", F.col("x1") * 2.0)
    feat = assembler(["x1", "x2"]).transform(df).withColumnRenamed("y", "label")
    model = boosted_trees("regressor", max_iter=10).fit(feat)
    preds = model.transform(feat)
    err = preds.select(
        F.avg(F.abs(F.col("prediction") - F.col("label"))).alias("mae")
    ).first()["mae"]
    assert err < 1.0


def test_cross_validator_picks_model_and_persists(spark):
    df = _toy(spark).withColumn("label", (F.col("x1") > 4.5).cast("double"))
    rf = rf_classifier(label_col="label", num_trees=5, weight_col=None)
    pipe = Pipeline(stages=[assembler(["x1", "x2"]), rf])
    grid = param_grid(rf, maxDepth=[2, 4])
    cv = cross_validate(pipe, grid, multiclass_evaluator("f1", "label"), folds=2)
    cv_model = cv.fit(df)
    assert len(cv_model.avgMetrics) == 2
    with tempfile.TemporaryDirectory() as d:
        save_pipeline(cv_model.bestModel, f"{d}/m")
        preds = load_pipeline(f"{d}/m").transform(df)  # S11 round trip
        assert preds.count() == df.count()


def test_regression_evaluator_rmse(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 3.0)], "label: double, prediction: double"
    )
    rmse = regression_evaluator("rmse").evaluate(df)
    assert abs(rmse - (0.5 ** 0.5)) < 1e-9  # errors 0 and 1 -> sqrt(1/2)


def test_confusion_matrix_pivot(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 1.0)],
        "label: double, prediction: double",
    )
    wide = confusion_matrix(df, pivot=True).collect()
    as_map = {r["label"]: r.asDict() for r in wide}
    assert as_map[0.0]["0.0"] == 1 and as_map[0.0]["1.0"] == 1
    assert as_map[1.0]["1.0"] == 2 and as_map[1.0]["0.0"] == 0


def test_split_sample_dropna_seeded(spark):
    """P12/P13/P14/P15: dropna, sample, randomSplit — deterministic under a
    fixed seed (the driver's rows-only determinism contract)."""
    df = _toy(spark).withColumn(
        "maybe_null", F.when(F.col("x1") > 5, F.col("x1"))
    )
    assert df.dropna().count() == df.filter(F.col("maybe_null").isNotNull()).count()
    s1 = df.sample(fraction=0.3, seed=7).count()
    s2 = df.sample(fraction=0.3, seed=7).count()
    assert s1 == s2 > 0
    a1, b1 = train_test_split(df, 0.75, seed=42)
    a2, b2 = train_test_split(df, 0.75, seed=42)
    assert a1.count() == a2.count() and b1.count() == b2.count()
    assert a1.count() + b1.count() == df.count()
