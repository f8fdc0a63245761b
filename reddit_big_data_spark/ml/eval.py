"""Evaluation operators M11 + M14 (SURVEY.md §2.10).

The reference collects predictions to the driver and runs sklearn's
confusion_matrix (reference code/ml/ML_Sentiment.py:264-279,
ML_Modeling.py:390-411) — a driver OOM at scale. Ours is a Spark-side
groupBy(label, prediction) count (optionally pivoted), so the wide table
never leaves the executors; only the k x k matrix does.
"""

from __future__ import annotations

from pyspark.ml.evaluation import (
    MulticlassClassificationEvaluator,
    RegressionEvaluator,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_matrix(
    preds: DataFrame,
    label_col: str = "label",
    prediction_col: str = "prediction",
    pivot: bool = False,
) -> DataFrame:
    """M14: distributed confusion matrix. Long form (label, prediction,
    cnt) by default; pivot=True returns one row per label with a column
    per predicted class (driver-safe: k x k)."""
    long = (
        preds.groupBy(label_col, prediction_col)
        .agg(F.count("*").alias("cnt"))
        .orderBy(label_col, prediction_col)
    )
    if not pivot:
        return long
    return (
        long.groupBy(label_col)
        .pivot(prediction_col)
        .agg(F.first("cnt"))
        .na.fill(0)
        .orderBy(label_col)
    )


def multiclass_evaluator(metric: str = "f1", label_col: str = "label") -> MulticlassClassificationEvaluator:
    """M11 (f1 / accuracy, ML_Sentiment.py:235,346,502)."""
    return MulticlassClassificationEvaluator(
        labelCol=label_col, predictionCol="prediction", metricName=metric
    )


def regression_evaluator(metric: str = "rmse", label_col: str = "label") -> RegressionEvaluator:
    """M11 (rmse, ML_Modeling.py:217-221)."""
    return RegressionEvaluator(
        labelCol=label_col, predictionCol="prediction", metricName=metric
    )
