"""Model operators M7-M13 + S11 (SURVEY.md §2.10).

Estimator configs mirror the reference's choices where sane:
RandomForest with entropy + weightCol (reference code/ml/ML_Sentiment.py:
184 — its 2000 trees are a notebook flex; numTrees is a parameter here),
LinearSVC wrapped in OneVsRest with weightCol (ML_Sentiment.py:385),
gradient-boosted trees standing in for SparkXGB (ML_Modeling.py:202-207)
with an optional xgboost.spark import, CrossValidator + ParamGridBuilder
(ML_Modeling.py:210-231), seeded randomSplit (ML_Modeling.py:241), and
Pipeline save/load persistence (ML_Modeling.py:247-253).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import (
    GBTClassifier,
    LinearSVC,
    OneVsRest,
    RandomForestClassifier,
)
from pyspark.ml.evaluation import Evaluator
from pyspark.ml.regression import GBTRegressor
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import DataFrame


def rf_classifier(
    label_col: str = "label",
    features_col: str = "features",
    num_trees: int = 50,
    weight_col: str | None = "weight",
    seed: int = 42,
) -> RandomForestClassifier:
    """M7 (entropy impurity + class weights, ML_Sentiment.py:184)."""
    rf = RandomForestClassifier(
        labelCol=label_col,
        featuresCol=features_col,
        numTrees=num_trees,
        impurity="entropy",
        seed=seed,
    )
    return rf.setWeightCol(weight_col) if weight_col else rf


def ovr_linear_svc(
    label_col: str = "label",
    features_col: str = "features",
    weight_col: str | None = "weight",
    max_iter: int = 20,
    parallelism: int = 8,
) -> OneVsRest:
    """M8: LinearSVC one-vs-rest (ML_Sentiment.py:385).

    `parallelism` overlaps the K independent binary fits (Spark's
    default is 1 = strictly sequential); each fit's own distributed
    OWLQN passes are unchanged — same data, same partitioning, same
    aggregation tree — so the fitted models (and q165's pinned VALUES
    snapshot) are byte-identical, only the wall-clock drops (measured
    ~10.5s -> see bench detail at sf0.1 for q165). Default raised 4 -> 8
    in r16 so the 5-class fit runs as ONE wave instead of 4+1
    (interleaved A/B at sf0.1: q165 6.16 -> 5.15 s; oracle snapshot
    re-verified identical). cross_validate keeps parallelism=4 — the
    same A/B showed no q166 movement (its fits are cheap enough that
    the driver, not the wave count, is the bound)."""
    svc = LinearSVC(labelCol=label_col, featuresCol=features_col, maxIter=max_iter)
    if weight_col:
        svc = svc.setWeightCol(weight_col)
    ovr = OneVsRest(
        classifier=svc,
        labelCol=label_col,
        featuresCol=features_col,
        parallelism=parallelism,
    )
    return ovr.setWeightCol(weight_col) if weight_col else ovr


def _xgb_classes():
    """(SparkXGBClassifier, SparkXGBRegressor) when the optional
    xgboost.spark dep is importable, else None. Split out of
    boosted_trees so callers whose EXPECTED OUTPUT depends on the
    backend (q167's seeded snapshot pins the GBT fallback's trees) can
    detect the environment up front instead of surfacing an opaque
    hash mismatch (VERDICT r11 #4)."""
    try:  # pragma: no cover - optional dependency
        from xgboost.spark import SparkXGBClassifier, SparkXGBRegressor  # type: ignore

        return SparkXGBClassifier, SparkXGBRegressor
    except ImportError:
        return None


def boosted_trees_backend() -> str:
    """'xgboost' when the optional dep resolves, 'gbt' otherwise —
    which estimator boosted_trees() will hand back in THIS environment."""
    return "xgboost" if _xgb_classes() is not None else "gbt"


def boosted_trees(
    kind: str = "classifier",
    label_col: str = "label",
    features_col: str = "features",
    max_iter: int = 20,
    seed: int = 42,
):
    """M9: SparkXGB when the optional dep exists, GBT otherwise (the
    fallback SURVEY.md §7 specifies so correctness never depends on an
    uninstallable package; xgboost.spark import per ML_Modeling.py:20-21).
    """
    xgb = _xgb_classes()
    if xgb is not None:  # pragma: no cover - optional dependency
        cls = xgb[0] if kind == "classifier" else xgb[1]
        return cls(label_col=label_col, features_col=features_col)
    cls = GBTClassifier if kind == "classifier" else GBTRegressor
    return cls(
        labelCol=label_col, featuresCol=features_col, maxIter=max_iter, seed=seed
    )


def cross_validate(
    pipeline: Pipeline,
    grid: list,
    evaluator: Evaluator,
    folds: int = 4,
    seed: int = 42,
    parallelism: int = 4,
) -> CrossValidator:
    """M10: folds x grid model fits; `parallelism` fits run concurrently
    (the reference runs them serially)."""
    return CrossValidator(
        estimator=pipeline,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=folds,
        seed=seed,
        parallelism=parallelism,
    )


def param_grid(stage, **params) -> list:
    """M10 helper: ParamGridBuilder from {param_name: [values...]}."""
    b = ParamGridBuilder()
    for name, values in params.items():
        b = b.addGrid(getattr(stage, name), values)
    return b.build()


def train_test_split(df: DataFrame, train_frac: float = 0.75, seed: int = 42):
    """M13 (seeded, ML_Modeling.py:241)."""
    return df.randomSplit([train_frac, 1.0 - train_frac], seed=seed)


def save_pipeline(model: PipelineModel, path: str) -> None:
    """S11 (ML_Modeling.py:247-253)."""
    model.write().overwrite().save(path)


def load_pipeline(path: str) -> PipelineModel:
    return PipelineModel.load(path)
