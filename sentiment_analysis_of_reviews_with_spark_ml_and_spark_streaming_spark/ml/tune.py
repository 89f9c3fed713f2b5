"""Cross-validated hyperparameter tuning.

The reference imports CrossValidator/ParamGridBuilder but never uses
them (Scalable_Project_ML_Model_Analysis.py:15-22, SURVEY.md §2.9
'imported-but-unused tuning surface'); this makes them real.
"""

from __future__ import annotations

from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import DataFrame

from .pipeline import build_sentiment_pipeline


def tune_svm(
    df: DataFrame,
    *,
    reg_params: list[float] | None = None,
    max_iters: list[int] | None = None,
    n_folds: int = 3,
    seed: int = 100,
):
    """Grid-search LinearSVC over (regParam, maxIter) with k-fold CV.

    Returns (best_model: PipelineModel, best_params: dict, avg_f1s).
    Each fold's fit is a distributed job; the grid is driver-scheduled
    (parallelism via CrossValidator's ``parallelism`` param).
    """
    pipeline = build_sentiment_pipeline("svm")
    svc = pipeline.getStages()[-1]
    grid = (
        ParamGridBuilder()
        .addGrid(svc.regParam, reg_params or [0.1, 0.3])
        .addGrid(svc.maxIter, max_iters or [20, 50])
        .build()
    )
    evaluator = MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="prediction", metricName="f1"
    )
    cv = CrossValidator(
        estimator=pipeline,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=n_folds,
        seed=seed,
        parallelism=2,
    )
    model = cv.fit(df)
    best_idx = max(range(len(model.avgMetrics)), key=lambda i: model.avgMetrics[i])
    best = grid[best_idx]
    best_params = {p.name: v for p, v in best.items()}
    return model.bestModel, best_params, list(model.avgMetrics)
