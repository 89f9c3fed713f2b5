"""Sentiment ML pipeline: Tokenizer → StopWordsRemover →
CountVectorizer → IDF → {LinearSVC | LogisticRegression | NaiveBayes}.

The reference fits and persists these as four separate objects, then
detours through deprecated RDD mllib (LabeledPoint maps at
Scalable_Project_ML_Model_Analysis.py:195-196, SVMWithSGD at
Scalable_Project_SVM_Model_Deployment.py:228-230, per-batch model
re-loads at Prediction_Pipe_Line.py:70-84). We keep the entire chain
one ``pyspark.ml.Pipeline`` — every stage is a DataFrame transform,
save/load is a single ``PipelineModel`` path, and the fitted model
transforms batch and streaming frames identically.

Hyperparameter parity (BASELINE.md): SVM maxIter=50 regParam=0.3;
LogReg maxIter=10 regParam=0.3; NB smoothing=1.0; split 80/20 seed=100.
mllib-SGD → ml-LinearSVC changes the optimizer, so parity is asserted
on F1 (threshold test), not weights (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LinearSVC, LogisticRegression, NaiveBayes
from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.ml.feature import CountVectorizer, IDF, StopWordsRemover, Tokenizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SEED = 100


def build_feature_pipeline(
    *,
    text_col: str = "text",
    stop_words: list[str] | None = None,
    vocab_size: int = 1 << 16,
    min_df: float = 1.0,
) -> list:
    """Feature stages shared by every model (reference fits them thrice)."""
    tokenizer = Tokenizer(inputCol=text_col, outputCol="words")
    remover = StopWordsRemover(inputCol="words", outputCol="words_nsw")
    if stop_words is not None:
        remover.setStopWords(stop_words)
    cv = CountVectorizer(
        inputCol="words_nsw", outputCol="tf", vocabSize=vocab_size, minDF=min_df
    )
    idf = IDF(inputCol="tf", outputCol="features")
    return [tokenizer, remover, cv, idf]


def build_sentiment_pipeline(
    model: str = "svm",
    *,
    text_col: str = "text",
    label_col: str = "label",
    stop_words: list[str] | None = None,
) -> Pipeline:
    stages = build_feature_pipeline(text_col=text_col, stop_words=stop_words)
    if model == "svm":
        clf = LinearSVC(
            featuresCol="features", labelCol=label_col, maxIter=50, regParam=0.3
        )
    elif model == "logreg":
        clf = LogisticRegression(
            featuresCol="features", labelCol=label_col, maxIter=10, regParam=0.3
        )
    elif model == "nb":
        clf = NaiveBayes(
            featuresCol="features", labelCol=label_col, smoothing=1.0
        )
    else:
        raise ValueError(f"unknown model {model!r}; use svm|logreg|nb")
    return Pipeline(stages=stages + [clf])


def evaluate_f1(predictions: DataFrame, *, label_col: str = "label") -> float:
    """F1 parity with MulticlassClassificationEvaluator(metricName='f1')
    (Scalable_Project_ML_Model_Analysis.py:227-229)."""
    evaluator = MulticlassClassificationEvaluator(
        labelCol=label_col, predictionCol="prediction", metricName="f1"
    )
    return float(evaluator.evaluate(predictions))


def evaluate_auc(predictions: DataFrame, *, label_col: str = "label") -> float:
    """Area under ROC via BinaryClassificationEvaluator — the
    reference imported this evaluator but never used it
    (Scalable_Project_ML_Model_Analysis.py:15-22)."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    score_col = (
        "rawPrediction" if "rawPrediction" in predictions.columns else "prediction"
    )
    evaluator = BinaryClassificationEvaluator(
        labelCol=label_col, rawPredictionCol=score_col, metricName="areaUnderROC"
    )
    return float(evaluator.evaluate(predictions))


def train_and_evaluate(
    df: DataFrame,
    model: str = "svm",
    *,
    label_col: str = "label",
    seed: int = DEFAULT_SEED,
    weights: tuple[float, float] = (0.8, 0.2),
) -> tuple[PipelineModel, float]:
    """80/20 split (seed=100 parity), fit, F1 on held-out."""
    train, test = df.randomSplit(list(weights), seed=seed)
    train = train.cache()
    test = test.cache()
    pipeline = build_sentiment_pipeline(model, label_col=label_col)
    fitted = pipeline.fit(train)
    f1 = evaluate_f1(fitted.transform(test), label_col=label_col)
    return fitted, f1


def inspect_weights(fitted: PipelineModel, top_n: int = 5) -> DataFrame:
    """vocabulary ↔ coefficient table, most-negative first — native
    replacement for the pandas sort at
    Scalable_Project_ML_Model_Analysis.py:235-243."""
    from pyspark.sql import SparkSession

    clf = fitted.stages[-1]
    cv_model = next(
        (s for s in fitted.stages if hasattr(s, "vocabulary")), None
    )
    if cv_model is None:
        raise ValueError("pipeline has no CountVectorizerModel stage")
    if hasattr(clf, "coefficients"):
        coeffs = [float(w) for w in clf.coefficients.toArray()]
    elif hasattr(clf, "theta"):
        # NaiveBayes has no linear coefficients; per-term importance is
        # the class-1 minus class-0 log-likelihood row of theta (same
        # most-negative-first semantics: negative = class-0 evidence)
        th = clf.theta.toArray()
        coeffs = [float(th[1][j] - th[0][j]) for j in range(th.shape[1])]
    else:
        raise TypeError(
            f"final stage {type(clf).__name__} exposes neither "
            "coefficients nor theta — cannot derive term weights"
        )
    vocab = list(cv_model.vocabulary)
    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            "no active SparkSession — inspect_weights must run inside "
            "the session that fitted the pipeline"
        )
    rows = list(zip(vocab, coeffs))
    df = spark.createDataFrame(rows, "word string, weight double")
    return df.orderBy(F.col("weight"), F.col("word")).limit(top_n)
