"""End-to-end Yelp workload parity: every stage of the reference's
five scripts as composable DataFrame functions.

Reference stages → our functions:
- Yelp_Data_PreProcessing.py (clean + join 3 CSVs)    → preprocess()
- Scalable_EDA_Final.py (EDA queries)                 → eda_*()
- Scalable_Project_ML_Model_Analysis.py (3-model F1)  → compare_models()
- Scalable_Project_SVM_Model_Deployment.py (persist)  → deploy()
- Prediction_Pipe_Line.py (stream scoring)            → streaming.scoring.score_stream()

Differences by design (documented semantic cleanups, SURVEY.md §7.4):
text cleaning is native expressions (not Python UDFs), the label is
int (the reference's untyped UDF produced strings), the four persisted
objects are one PipelineModel, and dirty rows are quarantined by the
reader instead of mis-parsed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import sentiment_compound, tokenize_ws
from ..operators import clean, relational


def preprocess(
    review: DataFrame, user: DataFrame, business: DataFrame
) -> DataFrame:
    """Batch ETL parity (Yelp_Data_PreProcessing.py:53-158).

    review: review_id,user_id,business_id,stars,date,text,useful,funny,cool
    user: user_id,elite · business: business_id,state,categories
    """
    rev = (
        review.withColumn("label", F.col("stars").try_cast("double"))
        .dropna(subset=["label", "text", "funny", "cool", "useful"])
        .select("review_id", "user_id", "business_id", "label", "stars", "text")
    )
    rev = clean.quarantine_bad_stars(rev, "stars")  # stars>5 mis-parses out
    user_dim = user.select("user_id", "elite").dropDuplicates()
    biz_dim = business.select("business_id", "state", "categories").dropDuplicates()
    joined = relational.join_dim(rev, user_dim, on="user_id", how="left")
    joined = relational.join_dim(joined, biz_dim, on="business_id", how="left")
    return joined.withColumn("text", clean.normalize_text("text"))


def eda_star_distribution(df: DataFrame) -> DataFrame:
    """groupBy(stars).count() (Scalable_EDA_Final.py:286-328)."""
    return (
        df.groupBy("stars").agg(F.count("*").alias("count")).orderBy("stars")
    )


def eda_top_categories(df: DataFrame, k: int = 10, positive_only: bool = True) -> DataFrame:
    """Top-k categories by review count (Scalable_EDA_Final.py:178-189):
    split ';' → explode → junk filter → group-count → top-k."""
    base = df.filter(F.col("label") >= 4) if positive_only else df
    cats = base.select(
        F.explode(F.split(F.col("categories"), ";")).alias("category")
    ).filter(~F.col("category").isin("0", "1") & (F.col("category") != ""))
    counts = cats.groupBy("category").agg(F.count("*").alias("count"))
    return relational.top_k(counts, [F.col("count").desc(), F.col("category")], k)


def eda_elite_vs_non(df: DataFrame) -> DataFrame:
    """Elite vs non-elite star mix (Scalable_EDA_Final.py:247-293).
    'None' is the reference's string sentinel for not-elite."""
    flagged = df.withColumn(
        "is_elite",
        (F.col("elite").isNotNull() & (F.col("elite") != "None")).cast("int"),
    )
    return (
        flagged.groupBy("is_elite", "stars")
        .agg(F.count("*").alias("count"))
        .orderBy("is_elite", "stars")
    )


def eda_word_count_histogram(df: DataFrame, buckets: int = 10) -> DataFrame:
    """Review-length histogram, DataFrame-native (replaces
    .rdd.histogram(10), Scalable_EDA_Final.py:140)."""
    wc = df.select(F.size(tokenize_ws("text")).alias("word_count"))
    return relational.histogram(wc, "word_count", buckets=buckets)


def eda_sentiment_scores(df: DataFrame) -> DataFrame:
    """Lexicon compound score per review (replaces the VADER UDF,
    Scalable_EDA_Final.py:377-386)."""
    return df.select(
        "review_id",
        F.round(sentiment_compound(tokenize_ws("text")), 6).alias("sentiment"),
    )


def add_binary_label(df: DataFrame) -> DataFrame:
    """label := 1 if stars >= 4 else 0 (Yelp_Data_PreProcessing.py:123-126)."""
    return df.withColumn("label", clean.binarize_rating("stars").cast("double"))


def compare_models(df: DataFrame) -> DataFrame:
    """Three-classifier F1 comparison on an 80/20 seed=100 split
    (Scalable_Project_ML_Model_Analysis.py) — returns (model, f1)."""
    from ..ml.pipeline import train_and_evaluate

    labeled = add_binary_label(df).select("text", "label").cache()
    rows = []
    for model in ["svm", "logreg", "nb"]:
        _, f1 = train_and_evaluate(labeled, model)
        rows.append((model, round(f1, 4)))
    spark = df.sparkSession
    return spark.createDataFrame(rows, "model string, f1 double")


def deploy(df: DataFrame, path: str):
    """Train the production SVM pipeline and persist ONE PipelineModel
    (replaces four separate saves,
    Scalable_Project_SVM_Model_Deployment.py:126-237). Returns
    (fitted_model, f1)."""
    from ..ml.pipeline import train_and_evaluate

    labeled = add_binary_label(df).select("text", "label")
    fitted, f1 = train_and_evaluate(labeled, "svm")
    fitted.write().overwrite().save(path)
    return fitted, f1
