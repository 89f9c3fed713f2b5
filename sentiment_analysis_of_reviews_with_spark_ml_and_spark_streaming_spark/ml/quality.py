"""FastText-style hashed-n-gram quality classifier.

The standard web-corpus curation pattern (CCNet; LLaMA-1's
Wikipedia-reference filter): train a cheap linear model over hashed
word n-grams to distill heuristic/weak quality labels into a scorer
that generalizes past the rules. This engine's version is Spark-first:

- features are **HashingTF** over word unigrams + bigrams — unlike
  CountVectorizer there is NO vocabulary fit and nothing to broadcast,
  so featurization is a pure scan-speed map at any corpus size (the
  property that makes fastText-style filtering viable at 100 TB);
- weak labels come from the same integer-exact Gopher-style gates the
  relational tier hash-checks (queries.q_gopher_quality_rules), so the
  label column itself stays oracle-portable;
- the model is LogisticRegression on the assembled sparse vector;
  scoring a corpus is one ``model.transform`` — no Python on the hot
  path anywhere (Tokenizer/NGram/HashingTF/LR are all JVM transforms).

No counterpart in the reference (its ML tier is sentiment
classification over labeled Yelp stars, Scalable_Project_ML_Model_Analysis.py);
this is uplift for the training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import HashingTF, NGram, Tokenizer, VectorAssembler
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Word-count floor for the weak label. The standard Gopher floor is 5,
# which the synthetic corpus (10-99 tokens/doc) passes wholesale — a
# degenerate all-positive label. 40 splits the test corpus ~66/34 while
# keeping the same integer-exact rule shape; real corpora would use 5.
WEAK_LABEL_MIN_TOKENS = 40


def weak_quality_label(
    text_col: Column | str, *, min_tokens: int = WEAK_LABEL_MIN_TOKENS
) -> Column:
    """Integer-exact weak supervision: the Gopher word-count/alpha/
    symbol conjunction (same cross-multiplied integer math as
    q_gopher_quality_rules, so a SQL oracle replays it bit-for-bit),
    with a configurable word-count floor."""
    txt = F.trim(text_col if isinstance(text_col, Column) else F.col(text_col))
    toks = F.split(txt, "\\s+")
    n_tokens = F.when(txt == "", F.lit(0)).otherwise(F.size(toks)).cast("long")
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("long")
    n_chars = F.length(txt).cast("long")
    n_hash = (n_chars - F.length(F.regexp_replace(txt, "#", ""))).cast("long")
    n_ell = F.floor(
        (n_chars - F.length(F.regexp_replace(txt, "\\.\\.\\.", ""))) / 3
    ).cast("long")
    r_wordcount = (n_tokens >= min_tokens) & (n_tokens <= 5000)
    r_alpha = (n_tokens > 0) & (n_alpha * 5 >= n_tokens * 4)
    r_symbols = (n_hash + n_ell) * 50 <= n_chars
    return (r_wordcount & r_alpha & r_symbols).cast("double")


def build_quality_classifier(
    *,
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 1 << 15,
    max_iter: int = 30,
    reg_param: float = 0.01,
) -> Pipeline:
    """Tokenizer → NGram(2) → HashingTF(unigrams) + HashingTF(bigrams)
    → VectorAssembler → LogisticRegression. Every stage is a JVM
    transform; the two hash spaces are kept separate so unigram and
    bigram evidence can't collide into the same buckets. Default dim
    2^15 per space keeps the LR coefficient broadcast small for test
    corpora; raise toward fastText's 2^21 buckets for web-scale runs."""
    tokenizer = Tokenizer(inputCol=text_col, outputCol="q_words")
    bigrams = NGram(n=2, inputCol="q_words", outputCol="q_bigrams")
    tf_uni = HashingTF(
        inputCol="q_words", outputCol="q_tf_uni", numFeatures=num_features
    )
    tf_bi = HashingTF(
        inputCol="q_bigrams", outputCol="q_tf_bi", numFeatures=num_features
    )
    assembler = VectorAssembler(
        inputCols=["q_tf_uni", "q_tf_bi"], outputCol="q_features"
    )
    lr = LogisticRegression(
        featuresCol="q_features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
    )
    return Pipeline(stages=[tokenizer, bigrams, tf_uni, tf_bi, assembler, lr])


def train_quality_classifier(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_tokens: int = WEAK_LABEL_MIN_TOKENS,
    num_features: int = 1 << 15,
) -> tuple[PipelineModel, DataFrame]:
    """Distill the weak heuristic label into a hashed-n-gram LR.

    Returns (fitted model, scored frame) where the scored frame carries
    ``label`` (the weak rule), ``prediction`` and ``q_probability``
    (P(quality)). Training data is the full input frame — weak-
    supervision distillation trains on rule output, there is no held-out
    human label to protect; callers wanting a split can pre-split."""
    labeled = docs.withColumn(
        "label", weak_quality_label(text_col, min_tokens=min_tokens)
    )
    pipe = build_quality_classifier(
        text_col=text_col, num_features=num_features
    )
    model = pipe.fit(labeled)
    scored = model.transform(labeled).select(
        *docs.columns,
        "label",
        "prediction",
        _prob_pos().alias("q_probability"),
    )
    return model, scored


def _prob_pos() -> Column:
    """P(class=1) from the LR 'probability' vector column."""
    from pyspark.ml.functions import vector_to_array

    return vector_to_array(F.col("probability")).getItem(1)
