"""Corpus-trained embeddings: Word2Vec → document vectors → ANN.

Closes the embedding loop: the similarity tier (operators/similarity)
consumes a pre-built ``embeddings`` table; this module TRAINS vectors
from raw text so the full pipeline — corpus → train → embed → ANN /
near-dup — runs inside the engine. ``ml.feature.Word2Vec`` is
skip-gram with distributed fit (driver holds vocab × dim, executors
hold partitioned training); the transform averages word vectors into
one vector per document — a DataFrame op, batch- and stream-capable.
"""

from __future__ import annotations

from pyspark.ml.feature import Tokenizer, Word2Vec, Word2VecModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pipeline import DEFAULT_SEED


def train_word2vec(
    docs: DataFrame,
    *,
    text_col: str = "text",
    vector_size: int = 32,
    min_count: int = 2,
    window: int = 5,
    seed: int = DEFAULT_SEED,
) -> Word2VecModel:
    """Fit Word2Vec on tokenized text. Seeded for reproducibility on a
    fixed partitioning (the optimizer is asynchronous, so exact vector
    equality across DIFFERENT partitionings is not guaranteed — pin
    layout when bit-reproducibility matters)."""
    words = Tokenizer(inputCol=text_col, outputCol="_w2v_words").transform(docs)
    w2v = Word2Vec(
        inputCol="_w2v_words",
        outputCol="_w2v_vec",
        vectorSize=vector_size,
        minCount=min_count,
        windowSize=window,
        seed=seed,
    )
    return w2v.fit(words)


def embed_documents(
    model: Word2VecModel,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, embedding array<float>) — mean word vector per doc, shaped
    like the driver's ``embeddings`` table so every ANN / dedup /
    centroid operator downstream consumes it unchanged."""
    words = Tokenizer(inputCol=text_col, outputCol="_w2v_words").transform(
        docs.select(id_col, text_col)
    )
    from pyspark.ml.functions import vector_to_array

    vecs = model.transform(words)
    # ml Vector → array<float>: the similarity operators' native layout
    return vecs.select(
        F.col(id_col).alias("vec_id"),
        vector_to_array(F.col("_w2v_vec"), dtype="float32").alias("embedding"),
    )


def similar_terms(
    model: Word2VecModel, term: str, *, top: int = 5
) -> DataFrame:
    """Nearest vocabulary terms by vector cosine (findSynonyms)."""
    return model.findSynonyms(term, top)
