"""Word2Vec training → document embedding → ANN roundtrip."""

from __future__ import annotations

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.ml.embed import (
    embed_documents,
    similar_terms,
    train_word2vec,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.similarity import (
    cosine_topk_bruteforce,
)

from .conftest import SF_DIR_SMOKE


def test_word2vec_trains_and_embeds(spark):
    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    model = train_word2vec(docs, vector_size=16, min_count=2)
    vocab = model.getVectors()
    assert vocab.count() > 10
    assert len(vocab.first()["vector"]) == 16

    emb = embed_documents(model, docs)
    assert emb.columns == ["vec_id", "embedding"]
    first = emb.first()
    assert len(first["embedding"]) == 16
    # every doc embedded exactly once
    assert emb.count() == docs.count()


def test_word2vec_synonyms_shape(spark):
    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet")
    model = train_word2vec(docs, vector_size=16, min_count=2)
    term = model.getVectors().first()["word"]
    syn = similar_terms(model, term, top=3)
    rows = syn.collect()
    assert len(rows) == 3
    assert set(syn.columns) == {"word", "similarity"}


def test_trained_embeddings_feed_ann_roundtrip(spark):
    """The full loop: corpus → Word2Vec → doc vectors → brute-force
    cosine ANN over the trained vectors, consumed unchanged by the
    similarity tier."""
    docs = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet").limit(60)
    model = train_word2vec(docs, vector_size=16, min_count=2)
    emb = embed_documents(model, docs).cache()
    queries = emb.limit(3)
    topk = cosine_topk_bruteforce(emb, queries, k=2)
    rows = topk.collect()
    q_ids = {r["query_id"] for r in rows}
    assert len(q_ids) == 3
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]  # self excluded by design
        assert -1.0001 <= r["cosine_sim"] <= 1.0001
        assert r["rank"] in (1, 2)
