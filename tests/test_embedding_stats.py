"""Embedding-stats oracle twin + PCA differential verification.

``embedding_pca_by_label`` is rows-only for the driver (dense SVD has
no SQL twin), so this test supplies the missing evidence: the engine's
top component / explained-variance ratio must match an eigendecomposition
of the covariance matrix computed INDEPENDENTLY by DuckDB from the same
parquet — up to sign, which the operator normalizes away.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.embeddings_stats import (
    per_group_pca,
)
from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.sources.io import (
    load_table,
)

from .conftest import SF_DIR_SMOKE


@pytest.fixture(scope="module")
def duck_cov():
    """Per-label covariance matrices via DuckDB (independent engine)."""
    con = duckdb.connect()
    rows = con.execute(
        "SELECT label, CAST(embedding AS DOUBLE[]) FROM "
        f"read_parquet('{SF_DIR_SMOKE}/embeddings.parquet')"
    ).fetchall()
    con.close()
    by_label: dict[int, list[list[float]]] = {}
    for label, vec in rows:
        by_label.setdefault(label, []).append(vec)
    out = {}
    for label, vecs in by_label.items():
        X = np.array(vecs)
        Xc = X - X.mean(axis=0, keepdims=True)
        out[label] = (len(vecs), (Xc.T @ Xc) / len(vecs))
    return out


def test_pca_matches_duckdb_covariance_eigvector(spark, duck_cov):
    emb = load_table(spark, SF_DIR_SMOKE, "embeddings")
    got = {r["label"]: r for r in per_group_pca(emb).collect()}
    assert set(got) == set(duck_cov)
    for label, (n, cov) in duck_cov.items():
        evals, evecs = np.linalg.eigh(cov)
        lam1, v1 = evals[-1], evecs[:, -1]
        r = got[label]
        assert r["n_vectors"] == n
        # explained-variance ratio vs independent eigenvalues
        assert r["explained_var_ratio"] == pytest.approx(
            lam1 / evals.sum(), abs=1e-4
        )
        # top component up to sign (operator pins the sign; undo it here)
        comp = np.array(r["top_component"])
        cos = abs(float(comp @ v1) / (np.linalg.norm(comp) * np.linalg.norm(v1)))
        assert cos == pytest.approx(1.0, abs=1e-6), (label, cos)


def test_embedding_stats_trace_consistent_with_pca(spark, duck_cov):
    """total_var (the oracle-checked trace) must equal the sum of the
    covariance eigenvalues — tying the driver-graded relational twin to
    the rows-only SVD path."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans.queries import (
        QUERIES,
    )

    stats = {
        r["label"]: r
        for r in QUERIES["embedding_stats_by_label"](spark, SF_DIR_SMOKE).collect()
    }
    for label, (n, cov) in duck_cov.items():
        assert stats[label]["n_vectors"] == n
        assert stats[label]["total_var"] == pytest.approx(
            float(np.trace(cov)), abs=1e-4
        )


def test_pca_power_share_brackets_exact_eigenvalue(spark, duck_cov):
    """The hash-portable power-iteration estimate must bracket the
    exact top eigenvalue: Rayleigh quotients never exceed lambda1, and
    after K=10 steps on this data the estimate stays within 15% (the
    cross-engine EQUALITY is test_queries_oracle's job; this ties the
    estimate to ground truth)."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans.queries import (
        QUERIES,
    )

    got = {
        r["label"]: r
        for r in QUERIES["embedding_pca_power_share"](
            spark, SF_DIR_SMOKE
        ).collect()
    }
    assert set(got) == set(duck_cov)
    for label, (n, cov) in duck_cov.items():
        evals = np.linalg.eigvalsh(cov)
        lam1 = evals[-1]
        r = got[label]
        assert r["n_vectors"] == n
        # Rayleigh quotient is a lower bound (up to round-9 state quantization)
        assert r["lambda1_est"] <= lam1 * (1 + 1e-6), (label, r["lambda1_est"], lam1)
        assert r["lambda1_est"] >= 0.85 * lam1, (label, r["lambda1_est"], lam1)
        assert r["trace"] == pytest.approx(float(evals.sum()), rel=1e-4)


def test_pca_grouped_map_twin_equals_relational_chain(spark):
    """r10 certificate twin (VERDICT r9 stretch #8): the applyInPandas
    power iteration (pca_power_grouped) must reproduce the relational
    driver-loop chain bit-for-bit — same quantized covariance input,
    same per-step round-9 arithmetic, two execution strategies. The
    DuckDB hash equality is test_queries_oracle's job; this pins the
    two SPARK paths to each other, so a drift in either arithmetic
    breaks loudly here."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans.queries import (
        QUERIES,
    )

    twin = sorted(
        tuple(r)
        for r in QUERIES["embedding_pca_label_top_eig"](
            spark, SF_DIR_SMOKE
        ).collect()
    )
    chain = sorted(
        tuple(r)
        for r in QUERIES["embedding_pca_power_share"](
            spark, SF_DIR_SMOKE
        ).collect()
    )
    assert twin == chain and len(twin) > 0
