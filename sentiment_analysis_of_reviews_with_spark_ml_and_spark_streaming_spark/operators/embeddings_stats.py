"""Grouped numerical operators over embedding columns.

``per_group_pca`` is the honest ``applyInPandas`` use-case: per-group
dense linear algebra (SVD) that no relational rewrite expresses — the
grouped-map form ships each group to one Python worker as an Arrow
batch and returns a small typed result. Everything expressible
relationally (means, z-scores, norms) stays native; see
plans/queries.py zscore query for the contrast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

PCA_SCHEMA = T.StructType(
    [
        T.StructField("label", T.IntegerType()),
        T.StructField("n_vectors", T.LongType()),
        T.StructField("explained_var_ratio", T.DoubleType()),
        T.StructField("top_component", T.ArrayType(T.DoubleType())),
    ]
)


def per_group_pca(
    df: DataFrame, *, group_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Top principal component + explained-variance ratio per group.

    Deterministic: numpy SVD with the component's sign normalized by
    its largest-magnitude coordinate. Groups stream through
    applyInPandas (one Arrow batch per group), so the shuffle carries
    raw vectors once and the result is one tiny row per group.
    """

    def pca(pdf: pd.DataFrame) -> pd.DataFrame:
        # a NULL group key arrives as NaN (int() would throw and abort
        # the whole job) and NULL vectors break np.stack — drop both,
        # mirroring SQL aggregate semantics for NULL groups/inputs
        pdf = pdf[pdf[group_col].notna() & pdf[vec_col].notna()]
        if not len(pdf):
            return pd.DataFrame(
                {
                    "label": pd.Series([], dtype="int64"),
                    "n_vectors": pd.Series([], dtype="int64"),
                    "explained_var_ratio": pd.Series([], dtype="float64"),
                    "top_component": pd.Series([], dtype="object"),
                }
            )
        X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        Xc = X - X.mean(axis=0, keepdims=True)
        # economy SVD: components = rows of Vt
        _, s, vt = np.linalg.svd(Xc, full_matrices=False)
        comp = vt[0]
        # sign convention: largest-|coord| entry is positive
        comp = comp * np.sign(comp[np.argmax(np.abs(comp))] or 1.0)
        var = s**2
        ratio = float(var[0] / var.sum()) if var.sum() > 0 else 0.0
        return pd.DataFrame(
            {
                "label": [int(pdf[group_col].iloc[0])],
                "n_vectors": [len(pdf)],
                "explained_var_ratio": [round(ratio, 6)],
                "top_component": [np.round(comp, 6).tolist()],
            }
        )

    return df.groupBy(group_col).applyInPandas(pca, schema=PCA_SCHEMA)


def pca_power_grouped(cov: DataFrame, *, k: int = 10) -> DataFrame:
    """Fixed-k power iteration + Rayleigh quotient per label, run as an
    applyInPandas grouped map over the quantized coordinate-form
    covariance matrix (label, i, j, a, n_vectors) — the certificate
    twin of the rows-only ``per_group_pca`` SVD path.

    Replicates the relational power chain's arithmetic EXACTLY
    (plans/queries._PCA_POWER_STEP / _PCA_POWER_RAYLEIGH): the iterate
    re-quantizes to 9 decimals every step via shortest-repr HALF_UP — the
    same BigDecimal.valueOf semantics Spark's round(double, n) uses —
    so the grouped-map result hashes identically to the certified SQL
    chain on both engines. The per-label matrix is dim² rounded
    doubles (KB-sized at any corpus scale), so each group's work is
    O(dim²·k) on one worker; the heavy lifting (the covariance build)
    stays relational and shuffles once.
    """
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql import types as T

    label_type = cov.schema["label"].dataType
    out_schema = T.StructType(
        [
            T.StructField("label", label_type),
            T.StructField("n_vectors", T.LongType()),
            T.StructField("trace", T.DoubleType()),
            T.StructField("lambda1_est", T.DoubleType()),
            T.StructField("top_share", T.DoubleType()),
        ]
    )

    def _round(v: float, n: int) -> float:
        # Spark round(double, n) = BigDecimal.valueOf(d) (shortest
        # decimal repr, like Python's repr) setScale(n, HALF_UP)
        return float(
            Decimal(repr(float(v))).quantize(
                Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP
            )
        )

    def power(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[pdf["label"].notna()]
        if not len(pdf):
            return pd.DataFrame(
                {
                    "label": pd.Series([], dtype="int64"),
                    "n_vectors": pd.Series([], dtype="int64"),
                    "trace": pd.Series([], dtype="float64"),
                    "lambda1_est": pd.Series([], dtype="float64"),
                    "top_share": pd.Series([], dtype="float64"),
                }
            )
        pdf = pdf.sort_values(["i", "j"])
        label = pdf["label"].iloc[0]
        n_vectors = int(pdf["n_vectors"].iloc[0])
        a = {
            (int(i), int(j)): float(v)
            for i, j, v in zip(pdf["i"], pdf["j"], pdf["a"])
        }
        dims = sorted({i for i, _ in a})
        x = {i: 1.0 for i in dims}
        for _ in range(k):
            y = {}
            for i in dims:
                s = 0.0
                for j in dims:
                    s += a[(i, j)] * x[j]
                y[i] = s
            m = max(abs(v) for v in y.values())
            div = m if m != 0 else 1.0
            x = {i: _round(y[i] / div, 9) for i in dims}
        trace = 0.0
        for i in dims:
            trace += a[(i, i)]
        xax = 0.0
        for i in dims:
            for j in dims:
                xax += (x[i] * a[(i, j)]) * x[j]
        xx = 0.0
        for i in dims:
            xx += x[i] * x[i]
        # NULL-on-zero, replicating the SQL chain's CASE guards: an
        # all-zero covariance (single vector / identical vectors)
        # zeroes the iterate, so xx = 0 and trace = 0 (r10 sweep)
        lam = None if xx == 0 else _round(xax / xx, 6)
        share = (
            None
            if xx == 0 or trace == 0
            else _round(xax / xx / trace, 6)
        )
        return pd.DataFrame(
            {
                "label": [label],
                "n_vectors": [n_vectors],
                "trace": [_round(trace, 6)],
                # object dtype so None crosses Arrow as a real null
                # (float64 would coerce it to NaN — the cosine_topk
                # lesson, similarity.py)
                "lambda1_est": pd.Series([lam], dtype=object),
                "top_share": pd.Series([share], dtype=object),
            }
        )

    return cov.groupBy("label").applyInPandas(power, schema=out_schema)
