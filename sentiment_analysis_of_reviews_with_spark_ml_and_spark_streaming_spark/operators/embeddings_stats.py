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
