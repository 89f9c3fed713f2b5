"""mapInArrow operators: columnar Python without the pandas detour.

mapInPandas pays Arrow→pandas→Arrow conversion per batch (object
boxing for strings, index allocation, copy for list columns).
mapInArrow hands the Python function raw ``pyarrow.RecordBatch``es —
for pure-numeric kernels over list columns (embeddings), numpy can
operate directly on the Arrow buffers with ZERO row materialization.
This is the lowest-overhead Python escape hatch PySpark has; at 100 TB
it is the difference between the Python stage being conversion-bound
and compute-bound.

Kept to the same discipline as the rest of the repo: an equivalence
test pins the kernel to the native-expression twin
(tests/test_arrow_ops.py), and the native twin is the default for
anything a HOF expression can say.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_embeddings_arrow(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """L2-normalize an embedding column via mapInArrow.

    The kernel reshapes each batch's list<float> buffer to an (n, d)
    numpy view (embeddings are fixed-dimension), computes row norms
    with one BLAS-free vectorized pass, and rebuilds the list array
    from the scaled buffer — no per-row Python, no pandas objects.
    Zero-norm rows pass through unscaled (norm reported as 0.0) so the
    operator is total.

    Native twin (the expression-only spelling, equal within fp
    tolerance): ``sqrt(aggregate(zip_with(v, v, (a,b) -> a*b), ...))``
    and ``transform(v, x -> x / norm)``.
    """
    import numpy as np
    import pyarrow as pa

    out_schema = f"{id_col} long, unit array<float>, norm double"

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            ids = rb.column(rb.schema.get_field_index(id_col))
            emb = rb.column(rb.schema.get_field_index(vec_col))
            if isinstance(emb, pa.ChunkedArray):  # pragma: no cover
                emb = emb.combine_chunks()
            lst = emb
            n = len(lst)
            if n == 0:
                continue
            # raise, don't assert: `python -O` strips asserts and the
            # reshape below would then silently misalign rows; a null
            # list element has width 0 in the offsets diff, so reject
            # it with a message that names the actual problem
            if lst.null_count:
                raise ValueError(
                    f"{vec_col} contains {lst.null_count} null embedding(s); "
                    "drop or impute them before normalize_embeddings_arrow"
                )
            flat = lst.values.to_numpy(zero_copy_only=False)
            offsets = lst.offsets.to_numpy(zero_copy_only=False)
            widths = np.diff(offsets)
            d = int(widths[0]) if n else 0
            if not (widths == d).all():
                raise ValueError(
                    f"ragged {vec_col} column: widths "
                    f"{sorted(set(widths.tolist()))[:5]}… (expected {d})"
                )
            mat = flat[offsets[0] : offsets[-1]].reshape(n, d).astype(
                "float64", copy=False
            )
            norms = np.sqrt((mat * mat).sum(axis=1))
            safe = np.where(norms == 0.0, 1.0, norms)
            unit = (mat / safe[:, None]).astype("float32")
            unit_arr = pa.FixedSizeListArray.from_arrays(
                pa.array(unit.ravel(), type=pa.float32()), d
            ).cast(pa.list_(pa.float32()))
            yield pa.RecordBatch.from_arrays(
                [ids, unit_arr, pa.array(norms, type=pa.float64())],
                [id_col, "unit", "norm"],
            )

    return df.select(id_col, vec_col).mapInArrow(kernel, out_schema)


def normalize_embeddings_native(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Expression-only twin: stays in codegen, no Python stage."""
    v = F.col(vec_col)
    norm = F.sqrt(
        F.aggregate(
            F.zip_with(v, v, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    unit = F.when(norm == 0.0, v).otherwise(
        F.transform(v, lambda x: (x / norm).cast("float"))
    )
    return df.select(
        F.col(id_col),
        unit.alias("unit"),
        F.when(norm == 0.0, F.lit(0.0)).otherwise(norm).alias("norm"),
    )


def label_centroids_arrow(
    df: DataFrame,
    *,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label embedding centroid + mean norm via applyInArrow — the
    GROUPED Arrow entry point (completes the matrix: mapInArrow for
    stateless kernels, this for per-group kernels, both pandas-free).
    Each group's list<float> column reshapes to an (n, d) numpy view
    and reduces in one vectorized pass; output is one row per label.

    Native twin (tested equal): posexplode + groupBy(label, dim) avg +
    re-assemble — many shuffled rows vs one Arrow batch per group. At
    100 TB the expression path wins when d is small (stays in codegen);
    the Arrow path wins for wide vectors where exploding d rows per
    embedding multiplies shuffle volume by the dimension.
    """
    import numpy as np
    import pyarrow as pa

    # deliberately UNannotated: with PEP 563 postponed annotations the
    # hints arrive as strings, applyInArrow's eval-type inference
    # raises, and pyspark 4.1's except-path leaves eval_type unbound
    # (UnboundLocalError) — no hints → clean None → correct default
    def kernel(key, table):
        lst = table.column(vec_col).combine_chunks()
        if isinstance(lst, pa.ChunkedArray):  # pragma: no cover
            lst = lst.combine_chunks()
        n = len(lst)
        flat = lst.values.to_numpy(zero_copy_only=False)
        offsets = lst.offsets.to_numpy(zero_copy_only=False)
        d = int(offsets[1] - offsets[0]) if n else 0
        mat = flat[offsets[0] : offsets[-1]].reshape(n, d).astype("float64")
        centroid = mat.mean(axis=0)
        norms = np.sqrt((mat * mat).sum(axis=1))
        return pa.table(
            {
                label_col: pa.array([key[0].as_py()], type=pa.int32()),
                "n_vectors": pa.array([n], type=pa.int64()),
                "centroid": pa.array(
                    [centroid.tolist()], type=pa.list_(pa.float64())
                ),
                "mean_norm": pa.array(
                    [float(norms.mean())], type=pa.float64()
                ),
            }
        )

    return df.groupBy(label_col).applyInArrow(
        kernel,
        schema=(
            f"{label_col} int, n_vectors long, centroid array<double>, "
            "mean_norm double"
        ),
    )
