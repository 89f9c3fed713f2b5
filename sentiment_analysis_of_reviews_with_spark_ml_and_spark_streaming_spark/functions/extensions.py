"""User-extension surface: Python UDTF + grouped-agg (UDAF) pandas UDF.

SURVEY.md §2.8 records the reference's UDF surface as four row-at-a-time
lambdas and notes "No UDAFs, no UDTFs" — every reference UDF is replaced
by native expressions elsewhere in this package. This module is the
OTHER half of §2.8: the extension points a user of this engine gets for
semantics the built-ins genuinely can't express.

Design stance (same as the rest of the repo): these are the slow path.
Each extension ships with a native twin and an equivalence test
(tests/test_extensions.py) so the cost of leaving codegen is always a
measured choice, not an accident:

- ``SplitSentences`` (UDTF, arrow-optimized): table function emitting
  one row per sentence with its ordinal. Native twin:
  posexplode(split(...)). UDTFs matter as API surface because they are
  SQL-callable (``SELECT s.* FROM docs, split_sentences(text) s``) —
  the extension a SQL-only user can reach without touching Python
  DataFrame code.
- ``geometric_mean`` (UDAF via pandas_udf GROUPED_AGG, Arrow-batched):
  per-group aggregate over numpy. Native twin:
  exp(avg(ln(x))). Grouped-agg pandas UDFs are the only user-defined
  TRUE aggregate surface in PySpark (they also work as window
  functions over unbounded frames).

At 100 TB both run distributed (per-task Arrow batches; no driver
involvement), but neither participates in whole-stage codegen and the
UDTF additionally blocks partial aggregation of anything above it —
prefer the native twins in hot paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SENTENCE_SPLIT = r"(?<=[.!?])\s+"


class SplitSentences:
    """Python UDTF: one output row per non-empty sentence.

    SQL-callable after ``register_extensions(spark)``:
    ``SELECT d.doc_id, s.pos, s.sentence
      FROM docs d, split_sentences(d.text) s``.
    """

    def eval(self, text: str | None):  # noqa: D102 — UDTF contract
        if not text:
            return
        import re

        pos = 0
        for raw in re.split(_SENTENCE_SPLIT, text):
            s = raw.strip()
            if s:
                yield (pos, s)
                pos += 1


def split_sentences_native(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Native twin of the UDTF: posexplode over a codegen'd regex split
    (what a hot path should use). Keeps (pos, sentence) semantics
    identical: non-empty trimmed sentences, 0-based ordinal."""
    parts = F.split(F.col(text_col), _SENTENCE_SPLIT)
    trimmed = F.filter(
        F.transform(parts, lambda s: F.trim(s)), lambda s: s != ""
    )
    return df.select(
        *df.columns, F.posexplode(trimmed).alias("pos", "sentence")
    )


def geometric_mean_udaf():
    """Grouped-agg pandas UDF (the PySpark UDAF surface): geometric
    mean via numpy over each group's Arrow batch. Returns the UDF
    object; apply as ``df.groupBy(k).agg(geometric_mean_udaf()(col))``.
    """
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # functionType passed explicitly: this module uses postponed
    # annotations (PEP 563), which stringifies type hints and defeats
    # pandas_udf's eval-type inference
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def geometric_mean(v):
        arr = v.to_numpy(dtype="float64")
        arr = arr[arr > 0]
        if arr.size == 0:
            return float("nan")
        return float(np.exp(np.log(arr).mean()))

    return geometric_mean


def geometric_mean_native(col):
    """Native twin: exp(avg(ln(x))) over positive values — stays in
    codegen and keeps partial aggregation (map-side combine), which the
    pandas UDAF gives up."""
    x = F.col(col) if isinstance(col, str) else col
    pos = F.when(x > 0, F.log(x))
    return F.exp(F.avg(pos))


def register_extensions(spark: SparkSession) -> None:
    """Make the UDTF callable from SQL. Arrow-optimized: batches cross
    the Python boundary columnar instead of pickled row-at-a-time."""
    from pyspark.sql.functions import udtf

    spark.udtf.register(
        "split_sentences",
        udtf(
            SplitSentences,
            returnType="pos int, sentence string",
            useArrow=True,
        ),
    )
