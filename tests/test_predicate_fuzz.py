"""Differential fuzz of the lakehouse predicate-pruning layer
(VERDICT r9 stretch #9).

The escaped-quote fix (r9) closed one unsound-pruning hole found by
reading `_mask_strings`; this closes the CLASS: a seeded grammar
composes predicates from comparisons, BETWEEN, IN, AND/OR/NOT,
parentheses, and string equalities whose literals contain hostile
comparator-looking text (escaped quotes, `k > 100`, `k IN (1,2)`,
backslashes, both quote styles) — then

1. soundness of `_extract_bounds` / `_extract_in_values` is checked
   against SPARK's own evaluation of the predicate (every matching
   row's value must fall inside the extracted range / value set), and
2. the end-to-end `_prune_by_predicate` candidate set must yield the
   same matched rows as an unpruned full-table read.

Pruning may only ever OVER-approximate: a pruned-away file containing
a matching row is a silent wrong answer (missed DELETE), which is
exactly what these properties falsify.
"""

from __future__ import annotations

import os
import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
    table_format as tf,
)

N_SOUNDNESS = int(os.environ.get("FUZZ_MAX_EXAMPLES", "8")) * 10
N_END_TO_END = max(6, int(os.environ.get("FUZZ_MAX_EXAMPLES", "8")))

# hostile note VALUES: comparator text, IN-lists, escaped quotes (both
# SQL '' doubling and backslash), both quote styles, BETWEEN/NOT text
NOTES = [
    "k > 100",
    "k IN (1,2)",
    "it's",
    'he said "k = 5"',
    "x' OR k < 3",
    "a''b",
    "BETWEEN 1 AND 9",
    "NOT k = 4",
    "plain",
    "back\\slash",
    # comparator text BETWEEN embedded quotes: with backslash-escaped
    # rendering the pre-r9 masker re-paired the quotes around the
    # comparator, leaving `k > 9` LIVE in the masked predicate — the
    # unsound-tightening shape the r9 fix closed (verified: the
    # soundness fuzz goes red under the old masker on these)
    "don't use k < 2",
    "a' k > 9 z '",
    "b' k = 0 y '",
    'c" val > 20 w "',
]


def _sql_str(v: str, style: str = "double") -> str:
    """Render a Python string as a Spark SQL literal. ``double``
    doubles the quote char (portable SQL); ``backslash`` uses \\'
    escapes (Spark accepts both — and ONLY the backslash style
    reproduces the pre-r9 unsound re-pairing, so the fuzzer mixes
    them)."""
    if style == "backslash":
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    return "'" + v.replace("\\", "\\\\").replace("'", "''") + "'"


def _atom(rng: random.Random) -> str:
    ops = ["<", "<=", ">", ">=", "="]
    kind = rng.randrange(8)
    if kind == 0:
        return f"k {rng.choice(ops)} {rng.randint(-5, 25)}"
    if kind == 1:
        return f"{rng.randint(-5, 25)} {rng.choice(ops)} k"
    if kind == 2:
        a = rng.randint(-5, 20)
        return f"k BETWEEN {a} AND {a + rng.randint(0, 10)}"
    if kind == 3:
        vals = sorted(rng.sample(range(-2, 22), rng.randint(1, 4)))
        return f"k IN ({', '.join(map(str, vals))})"
    if kind == 4:
        style = rng.choice(["double", "backslash"])
        return f"note = {_sql_str(rng.choice(NOTES), style)}"
    if kind == 5:
        style = rng.choice(["double", "backslash"])
        return f"note != {_sql_str(rng.choice(NOTES), style)}"
    if kind == 6:
        return f"val {rng.choice(ops)} {rng.randint(-5, 25)}.5"
    return "note LIKE '%>%'"


def _pred(rng: random.Random, depth: int = 0) -> str:
    r = rng.randrange(10)
    if depth >= 3 or r < 4:
        return _atom(rng)
    if r < 7:
        return f"({_pred(rng, depth + 1)} AND {_pred(rng, depth + 1)})"
    if r < 9:
        return f"({_pred(rng, depth + 1)} OR {_pred(rng, depth + 1)})"
    return f"NOT ({_pred(rng, depth + 1)})"


def _table_rows():
    return [
        Row(k=i, note=NOTES[i % len(NOTES)], val=float(i) - 3.0)
        for i in range(40)
    ]


def test_fuzz_bound_extraction_sound_vs_spark_filter(spark):
    """For every generated predicate and every row SPARK says matches:
    the row's k must lie inside _extract_bounds' range and inside
    _extract_in_values' value set (when extracted), for both the long
    and the double column. All predicates evaluate in ONE Spark job
    (each as a boolean projection)."""
    rng = random.Random(100)
    preds = [_pred(rng) for _ in range(N_SOUNDNESS)]
    df = spark.createDataFrame(_table_rows())
    cols = [
        F.coalesce(F.expr(f"({p})"), F.lit(False)).alias(f"p{i}")
        for i, p in enumerate(preds)
    ]
    rows = df.select("k", "val", *cols).collect()
    for i, p in enumerate(preds):
        matched = [r for r in rows if r[f"p{i}"]]
        for col, attr in (("k", "k"), ("val", "val")):
            bounds = tf._extract_bounds(p, col)
            if bounds is not None:
                lo, hi = bounds
                for r in matched:
                    v = r[attr]
                    assert v is not None, (p, col)
                    assert lo is None or v >= lo, (p, col, v, bounds)
                    assert hi is None or v <= hi, (p, col, v, bounds)
            vals = tf._extract_in_values(p, col)
            if vals is not None:
                for r in matched:
                    assert r[attr] in vals, (p, col, r[attr], vals)


def test_fuzz_pruned_read_equals_unpruned(spark, tmp_path):
    """End-to-end: the _prune_by_predicate candidate files + filter
    must return exactly the rows a full-table read + filter returns —
    a pruned-away file with a matching row is a missed DELETE."""
    root = str(tmp_path / "t")
    tf.create_table(
        spark.createDataFrame(_table_rows()).repartitionByRange(8, "k"),
        root,
        stat_cols=["k", "note", "val"],
    )
    live, schema = tf.snapshot_files(root, tf.latest_version(root))
    from pyspark.sql.types import StructType

    st = StructType.fromJson(schema)
    full = tf.read_files(spark, root, live, st)
    rng = random.Random(200)
    n_pruned_something = 0
    for _ in range(N_END_TO_END):
        p = _pred(rng)
        want = sorted(
            r["k"] for r in full.filter(f"coalesce(({p}), false)").collect()
        )
        for prune_col in ("k", "note", "val"):
            cands = tf._prune_by_predicate(live, p, prune_col)
            if len(cands) < len(live):
                n_pruned_something += 1
            got = (
                sorted(
                    r["k"]
                    for r in tf.read_files(spark, root, cands, st)
                    .filter(f"coalesce(({p}), false)")
                    .collect()
                )
                if cands
                else []
            )
            assert got == want, (p, prune_col, got, want)
    # the fuzz must actually EXERCISE pruning, not vacuously pass
    # because every predicate disabled it
    assert n_pruned_something > 0
