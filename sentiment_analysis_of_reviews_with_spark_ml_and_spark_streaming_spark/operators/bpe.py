"""Distributed BPE merge training (Sennrich et al. 2016 shape).

The one LLM-pipeline stage the counting/chunking tier doesn't cover:
LEARNING the tokenizer, not applying one. Classic BPE trains on the
word-frequency table (not the raw corpus — a corpus of any size
collapses to |vocab| rows weighted by count, which is what makes this
tractable at 100 TB: one corpus-wide word count, then iterations touch
only the compact state table).

Algorithm per merge step, all DataFrame ops:
1. pair counts: each word's current token sequence contributes its
   adjacent pairs weighted by word frequency (explode + groupBy — a
   map-side-combined aggregation on the small state table);
2. best pair: global argmax with deterministic tiebreak
   (count DESC, a ASC, b ASC) — a 1-ROW driver collect per step,
   the same bounded-scalar pattern as k-means convergence checks;
3. apply: token sequences are kept as delimiter-joined strings
   ('·h·e·l·l·o·') and the merge is ``replace('·a·b·' → '·ab·')``
   applied ``replace_passes`` times — replace() is greedy
   left-to-right non-overlapping in every engine, and repeated
   passes catch matches whose leading delimiter was consumed by the
   previous replacement ('·a·b·a·b·' → '·ab·ab·' after 2; pass 3 is
   margin). String-replace semantics were chosen over a
   sequential-scan HOF because they are IDENTICAL in Spark and the
   DuckDB oracle — the whole training loop is therefore
   value-hash-certifiable cross-engine (queries.q_bpe_merge_training).

Deviation from canonical BPE, documented: for immediately repeated
pairs the delimiter-consuming replace can defer a merge to the next
pass; with >= 2 passes the end state matches greedy BPE on every case
exercised (property tests in tests/test_bpe.py pin 'aaa', 'ababab',
and random fixtures against a reference Python implementation).

The delimiter '·' (U+00B7) is stripped from input text defensively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEP = "·"


def _spaced(col):
    """word -> '·c·h·a·r·s·' (initial single-char token sequence)."""
    return F.concat(
        F.lit(SEP), F.array_join(F.split(col, ""), SEP), F.lit(SEP)
    )


def word_freq_table(
    docs: DataFrame, *, text_col: str = "text", min_len: int = 2
) -> DataFrame:
    """(word, wcount) — the compact training input BPE iterates on."""
    w = F.explode(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    ).alias("w")
    return (
        docs.select(w)
        .withColumn("w", F.replace(F.col("w"), F.lit(SEP), F.lit("")))
        .filter(F.length("w") >= min_len)
        .groupBy("w")
        .agg(F.count("*").alias("wcount"))
    )


def _pair_counts(state: DataFrame) -> DataFrame:
    toks = F.expr(f"filter(split(s, '{SEP}'), x -> x <> '')")
    n = F.size(toks)
    pairs = F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("a"), F.slice(toks, 2, n - 1).alias("b")
    )
    return (
        state.select(F.explode(pairs).alias("p"), "wcount")
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "wcount")
        .groupBy("a", "b")
        .agg(F.sum("wcount").alias("pair_count"))
    )


def learn_bpe_merges(
    docs: DataFrame,
    *,
    n_merges: int = 3,
    text_col: str = "text",
    replace_passes: int = 3,
) -> DataFrame:
    """Returns the learned merge table:
    (step, a, b, merged, pair_count)."""
    spark = docs.sparkSession
    state = word_freq_table(docs, text_col=text_col).select(
        _spaced(F.col("w")).alias("s"), "wcount"
    )
    merges: list[tuple] = []
    # The previous iteration's cache is released only AFTER the current
    # pair-count collect has materialized the new state from it —
    # unpersisting before the derived state is ever computed (the old
    # code) made every iteration replay the whole merge chain from the
    # raw word table: O(n_merges²) recomputation.
    # Scale note: persist() shortcuts EXECUTION but not lineage, so
    # plan-analysis cost still grows with the merge chain (~O(n²)
    # total). Fine at the certified n_merges=3..tens; for a real
    # 30k-merge tokenizer run, swap the persist for
    # localCheckpoint(eager=True) (the CC pointer-doubling pattern,
    # dedup.py) to truncate lineage and keep analysis O(1) per step.
    cached_prev: DataFrame | None = None
    for step in range(1, n_merges + 1):
        state = state.persist()
        best_rows = (
            _pair_counts(state)
            .orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if cached_prev is not None:
            cached_prev.unpersist()
        cached_prev = state
        if not best_rows:
            break
        best = best_rows[0]
        a, b, cnt = best["a"], best["b"], int(best["pair_count"])
        merges.append((step, a, b, a + b, cnt))
        pat, rep = F.lit(f"{SEP}{a}{SEP}{b}{SEP}"), F.lit(f"{SEP}{a+b}{SEP}")
        s = F.col("s")
        for _ in range(replace_passes):
            s = F.replace(s, pat, rep)
        nxt = state.select(s.alias("s"), "wcount")
        state = nxt
    if cached_prev is not None:
        cached_prev.unpersist()
    return spark.createDataFrame(
        merges, "step int, a string, b string, merged string, pair_count long"
    )


def apply_bpe_merges(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    replace_passes: int = 3,
) -> DataFrame:
    """Tokenize with a learned merge list: per word, replay the merges
    in order (same replace semantics as training). Adds a
    ``bpe_tokens`` array column; pure projection, zero shuffle."""
    word_arr = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")

    def tokenize_word(w):
        # strip the SEP delimiter from input words exactly like the
        # training path (word_freq_table) — otherwise a word containing
        # the delimiter tokenizes differently at train vs apply time
        w = F.replace(w, F.lit(SEP), F.lit(""))
        s = F.concat(F.lit(SEP), F.array_join(F.split(w, ""), SEP), F.lit(SEP))
        for a, b in merges:
            for _ in range(replace_passes):
                s = F.replace(
                    s,
                    F.lit(f"{SEP}{a}{SEP}{b}{SEP}"),
                    F.lit(f"{SEP}{a}{b}{SEP}"),
                )
        return F.filter(F.split(s, SEP), lambda x: x != "")

    return docs.withColumn(
        "bpe_tokens",
        F.flatten(F.transform(word_arr, tokenize_word)),
    )
