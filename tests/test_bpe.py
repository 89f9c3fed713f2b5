"""BPE merge training vs a canonical reference implementation."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators.bpe import (
    apply_bpe_merges,
    learn_bpe_merges,
    word_freq_table,
)


def _ref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Canonical greedy BPE (Sennrich et al.): pair counts over the
    word-frequency table, argmax with (count desc, a asc, b asc)
    tiebreak, left-to-right non-overlapping merge."""
    seqs = {w: list(w) for w in word_freqs}
    merges = []
    for step in range(1, n_merges + 1):
        counts: Counter = Counter()
        for w, toks in seqs.items():
            for i in range(len(toks) - 1):
                counts[(toks[i], toks[i + 1])] += word_freqs[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((step, a, b, a + b, cnt))
        for w, toks in seqs.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            seqs[w] = out
    return merges, seqs


FIXTURE = [
    (1, "low low low lower lowest"),
    (2, "new newer newest west west"),
    (3, "aaa ababab banana"),
]


def test_merges_match_reference(spark):
    docs = spark.createDataFrame(FIXTURE, "doc_id long, text string")
    freqs = {
        r["w"]: r["wcount"] for r in word_freq_table(docs).collect()
    }
    want, _ = _ref_bpe(freqs, 5)
    got = [
        (r["step"], r["a"], r["b"], r["merged"], r["pair_count"])
        for r in learn_bpe_merges(docs, n_merges=5)
        .orderBy("step")
        .collect()
    ]
    assert got == want


def test_apply_matches_reference_final_state(spark):
    docs = spark.createDataFrame(FIXTURE, "doc_id long, text string")
    freqs = {r["w"]: r["wcount"] for r in word_freq_table(docs).collect()}
    ref_merges, ref_seqs = _ref_bpe(freqs, 4)
    merged = apply_bpe_merges(
        docs, [(a, b) for _, a, b, _, _ in ref_merges]
    )
    for row in merged.collect():
        words = [w for w in re.split(r"\s+", row["text"].lower().strip()) if len(w) >= 1]
        want = []
        for w in words:
            want.extend(ref_seqs.get(w, list(w)))
        assert row["bpe_tokens"] == want, (row["text"], row["bpe_tokens"], want)


def test_token_count_decreases_monotonically(spark):
    docs = spark.createDataFrame(FIXTURE, "doc_id long, text string")
    m = learn_bpe_merges(docs, n_merges=3).collect()
    assert len(m) == 3
    counts = [r["pair_count"] for r in sorted(m, key=lambda r: r["step"])]
    # later merges can never be MORE frequent than what was available
    # earlier (frequencies only shrink as sequences compress)
    assert counts == sorted(counts, reverse=True) or counts[0] >= counts[-1]
