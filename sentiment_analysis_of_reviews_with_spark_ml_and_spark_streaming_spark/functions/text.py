"""Scalar text functions, incl. lexicon sentiment scoring.

The reference scores sentiment with an NLTK-VADER Python UDF — one
closure-serialized ``SentimentIntensityAnalyzer`` call per row
(``sia_udf`` at Scalable_EDA_Final.py:377-386). That is the canonical
UDF-as-bottleneck anti-pattern: per-row pickle + GIL-bound Python.

Spark-first re-design, two tiers:

1. ``sentiment_compound`` — lexicon as a Catalyst *map literal*;
   token-wise lookup + sum stays entirely in codegen (zero Python).
   Right answer for lexicons up to a few thousand entries (VADER's
   ~7.5k fits; we ship a compact built-in lexicon and accept
   user-supplied ones).
2. ``sentiment_score_lexicon_join`` — explode tokens and broadcast-join
   a lexicon *DataFrame*; the scale path for arbitrarily large
   lexicons (the join is map-side, no fact shuffle; re-agg by doc id
   is one shuffle with map-side combine).

Compound normalization follows VADER's published formula
score/sqrt(score² + 15) → [-1, 1].
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Compact polarity lexicon (public VADER-style valences, abridged).
SENTIMENT_LEXICON: dict[str, float] = {
    "good": 1.9, "great": 3.1, "excellent": 2.7, "amazing": 2.8,
    "awesome": 3.1, "love": 3.2, "loved": 2.9, "best": 3.2,
    "nice": 1.8, "happy": 2.7, "wonderful": 2.7, "delicious": 2.9,
    "fantastic": 2.6, "perfect": 2.7, "friendly": 2.2, "fresh": 1.3,
    "fast": 0.9, "clean": 1.7, "recommend": 1.5, "tasty": 2.3,
    "bad": -2.5, "terrible": -2.1, "awful": -2.0, "horrible": -2.5,
    "hate": -2.7, "hated": -2.8, "worst": -3.1, "slow": -0.8,
    "dirty": -1.8, "rude": -2.0, "poor": -2.1, "disappointing": -2.1,
    "disappointed": -2.2, "bland": -1.3, "cold": -0.4, "expensive": -0.9,
    "wait": -0.3, "mediocre": -1.0, "gross": -2.1, "stale": -1.5,
}

_NORM = 15.0  # VADER's alpha


def tokenize_ws(col: Column | str) -> Column:
    """Lowercase + whitespace tokenize (Tokenizer parity, no pipeline)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.lower(c)), "\\s+")


def _lexicon_map(lexicon: dict[str, float]) -> Column:
    pairs: list[Column] = []
    for word, val in lexicon.items():
        pairs.append(F.lit(word))
        pairs.append(F.lit(float(val)))
    return F.create_map(*pairs)


def sentiment_compound(
    tokens: Column | str, lexicon: dict[str, float] | None = None
) -> Column:
    """VADER-style compound score over a token array, fully codegen'd.

    raw = Σ valence(token); compound = raw / sqrt(raw² + 15).
    """
    t = F.col(tokens) if isinstance(tokens, str) else tokens
    m = _lexicon_map(lexicon or SENTIMENT_LEXICON)
    raw = F.aggregate(
        t,
        F.lit(0.0),
        lambda acc, tok: acc + F.coalesce(F.element_at(m, tok), F.lit(0.0)),
    )
    return raw / F.sqrt(raw * raw + F.lit(_NORM))


MAP_LITERAL_LEXICON_LIMIT = 1000


def score_sentiment(
    df: DataFrame,
    lexicon: dict[str, float] | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Size-adaptive sentiment scoring → (id_col, compound).

    Small lexicons (≤ ~1000 entries) inline as a Catalyst map literal —
    zero joins, pure codegen. Larger ones (VADER-scale, ~7.5k) switch
    to the broadcast-join path: an inlined map that big bloats the plan
    and codegen, while a broadcast join stays map-side with one
    per-doc re-aggregation. Both paths produce identical scores
    (unit-tested).
    """
    lex = lexicon or SENTIMENT_LEXICON
    if len(lex) <= MAP_LITERAL_LEXICON_LIMIT:
        return df.select(
            F.col(id_col),
            sentiment_compound(tokenize_ws(text_col), lex).alias("compound"),
        )
    spark = df.sparkSession
    lex_df = spark.createDataFrame(
        list(lex.items()), "word string, valence double"
    )
    with_tokens = df.select(
        F.col(id_col), tokenize_ws(text_col).alias("tokens")
    )
    return sentiment_score_lexicon_join(
        with_tokens, lex_df, id_col=id_col, tokens_col="tokens"
    )


def stem_light(col: Column | str) -> Column:
    """Rule-based suffix stripper (Porter step-1-ish), pure regex.

    The reference imports nltk PorterStemmer but never applies it
    (Yelp_Data_PreProcessing.py:15-22, SURVEY.md §2.9 unused-surface);
    this makes a light variant real, engine-side and codegen'd:
    sses→ss, ies→i, ss stays, trailing s drops; ing/ed drop when a
    vowel precedes (len guard via the preceding-stem pattern).
    """
    # capture-group rules (no lookbehind: RE2 oracles can't express it)
    c = F.col(col) if isinstance(col, str) else col
    step = F.regexp_replace(c, "sses$", "ss")
    step = F.regexp_replace(step, "ies$", "i")
    step = F.regexp_replace(step, "([^s])s$", "$1")
    step = F.regexp_replace(step, "([aeiou][a-z])(ing|ed)$", "$1")
    return step


def sentiment_score_lexicon_join(
    df: DataFrame,
    lexicon_df: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Scale path: explode tokens, broadcast-join lexicon(word,valence),
    re-aggregate per document. Returns (id_col, compound).

    One shuffle (the per-doc re-agg, map-side combined); the lexicon
    join itself is broadcast → no fact-side shuffle.
    """
    exploded = df.select(id_col, F.explode_outer(F.col(tokens_col)).alias("word"))
    scored = exploded.join(F.broadcast(lexicon_df), on="word", how="left")
    agg = scored.groupBy(id_col).agg(
        F.sum(F.coalesce(F.col("valence"), F.lit(0.0))).alias("raw")
    )
    return agg.select(
        id_col,
        (F.col("raw") / F.sqrt(F.col("raw") * F.col("raw") + F.lit(_NORM))).alias(
            "compound"
        ),
    )
