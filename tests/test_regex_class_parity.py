"""Cross-engine regex-class parity on \\x0B (vertical tab).

Java's ``\\s`` is ``[ \\t\\n\\x0B\\f\\r]`` while RE2's (DuckDB) lacks
``\\x0B`` — so any shorthand whitespace class shared between a Spark
expression and its DuckDB twin silently diverges on vertical-tab
text. The r11 ADVICE caught one site (the c4 rstrip); the r12 sweep
spelled the class out byte-for-byte across all ~80 oracle-twin sites
(`plans/queries.py`), `textstats.TRAILING_WS_PATTERN`,
`textstats.BPE_ISH_PATTERN`, `clean.PHONE_PATTERN`, and
`clean.URL_PATTERN`. These tests pin the parity on adversarial
\\x0B-bearing inputs so the class cannot silently re-enter.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.operators import (
    clean,
    textstats,
)

WS_CLASS = "[ \\t\\n\\x0B\\f\\r]"
SAMPLES = [
    "plain words here",
    "vertical\x0btab between",
    "ends with period.\x0b",
    "tab\tand\x0bmix .",
    " \x0b ",
    "",
]


def _duck_one(sql: str):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchone()[0]
    finally:
        con.close()


def test_word_split_counts_match_on_vtab(spark):
    """Spark's Java \\s+ split == DuckDB's explicit-class split."""
    for s in SAMPLES:
        lit = s.replace("'", "''")
        spark_n = (
            spark.range(1)
            .select(
                F.when(F.trim(F.lit(s)) == "", 0)
                .otherwise(F.size(F.split(F.trim(F.lit(s)), "\\s+")))
                .alias("n")
            )
            .collect()[0]["n"]
        )
        duck_n = _duck_one(
            f"SELECT CASE WHEN trim('{lit}') = '' THEN 0 ELSE "
            f"len(string_split_regex(trim('{lit}'), '{WS_CLASS}+')) END"
        )
        assert spark_n == duck_n, (s, spark_n, duck_n)


def test_tokenize_ws_pattern_is_spelled_class(spark):
    """tokenize_ws must carry the byte-identical spelled class (not
    Java's \\s shorthand) so every twin that mirrors it stays
    textually identical, and must still tokenize \\x0B as whitespace
    (Java-\\s-equivalent behavior pin)."""
    from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.functions import (
        text,
    )

    assert text.WS_SPLIT_PATTERN == WS_CLASS + "+"
    for s in SAMPLES:
        lit = s.replace("'", "''")
        toks = (
            spark.range(1)
            .select(text.tokenize_ws(F.lit(s)).alias("t"))
            .collect()[0]["t"]
        )
        duck = _duck_one(
            f"SELECT string_split_regex(trim(lower('{lit}')), "
            f"'{WS_CLASS}+')"
        )
        assert toks == duck, (s, toks, duck)


def test_trailing_ws_strip_matches_on_vtab(spark):
    """c4's rstrip-then-last-char check agrees on '.\\x0B' lines."""
    for s in SAMPLES:
        lit = s.replace("'", "''")
        spark_ch = (
            spark.range(1)
            .select(
                F.substring(
                    F.regexp_replace(
                        F.lit(s), textstats.TRAILING_WS_PATTERN, ""
                    ),
                    -1,
                    1,
                ).alias("c")
            )
            .collect()[0]["c"]
        )
        duck_ch = _duck_one(
            f"SELECT right(regexp_replace('{lit}', '{WS_CLASS}+$', ''), 1)"
        )
        assert (spark_ch or "") == (duck_ch or ""), (s, spark_ch, duck_ch)


def test_bpe_ish_token_counts_match_on_vtab(spark):
    """BPE_ISH_PATTERN is interpolated into DuckDB twins verbatim —
    a \\x0B must not count as a token on either engine."""
    for s in SAMPLES + ["ab12!\x0b?"]:
        lit = s.replace("'", "''")
        spark_n = (
            spark.range(1)
            .select(
                F.size(
                    F.regexp_extract_all(
                        F.lit(s), F.lit(textstats.BPE_ISH_PATTERN), 0
                    )
                ).alias("n")
            )
            .collect()[0]["n"]
        )
        duck_n = _duck_one(
            "SELECT len(regexp_extract_all("
            f"'{lit}', '{textstats.BPE_ISH_PATTERN}'))"
        )
        assert spark_n == duck_n, (s, spark_n, duck_n)


def test_pii_patterns_match_on_vtab(spark):
    """PHONE/URL patterns (interpolated into twins) agree on
    \\x0B-separated digits and \\x0B-terminated URLs."""
    cases = [
        "call 555\x0b123\x0b4567 now",
        "call 555 - 123 - 4567 now",
        "call 555\x0b-\x0b123\x0b-\x0b4567 now",
        "list 1 - 2 - 3 - 4 - 5 - 6 - 7 end",
        "ring +44 - 20 - 7946 - 0958 uk",
        "dial +1 (555) 010-42 ok",
        # leftmost-FIRST alternation pins: at one start position the
        # tight alternative matches a SHORTER span than the wide one
        # would — Java picks first-listed, and DuckDB's RE2 must too
        # (RE2 default is PCRE-style leftmost-first, not POSIX
        # leftmost-longest); a divergence here shifts mask boundaries
        "1234567 - 890 - 123",
        "555-123-4567 - 890 - 1234",
        "see https://x.example/a\x0btail",
        "version 1.2.3.4.5 stays",
    ]
    for s in cases:
        lit = s.replace("'", "''")
        for pat in (clean.PHONE_PATTERN, clean.URL_PATTERN):
            # compare the MATCHED STRINGS, not just their count: a
            # leftmost-first vs leftmost-longest divergence can yield
            # the same match count with different span boundaries
            spark_m = (
                spark.range(1)
                .select(
                    F.regexp_extract_all(F.lit(s), F.lit(pat), 0).alias(
                        "m"
                    )
                )
                .collect()[0]["m"]
            )
            duck_m = _duck_one(
                f"SELECT regexp_extract_all('{lit}', "
                f"'{pat.replace(chr(39), chr(39) * 2)}')"
            )
            assert spark_m == duck_m, (s, pat, spark_m, duck_m)
