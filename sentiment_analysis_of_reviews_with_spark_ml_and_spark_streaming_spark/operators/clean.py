"""Text/row cleaning as native Column expressions.

The reference implements these as untyped row-at-a-time Python UDFs
(``punct_remover``/``rating_convert``/``remove_spaces`` at
Yelp_Data_PreProcessing.py:116-130, Scalable_Project_ML_Model_Analysis.py:61-83,
Scalable_Project_SVM_Model_Deployment.py:88-101, Prediction_Pipe_Line.py:50-64),
which forces a BatchEvalPython boundary per partition and blocks
Catalyst pushdown through the projection. Re-expressed here as
``regexp_replace``/``when`` chains the whole cleaning stage stays
inside whole-stage codegen — at 100 TB that is the difference between
a scan-speed pipeline and a pickle-bound one.
"""

from __future__ import annotations

import string

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Same character class the reference builds with
# re.escape(string.punctuation) + '0-9\r\t\n' (Yelp_Data_PreProcessing.py:116-118).
# Spelled as an explicit char class so Spark (Java regex) and any ANSI
# oracle (RE2) agree byte-for-byte.
PUNCT_DIGITS_CLASS = "[" + "".join("\\" + c for c in string.punctuation) + "0-9\\r\\t\\n]"
_WS_RUN = "\\s+"


def strip_punct_digits(col: Column | str) -> Column:
    """remove_punct parity: punctuation/digits/CR/TAB/LF → single space."""
    return F.regexp_replace(col, PUNCT_DIGITS_CLASS, " ")


def squeeze_spaces(col: Column | str) -> Column:
    """remove_spaces parity: collapse whitespace runs, trim edges."""
    return F.trim(F.regexp_replace(col, _WS_RUN, " "))


def normalize_text(col: Column | str) -> Column:
    """Full cleaning chain: punct/digit strip → space squeeze.

    Equivalent to the reference's UDF composition
    ``remove_spaces_udf(punct_remover('text'))`` + ``ltrim``
    (Scalable_Project_ML_Model_Analysis.py:86,112) in one codegen'd
    expression — the reference's trailing ltrim is subsumed:
    squeeze_spaces already trims BOTH edges, so the extra ltrim node
    was a no-op (r11 review finding).
    """
    return squeeze_spaces(strip_punct_digits(col))


def binarize_rating(col: Column | str, threshold: float = 4.0) -> Column:
    """rating_convert parity: label = 1 if stars >= threshold else 0.

    The reference's untyped UDF returned the *string* '1'/'0' and was
    re-cast downstream (Scalable_Project_ML_Model_Analysis.py:75-78,89);
    we emit int directly (documented semantic cleanup, SURVEY.md §7.4).

    PRECONDITION: run quarantine_bad_stars / drop_null_rows first.
    NULL or unparseable stars fall to the otherwise(0) branch — the
    reference's semantics, kept for parity — which silently turns
    junk rows into confident NEGATIVE labels if the cleaning stage is
    skipped (r11 review note).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.try_cast("double") >= threshold, 1).otherwise(0).cast("int")


def impute_null(col: Column | str, value) -> Column:
    """when(isNull, value).otherwise(col) — the post-left-join elite
    impute (Scalable_Project_SVM_Model_Deployment.py:81)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(value))


def drop_null_rows(df: DataFrame, subset: list[str]) -> DataFrame:
    """dropna(subset=...) parity (Yelp_Data_PreProcessing.py:61)."""
    return df.dropna(subset=subset)


# \S spelled out as Java's complement class: RE2's \S admits \x0B
# (vertical tab) where Java's excludes it — these patterns are
# embedded verbatim in DuckDB oracle twins, so every whitespace
# shorthand must be byte-identical across engines (r12, the
# TRAILING_WS_PATTERN convention in operators/textstats.py).
URL_PATTERN = r"(?:https?://|www\.)[^ \t\n\x0B\f\r]+"
HTML_TAG_PATTERN = r"<[^>]{1,200}>"
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# >= 7 digits, each pair separated by at most THREE phone separators
# (' - ' between digit groups: '555 - 123 - 4567'; the r11 {0,2} cap
# dropped those spaced-dash formats — a PII-recall regression the r11
# ADVICE flagged) — the old char-class form [\d\s().-]{7,} matched any
# 9+-char span with just TWO digits, so dotted version strings
# ('1.2.3.4.5') and sparse spaced digit runs were masked corpus-wide
# (r11 review finding); the >=7-digit floor still rejects those.
# Digit-dense date shapes ('2020-08-16') still mask: a conservative
# PII stance (dates of birth ARE PII) this pipeline accepts. RE2- and
# Java-compatible (no lookaround — the pattern is embedded verbatim in
# the DuckDB oracle twins).
# separator class spells out Java's \s (see URL_PATTERN note)
PHONE_PATTERN = r"\+?\d(?:[ \t\n\x0B\f\r().-]{0,3}\d){6,}"


def strip_urls(col: Column | str, replacement: str = " ") -> Column:
    """Remove URLs (http/https/www) — standard web-corpus cleaning."""
    return F.regexp_replace(col, URL_PATTERN, replacement)


def strip_html_tags(col: Column | str, replacement: str = " ") -> Column:
    """Remove HTML/XML tags (bounded length to avoid runaway matches
    on stray '<')."""
    return F.regexp_replace(col, HTML_TAG_PATTERN, replacement)


def mask_pii(col: Column | str) -> Column:
    """Mask emails and phone-like sequences with typed placeholders —
    the minimal PII pass a training-data pipeline runs before
    tokenization. Order matters: emails first (phones regex could eat
    digit runs inside mangled emails)."""
    c = F.col(col) if isinstance(col, str) else col
    no_email = F.regexp_replace(c, EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(no_email, PHONE_PATTERN, "<PHONE>")


def web_text_clean(col: Column | str) -> Column:
    """Web-corpus pre-clean: tags → urls → pii → whitespace squeeze.
    Composes with normalize_text for the full reference-parity chain."""
    return squeeze_spaces(mask_pii(strip_urls(strip_html_tags(col))))


def quarantine_bad_stars(
    df: DataFrame, col: str = "stars", hi: float = 5.0, lo: float = 1.0
) -> DataFrame:
    """Drop mis-parsed rows where stars fall outside [lo, hi] or are
    non-numeric (Scalable_EDA_Final.py:322,365; junk label 2017 at
    Scalable_Project_ML_Model_Analysis.py:171). ``lo`` defaults to the
    Yelp 1-star floor; pass ``lo=0.0`` for scales with legitimate 0 or
    half-star ratings."""
    # try_cast: ANSI mode (Spark 4 default) makes plain cast throw on
    # junk like 'abc' — exactly the rows this operator quarantines
    c = F.col(col).try_cast("double")
    return df.filter(c.isNotNull() & (c <= hi) & (c >= lo))
