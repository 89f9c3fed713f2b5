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
# Phone shapes, >= 7 digits, three lookaround-free alternatives
# (leftmost-first on both Java and RE2 — the pattern is embedded
# verbatim in the DuckDB oracle twins):
#   1. tight: any digit run with at most ONE separator between each
#      adjacent pair ('5551234567', '555-123-4567', '555 123 4567');
#      unbounded length like the r11 pattern.
#   2. wide, long lead: a >=3-digit group then 2-3 more >=2-digit
#      groups, 1-3 separators between groups ('555 - 123 - 4567').
#   3. wide, short lead: a 1-2 digit country/area code then 3-4
#      >=2-digit groups ('+1 (555) 010-42', '+44 - 20 - 7946 - 0958').
# The r12 single-alternative form \d(?:[sep]{0,3}\d){6,} recovered
# spaced-dash phones but also masked any >=7-digit span whose digits
# are INDIVIDUALLY separated by up to 3 chars — spaced numeric lists
# ('1 - 2 - 3 - 4 - 5 - 6 - 7') masked corpus-wide (r12 ADVICE).
# Requiring >=2-digit groups whenever separators run wide, and
# capping wide groups at 4-5 (the separator budget), keeps the
# spaced-dash recall without that over-masking. The >=7-digit floor
# still rejects dotted version strings ('1.2.3.4.5'); digit-dense
# date shapes ('2020-08-16') still mask via alternative 1: a
# conservative PII stance (dates of birth ARE PII) this pipeline
# accepts. Separator class spells out Java's \s (see URL_PATTERN
# note).
_PHONE_SEP = r"[ \t\n\x0B\f\r().-]"
PHONE_PATTERN = (
    r"\+?(?:"
    r"\d(?:" + _PHONE_SEP + r"?\d){6,}"
    r"|\d{3,}(?:" + _PHONE_SEP + r"{1,3}\d{2,}){2,3}"
    r"|\d{1,2}(?:" + _PHONE_SEP + r"{1,3}\d{2,}){3,4}"
    r")"
)


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
