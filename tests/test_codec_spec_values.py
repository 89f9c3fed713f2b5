"""Absolute expected-value assertions for the XML/codec surfaces.

The driver certificates `xml_extract_orders` / `codec_roundtrip_suite`
hash FLAGS ONLY since r11 (engine-version robustness: a parser must
invert its own renderer), which means they attest self-consistency —
a parser+renderer pair that is consistently wrong against the XML/URL
spec would stay green there. These tests pin known input → known
output against the published specs (RFC 4648 base64, HTML/URL form
encoding via java.net.URLEncoder semantics, XML 1.0 entity decoding),
so spec-level drift is detectable outside the driver (r11 ADVICE #4).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _one(spark, expr: str):
    return spark.range(1).select(F.expr(expr).alias("v")).collect()[0]["v"]


def test_base64_hex_spec_values(spark):
    # RFC 4648 test-vector-style values, not roundtrips
    assert _one(spark, "base64(cast('Spark' as binary))") == "U3Bhcms="
    assert _one(spark, "cast(unbase64('U3Bhcms=') as string)") == "Spark"
    assert _one(spark, "hex(cast('AB' as binary))") == "4142"
    assert _one(spark, "cast(unhex('4142') as string)") == "AB"


def test_url_codec_spec_values(spark):
    # application/x-www-form-urlencoded: space → '+', '&' → %26
    assert _one(spark, "url_encode('a b&c')") == "a+b%26c"
    assert _one(spark, "url_decode('a+b%26c')") == "a b&c"
    url = "'https://shop.example.com/orders/42?priority=1-URGENT'"
    assert _one(spark, f"parse_url({url}, 'HOST')") == "shop.example.com"
    assert _one(spark, f"parse_url({url}, 'PATH')") == "/orders/42"
    assert (
        _one(spark, f"parse_url({url}, 'QUERY', 'priority')") == "1-URGENT"
    )


def test_xml_parse_spec_values(spark):
    xml = "'<order id=\"42\"><price>7.5</price>" \
          "<priority>1-URGENT</priority></order>'"
    assert _one(spark, f"xpath_long({xml}, '/order/@id')") == 42
    st = _one(
        spark, f"from_xml({xml}, 'price double, priority string')"
    )
    assert st["price"] == 7.5
    assert st["priority"] == "1-URGENT"
    # XML 1.0 entity decoding — a parser that fails to decode &amp;
    # would still pass a construct-parse roundtrip of escaped input
    ent = _one(spark, "from_xml('<r><p>a&amp;b</p></r>', 'p string')")
    assert ent["p"] == "a&b"
