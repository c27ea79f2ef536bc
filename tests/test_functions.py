"""Unit tests for the scalar function library (reference F1-F14 parity),
with the reference's own literal test cases
(/root/reference/tests/unit/test_transform_pandas_ops.py:56-106,
tests/unit/test_transform_normalizers.py:13-52)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wage_etl_spark.functions.cleaning import (
    clean_currency, json_payload, normalize_category_key, normalize_header,
    parse_updated_date, slugify, truncate_reason, zfill,
)
from wage_etl_spark.functions.hashing import rolling_fingerprint, simhash64, hamming64
from wage_etl_spark.functions.text import (
    avg_token_len, bpe_token_count, punct_ratio, quality_score, token_count, ws_tokens,
)


def _one(spark, expr, value, typ="string"):
    df = spark.createDataFrame([(value,)], f"v {typ}")
    return df.select(expr.alias("out")).first()["out"]


CURRENCY_CASES = [
    ("$18.71", 18.71),
    ("$1,000", 1000.0),
    ("invalid", 0.0),
    (None, 0.0),
    ("  $2,500.50 ", 2500.50),
    ("$0.00", 0.0),
    ("42", 42.0),
]


@pytest.mark.parametrize("raw,want", CURRENCY_CASES)
def test_clean_currency(spark, raw, want):
    assert _one(spark, clean_currency(F.col("v")), raw) == want


HEADER_CASES = [
    ("1 Adult", "1 adult"),
    ("2 Adults (1 Working)", "2 adults (1 working)"),
    ("2 Adults (1 Working) 1 Child", "2 adults (1 working) 1 child"),
    ("2 Adults - 2 Children", "2 adults 2 children"),
    ("1 Adult 0 Children", "1 adult"),
    ("2 Adults (Both Working)", "2 adults"),
]


@pytest.mark.parametrize("raw,want", HEADER_CASES)
def test_normalize_header(spark, raw, want):
    assert _one(spark, normalize_header(F.col("v")), raw) == want


def test_category_key_and_slug(spark):
    assert _one(spark, normalize_category_key(F.col("v")), " Living   Wage!! ") == "living wage"
    assert _one(spark, slugify(F.col("v")), "Some New Thing!") == "some_new_thing"


def test_zfill(spark):
    assert _one(spark, zfill(F.col("v"), 5), "34", "string") == "00034"
    assert _one(spark, zfill(F.col("v"), 5), 7, "int") == "00007"


def test_parse_updated_date(spark):
    got = _one(spark, parse_updated_date(F.col("v")), "Last updated on January 15, 2025 ok")
    assert str(got) == "2025-01-15"
    assert _one(spark, parse_updated_date(F.col("v")), "no date here") is None


def test_truncate_reason(spark):
    assert _one(spark, truncate_reason(F.col("v"), 5), "abcdefgh") == "abcde"


def test_json_payload_keeps_nulls(spark):
    df = spark.createDataFrame([("a", None)], "x string, y string")
    out = df.select(json_payload("x", "y").alias("j")).first()["j"]
    assert '"y":null' in out


def test_text_stats(spark):
    txt = "hello world, this is fine."
    assert _one(spark, token_count(F.col("v")), txt) == 5
    assert _one(spark, token_count(F.col("v")), "   ") == 0
    assert _one(spark, bpe_token_count(F.col("v")), "ab12 cd!") == 4  # ab,12,cd,!
    pr = _one(spark, punct_ratio(F.col("v")), "a,b.")
    assert abs(pr - 0.5) < 1e-9
    q = _one(spark, quality_score(F.col("v")), txt)
    assert 0.0 <= q <= 1.0


def test_rolling_fingerprint_matches_python(spark):
    import hashlib

    toks = ["spark", "merge", "window"]
    h = 0
    for t in toks:
        th = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
        h = (h * 1_000_003 + th) % 1_000_000_007
    got = _one(spark, rolling_fingerprint(ws_tokens(F.col("v"))), " ".join(toks))
    assert got == h
    # order sensitivity
    rev = _one(spark, rolling_fingerprint(ws_tokens(F.col("v"))), " ".join(reversed(toks)))
    assert rev != got


def test_simhash_properties(spark):
    df = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",),
         ("the quick brown fox jumps over the lazy cat",),
         ("completely unrelated words appear in this text",)],
        "v string",
    )
    rows = df.select(simhash64(ws_tokens(F.col("v"))).alias("h")).collect()
    h1, h2, h3 = [r["h"] for r in rows]
    near = df.limit(0)
    d12 = _one(spark, hamming64(F.lit(h1), F.lit(h2)), "x")
    d13 = _one(spark, hamming64(F.lit(h1), F.lit(h3)), "x")
    assert d12 < d13  # near-dup closer than unrelated
    assert all(h >= 0 for h in (h1, h2, h3))
