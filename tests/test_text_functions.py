from __future__ import annotations

from pyspark.sql import functions as F

from newsfeeds_crawler_spark.functions import text as T


def _one(spark, col, s="the quick brown fox"):
    return spark.createDataFrame([(s,)], ["t"]).select(col.alias("v")).first()["v"]


def test_token_counts(spark):
    assert _one(spark, T.token_count_ws(F.col("t")), "a b  c") == 3
    assert _one(spark, T.token_count_ws(F.col("t")), "   ") == 0
    assert _one(spark, T.token_count_bpe_ish(F.col("t")), "don't stop2x!") == 7
    # don | ' | t | stop | 2 | x | !


def test_lang_id(spark):
    assert _one(spark, T.lang_id(F.col("t")), "the cat is in the house") == "en"
    assert _one(spark, T.lang_id(F.col("t")), "das ist nicht der hund und") == "de"
    assert _one(spark, T.lang_id(F.col("t")), "xyz qqq zzz") == "und"


def test_quality_score_bounds(spark):
    v = _one(spark, T.quality_score(F.col("t")), "the cat is on the mat. " * 30)
    assert 0.0 <= v <= 1.0
    junk = _one(spark, T.quality_score(F.col("t")), "!!!???...;;;")
    assert junk < v


def test_fingerprint_matches_python_fold(spark):
    s = "hello world 123"
    got = _one(spark, T.fingerprint64(F.col("t")), s)
    m = (1 << 31) - 1
    h = 0
    for ch in s:
        h = (h * 131 + ord(ch)) % m
    assert got == h


def test_shingles(spark):
    got = _one(spark, T.shingles(F.col("t"), 3), "a b c d")
    assert got == ["a b c", "b c d"]
    short = _one(spark, T.shingles(F.col("t"), 3), "a b")
    assert short == ["a b"]


def test_char_ngrams(spark):
    got = _one(spark, T.char_ngrams(F.col("t"), 4), "abcde")
    assert got == ["abcd", "bcde"]
