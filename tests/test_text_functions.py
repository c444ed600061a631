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


def test_fingerprint64_arrow_equals_expr(spark):
    """The Arrow-batched fingerprint twin must be BIT-IDENTICAL to the
    expression fold on every edge: empty string (one ascii('')=0 step),
    nulls, whitespace, multi-byte, astral-plane codepoints (Spark's
    split('')+ascii walks full codepoints, not UTF-16 units), and long
    texts crossing the 1024-row chunk boundary."""
    samples = [
        "", "a", "ab", "hello world 123", "héllo wörld", "日本語テスト",
        "tab\tnl\n", None, "a b c", "\U0001F600", "a\U0001F600b",
        "\U0001D11E clef", "x" * 3000,
    ] + [f"doc {i} body {'y' * (i % 37)}" for i in range(1500)]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    rows = df.select(
        T.fingerprint64(F.col("t")).alias("e"),
        T.fingerprint64_arrow(F.col("t")).alias("a"),
    ).collect()
    assert len(rows) == len(samples)
    for r in rows:
        assert r["e"] == r["a"]


def test_fingerprint64_arrow_fuzz(spark):
    """Hypothesis-generated unicode through both physical forms."""
    from hypothesis import given, settings, strategies as st

    m = (1 << 31) - 1

    def py_fp(s):
        h = 0
        for ch in s:
            h = (h * 131 + ord(ch)) % m
        return h

    @settings(max_examples=20, deadline=None)
    @given(st.lists(st.text(max_size=80), min_size=1, max_size=8))
    def _case(texts):
        df = spark.createDataFrame([(s,) for s in texts], "t string")
        rows = df.select(
            "t",
            T.fingerprint64(F.col("t")).alias("e"),
            T.fingerprint64_arrow(F.col("t")).alias("a"),
        ).collect()
        for r in rows:
            assert r["e"] == r["a"] == py_fp(r["t"])

    _case()
