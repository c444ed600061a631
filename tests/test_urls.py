from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from newsfeeds_crawler_spark.functions.urls import (
    canonicalize_url,
    canonicalize_url_py,
    url_hash,
    url_host,
    url_host_py,
)

CASES = [
    ("http://Example.COM/a/b", "http://example.com/a/b"),
    ("HTTP://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com//a///b", "http://example.com/a/b"),
    ("http://example.com/a#frag", "http://example.com/a"),
    ("http://example.com/a?q=1&r=2#f", "http://example.com/a?q=1&r=2"),
    ("http://example.com/A/B?Q=UP", "http://example.com/A/B?Q=UP"),
    ("http://example.com:80//x//y?a=//b#z", "http://example.com/x/y?a=//b"),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_canonicalize_py(raw, expected):
    assert canonicalize_url_py(raw) == expected


def test_canonicalize_spark_matches_python(spark):
    urls = [raw for raw, _ in CASES] + [
        f"http://Host{i}.example.org:{80 if i % 2 else 8080}//p{i}///q?x={i}#frag{i}"
        for i in range(50)
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = [
        r["canon"]
        for r in df.select(canonicalize_url("url").alias("canon")).collect()
    ]
    want = [canonicalize_url_py(u) for u in urls]
    assert got == want


def test_host_extraction(spark):
    urls = ["http://A.B.com:80/x", "https://h.io:9/y?u=http://other.com/"]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = [r["h"] for r in df.select(url_host("url").alias("h")).collect()]
    assert got == ["a.b.com", "h.io"]
    assert [url_host_py(u) for u in urls] == got


def test_url_hash_is_stable_and_canonical(spark):
    df = spark.createDataFrame(
        [("http://Example.com:80/a#f",), ("http://example.com/a",)], ["url"]
    )
    hashes = {r["h"] for r in df.select(url_hash("url").alias("h")).collect()}
    assert len(hashes) == 1  # same canonical form -> same 64-bit key


def test_spark_canonicalize_stays_jvm_side(spark):
    df = spark.createDataFrame([("http://a.com/x",)], ["url"])
    plan = (
        df.select(canonicalize_url("url"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_malformed_scheme_and_ipv6_edges_match_mirror(spark):
    """ADVICE edge inputs: scheme-less URL embedding an absolute URL in its
    query, and IPv6 host-port literals — Spark must match the Python
    oracle mirror byte-for-byte."""
    cases = [
        "example.com/p?u=http://b.com",
        "http://[::1]:8080/x",
        "http://[::1]:80/x",
        "https://h.com:443//a//b?q=1#frag",
        "weird_scheme!//host/x",
        "ftp+x.y-z://Host.COM//p",
    ]
    df = spark.createDataFrame([(c,) for c in cases], ["u"])
    rows = df.select(
        "u",
        canonicalize_url("u").alias("c"),
        url_host("u").alias("h"),
    ).collect()
    for r in rows:
        assert r["c"] == canonicalize_url_py(r["u"]), r["u"]
        assert r["h"] == url_host_py(r["u"]), r["u"]
