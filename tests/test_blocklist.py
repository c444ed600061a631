"""Domain-blocklist filtering (operators/blocklist.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from newsfeeds_crawler_spark.operators.blocklist import (
    blocklist_filter,
    host_suffixes,
)


def test_host_suffixes_chain(spark):
    out = spark.createDataFrame([("a.b.co.uk",)], "h string").select(
        host_suffixes(F.col("h")).alias("s")
    ).first().s
    assert out == ["a.b.co.uk", "b.co.uk", "co.uk", "uk"]


def test_dot_bounded_and_most_specific(spark):
    urls = spark.createDataFrame(
        [
            ("https://bad.com/x",),          # exact rule match
            ("https://a.bad.com/x",),        # subdomain of rule
            ("https://notbad.com/x",),       # substring decoy — must pass
            ("https://deep.a.bad.com/x",),   # deeper subdomain
            ("https://good.org/x",),
        ],
        "url string",
    )
    rules = spark.createDataFrame(
        [("bad.com",), ("a.bad.com",)], "domain string"
    )
    out = {r.url: r for r in blocklist_filter(urls, rules).collect()}
    assert out["https://bad.com/x"].matched_rule == "bad.com"
    # most specific rule wins for the direct subdomain
    assert out["https://a.bad.com/x"].matched_rule == "a.bad.com"
    assert out["https://deep.a.bad.com/x"].matched_rule == "a.bad.com"
    assert out["https://notbad.com/x"].blocked is False
    assert out["https://notbad.com/x"].matched_rule is None
    assert out["https://good.org/x"].blocked is False
    assert sum(r.blocked for r in out.values()) == 3


def test_passthrough_columns_and_invariance(spark):
    urls = spark.createDataFrame(
        [(i, f"https://h{i % 5}.ex.com/p{i}") for i in range(200)],
        "rid long, url string",
    )
    rules = spark.createDataFrame([("h2.ex.com",)], "domain string")
    a = sorted(map(tuple, blocklist_filter(urls, rules).collect()))
    b = sorted(
        map(tuple, blocklist_filter(urls.repartition(7), rules).collect())
    )
    assert a == b
    assert len(a) == 200 and len(a[0]) == 5  # rid, url, host, blocked, rule
    blocked = [t for t in a if t[3]]
    assert len(blocked) == 40 and all(t[4] == "h2.ex.com" for t in blocked)
