"""robots.txt parsing — Spark expression vs python mirror."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from newsfeeds_crawler_spark.functions.robots import (
    crawl_delay_ms,
    crawl_delay_ms_py,
    disallow_prefixes,
    disallow_prefixes_py,
)

ROBOTS = [
    # simple wildcard group
    "User-agent: *\nDisallow: /admin\nDisallow: /tmp\n",
    # agent-specific group ours doesn't match
    "User-agent: googlebot\nDisallow: /secret\n",
    # two groups: specific then wildcard
    "User-agent: googlebot\nDisallow: /g\n\nUser-agent: *\nDisallow: /w\n",
    # multi-agent group header
    "User-agent: a\nUser-agent: *\nDisallow: /both\n",
    # comments, blank lines, empty disallow (allow-all), crawl delay
    "# comment\nUser-agent: *\nDisallow:\nCrawl-delay: 2.5\nDisallow: /x # inline\n",
    # orphan disallow before any group — ignored
    "Disallow: /orphan\nUser-agent: *\nDisallow: /ok\n",
    # no rules at all
    "User-agent: *\n",
    "",
]


@pytest.mark.parametrize("body", ROBOTS)
def test_disallow_spark_matches_python(spark, body):
    df = spark.createDataFrame([(body,)], ["robots"])
    got = df.select(
        disallow_prefixes(F.col("robots"), "mybot").alias("p")
    ).collect()[0].p
    want = disallow_prefixes_py(body, "mybot")
    assert sorted(got) == sorted(want), body


def test_expected_values():
    assert disallow_prefixes_py(ROBOTS[0], "mybot") == ["/admin", "/tmp"]
    assert disallow_prefixes_py(ROBOTS[1], "mybot") == []
    assert disallow_prefixes_py(ROBOTS[1], "googlebot") == ["/secret"]
    assert disallow_prefixes_py(ROBOTS[2], "mybot") == ["/w"]
    assert disallow_prefixes_py(ROBOTS[2], "googlebot") == ["/g", "/w"]
    assert disallow_prefixes_py(ROBOTS[3], "mybot") == ["/both"]
    assert disallow_prefixes_py(ROBOTS[4], "mybot") == ["/x"]
    assert disallow_prefixes_py(ROBOTS[5], "mybot") == ["/ok"]


def test_crawl_delay(spark):
    df = spark.createDataFrame([(b,) for b in ROBOTS], ["robots"])
    got = [
        r.d for r in df.select(crawl_delay_ms(F.col("robots")).alias("d")).collect()
    ]
    want = [crawl_delay_ms_py(b) for b in ROBOTS]
    assert got == want
    assert crawl_delay_ms_py(ROBOTS[4]) == 2500
    assert crawl_delay_ms_py(ROBOTS[0]) == 1000  # default


def test_crawl_delay_binds_to_governing_group(spark):
    """A googlebot-only Crawl-delay must NOT apply to '*'; the first
    binding group's value wins; Column == python mirror."""
    body = (
        "User-agent: googlebot\n"
        "Crawl-delay: 9\n"
        "Disallow: /g\n"
        "\n"
        "User-agent: *\n"
        "Crawl-delay: 2.5\n"
        "Disallow: /a\n"
    )
    body2 = "User-agent: googlebot\nCrawl-delay: 9\n"  # nothing binds to *
    df = spark.createDataFrame([(body,), (body2,)], ["b"])
    rows = df.select(
        crawl_delay_ms(F.col("b")).alias("ms"),
        disallow_prefixes(F.col("b")).alias("dis"),
    ).collect()
    assert rows[0]["ms"] == crawl_delay_ms_py(body) == 2500
    assert rows[0]["dis"] == disallow_prefixes_py(body) == ["/a"]
    assert rows[1]["ms"] == crawl_delay_ms_py(body2) == 1000  # default
    assert rows[1]["dis"] == disallow_prefixes_py(body2) == []
