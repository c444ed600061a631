"""Skew/salt planning (operators/skew.py) + robots sitemap discovery
(functions/robots.sitemap_urls) and its composition with index expansion."""

from __future__ import annotations

from pyspark.sql import functions as F

from newsfeeds_crawler_spark.functions.robots import (
    sitemap_urls,
    sitemap_urls_py,
)
from newsfeeds_crawler_spark.operators.skew import (
    apply_salt,
    key_counts,
    salt_plan,
)


def test_salt_plan_clamps_and_interior(spark):
    rows = (
        [("hot", i) for i in range(5000)]       # ceil(5000/500)=10 → max 8
        + [("warm", i) for i in range(1200)]    # ceil=3 (interior)
        + [("cold", i) for i in range(10)]      # 1 (lower clamp)
    )
    df = spark.createDataFrame(rows, "host string, rid long")
    plan = {
        r.key: r
        for r in salt_plan(
            key_counts(df, "host"), target_rows=500, max_fanout=8
        ).collect()
    }
    assert (plan["hot"].fanout, plan["hot"].hot) == (8, True)
    assert (plan["warm"].fanout, plan["warm"].hot) == (3, True)
    assert (plan["cold"].fanout, plan["cold"].hot) == (1, False)


def test_apply_salt_deterministic_and_bounded(spark):
    rows = [("hot", i) for i in range(4000)] + [("cold", i) for i in range(50)]
    df = spark.createDataFrame(rows, "host string, rid long")
    plan = salt_plan(key_counts(df, "host"), target_rows=500, max_fanout=8)
    salted = apply_salt(df, plan, "host", F.col("rid"))
    a = sorted(map(tuple, salted.collect()))
    b = sorted(map(tuple, apply_salt(df.repartition(7), plan, "host",
                                     F.col("rid")).collect()))
    assert a == b  # replay/partition invariant
    out = salted.groupBy("host", "salt").count().collect()
    hot_salts = {r.salt for r in out if r.host == "hot"}
    cold_salts = {r.salt for r in out if r.host == "cold"}
    assert hot_salts == set(range(8))      # all 8 sub-keys populated
    assert cold_salts == {0}               # cold rows never split
    assert salted.filter(
        (F.col("salt") < 0) | (F.col("salt") >= F.col("fanout"))
    ).count() == 0
    # salted partial + final == unsalted aggregate (the two-phase contract)
    partial = salted.groupBy("host", "salt").agg(
        F.count(F.lit(1)).alias("c")
    )
    final = partial.groupBy("host").agg(F.sum("c").alias("n"))
    assert {(r.host, r.n) for r in final.collect()} == {
        ("hot", 4000), ("cold", 50)
    }


def test_sitemap_urls_extraction_and_mirror(spark):
    body = (
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: https://a/s1.xml\n"
        "sitemap:https://a/s2.xml\n"
        "  # comment line\n"
        "SITEMAP: https://a/s3.xml # mirror\n"
        "NotASitemap: https://a/no.xml\n"
    )
    expect = ["https://a/s1.xml", "https://a/s2.xml", "https://a/s3.xml"]
    got = spark.createDataFrame([(body,)], "body string").select(
        sitemap_urls(F.col("body")).alias("u")
    ).first().u
    assert got == expect
    assert sitemap_urls_py(body) == expect
    assert sitemap_urls_py("User-agent: *\nDisallow:\n") == []


def test_robots_to_frontier_bootstrap(spark):
    """robots → sitemap discovery → index expansion → page URLs: the
    crawl bootstrap composition."""
    from newsfeeds_crawler_spark.operators.sitemap import expand_sitemaps

    NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
    robots = "User-agent: *\nDisallow: /admin\nSitemap: https://a/sm.xml\n"
    corpus = spark.createDataFrame(
        [
            ("https://a/sm.xml",
             f"<sitemapindex {NS}><sitemap><loc>https://a/u.xml</loc>"
             "</sitemap></sitemapindex>"),
            ("https://a/u.xml",
             f"<urlset {NS}><url><loc>https://a/page1</loc></url>"
             "<url><loc>https://a/page2</loc></url></urlset>"),
        ],
        "url string, body string",
    )
    seeds = (
        spark.createDataFrame([(robots,)], "body string")
        .select(F.explode(sitemap_urls(F.col("body"))).alias("url"))
    )
    pages = sorted(r.loc for r in expand_sitemaps(seeds, corpus).collect())
    assert pages == ["https://a/page1", "https://a/page2"]
