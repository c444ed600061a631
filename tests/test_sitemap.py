"""Sitemap parsing (functions/sitemap.py) + bounded index expansion
(operators/sitemap.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from newsfeeds_crawler_spark.functions.sitemap import parse_sitemap_py
from newsfeeds_crawler_spark.operators.sitemap import (
    expand_sitemaps,
    sitemap_entries,
)

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def _urlset(entries: str) -> str:
    return f"<urlset {NS}>{entries}</urlset>"


def test_parse_urlset_kinds_and_lastmod():
    body = _urlset(
        "<url><loc>https://a/x</loc>"
        "<lastmod>2026-03-05T06:07:08Z</lastmod></url>"
        "<url><loc>https://a/y</loc></url>"              # no lastmod → null
        "<url><loc>https://a/z</loc>"
        "<lastmod>2026-04-01</lastmod></url>"            # date-only W3C form
        "<url><lastmod>2026-01-01</lastmod></url>"       # no loc → dropped
        "<url><loc>  </loc></url>"                       # blank loc → dropped
    )
    kind, entries = parse_sitemap_py(body)
    assert kind == "urlset"
    assert entries == [
        ("https://a/x", datetime(2026, 3, 5, 6, 7, 8)),
        ("https://a/y", None),
        ("https://a/z", datetime(2026, 4, 1)),
    ]


def test_parse_sitemapindex_and_failures():
    idx = (
        f"<sitemapindex {NS}><sitemap><loc>https://a/sm1.xml</loc>"
        "</sitemap></sitemapindex>"
    )
    kind, entries = parse_sitemap_py(idx)
    assert kind == "sitemapindex"
    assert entries == [("https://a/sm1.xml", None)]
    assert parse_sitemap_py(None) is None
    assert parse_sitemap_py("<urlset xmlns=") is None          # XML error
    assert parse_sitemap_py("<rss><channel/></rss>") is None   # wrong root
    # un-namespaced root is NOT a protocol sitemap
    assert parse_sitemap_py("<urlset><url><loc>x</loc></url></urlset>") is None


def test_sitemap_entries_udtf_document_order(spark):
    docs = spark.createDataFrame(
        [
            ("https://a/sitemap.xml", _urlset(
                "<url><loc>https://a/1</loc></url>"
                "<url><loc>https://a/2</loc>"
                "<lastmod>2026-02-03T04:05:06Z</lastmod></url>"
            )),
            ("https://b/sitemap.xml", "<bad"),
        ],
        "url string, body string",
    )
    rows = sorted(
        sitemap_entries(docs).collect(), key=lambda r: (r.url, r.entry_idx)
    )
    assert [(r.url, r.entry_idx, r.loc, r.lastmod_ts) for r in rows] == [
        ("https://a/sitemap.xml", 0, "https://a/1", None),
        ("https://a/sitemap.xml", 1, "https://a/2",
         datetime(2026, 2, 3, 4, 5, 6)),
    ]


def test_expand_sitemaps_two_levels_with_cycle(spark):
    corpus = spark.createDataFrame(
        [
            # root index → two child sitemaps + a cycle back to itself
            ("https://a/sitemap.xml",
             f"<sitemapindex {NS}>"
             "<sitemap><loc>https://a/sm1.xml</loc></sitemap>"
             "<sitemap><loc>https://a/sm2.xml</loc></sitemap>"
             "<sitemap><loc>https://a/sitemap.xml</loc></sitemap>"
             "</sitemapindex>"),
            ("https://a/sm1.xml", _urlset(
                "<url><loc>https://a/p1</loc></url>"
                "<url><loc>https://a/p2</loc></url>")),
            ("https://a/sm2.xml", _urlset(
                "<url><loc>https://a/p3</loc>"
                "<lastmod>2026-05-06T07:08:09Z</lastmod></url>")),
        ],
        "url string, body string",
    )
    seeds = spark.createDataFrame(
        [("https://a/sitemap.xml",)], "url string"
    )
    out = expand_sitemaps(seeds, corpus, max_depth=4)
    rows = sorted(out.collect(), key=lambda r: r.loc)
    assert [(r.loc, r.src_url, r.depth) for r in rows] == [
        ("https://a/p1", "https://a/sm1.xml", 1),
        ("https://a/p2", "https://a/sm1.xml", 1),
        ("https://a/p3", "https://a/sm2.xml", 1),
    ]
    assert rows[2].lastmod_ts == datetime(2026, 5, 6, 7, 8, 9)


def test_expand_sitemaps_depth_cap_and_missing_doc(spark):
    # chain root → i1 → i2 → urlset, depth cap 2 stops before the urlset;
    # a dangling loc (not in corpus) behaves like a failed fetch
    corpus = spark.createDataFrame(
        [
            ("r", f"<sitemapindex {NS}><sitemap><loc>i1</loc></sitemap>"
                  "<sitemap><loc>gone</loc></sitemap></sitemapindex>"),
            ("i1", f"<sitemapindex {NS}><sitemap><loc>i2</loc>"
                   "</sitemap></sitemapindex>"),
            ("i2", _urlset("<url><loc>p</loc></url>")),
        ],
        "url string, body string",
    )
    seeds = spark.createDataFrame([("r",)], "url string")
    assert expand_sitemaps(seeds, corpus, max_depth=2).count() == 0
    full = expand_sitemaps(seeds, corpus, max_depth=3).collect()
    assert [(r.loc, r.depth) for r in full] == [("p", 2)]
