"""clientHttpParams consumption: simulated latency + socket timeout.

The latency is a pure function of the canonical URL computed TWICE — as a
Catalyst expression in the engine and as zlib.crc32 in the oracle — so the
first test pins their bit-for-bit agreement (Spark's crc32 is the same
CRC-32 as zlib's). The rest pins the param plumbing end-to-end:
.properties → CrawlerConfiguration → CrawlConfig → fetch behavior.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from newsfeeds_crawler_spark.config import CrawlerConfiguration, parse_properties
from newsfeeds_crawler_spark.functions.httpsim import (
    LATENCY_MOD_MS,
    SOCKET_TIMEOUT_PARAM,
    sim_latency_ms,
    sim_latency_ms_py,
    socket_timeout_ms,
)
from newsfeeds_crawler_spark.operators.fetchparse import fetch


def test_spark_and_python_latency_agree(spark):
    urls = [
        "http://example.com/feed.rss",
        "http://sub.example.org/a/b?q=1",
        "https://xn--e1afmkfd.xn--p1ai/новости",  # non-ASCII round-trip
        "http://h0.example.net/items/00042",
        "",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url_canon"])
    got = {
        r["url_canon"]: r["lat"]
        for r in df.select("url_canon", sim_latency_ms("url_canon").alias("lat")).collect()
    }
    for u in urls:
        want = sim_latency_ms_py(u)
        assert got[u] == want, u
        assert 0 <= want < LATENCY_MOD_MS


def test_socket_timeout_param_extraction():
    assert socket_timeout_ms({}) == 0
    assert socket_timeout_ms({SOCKET_TIMEOUT_PARAM: 0}) == 0
    assert socket_timeout_ms({SOCKET_TIMEOUT_PARAM: 9000}) == 9000


def test_properties_to_crawl_config_carries_http_params():
    props = parse_properties(
        "\n".join(
            [
                "feed.feedListFile=feeds.txt",
                "http.workersNum=3",
                "http.hostAccessInterval=1000",
                "feedManager.maxWaitingTimeBeforeStop=60000",
                "db.url=jdbc:mysql://x/y",
                "db.username=u",
                "db.password=p",
                f"httpClient.{SOCKET_TIMEOUT_PARAM}=9000i",
                "httpClient.http.connection.timeout=4000i",
            ]
        )
    )
    cfg = CrawlerConfiguration.from_properties(props).to_crawl_config()
    assert cfg.client_http_params[SOCKET_TIMEOUT_PARAM] == 9000
    assert socket_timeout_ms(cfg.client_http_params) == 9000


def test_fetch_times_out_slow_urls(spark):
    """A 200 page whose latency >= timeout fetches with a null body; a fast
    one keeps its body; a corpus miss stays a connection failure."""
    urls = [f"http://t.example.com/p{i}" for i in range(40)]
    timeout = 15_000
    slow = next(u for u in urls if sim_latency_ms_py(u) >= timeout)
    fast = next(u for u in urls if sim_latency_ms_py(u) < timeout)
    corpus = spark.createDataFrame(
        [
            (u, 200, f"body-of-{u}", None, None, None, None, None, None)
            for u in (slow, fast)
        ],
        "url_canon string, status int, body string, bytes binary, w int,"
        " h int, fmt string, caption string, phash long",
    )
    admitted = spark.createDataFrame(
        [(slow,), (fast,), ("http://t.example.com/missing",)], ["url_canon"]
    )
    rows = {
        r["url_canon"]: r
        for r in fetch(
            admitted, corpus, materialize=False, socket_timeout_ms=timeout
        ).collect()
    }
    assert rows[slow]["body"] is None
    assert rows[fast]["body"] == f"body-of-{fast}"
    assert rows["http://t.example.com/missing"]["body"] is None
    # timeout disabled -> the slow page fetches normally
    rows0 = {
        r["url_canon"]: r
        for r in fetch(admitted, corpus, materialize=False).collect()
    }
    assert rows0[slow]["body"] == f"body-of-{slow}"
