"""Mid-crawl robots refresh (versioned rules): engine vs oracle, exact.

Real crawls refetch robots.txt while running — rules and crawl-delays
change mid-crawl. The engine consumes a persisted update schedule
(CrawlEngine(robots_updates=)): each row takes effect at the START of its
effective epoch, and the versioning follows the gate placement — heads
mode gates at ENQUEUE (a pending row keeps the admission decided under
the rules in force at its enqueue epoch), the legacy full-frontier mode
re-checks pending rows against the CURRENT rules each tick. The oracle
replays both placements (simulate(robots_updates=, enqueue_robots=)), so
every assertion here is exact equality.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from newsfeeds_crawler_spark.oracle import simulate
from newsfeeds_crawler_spark.plans import CrawlConfig, CrawlEngine
from newsfeeds_crawler_spark.synth import CorpusSpec, synthesize
from newsfeeds_crawler_spark.synth.tables import (
    corpus_df,
    hosts_df,
    preseen_df,
    robots_updates_df,
    seeds_df,
)

# live feeds spread over epochs 0-3 (10 feeds, 4 hosts, workers=2), so
# enqueues span epochs 1-4 and the epoch-2..4 updates catch some enqueues
# under OLD rules and some under NEW — both gate placements get exercised
# against rows that straddle each flip
SPEC = CorpusSpec(
    n_feeds=10, items_per_feed=8, n_hosts=4, robots_frac=0.25, workers=2
)

# one schedule feeds BOTH sides (robots_updates_df for the engine, the raw
# dicts for the oracle): an allow-flip (host2 drops every rule at 2), a
# politeness slowdown (host3 1 s -> 3 s), a deny-flip (host1 loses /a/ at
# 3), and a combined rules+delay change (host0 at 4)
UPDATES = [
    {"host": "host2.example.com", "effective_epoch": 2, "disallow": []},
    {"host": "host3.example.com", "effective_epoch": 2,
     "crawl_delay_ms": 3000},
    {"host": "host1.example.com", "effective_epoch": 3,
     "disallow": ["/private/", "/a/"]},
    {"host": "host0.example.com", "effective_epoch": 4,
     "disallow": ["/private/", "/a/6/"], "crawl_delay_ms": 2000},
]


def _mk_engine(spark, corpus, wd, updates=UPDATES, **cfg_kwargs):
    cfg = CrawlConfig(
        workers=corpus.spec.workers, tick_ms=corpus.spec.tick_ms, **cfg_kwargs
    )
    return CrawlEngine(
        spark,
        wd,
        corpus_df(spark, corpus).cache(),
        hosts_df(spark, corpus),
        seeds_df(spark, corpus),
        preseen_df(spark, corpus),
        cfg,
        robots_updates=None if updates is None
        else robots_updates_df(spark, updates),
    )


def _assert_exact(eng, oracle):
    got_order = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in eng.crawl_order().collect()
    ]
    assert got_order == oracle.crawl_order
    got_seen = {
        r["url_canon"]: r["pub_ts"] for r in eng.articles_final().collect()
    }
    assert got_seen == oracle.seen
    feeds = {r["feed_canon"]: r for r in eng.feeds_final().collect()}
    assert set(feeds) == set(oracle.feeds)
    for fc, o in oracle.feeds.items():
        assert feeds[fc]["state"] == o["state"], fc
        assert feeds[fc]["last_pub_ts"] == o["last_pub_ts"], fc
    for state in ("robots_denied", "quota_denied"):
        got = {
            r["url_canon"]
            for r in eng.frontier_all()
            .filter(F.col("state") == state)
            .collect()
        }
        want = {t.url_canon for t in oracle.tasks if t.state == state}
        assert got == want, state


def _binding(oracle, baseline):
    """The planted updates must actually change the crawl — otherwise the
    equality below would also pass with the feature broken."""
    denied = lambda r: {t.url_canon for t in r.tasks if t.state == "robots_denied"}
    assert (
        oracle.crawl_order != baseline.crawl_order
        or denied(oracle) != denied(baseline)
    )
    return denied


def test_heads_mode_refresh_exact_and_binding(spark, tmp_path):
    """Heads mode (scale-path default): the enqueue-time gate reads the
    rule version in force at each task's ENQUEUE epoch."""
    corpus = synthesize(SPEC)
    oracle = simulate(corpus, robots_updates=UPDATES, enqueue_robots=True)
    baseline = simulate(corpus, enqueue_robots=True)
    denied = _binding(oracle, baseline)
    # both flip directions bind: the deny-flip denies NEW urls, the
    # allow-flip lets a url the static rules rejected get fetched
    assert denied(oracle) - denied(baseline)
    fetched = lambda r: {u for u, _, _ in r.crawl_order}
    assert fetched(oracle) - fetched(baseline)
    assert fetched(baseline) - fetched(oracle)

    eng = _mk_engine(spark, corpus, str(tmp_path / "heads"))
    eng.run()
    _assert_exact(eng, oracle)


def test_legacy_mode_refresh_exact(spark, tmp_path):
    """Legacy full-frontier mode: the admission-time gate re-checks every
    pending row against the CURRENT rules — a mid-crawl disallow kills
    rows that were enqueued under the old rules."""
    corpus = synthesize(SPEC)
    oracle = simulate(corpus, robots_updates=UPDATES, enqueue_robots=False)
    _binding(oracle, simulate(corpus, enqueue_robots=False))

    eng = _mk_engine(
        spark, corpus, str(tmp_path / "legacy"), frontier_heads=False
    )
    eng.run()
    _assert_exact(eng, oracle)


def test_gate_placement_diverges_under_updates(spark):
    """Documents WHY the oracle needs enqueue_robots: under a mid-crawl
    rule change the two gate placements produce genuinely different
    results (under static rules they are equivalent — pinned by the
    r1–r4 suites)."""
    corpus = synthesize(SPEC)
    enq = simulate(corpus, robots_updates=UPDATES, enqueue_robots=True)
    adm = simulate(corpus, robots_updates=UPDATES, enqueue_robots=False)
    assert enq.crawl_order != adm.crawl_order or {
        t.url_canon for t in enq.tasks if t.state == "robots_denied"
    } != {t.url_canon for t in adm.tasks if t.state == "robots_denied"}


def test_kill_resume_across_update_epoch(spark, tmp_path):
    """Kill between the two update epochs; the resumed engine replays the
    PERSISTED schedule (the constructor arg is ignored on resume) and
    converges to the oracle exactly — the applied-through marker plus
    idempotent re-application make the refresh crash-safe."""
    corpus = synthesize(SPEC)
    oracle = simulate(corpus, robots_updates=UPDATES, enqueue_robots=True)

    eng = _mk_engine(spark, corpus, str(tmp_path / "kr"), max_epochs=3)
    eng.run()
    resumed = _mk_engine(spark, corpus, str(tmp_path / "kr"), updates=None)
    resumed.run()
    _assert_exact(resumed, oracle)


def test_refresh_with_quota_exact(spark, tmp_path):
    """Rule changes interact with the crawl-trap quota: a newly-denied
    enqueue never consumes quota, a newly-allowed one does — both sides
    run the combined rule."""
    cap = 2
    corpus = synthesize(SPEC)
    oracle = simulate(corpus, robots_updates=UPDATES, host_pending_cap=cap)
    _binding(oracle, simulate(corpus, host_pending_cap=cap))

    eng = _mk_engine(
        spark, corpus, str(tmp_path / "quota"), host_pending_cap=cap
    )
    eng.run()
    _assert_exact(eng, oracle)


def test_schedule_validation(spark, tmp_path):
    corpus = synthesize(CorpusSpec(n_feeds=3, items_per_feed=3, n_hosts=3))
    bad_epoch = [{"host": "host0.example.com", "effective_epoch": 0,
                  "disallow": []}]
    with pytest.raises(Exception, match="effective_epoch"):
        _mk_engine(spark, corpus, str(tmp_path / "v0"), updates=bad_epoch).run()
    dup = [
        {"host": "host0.example.com", "effective_epoch": 2, "disallow": []},
        {"host": "host0.example.com", "effective_epoch": 2,
         "disallow": ["/a/"]},
    ]
    with pytest.raises(Exception, match="duplicate"):
        _mk_engine(spark, corpus, str(tmp_path / "v1"), updates=dup).run()
