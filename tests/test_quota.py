"""Per-host pending quota (crawl-trap guard) — engine vs oracle equivalence.

The guard caps the number of PENDING frontier rows per host: overflow
enqueues are terminal 'quota_denied' (they process for their feed at their
enqueue epoch, exactly like an enqueue-time robots denial), so a link-farm
host can never grow its queue without bound while politeness admits it one
URL per delay window. No reference analog (the reference's mailbox is
unbounded, HttpManager.scala:76-94) — this is a priority-frontier extension
for the 10^10-frontier target, so the oracle simulator replays the exact
bulk rule and the suite pins equality.
"""

from __future__ import annotations

import pytest

from newsfeeds_crawler_spark.oracle import simulate
from newsfeeds_crawler_spark.plans import CrawlConfig, CrawlEngine
from newsfeeds_crawler_spark.synth import CorpusSpec, synthesize
from newsfeeds_crawler_spark.synth.tables import (
    corpus_df,
    hosts_df,
    preseen_df,
    seeds_df,
)

# 2 hosts x 48 items: per-host queues far exceed a cap of 2, so the guard
# must bite; robots_frac (default 0.08) keeps enqueue-time robots denials
# in the mix, pinning the robots-before-quota consumption order
SPEC = CorpusSpec(n_feeds=6, items_per_feed=8, n_hosts=2)
CAP = 2


def _mk_engine(spark, corpus, wd, **cfg_kwargs):
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
    )


@pytest.fixture(scope="module")
def quota_run(spark, tmp_path_factory):
    corpus = synthesize(SPEC)
    oracle = simulate(corpus, host_pending_cap=CAP)
    eng = _mk_engine(
        spark, corpus, str(tmp_path_factory.mktemp("quota")),
        host_pending_cap=CAP,
    )
    eng.run()
    return corpus, oracle, eng


def test_quota_binds(quota_run):
    corpus, oracle, eng = quota_run
    denied = [t for t in oracle.tasks if t.state == "quota_denied"]
    assert denied, "cap=2 on a 2-host corpus must deny something"
    # and the guard changes the crawl vs the uncapped run
    uncapped = simulate(corpus)
    assert oracle.crawl_order != uncapped.crawl_order


def test_quota_crawl_order_and_seen_exact(quota_run):
    corpus, oracle, eng = quota_run
    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in eng.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
    got_seen = {
        r["url_canon"]: r["pub_ts"] for r in eng.articles_final().collect()
    }
    assert got_seen == oracle.seen


def test_quota_denials_logged_exactly(quota_run):
    corpus, oracle, eng = quota_run
    want = {
        (t.url_canon, t.key[0], t.key[1], t.key[2])
        for t in oracle.tasks
        if t.state == "quota_denied"
    }
    got = {
        (r["url_canon"], r["e_epoch"], r["e_rank"], r["e_sub"])
        for r in eng.cat.read_committed("frontier_log")
        .filter("state = 'quota_denied'")
        .collect()
    }
    assert got == want


def test_quota_counts_drain_to_zero(quota_run):
    """Induction check on the incremental per-host counts: at convergence
    every pending row has left the frontier, so every maintained count must
    be exactly 0 — any drift (missed decrement / double increment) shows
    up here."""
    corpus, oracle, eng = quota_run
    rows = eng.cat.read_committed("hosts").select(
        "host", "pending_count"
    ).collect()
    assert rows
    assert all(r["pending_count"] == 0 for r in rows), sorted(
        (r["host"], r["pending_count"]) for r in rows if r["pending_count"]
    )


def test_quota_feed_states_match(quota_run):
    corpus, oracle, eng = quota_run
    got = {
        r["feed_canon"]: (r["state"], r["last_pub_ts"])
        for r in eng.cat.read_committed("feeds").collect()
    }
    want = {
        fc: (st["state"], st["last_pub_ts"]) for fc, st in oracle.feeds.items()
    }
    assert got == want


def test_quota_kill_and_resume_converges_identically(spark, tmp_path):
    """The counts live in the snapshot-versioned hosts table, so a
    mid-crawl kill + resume must converge to the identical state."""
    corpus = synthesize(SPEC)
    oracle = simulate(corpus, host_pending_cap=CAP)

    eng = _mk_engine(
        spark, corpus, str(tmp_path / "qkill"),
        host_pending_cap=CAP, max_epochs=3,
    )
    eng.run()
    resumed = _mk_engine(
        spark, corpus, str(tmp_path / "qkill"), host_pending_cap=CAP
    )
    resumed.run()
    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in resumed.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
    rows = resumed.cat.read_committed("hosts").collect()
    assert all(r["pending_count"] == 0 for r in rows)


def test_quota_requires_heads_mode(spark, tmp_path):
    corpus = synthesize(CorpusSpec(n_feeds=2, items_per_feed=2, n_hosts=2))
    eng = _mk_engine(
        spark, corpus, str(tmp_path / "qlegacy"),
        host_pending_cap=CAP, frontier_heads=False,
    )
    with pytest.raises(ValueError, match="host_pending_cap"):
        eng.run()
