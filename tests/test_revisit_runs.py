"""Cross-run revisit composition: engine feeds table → change
observations → revisit schedule → seed deferral for the next run."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from newsfeeds_crawler_spark.operators.revisit import (
    due_seeds,
    revisit_observations,
    revisit_schedule,
)
from newsfeeds_crawler_spark.plans import CrawlConfig, CrawlEngine
from newsfeeds_crawler_spark.synth import CorpusSpec, synthesize
from newsfeeds_crawler_spark.synth.tables import (
    corpus_df,
    hosts_df,
    preseen_df,
    seeds_df,
)

SPEC = CorpusSpec(
    n_hosts=4,
    n_feeds=4,
    items_per_feed=4,
    preseen_frac=0.0,
    dup_frac=0.0,
    dead_item_frac=0.0,
    no_caption_frac=0.0,
    null_pubdate_frac=0.0,
    robots_frac=0.0,
    with_dead_feed=False,
    with_unparseable_feed=False,
    with_empty_feed=False,
)


@pytest.fixture(scope="module")
def first_run(spark, tmp_path_factory):
    corpus = synthesize(SPEC)
    eng = CrawlEngine(
        spark,
        str(tmp_path_factory.mktemp("rv1")),
        corpus_df(spark, corpus).cache(),
        hosts_df(spark, corpus),
        seeds_df(spark, corpus),
        preseen_df(spark, corpus),
        CrawlConfig(workers=SPEC.workers, tick_ms=SPEC.tick_ms),
    )
    eng.run()
    return corpus, eng


def test_observations_changed_flags(spark, first_run):
    corpus, eng = first_run
    feeds = eng.feeds_final()
    done = feeds.filter(F.col("state") == "done")
    assert done.count() == SPEC.n_feeds
    # identical snapshot → every revisited feed unchanged
    obs = revisit_observations(feeds, feeds, epoch=1)
    rows = obs.collect()
    assert len(rows) == feeds.count()
    assert all(r.changed == 0 for r in rows)
    # shift one feed's prior watermark back a day → changed fires for it
    target = done.orderBy("seed_idx").first().feed_canon
    prior = feeds.withColumn(
        "last_pub_ts",
        F.when(
            F.col("feed_canon") == target,
            F.col("last_pub_ts") - F.expr("INTERVAL 1 DAY"),
        ).otherwise(F.col("last_pub_ts")),
    )
    obs2 = {r.feed_canon: r.changed for r in
            revisit_observations(prior, feeds, epoch=1).collect()}
    assert obs2[target] == 1
    assert sum(obs2.values()) == 1
    # a feed absent from the prior run yields no observation
    obs3 = revisit_observations(
        prior.filter(F.col("feed_canon") != target), feeds, epoch=1
    )
    assert obs3.filter(F.col("feed_canon") == target).count() == 0


def test_schedule_defers_stable_feeds_and_next_run_converges(
    spark, first_run, tmp_path
):
    corpus, eng = first_run
    feeds = eng.feeds_final()
    target = (
        feeds.filter(F.col("state") == "done")
        .orderBy("seed_idx")
        .first()
        .feed_canon
    )
    # history: 3 revisits; `target` changed every time, the rest never
    obs = []
    for ep in (1, 2, 3):
        prior = feeds.withColumn(
            "last_pub_ts",
            F.when(
                F.col("feed_canon") == target,
                F.col("last_pub_ts") - F.expr(f"INTERVAL {ep} DAY"),
            ).otherwise(F.col("last_pub_ts")),
        )
        obs.append(revisit_observations(prior, feeds, epoch=ep))
    history = obs[0].unionByName(obs[1]).unionByName(obs[2])
    sched = revisit_schedule(
        history, id_col="feed_canon", max_epochs=100
    )
    s = {r.feed_canon: r for r in sched.collect()}
    assert s[target].interval_epochs == 1          # hot feed: due at 4
    assert all(
        r.interval_epochs == 100                   # stable feeds: epoch 103
        for k, r in s.items()
        if k != target
    )
    due, deferred = due_seeds(
        seeds_df(spark, corpus), sched, run_epoch=s[target].next_fetch_epoch
    )
    due_urls = [r.url for r in due.collect()]
    n_def = deferred.count()
    # only the hot feed is due; every other crawled feed deferred (seeds
    # that never completed have no schedule row and would stay due)
    from newsfeeds_crawler_spark.functions.urls import canonicalize_url

    due_canon = due.select(
        canonicalize_url(F.col("url")).alias("c")
    ).collect()
    assert [r.c for r in due_canon] == [target]
    assert n_def == SPEC.n_feeds - 1
    # the next run over the due subset converges and crawls ONLY that feed
    eng2 = CrawlEngine(
        spark,
        str(tmp_path / "rv2"),
        corpus_df(spark, corpus),
        hosts_df(spark, corpus),
        due,
        preseen_df(spark, corpus),
        CrawlConfig(workers=SPEC.workers, tick_ms=SPEC.tick_ms),
    )
    eng2.run()
    hosts_crawled = {
        r.feed_canon
        for r in eng2.feeds_final().filter(F.col("state") == "done").collect()
    }
    assert hosts_crawled == {target}
    assert eng2.crawl_order().count() > 0
