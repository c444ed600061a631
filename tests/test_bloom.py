from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from newsfeeds_crawler_spark.operators.bloom import PartitionedBloom


def _keys_df(spark, keys):
    return spark.createDataFrame([(int(k),) for k in keys], ["url_hash"])


def test_no_false_negatives_and_bounded_fpr(spark):
    rng = np.random.default_rng(42)
    members = rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)
    members = np.unique(members)
    others = rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)
    others = np.setdiff1d(np.unique(others), members)

    bloom = PartitionedBloom.build(
        _keys_df(spark, members), num_buckets=8,
        expected_per_bucket=len(members) // 8, fpp=0.01,
    )
    maybe, new = bloom.split(_keys_df(spark, members), "url_hash")
    assert new.count() == 0                      # zero false negatives
    assert maybe.count() == len(members)

    maybe_o, new_o = bloom.split(_keys_df(spark, others), "url_hash")
    fpr = maybe_o.count() / len(others)
    assert fpr < 0.03, fpr                       # ~fpp with slack


def test_merge_is_bitwise_or(spark):
    a_keys, b_keys = [1, 2, 3], [100, 200]
    kw = dict(num_buckets=4, expected_per_bucket=1000, fpp=0.01)
    a = PartitionedBloom.build(_keys_df(spark, a_keys), **kw)
    b = PartitionedBloom.build(_keys_df(spark, b_keys), **kw)
    merged = a.merge(b)
    maybe, new = merged.split(_keys_df(spark, a_keys + b_keys), "url_hash")
    assert new.count() == 0


def test_state_table_roundtrip(spark):
    bloom = PartitionedBloom.build(
        _keys_df(spark, range(100)), num_buckets=4,
        expected_per_bucket=100, fpp=0.01,
    )
    df = bloom.to_df(spark)
    back = PartitionedBloom.from_df(df, bloom.m, bloom.k, bloom.num_buckets)
    assert back.filters == bloom.filters


def test_crawl_with_bloom_prefilter_identical(spark, tmp_path):
    from newsfeeds_crawler_spark.oracle import simulate
    from newsfeeds_crawler_spark.plans import CrawlConfig, CrawlEngine
    from newsfeeds_crawler_spark.synth import CorpusSpec, synthesize
    from newsfeeds_crawler_spark.synth.tables import (
        corpus_df, hosts_df, preseen_df, seeds_df,
    )

    corpus = synthesize(CorpusSpec(n_feeds=5, items_per_feed=6, n_hosts=4))
    oracle = simulate(corpus)
    eng = CrawlEngine(
        spark, str(tmp_path / "bloom"),
        corpus_df(spark, corpus).cache(), hosts_df(spark, corpus),
        seeds_df(spark, corpus), preseen_df(spark, corpus),
        CrawlConfig(workers=corpus.spec.workers, use_bloom=True,
                    bloom_expected_per_bucket=1000),
    )
    eng.run()
    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in eng.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
    seen = {r["url_canon"]: r["pub_ts"] for r in eng.articles_final().collect()}
    assert seen == oracle.seen


def test_filter_persisted_not_rebuilt_per_epoch(spark, tmp_path, monkeypatch):
    """The bloom blobs live in the seen_filter state table: built once,
    then delta-merged per epoch (O(|upserts|)) — never rebuilt from the
    full store."""
    from newsfeeds_crawler_spark.oracle import simulate
    from newsfeeds_crawler_spark.plans import CrawlConfig, CrawlEngine
    from newsfeeds_crawler_spark.synth import CorpusSpec, synthesize
    from newsfeeds_crawler_spark.synth.tables import (
        corpus_df, hosts_df, preseen_df, seeds_df,
    )

    full_builds = []
    orig_build = PartitionedBloom.build  # staticmethod -> plain function

    def counting_build(df, key="url_hash", num_buckets=16,
                       expected_per_bucket=100_000, fpp=0.01, m=None, k=None):
        if m is None:  # full build (delta builds pass explicit m/k)
            full_builds.append(1)
        return orig_build(df, key, num_buckets, expected_per_bucket, fpp, m, k)

    monkeypatch.setattr(PartitionedBloom, "build", staticmethod(counting_build))

    corpus = synthesize(CorpusSpec(n_feeds=5, items_per_feed=6, n_hosts=4))
    oracle = simulate(corpus)
    eng = CrawlEngine(
        spark, str(tmp_path / "pf"),
        corpus_df(spark, corpus).cache(), hosts_df(spark, corpus),
        seeds_df(spark, corpus), preseen_df(spark, corpus),
        CrawlConfig(workers=corpus.spec.workers, seen_filter="bloom",
                    bloom_expected_per_bucket=1000),
    )
    res = eng.run()
    assert res["epochs"] >= 3
    assert len(full_builds) == 1          # exactly one O(|seen|) build
    assert eng.cat.exists("seen_filter")  # blobs snapshotted per epoch
    assert eng.cat.meta("seen_filter")["kind"] == "bloom"
    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in eng.crawl_order().collect()
    ]
    assert got == oracle.crawl_order
