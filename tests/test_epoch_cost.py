"""Per-epoch fixed-cost regression pin: JOBS launched per steady tick.

Wall-clock on this shared host swings ±30% from co-tenant steal, so the
epoch-cost guard pins the noise-free proxy instead: the number of Spark
jobs a steady-state tick launches. The tick DAG is deterministic (fixed
config ⇒ fixed plan ⇒ fixed job count modulo AQE's ±ε), so a structural
regression — a phase that stops being fused, a collect that sneaks into a
loop, a write that stops overlapping — shows up as a job-count jump long
before it is measurable through the noise.

Measured reference points (8 cores, 20-feed synth corpus):
  - scale-path defaults (bloom + seen/corpus/frontier/hosts/feeds buckets
    16, incremental heads admission): ~51
  - all bucketing off: ~36
Bounds below leave ~20% headroom over those. Round-4 cuts that set these
levels: tick plans run on an AQE-off cloned session (every tick plan is
hand-shaped, so AQE only added one job per shuffle stage), the persisted
seen-filter is cached in memory across ticks, the robots split and article
rows are checkpointed once instead of re-broadcast per consumer, the three
feed-count deltas fold into one aggregate, and the seen/frontier merges
reuse touched-bucket sets collected once per tick.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from newsfeeds_crawler_spark.functions.urls import host_bucket
from newsfeeds_crawler_spark.plans import CrawlConfig, CrawlEngine
from newsfeeds_crawler_spark.synth import CorpusSpec, synthesize
from newsfeeds_crawler_spark.synth.tables import (
    corpus_df,
    hosts_df,
    preseen_df,
    seeds_df,
)


def _jobs_store(spark):
    try:
        return spark.sparkContext._jsc.sc().statusStore()
    except Exception:  # pragma: no cover - private API moved
        pytest.skip("statusStore not reachable on this Spark build")


def _steady_tick_jobs(spark, cfg: CrawlConfig, ticks: int = 4) -> int:
    corpus = synthesize(CorpusSpec(n_feeds=20, items_per_feed=20, n_hosts=8))
    eng = CrawlEngine(
        spark, tempfile.mkdtemp(prefix="nfc_jobs_"),
        corpus_df(spark, corpus), hosts_df(spark, corpus),
        seeds_df(spark, corpus), preseen_df(spark, corpus), cfg,
    )
    store = _jobs_store(spark)
    v = eng.init_state()
    counts = {
        r["b"]: r["n"]
        for r in eng.cat.read("frontier", v["frontier"])
        .filter(F.col("state") == "pending")
        .groupBy(host_bucket(F.col("host"), cfg.num_host_buckets).alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    last = 0
    for tick in range(ticks):
        j0 = store.jobsList(None).size()
        r = eng._run_tick(tick, v, counts)
        assert r is not None
        v, meta, counts = r
        eng.cat.commit_epoch(tick + 1, v, meta=meta)
        last = store.jobsList(None).size() - j0
    return last


def test_steady_tick_job_count_default_scale_path(spark):
    n = _steady_tick_jobs(spark, CrawlConfig(workers=16, max_epochs=8))
    assert n <= 62, (
        f"steady tick launched {n} jobs at scale-path defaults "
        f"(reference ~51): a fixed-cost fusion regressed"
    )


def test_steady_tick_job_count_buckets_off(spark):
    cfg = CrawlConfig(
        workers=16, max_epochs=8, seen_filter="none",
        seen_buckets=0, corpus_buckets=0, frontier_buckets=0,
    )
    n = _steady_tick_jobs(spark, cfg)
    assert n <= 45, (
        f"steady tick launched {n} jobs with bucketing off "
        f"(reference ~36): a fixed-cost fusion regressed"
    )


def test_bucket_sizing_rule_warns_and_auto_sizes():
    """The measured heads-A/B rule (frontier_buckets >= 4×workers or the
    maintenance merges degenerate to full rewrites) is engine behavior:
    undersized configs warn by default and auto-raise to the next power of
    two under auto_size_buckets. The sizing check runs before any Spark
    machinery, so a None session suffices."""
    import warnings

    from newsfeeds_crawler_spark.plans.driver import CrawlEngine

    def _init(cfg):
        eng = CrawlEngine.__new__(CrawlEngine)
        try:
            CrawlEngine.__init__(eng, None, None, None, None, None, None, cfg)
        except AttributeError:
            pass  # the None spark session fails past the sizing check
        return eng

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _init(CrawlConfig(workers=16, frontier_buckets=16))
    assert any("4×workers" in str(x.message) for x in w)

    eng = _init(
        CrawlConfig(workers=16, frontier_buckets=16, auto_size_buckets=True)
    )
    assert eng.cfg.frontier_buckets == 64

    # well-sized configs are untouched and silent
    with warnings.catch_warnings(record=True) as w3:
        warnings.simplefilter("always")
        eng3 = _init(CrawlConfig(workers=3, frontier_buckets=16))
    assert not [x for x in w3 if "4×workers" in str(x.message)]
    assert eng3.cfg.frontier_buckets == 16
