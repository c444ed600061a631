"""Per-tick cost profiler for the crawl engine — the measurement harness
behind BENCH/BASELINE.md's epoch-cost A/B table.

Runs N ticks of a synthetic crawl and prints per-tick wall time plus the
per-table snapshot-write timings (the writes run concurrently, so their
sum exceeds the wall share they actually occupy). Compare two builds by
pointing PYTHONPATH at a `git archive` of the other revision.

    python tools/epoch_profile.py --feeds 300 --items 40 --hosts 1500 \
        --workers 2000 --cores 32 --ticks 5 [--use-bloom] [--seen-buckets 8]

Measure on an UNLOADED host and interleave A/B runs: single runs on a
shared VM swing ±30% from co-tenant steal.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--feeds", type=int, default=20)
    ap.add_argument("--items", type=int, default=20)
    ap.add_argument("--hosts", type=int, default=8)
    ap.add_argument("--workers", type=int, default=16)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--ticks", type=int, default=6)
    ap.add_argument("--use-bloom", action="store_true")
    ap.add_argument("--seen-filter", default="none",
                    choices=["none", "bloom", "cuckoo"])
    ap.add_argument("--seen-buckets", type=int, default=0)
    ap.add_argument("--corpus-buckets", type=int, default=0)
    ap.add_argument("--frontier-buckets", type=int, default=0)
    ap.add_argument("--hosts-buckets", type=int, default=16)
    ap.add_argument("--feeds-buckets", type=int, default=16)
    ap.add_argument("--salt-partitions", type=int, default=0)
    ap.add_argument("--no-speculative-gate", action="store_true")
    ap.add_argument("--no-frontier-heads", action="store_true")
    args = ap.parse_args()

    from newsfeeds_crawler_spark.plans import CrawlConfig, CrawlEngine
    from newsfeeds_crawler_spark.session import get_spark
    from newsfeeds_crawler_spark.synth import CorpusSpec, synthesize
    from newsfeeds_crawler_spark.synth.tables import (
        corpus_df, hosts_df, preseen_df, seeds_df,
    )

    spark = get_spark("nfc-epoch-profile", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = synthesize(CorpusSpec(
        n_feeds=args.feeds, items_per_feed=args.items, n_hosts=args.hosts
    ))
    cfg = CrawlConfig(
        workers=args.workers,
        use_bloom=args.use_bloom,
        seen_filter=args.seen_filter,
        seen_buckets=args.seen_buckets,
        corpus_buckets=args.corpus_buckets,
        frontier_buckets=args.frontier_buckets,
        hosts_buckets=args.hosts_buckets,
        feeds_buckets=args.feeds_buckets,
        salt_partitions=args.salt_partitions,
        speculative_gate=not args.no_speculative_gate,
        frontier_heads=not args.no_frontier_heads,
        max_epochs=args.ticks,
    )
    eng = CrawlEngine(
        spark, tempfile.mkdtemp(prefix="nfc_prof_"),
        corpus_df(spark, corpus), hosts_df(spark, corpus),
        seeds_df(spark, corpus), preseen_df(spark, corpus), cfg,
    )

    cat = eng.cat
    orig_write = cat.write
    times: dict[str, list[float]] = {}

    def timed_write(name, df, mode="overwrite", **kw):
        t0 = time.time()
        v = orig_write(name, df, mode=mode, **kw)
        times.setdefault(f"write:{name}", []).append(time.time() - t0)
        return v

    cat.write = timed_write
    for meth in ("merge_bucketed", "append_bucketed", "write_bucketed"):
        def _mk(m):
            orig = getattr(cat, m)

            def timed(name, *a, **kw):
                t0 = time.time()
                v = orig(name, *a, **kw)
                times.setdefault(f"{m}:{name}", []).append(time.time() - t0)
                return v

            return timed
        setattr(cat, meth, _mk(meth))
    v = eng.init_state()
    from pyspark.sql import functions as F

    from newsfeeds_crawler_spark.functions.urls import host_bucket

    counts = {
        r["b"]: r["n"]
        for r in cat.read("frontier", v["frontier"])
        .filter(F.col("state") == "pending")
        .groupBy(host_bucket(F.col("host"), cfg.num_host_buckets).alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for tick in range(args.ticks):
        t0 = time.time()
        r = eng._run_tick(tick, v, counts)
        if r is None:
            break
        v, meta, counts = r
        cat.commit_epoch(tick + 1, v, meta=meta)
        ph = getattr(eng, "last_tick_phases", {})
        print(f"tick {tick}: {time.time() - t0:.2f}s {meta} phases={ph}")
    for k, vals in sorted(times.items()):
        print(f"  {k}: n={len(vals)} avg={sum(vals) / len(vals):.2f}s "
              f"(concurrent — not additive wall time)")
    spark.stop()


if __name__ == "__main__":
    main()
