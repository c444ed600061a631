"""spark-submit entry point for the crawl engine.

Deployment shape per BASELINE.json north_rule — micro-epochs driven from a
single driver script shipped with the package:

    cd /root/repo && zip -qr /tmp/nfc.zip newsfeeds_crawler_spark
    spark-submit --py-files /tmp/nfc.zip tools/run_crawl.py \
        --workdir /data/crawl1 --feeds 100 --items 50 --epochs 200 \
        --workers 64 --salt-partitions 8

Local smoke (no cluster): python tools/run_crawl.py --workdir /tmp/crawl1

The corpus here is the deterministic synthetic one (the sandbox's "web");
on a real deployment the corpus DataFrame is replaced by the HTTP-fetch
UDF over the frontier (operators/fetchparse.fetch keeps the same contract:
admitted tasks in, (task, body) out).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description="Run the batch-iterative crawl")
    ap.add_argument("--workdir", required=True, help="state-table root (created)")
    ap.add_argument("--feeds", type=int, default=10)
    ap.add_argument("--items", type=int, default=20)
    ap.add_argument("--hosts", type=int, default=6)
    ap.add_argument("--epochs", type=int, default=10_000)
    ap.add_argument("--workers", type=int, default=3,
                    help="global in-flight cap (reference http.workersNum)")
    ap.add_argument("--salt-partitions", type=int, default=0,
                    help=">0 enables salted pre-rank for hot-host skew")
    ap.add_argument("--use-bloom", action="store_true",
                    help="Bloom-prefilter the seen probe")
    ap.add_argument("--seen-filter", choices=["none", "bloom", "cuckoo"],
                    default="bloom", help="persisted seen prefilter kind")
    ap.add_argument("--seen-buckets", type=int, default=16,
                    help="hash-bucket the seen_urls table; per-epoch merge "
                         "rewrites only touched buckets (0 = plain table)")
    ap.add_argument("--corpus-buckets", type=int, default=16,
                    help=">0 materializes a bucketed corpus copy and "
                         "partition-prunes every fetch scan (0 = the input "
                         "corpus is already bucket-partitioned)")
    ap.add_argument("--frontier-buckets", type=int, default=16,
                    help="hash-bucket the frontier on xxhash64(host); the "
                         "per-epoch state transition rewrites only touched "
                         "buckets (0 = full copy-on-write rewrite)")
    ap.add_argument("--compact-articles-every", type=int, default=0,
                    help="every N ticks, fold article buckets that "
                         "accumulated >8 append dirs to latest-per-url "
                         "(bucket-local rewrite); 0 = never")
    ap.add_argument("--depth-weight", type=float, default=0.0)
    ap.add_argument("--recency-weight", type=float, default=0.0)
    ap.add_argument("--host-pending-cap", type=int, default=0,
                    help="crawl-trap guard: max pending frontier rows per "
                         "host; overflow enqueues are dropped terminally "
                         "(quota_denied). Requires heads mode. 0 = off")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the last committed epoch in workdir")
    ap.add_argument("--config", default=None,
                    help=".properties file in the reference format "
                         "(feed.*/http.*/feedManager.*) — supplies workers, "
                         "tick and stall timeout; CLI flags still override "
                         "epochs/salting/bloom")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from newsfeeds_crawler_spark.plans.driver import CrawlConfig, CrawlEngine
    from newsfeeds_crawler_spark.session import get_spark
    from newsfeeds_crawler_spark.synth.corpus import CorpusSpec, synthesize
    from newsfeeds_crawler_spark.synth.tables import (
        corpus_df,
        hosts_df,
        preseen_df,
        seeds_df,
    )

    spark = get_spark("nfc-crawl", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")
    corpus = synthesize(
        CorpusSpec(
            n_feeds=args.feeds, items_per_feed=args.items, n_hosts=args.hosts
        )
    )
    common = dict(
        max_epochs=args.epochs,
        salt_partitions=args.salt_partitions,
        use_bloom=args.use_bloom,
        seen_filter=args.seen_filter,
        seen_buckets=args.seen_buckets,
        corpus_buckets=args.corpus_buckets,
        frontier_buckets=args.frontier_buckets,
        compact_articles_every=args.compact_articles_every,
        depth_weight=args.depth_weight,
        recency_weight=args.recency_weight,
        host_pending_cap=args.host_pending_cap,
    )
    if args.config:
        from newsfeeds_crawler_spark.config import CrawlerConfiguration

        cfg = CrawlerConfiguration.from_properties_file(
            args.config
        ).to_crawl_config(**common)
    else:
        cfg = CrawlConfig(workers=args.workers, **common)
    engine = CrawlEngine(
        spark,
        args.workdir,
        corpus_df(spark, corpus),
        hosts_df(spark, corpus),
        seeds_df(spark, corpus),
        preseen_df(spark, corpus),
        cfg,
    )
    import time as _time

    t0 = _time.time()
    result = engine.run(resume=args.resume, progress=True)
    crawl_s = _time.time() - t0
    arts = engine.articles_final()
    summary = {
        "epochs": result["epochs"],
        "crawl_seconds": round(crawl_s, 2),
        "fetched": engine.crawl_order().count(),
        "articles": arts.filter(arts["action"] != "preseen").count(),
        "feeds_done": engine.feeds_final().filter("state = 'done'").count(),
        "workdir": args.workdir,
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
