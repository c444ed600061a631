"""Admission-stage A/B at a large materialized frontier: full-scan vs heads.

The round-3 verdict's top scale item: full-scan admission re-ranks the
ENTIRE pending frontier every tick (O(|pending|) per epoch), while the
heads path reads one head-candidate row per host plus a touched-bucket
maintenance merge. This harness materializes a generative frontier of
--rows tasks across --hosts hosts as a bucketed catalog table, then times
the two admission shapes per tick, INTERLEAVED (full,heads,full,heads,...)
so co-tenant steal on this shared VM lands on both sides equally.

    python tools/heads_ab.py --rows 96000000 --hosts 20000 --workers 64 \
        --ticks 4 --cores 32

Measured stage per tick:
  full : admit(pending, hosts, t, workers)            -> count admitted
  heads: admit_heads(heads_table, hosts, t, workers)  -> count admitted
         + recompute top-1 for the admitted hosts' buckets and
           merge_bucketed them back (the per-tick maintenance cost)

The one-time heads build (a full-frontier window, same cost class as ONE
full-scan admission) is reported separately as build_heads_sec — it
amortizes over every subsequent tick of a 10^4-10^5-epoch crawl.

Prints one JSON line with per-tick seconds for both sides and the median
speedup. The frontier stays static across ticks (the deletes/enqueues of a
real tick touch the same buckets the maintenance merge rewrites, and are
measured by tools/epoch_profile.py); this isolates the ADMISSION stage,
which is what the full scan made O(|pending|).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rows", type=int, default=16_000_000)
    ap.add_argument("--hosts", type=int, default=20_000)
    ap.add_argument("--workers", type=int, default=64)
    ap.add_argument("--ticks", type=int, default=4)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--buckets", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from newsfeeds_crawler_spark.operators.politeness import (
        admit,
        admit_heads,
        head_candidates,
    )
    from newsfeeds_crawler_spark.session import get_spark
    from newsfeeds_crawler_spark.sources.frontier import mk_url_expr
    from newsfeeds_crawler_spark.tablestore import Catalog

    local_dir = "/dev/shm/spark-local"
    try:
        os.makedirs(local_dir, exist_ok=True)
        conf = {"spark.local.dir": local_dir}
    except OSError:
        conf = {}
    spark = get_spark(
        "nfc-heads-ab", cores=args.cores,
        shuffle_partitions=max(32, args.cores * 4), extra_conf=conf,
    )
    spark.sparkContext.setLogLevel("ERROR")

    wd = tempfile.mkdtemp(prefix="nfc_heads_ab_")
    cat = Catalog(spark, wd)

    # generative frontier in FRONTIER_SCHEMA shape (priority frontier off:
    # constant 0.0 -> pure FIFO, the oracle-checked mode)
    url = mk_url_expr(F.col("id"), args.hosts)
    frontier = spark.range(args.rows).select(
        url.alias("url"),
        url.alias("url_canon"),
        F.xxhash64(url).alias("url_hash"),
        F.concat(
            F.lit("host"), (F.col("id") % args.hosts).cast("string"),
            F.lit(".example.com"),
        ).alias("host"),
        F.lit("article").alias("kind"),
        F.lit(None).cast("string").alias("feed_canon"),
        F.lit(None).cast("timestamp").alias("parsed_pub_ts"),
        F.lit(0).cast("int").alias("e_epoch"),
        (F.col("id") % 2_000_000_000).cast("int").alias("e_rank"),
        F.lit(0).cast("int").alias("e_sub"),
        F.lit(0.0).alias("priority"),
        F.lit("pending").alias("state"),
        F.lit(None).cast("int").alias("fetch_epoch"),
        F.lit(None).cast("int").alias("admit_rank"),
    )
    t0 = time.time()
    fv = cat.write_bucketed(
        "frontier", frontier, key="xxhash64(host)", num_buckets=args.buckets
    )
    build_frontier = time.time() - t0

    hosts = spark.range(args.hosts).select(
        F.concat(
            F.lit("host"), F.col("id").cast("string"), F.lit(".example.com")
        ).alias("host"),
        F.lit(None).cast("int").alias("last_access_epoch"),
        F.lit(1).cast("int").alias("delay_epochs"),
    ).localCheckpoint(eager=True)

    t0 = time.time()
    hv = cat.write_bucketed(
        "frontier_heads",
        head_candidates(cat.read("frontier", fv)),
        key="xxhash64(host)",
        num_buckets=args.buckets,
    )
    build_heads = time.time() - t0

    full_ticks: list[float] = []
    heads_ticks: list[float] = []
    admitted_n = 0
    for t in range(args.ticks):
        # full-scan side
        t0 = time.time()
        pending = cat.read("frontier", fv).filter(F.col("state") == "pending")
        admitted_n = admit(pending, hosts, t, args.workers).count()
        full_ticks.append(time.time() - t0)

        # heads side: admission + per-tick maintenance merge
        t0 = time.time()
        heads = cat.read("frontier_heads", hv)
        adm = admit_heads(heads, hosts, t, args.workers).localCheckpoint(
            eager=True
        )
        n2 = adm.count()
        th = (
            adm.select(
                "host",
                F.pmod(F.xxhash64("host"), F.lit(args.buckets))
                .cast("int")
                .alias("__b"),
            )
            .distinct()
            .collect()
        )
        touched = {r["__b"] for r in th}
        th_df = spark.createDataFrame(
            [(r["host"],) for r in th], "host string"
        )
        live = (
            cat.read("frontier", fv, buckets=touched)
            .filter(F.col("state") == "pending")
            .join(F.broadcast(th_df), "host", "left_semi")
        )
        hv = cat.merge_bucketed(
            "frontier_heads",
            head_candidates(live),
            on="host",
            base_version=hv,
            deletes=th_df,
            touched=touched,
        )
        heads_ticks.append(time.time() - t0)
        assert n2 == admitted_n, (n2, admitted_n)

    med_full = sorted(full_ticks)[len(full_ticks) // 2]
    med_heads = sorted(heads_ticks)[len(heads_ticks) // 2]
    print(json.dumps({
        "rows": args.rows,
        "hosts": args.hosts,
        "workers": args.workers,
        "admitted_per_tick": admitted_n,
        "build_frontier_sec": round(build_frontier, 2),
        "build_heads_sec": round(build_heads, 2),
        "full_tick_sec": [round(x, 2) for x in full_ticks],
        "heads_tick_sec": [round(x, 2) for x in heads_ticks],
        "median_full_sec": round(med_full, 2),
        "median_heads_sec": round(med_heads, 2),
        "admission_speedup": round(med_full / med_heads, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
