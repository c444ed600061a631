"""One-shot page download to a file — debug analog of the reference's
tools/DownloadPage.scala:17-31 (args: url, output file).

The sandbox has no network, so the "web" is a corpus: either a parquet
path with the engine's corpus schema (--corpus) or the deterministic
synthetic corpus (--synth). The fetch runs through the REAL engine path —
operators.fetchparse.fetch over a 1-row admitted DataFrame — so what this
tool prints is exactly what an epoch would see for that URL.

    python tools/download_page.py --url http://host0.../feed.xml \
        --out /tmp/page.html [--corpus /path/corpus.parquet | --synth]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description="Fetch ONE url from the corpus")
    ap.add_argument("--url", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--corpus", help="parquet path with the corpus schema")
    ap.add_argument("--synth", action="store_true",
                    help="use the deterministic synthetic corpus")
    ap.add_argument("--feeds", type=int, default=10)
    ap.add_argument("--items", type=int, default=20)
    ap.add_argument("--hosts", type=int, default=6)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from newsfeeds_crawler_spark.functions.urls import canonicalize_url, url_host
    from newsfeeds_crawler_spark.operators.fetchparse import fetch
    from newsfeeds_crawler_spark.session import get_spark

    spark = get_spark("nfc-download-page", cores=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    if args.corpus:
        corpus = spark.read.parquet(args.corpus)
    elif args.synth:
        from newsfeeds_crawler_spark.synth.corpus import CorpusSpec, synthesize
        from newsfeeds_crawler_spark.synth.tables import corpus_df

        corpus = corpus_df(spark, synthesize(CorpusSpec(
            n_feeds=args.feeds, items_per_feed=args.items, n_hosts=args.hosts
        )))
    else:
        ap.error("one of --corpus / --synth is required")

    one = (
        spark.createDataFrame([(args.url,)], ["url"])
        .withColumn("url_canon", canonicalize_url("url"))
        .withColumn("host", url_host(F.col("url_canon"), canonical=True))
    )
    row = fetch(one, corpus, materialize=False).collect()[0]
    if row["body"] is None:
        print(f"NULL body (status={row['status']}) for {row['url_canon']}")
        spark.stop()
        sys.exit(1)
    with open(args.out, "w", encoding="utf-8") as f:
        f.write(row["body"])
    print(f"wrote {len(row['body'])} chars to {args.out} "
          f"(status={row['status']}, host={row['host']})")
    spark.stop()


if __name__ == "__main__":
    main()
