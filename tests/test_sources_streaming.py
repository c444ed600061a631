"""sources/ (generative frontier, bucketed storage) and streaming/ (micro-
batch admission, watermark windows)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from newsfeeds_crawler_spark.sources.frontier import (
    generative_frontier,
    generative_seen,
    read_bucket,
    write_bucketed,
)
from newsfeeds_crawler_spark.streaming.frontier_stream import (
    host_fetch_windows,
    stream_crawl,
)


def test_generative_frontier_shape_and_determinism(spark):
    f1 = generative_frontier(spark, 1000, 10)
    f2 = generative_frontier(spark, 1000, 10)
    assert f1.count() == 1000
    assert f1.select("host").distinct().count() == 10
    r1 = {r.id: r.url_hash for r in f1.collect()}
    r2 = {r.id: r.url_hash for r in f2.collect()}
    assert r1 == r2
    # canonical form is lower-case, port-stripped, slash-collapsed
    row = f1.filter(F.col("id") == 7).collect()[0]
    assert row.url_canon == "http://host7.example.com/page/7"


def test_generative_seen_hashes_agree_with_frontier(spark):
    f = generative_frontier(spark, 100, 10)
    s = generative_seen(spark, 50, 10, stride=2)
    hits = f.join(s, "url_hash", "left_semi").count()
    assert hits == 50  # exactly the even ids


def test_bucketed_write_prunes_partitions(spark, tmp_path):
    path = str(tmp_path / "bucketed")
    f = generative_frontier(spark, 500, 10)
    write_bucketed(f, path, num_buckets=8)
    one = read_bucket(spark, path, 3)
    # pruned read only touches bucket=3 files
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert one.count() > 0
    total = sum(
        read_bucket(spark, path, b).count() for b in range(8)
    )
    assert total == 500
    assert "bucket" in plan


def test_stream_crawl_matches_batch_semantics(spark, tmp_path):
    frontier_dir = str(tmp_path / "frontier_in")
    workdir = str(tmp_path / "stream_work")
    os.makedirs(frontier_dir)
    # two micro-batches, overlapping URLs: batch1 ids 0..99, batch2 50..149
    base = generative_frontier(spark, 150, 5).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        "url_canon",
        "url_hash",
        "host",
        F.lit(None).cast("timestamp").alias("enqueue_ts"),
        F.col("id").alias("seq"),
    )
    base.filter(F.col("seq") < 100).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "b1")
    )
    base.filter(F.col("seq") >= 50).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "b2")
    )
    # land batch files in order (separate mtimes so the stream sees b1 first)
    for i, src in enumerate(["b1", "b2"]):
        for fn in os.listdir(str(tmp_path / src)):
            if fn.endswith(".parquet"):
                os.rename(
                    str(tmp_path / src / fn), f"{frontier_dir}/batch{i}.parquet"
                )
        time.sleep(1.1)
    q = stream_crawl(spark, frontier_dir, workdir, workers=3)
    q.awaitTermination(120)
    admitted = spark.read.parquet(os.path.join(workdir, "admitted"))
    rows = admitted.orderBy("batch_id", "admit_rank").collect()
    # batch semantics: per batch, one URL per host (5 hosts), capped at 3
    for bid in {r.batch_id for r in rows}:
        batch_rows = [r for r in rows if r.batch_id == bid]
        assert len(batch_rows) <= 3
        hosts = [r.host for r in batch_rows]
        assert len(hosts) == len(set(hosts))
    # streamed seen-set: a URL admitted in batch 0 is never re-admitted
    seqs = [r.seq for r in rows]
    assert len(seqs) == len(set(seqs))


def test_host_fetch_windows_batch_semantics(spark):
    # watermark logic is exercised on a batch frame (same expression tree);
    # full streaming watermark behavior needs a long-running source
    df = spark.createDataFrame(
        [("h1", "2024-01-01 00:01:00"), ("h1", "2024-01-01 00:04:00"),
         ("h2", "2024-01-01 00:12:00")],
        ["host", "ts"],
    ).select("host", F.col("ts").cast("timestamp").alias("fetch_ts"))
    out = {
        (r.host, str(r.win_start)): r.n_fetched
        for r in host_fetch_windows(df).collect()
    }
    assert out[("h1", "2024-01-01 00:00:00")] == 2
    assert out[("h2", "2024-01-01 00:10:00")] == 1
