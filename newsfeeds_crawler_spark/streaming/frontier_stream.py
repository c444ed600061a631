"""Structured Streaming front-end for the crawl engine.

The reference is a run-to-completion batch job (ProjectManager.scala:48-51),
so the core engine is batch-iterative (plans/driver.py). This module is the
streaming deployment shape for a *continuously fed* frontier: new frontier
files land in a directory, each micro-batch runs the same admission
semantics (in-batch dedup → seen anti-join → per-host politeness top-1 →
worker cap) via ``foreachBatch``, appending admitted rows and advancing the
seen store. Semantics per micro-batch are identical to one engine epoch —
``tests/test_streaming.py`` pins a streamed run against the batch operators.

``host_fetch_windows`` is the watermarked event-time aggregation
(late-data-tolerant per-host fetch rates) a crawl dashboard needs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

FRONTIER_STREAM_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_canon", StringType(), False),
        StructField("url_hash", LongType(), False),
        StructField("host", StringType(), False),
        StructField("enqueue_ts", TimestampType(), True),
        StructField("seq", LongType(), False),
    ]
)


def _batch_dirs(root: str, below: int) -> list[str]:
    """Per-batch state dirs b<id> with id < ``below`` (replay-safe: a
    replayed batch never reads its own orphan output)."""
    if not os.path.isdir(root):
        return []
    out = []
    for d in os.listdir(root):
        if d.startswith("b") and d[1:].isdigit() and int(d[1:]) < below:
            if os.path.exists(os.path.join(root, d, "_SUCCESS")):
                out.append(os.path.join(root, d))
    return out


def _admit_batch(batch: DataFrame, workdir: str, workers: int,
                 batch_id: int) -> None:
    """One micro-batch = one engine epoch, with two properties the
    foreachBatch shape needs explicitly:

    - **pending carry-over**: rows losing the per-host top-1 or the worker
      cap are persisted as pending state and re-enter the next batch (the
      engine keeps such rows in the frontier table) — never dropped;
    - **idempotent replay**: every sink writes to a per-batch_id directory
      with mode=overwrite, and every read excludes dirs >= this batch_id,
      so a failure between writes or a checkpoint replay rewrites the same
      directories instead of duplicating rows.
    """
    spark = batch.sparkSession
    seen_dir = os.path.join(workdir, "seen")
    out_dir = os.path.join(workdir, "admitted")
    pend_dir = os.path.join(workdir, "pending")

    batch = batch.dropDuplicates(["url_hash"])
    pend_prior = _batch_dirs(pend_dir, batch_id)
    if pend_prior:
        # newest committed pending snapshot (cumulative — see write below)
        newest = max(pend_prior, key=lambda d: int(os.path.basename(d)[1:]))
        carried = spark.read.parquet(newest).select(*batch.columns)
        batch = carried.unionByName(batch).dropDuplicates(["url_hash"])
    seen_prior = _batch_dirs(seen_dir, batch_id)
    if seen_prior:
        seen = spark.read.parquet(*seen_prior).select("url_hash")
        fresh = batch.join(seen, "url_hash", "left_anti")
    else:
        fresh = batch
    fresh = fresh.localCheckpoint(eager=True)
    w_host = Window.partitionBy("host").orderBy("seq")
    admitted = (
        fresh.withColumn("__rn", F.row_number().over(w_host))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    # two-level top-k (TakeOrderedAndProject): never a single-partition
    # Window over the whole micro-batch
    admitted = admitted.orderBy("seq").limit(workers)
    w_glob = Window.orderBy("seq")  # input bounded by limit(workers)
    admitted = (
        admitted.withColumn("admit_rank", F.row_number().over(w_glob) - 1)
        .withColumn("batch_id", F.lit(batch_id).cast("long"))
        .localCheckpoint(eager=True)
    )
    admitted.write.mode("overwrite").parquet(os.path.join(out_dir, f"b{batch_id}"))
    admitted.select("url_hash").write.mode("overwrite").parquet(
        os.path.join(seen_dir, f"b{batch_id}")
    )
    # cumulative pending snapshot: everything fresh that was NOT admitted
    remainder = fresh.join(admitted.select("url_hash"), "url_hash", "left_anti")
    remainder.write.mode("overwrite").parquet(
        os.path.join(pend_dir, f"b{batch_id}")
    )


def read_admitted(spark: SparkSession, workdir: str) -> DataFrame:
    """All committed admitted rows across batches (per-batch dirs).
    An empty/fresh workdir (no committed batch yet) reads as an empty
    typed frame, not a confusing zero-path error."""
    dirs = _batch_dirs(os.path.join(workdir, "admitted"), below=1 << 60)
    if not dirs:
        schema = StructType(
            FRONTIER_STREAM_SCHEMA.fields
            + [
                StructField("admit_rank", IntegerType(), True),
                StructField("batch_id", LongType(), True),
            ]
        )
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*dirs)


def stream_crawl(
    spark: SparkSession,
    frontier_dir: str,
    workdir: str,
    workers: int = 1000,
    max_files_per_trigger: int = 1,
):
    """Start (and return) the streaming admission query.

    One input file ≈ one micro-batch ≈ one engine epoch. Caller awaits
    ``.awaitTermination()`` (use ``trigger(availableNow=True)`` semantics by
    stopping after the directory drains — the query object is returned).
    """
    ckpt = os.path.join(workdir, "_checkpoint")
    os.makedirs(os.path.join(workdir, "seen"), exist_ok=True)
    stream = (
        spark.readStream.schema(FRONTIER_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(frontier_dir)
    )
    return (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .foreachBatch(
            lambda b, bid: _admit_batch(b, workdir, workers, bid)
        )
        .start()
    )


def host_fetch_windows(
    fetched: DataFrame,
    window: str = "10 minutes",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Watermarked tumbling-window per-host fetch counts over a streaming
    DataFrame with (host, fetch_ts). Late rows beyond the watermark drop —
    the streaming analog of P1's drop-late-by-predicate."""
    return (
        fetched.withWatermark("fetch_ts", watermark)
        .groupBy(F.window("fetch_ts", window).alias("win"), "host")
        .agg(F.count(F.lit(1)).alias("n_fetched"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "host",
            "n_fetched",
        )
    )
