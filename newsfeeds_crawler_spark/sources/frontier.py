"""Frontier sources — generative URL frontiers and bucketed state storage.

The 10^10-URL path (BASELINE.json north_star) can never materialize its
frontier as files; it must be *generative*: ``spark.range(n)`` plus pure
column expressions deriving url / host / hash from the row id. Nothing
touches the driver, partitioning is explicit, and the same expressions run
unchanged at 10^3 (tests) and 10^10 (cluster). bench.py's throughput
workload and the skew/e2e tests both consume this source.

``write_bucketed`` is the storage shape for the seen/frontier state tables:
hash-bucketed parquet by ``pmod(xxhash64(key), B)`` so the per-epoch
anti-join/merge can run bucket-by-bucket (storage-partition join once a real
Iceberg catalog is attached — tablestore.Catalog keeps the same layout).

Reference analog: the seed list is the only "source" in the reference
(config/Configuration.scala:45-83); everything else arrived over HTTP.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from newsfeeds_crawler_spark.functions.urls import canonicalize_url, url_host


def mk_url_expr(idcol: Column, n_hosts: int, *, messy: bool = True) -> Column:
    """URL string derived from a row id; ``messy`` adds the upper-case /
    default-port / double-slash noise that canonicalization must strip."""
    if messy:
        return F.concat(
            F.lit("HTTP://Host"),
            (idcol % n_hosts).cast("string"),
            F.lit(".Example.COM:80//page//"),
            idcol.cast("string"),
        )
    return F.concat(
        F.lit("http://host"),
        (idcol % n_hosts).cast("string"),
        F.lit(".example.com/page/"),
        idcol.cast("string"),
    )


def generative_frontier(
    spark: SparkSession,
    n_urls: int,
    n_hosts: int,
    parts: int | None = None,
) -> DataFrame:
    """(id, url_canon, host, url_hash) for ids [0, n_urls) — never
    materialized, partitioned into ``parts`` tasks (default 8×parallelism:
    fine tasks smooth stragglers at high core counts)."""
    if parts is None:
        parts = spark.sparkContext.defaultParallelism * 8
    return (
        spark.range(0, n_urls, 1, parts)
        .select(
            F.col("id"),
            canonicalize_url(mk_url_expr(F.col("id"), n_hosts)).alias("url_canon"),
        )
        .withColumn("host", url_host(F.col("url_canon"), canonical=True))
        .withColumn("url_hash", F.xxhash64("url_canon"))
    )


def generative_seen(
    spark: SparkSession,
    n_keys: int,
    n_hosts: int,
    stride: int = 2,
    parts: int | None = None,
) -> DataFrame:
    """url_hash for every ``stride``-th frontier id — a seen store whose
    hashes agree with :func:`generative_frontier` (same canonical forms)."""
    if parts is None:
        parts = spark.sparkContext.defaultParallelism * 8
    return (
        spark.range(0, n_keys, 1, parts)
        .select(
            canonicalize_url(
                mk_url_expr(F.col("id") * stride, n_hosts)
            ).alias("c")
        )
        .select(F.xxhash64("c").alias("url_hash"))
    )


def write_bucketed(
    df: DataFrame,
    path: str,
    key: str = "url_hash",
    num_buckets: int = 64,
) -> None:
    """Hash-bucketed parquet layout for big state tables.

    partitionBy on the derived ``bucket`` column gives partition pruning on
    the probe side and lets two tables bucketed the same way join
    bucket-aligned; repartition first so each bucket is one file, not one
    file per task × bucket.
    """
    (
        df.withColumn(
            "bucket", F.pmod(F.col(key), F.lit(num_buckets)).cast("int")
        )
        .repartition(num_buckets, "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def read_bucket(spark: SparkSession, path: str, bucket: int) -> DataFrame:
    """Partition-pruned single-bucket read (`.where` on the partition column
    prunes at planning time — check PartitionFilters in explain)."""
    return spark.read.parquet(path).where(F.col("bucket") == bucket)
