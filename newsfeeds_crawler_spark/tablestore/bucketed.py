"""Spark-managed bucketed tables — the shuffle-free probe-side layout.

The snapshot catalog (catalog.py) gives bucket-level file pruning and
touched-bucket merges, but a plain parquet read cannot tell Catalyst the
data is hash-partitioned, so the probe join still shuffles BOTH sides.
Spark's managed bucketed tables (``bucketBy().saveAsTable``) persist that
metadata: a join whose equi-key equals the bucket key reads the store with
NO Exchange — only the (much smaller) candidate side shuffles, and with
``repartition(B, key)`` even that becomes a co-partitioned pass.

This is the single-node stand-in for the Iceberg storage-partitioned join
named in SURVEY.md §2.3 J2/J5: on a real cluster, attach the same engine
to an Iceberg catalog with ``bucket(B, url_hash)`` partitioning and the
plan shape is identical (pinned by
tests/test_plan_shapes.py::test_bucketed_table_probe_join_shuffles_one_side).

Reference analog: the ``article.url UNIQUE`` index point-probe
(MysqlFeedArticleDao.scala:46-56) whose bulk, partition-aligned equivalent
this is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed_table(
    df: DataFrame,
    table: str,
    key: str = "url_hash",
    num_buckets: int = 64,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a managed parquet table bucketed (and per-file
    sorted) on ``key``. ``path`` makes it external (data under ``path``)."""
    w = df.write.mode("overwrite").format("parquet")
    w = w.bucketBy(num_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def probe_bucketed(
    candidates: DataFrame,
    table: str,
    key: str = "url_hash",
    how: str = "left",
    align: bool = True,
) -> DataFrame:
    """Join ``candidates`` against a bucketed seen-store table on ``key``.

    The store side is read WITHOUT an Exchange (bucketing metadata makes
    its output partitioning satisfy the join requirement); ``align=True``
    additionally repartitions the candidates into the store's bucket count
    so the join is fully co-partitioned.
    """
    spark = candidates.sparkSession
    store = spark.table(table)
    if align:
        num_buckets = _table_bucket_count(spark, table)
        if num_buckets:
            candidates = candidates.repartition(num_buckets, F.col(key))
    return candidates.join(store, on=key, how=how)


def _table_bucket_count(spark: SparkSession, table: str) -> int | None:
    for row in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
        if row["col_name"] == "Num Buckets":
            try:
                return int(row["data_type"])
            except (TypeError, ValueError):
                return None
    return None
