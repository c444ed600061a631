"""Corpus snapshot diff: classify every document across two snapshots of
the same table as added / removed / modified / unchanged — the audit
operator a snapshot catalog (``tablestore/catalog.py`` time travel, or
Iceberg's changelog scan) pairs with its time-travel reads: "what did
epoch N actually change?" is the first question after every incremental
crawl merge, and the diff counts are the regression alarm for a corpus
refresh (a refresh that "modified" 40% of documents is a parser bug, not
news).

Semantics: rows align on ``id_col``; content equality is the portable
64-bit rolling fingerprint (the same ``fingerprint64_arrow`` every dedup
operator uses, so "modified" here agrees with "no longer an exact dup"
there). Output one row per id present in either snapshot, with the
change class and both fingerprints (null on the absent side).

100 TB shape: fingerprints are computed map-side on each snapshot scan
(column-pruned to id + text), then ONE full-outer shuffle join on id —
both sides hash-partition identically, and on a bucketed/Iceberg catalog
whose tables bucket on id the join is storage-partitioned with zero
shuffle. The classification is map-only arithmetic on the joined row. No
driver state; the diff never materializes texts, only 8-byte prints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from newsfeeds_crawler_spark.functions.text import fingerprint64_arrow


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, old_fp, new_fp, change) for every id in either snapshot;
    ``change`` ∈ added | removed | modified | unchanged."""

    def prints(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col(id_col).cast("bigint").alias("doc_id"),
            fingerprint64_arrow(F.col(text_col)).alias(f"{side}_fp"),
        )

    o = prints(old, "old")
    n = prints(new, "new")
    j = o.join(n, "doc_id", "full_outer")
    change = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("modified"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select("doc_id", "old_fp", "new_fp", change.alias("change"))


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per change class with its count — the per-epoch audit line
    (map-side-combinable aggregate over the diff)."""
    return (
        snapshot_diff(old, new, id_col, text_col)
        .groupBy("change")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
