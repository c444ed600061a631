"""Small-file compaction planning — the table-maintenance operator a
100 TB corpus runs continuously (Iceberg's ``rewriteDataFiles`` binPack
strategy, Delta OPTIMIZE): pick undersized data files per partition and
group them into rewrite tasks close to a target file size, leaving
well-sized files alone.

Semantics (Iceberg binPack conventions):

- files with ``bytes >= min_file_bytes`` (default ¾ of the target, the
  ``MIN_FILE_SIZE_DEFAULT_RATIO``) are **kept** — rewriting them is pure
  write amplification;
- smaller files are **next-fit bin-packed** per partition in file-id
  order: a group closes when the next file would push it past
  ``target_bytes``. Next-fit (not first-fit-decreasing) is what streaming
  compactors use because it preserves ingestion order — relevant when
  file order encodes a sort/cluster key.

Execution shape: the planner runs over the file MANIFEST, not the data —
∝ |files| (≈10^6 rows for 100 TB of 100 MB files), thousands of times
smaller than the table. Next-fit is inherently sequential *within a
partition*, so the kernel is one Arrow-batched ``applyInPandas`` per
partition key (the bounded-sequential-kernel pattern of
operators/semdedup.py) — partitions parallelize, and a partition's file
list always fits comfortably in one task. The DuckDB oracle replays the
same walk as a recursive CTE, so the gate pins the sequential semantics
exactly (the same technique as the dedup_minhash_components
recursive-CTE oracle).

No reference analog (the reference stores rows in MySQL); this is
maintenance for the Iceberg-layout corpus/state tables the engine writes
(tablestore/catalog.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TARGET_BYTES = 1_000_000
MIN_FILE_RATIO_NUM, MIN_FILE_RATIO_DEN = 3, 4  # keep files ≥ ¾ target


def compaction_plan(
    files: DataFrame,
    part_col: str = "part",
    id_col: str = "file_id",
    bytes_col: str = "bytes",
    target_bytes: int = TARGET_BYTES,
    min_file_bytes: int | None = None,
) -> DataFrame:
    """Per-file compaction plan: (part, file_id, bytes, action, group_id).

    ``action`` ∈ {'keep', 'compact'}; ``group_id`` is the 0-based rewrite
    group within the partition (null for kept files). Deterministic and
    partition-invariant: groups depend only on (part, file_id order,
    bytes).
    """
    if min_file_bytes is None:
        min_file_bytes = (
            int(target_bytes) * MIN_FILE_RATIO_NUM
        ) // MIN_FILE_RATIO_DEN
    base = files.select(
        F.col(part_col).cast("string").alias("part"),
        F.col(id_col).cast("bigint").alias("file_id"),
        F.col(bytes_col).cast("bigint").alias("bytes"),
    )
    keep = base.filter(F.col("bytes") >= min_file_bytes).select(
        "part",
        "file_id",
        "bytes",
        F.lit("keep").alias("action"),
        F.lit(None).cast("bigint").alias("group_id"),
    )
    cand = base.filter(F.col("bytes") < min_file_bytes)
    target = int(target_bytes)

    def _walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("file_id").reset_index(drop=True)
        groups = []
        grp, acc = 0, 0
        first = True
        for b in pdf["bytes"]:
            b = int(b)
            if first:
                grp, acc, first = 0, b, False
            elif acc + b > target:
                grp, acc = grp + 1, b
            else:
                acc += b
            groups.append(grp)
        pdf["group_id"] = pd.Series(groups, dtype="int64")
        pdf["action"] = "compact"
        return pdf[["part", "file_id", "bytes", "action", "group_id"]]

    packed = cand.groupBy("part").applyInPandas(
        _walk, "part string, file_id long, bytes long, action string, group_id long"
    )
    return keep.unionByName(packed)


def compaction_stats(plan: DataFrame) -> DataFrame:
    """Per-partition rollup: files before/after, bytes, rewrite volume.

    ``n_files_after`` = kept files + rewrite groups;
    ``rewrite_bytes`` = bytes that will be re-written (write
    amplification numerator — kept files cost nothing)."""
    return plan.groupBy("part").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files_before"),
        (
            F.sum(F.when(F.col("action") == "keep", 1).otherwise(0))
            + F.countDistinct(
                F.when(F.col("action") == "compact", F.col("group_id"))
            )
        ).cast("bigint").alias("n_files_after"),
        F.sum("bytes").cast("bigint").alias("total_bytes"),
        F.sum(
            F.when(F.col("action") == "compact", F.col("bytes")).otherwise(0)
        ).cast("bigint").alias("rewrite_bytes"),
    )
