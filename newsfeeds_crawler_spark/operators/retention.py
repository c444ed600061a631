"""Snapshot retention / expiry planning — the distributed form of
Iceberg's ``expire_snapshots`` (and of the local
``tablestore.Catalog.vacuum``, which walks the filesystem on the driver
and is right only while the file count is small).

Given the snapshot list (version, epoch) and the manifest file references
(version, file), a version is LIVE if it is among the newest
``keep_last`` versions OR its epoch is ≥ ``keep_min_epoch`` (the
time-travel horizon); a file is deletable iff NO live version references
it. At 100 TB the manifest set is millions of rows, so reachability is a
rank window over versions (∝ |snapshots|) plus one left-anti join of the
file references against the live reference set (∝ |manifest rows|,
map-side combinable dedup) — never a driver-side walk. The output plan
frame feeds whatever deletes files (an Iceberg expire action, an object-
store batch delete).

Safety property pinned by the unit test: a file referenced by even one
live version NEVER appears in the plan (shared files across snapshots
are the whole reason expiry needs reference counting, not per-snapshot
deletion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def live_versions(
    snapshots: DataFrame,
    keep_last: int = 2,
    keep_min_epoch: int | None = None,
) -> DataFrame:
    """(version, epoch, live:bool) — newest ``keep_last`` versions by
    version order, plus every version at or after the epoch horizon."""
    w = Window.orderBy(F.col("version").desc())
    ranked = snapshots.select(
        F.col("version").cast("bigint").alias("version"),
        F.col("epoch").cast("bigint").alias("epoch"),
    ).withColumn("__rk", F.row_number().over(w))
    live = F.col("__rk") <= int(keep_last)
    if keep_min_epoch is not None:
        live = live | (F.col("epoch") >= int(keep_min_epoch))
    return ranked.select("version", "epoch", live.alias("live"))


def expire_plan(
    snapshots: DataFrame,
    manifests: DataFrame,
    keep_last: int = 2,
    keep_min_epoch: int | None = None,
) -> DataFrame:
    """Deletable-file plan: (file, n_refs, last_ref_version) for every
    file referenced ONLY by expired versions. ``n_refs`` counts distinct
    referencing versions (all of them expired, by construction)."""
    lv = live_versions(snapshots, keep_last, keep_min_epoch)
    refs = (
        manifests.select(
            F.col("version").cast("bigint").alias("version"),
            F.col("file").cast("string").alias("file"),
        )
        .distinct()
        .join(lv.select("version", "live"), "version")
    )
    live_files = refs.filter(F.col("live")).select("file").distinct()
    dead_refs = refs.join(live_files, "file", "left_anti")
    return dead_refs.groupBy("file").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_refs"),
        F.max("version").cast("bigint").alias("last_ref_version"),
    )


def expire_summary(
    snapshots: DataFrame,
    manifests: DataFrame,
    keep_last: int = 2,
    keep_min_epoch: int | None = None,
) -> DataFrame:
    """One-row accounting: versions live/expired, files kept/deletable."""
    lv = live_versions(snapshots, keep_last, keep_min_epoch)
    plan = expire_plan(snapshots, manifests, keep_last, keep_min_epoch)
    files = manifests.select("file").distinct()
    return (
        lv.agg(
            F.sum(F.col("live").cast("int")).cast("bigint").alias(
                "n_live_versions"
            ),
            F.sum((~F.col("live")).cast("int")).cast("bigint").alias(
                "n_expired_versions"
            ),
        )
        .crossJoin(files.agg(F.count(F.lit(1)).cast("bigint").alias("n_files")))
        .crossJoin(
            plan.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_deletable")
            )
        )
    )
