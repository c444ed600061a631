"""Snapshot expiry planning (operators/retention.py), including the
composition with a real tablestore catalog's manifests."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from newsfeeds_crawler_spark.operators.retention import (
    expire_plan,
    expire_summary,
    live_versions,
)


def _frames(spark):
    snaps = spark.createDataFrame(
        [(v, (v * 13) % 40) for v in range(1, 11)], "version long, epoch long"
    )
    # file f_k referenced by versions k..k+2 (sharing across snapshots)
    rows = [
        (v, f"f{k}") for k in range(1, 9) for v in (k, k + 1, k + 2)
    ]
    manifests = spark.createDataFrame(rows, "version long, file string")
    return snaps, manifests


def test_live_rule_union_of_last_k_and_epoch_horizon(spark):
    snaps, _ = _frames(spark)
    lv = {r.version: r.live
          for r in live_versions(snaps, keep_last=2, keep_min_epoch=30).collect()}
    # last 2 = {9, 10}; epoch = 13v mod 40 ≥ 30 → v ∈ {4 (12? no: 52%40=12)...}
    expect_live = {9, 10} | {v for v in range(1, 11) if (v * 13) % 40 >= 30}
    assert {v for v, l in lv.items() if l} == expect_live


def test_shared_files_survive_any_live_reference(spark):
    snaps, manifests = _frames(spark)
    plan = expire_plan(snaps, manifests, keep_last=2, keep_min_epoch=None)
    deletable = {r.file for r in plan.collect()}
    # live = {9, 10}; f7 (refs 7,8,9) and f8 (refs 8,9,10) touch a live
    # version → must survive; f1..f6's newest ref is 8 → deletable
    assert deletable == {f"f{k}" for k in range(1, 7)}
    rows = {r.file: r for r in plan.collect()}
    assert rows["f6"].last_ref_version == 8
    assert rows["f1"].n_refs == 3


def test_summary_accounting(spark):
    snaps, manifests = _frames(spark)
    s = expire_summary(snaps, manifests, keep_last=2).first()
    assert s.n_live_versions == 2 and s.n_expired_versions == 8
    assert s.n_files == 8 and s.n_deletable == 6


def test_plan_matches_catalog_vacuum_semantics(spark, tmp_path):
    """Drive the REAL snapshot catalog: three commits of one table, build
    (version, file) manifests from its _snapshots metadata, and check the
    distributed plan deletes exactly what vacuum(keep_last=2) removes."""
    from newsfeeds_crawler_spark.tablestore.catalog import Catalog

    cat = Catalog(spark, str(tmp_path))
    for v in range(3):
        cat.write(
            "t",
            spark.range(5).select((F.col("id") + v).alias("x")),
            mode="overwrite",
        )
    cur = cat.current_version("t")
    assert cur == 3
    snaps = spark.createDataFrame(
        [(v, v) for v in range(1, cur + 1)], "version long, epoch long"
    )
    rows = []
    for v in range(1, cur + 1):
        for d in cat._manifest("t", v)["data_dirs"]:
            parts = d.split(os.sep)
            rows.append((v, os.path.join(*parts[:2])))
    manifests = spark.createDataFrame(rows, "version long, file string")
    plan_files = {
        r.file for r in expire_plan(snaps, manifests, keep_last=2).collect()
    }
    removed = cat.vacuum("t", keep_last=2)
    assert removed == len(plan_files) == 1
    # and the table still reads at its latest version
    assert cat.read_committed("t").count() == 5
