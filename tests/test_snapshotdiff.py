"""Corpus snapshot diff (operators/snapshotdiff.py): class semantics,
catalog time-travel composition, and gate class coverage."""

from __future__ import annotations

from newsfeeds_crawler_spark.operators.snapshotdiff import (
    diff_summary,
    snapshot_diff,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_all_change_classes(spark):
    old = _docs(spark, [(1, "same"), (2, "gone"), (3, "before edit")])
    new = _docs(spark, [(1, "same"), (3, "after edit"), (4, "brand new")])
    out = {r.doc_id: r for r in snapshot_diff(old, new).collect()}
    assert out[1].change == "unchanged"
    assert out[2].change == "removed" and out[2].new_fp is None
    assert out[3].change == "modified"
    assert out[3].old_fp is not None and out[3].old_fp != out[3].new_fp
    assert out[4].change == "added" and out[4].old_fp is None
    summ = {r.change: r.n for r in diff_summary(old, new).collect()}
    assert summ == {"unchanged": 1, "removed": 1, "modified": 1, "added": 1}


def test_diff_against_catalog_time_travel(spark, tmp_path):
    """The intended composition: diff two committed snapshots of the same
    catalog table (time travel supplies OLD, the head supplies NEW)."""
    from newsfeeds_crawler_spark.tablestore.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "cat"))
    v1 = cat.write("docs", _docs(spark, [(1, "alpha"), (2, "beta")]))
    v2 = cat.write(
        "docs",
        _docs(spark, [(1, "alpha"), (2, "beta prime"), (3, "gamma")]),
    )
    assert v2 > v1
    old = cat.read("docs", version=v1)
    new = cat.read("docs")
    summ = {r.change: r.n for r in diff_summary(old, new).collect()}
    assert summ == {"unchanged": 1, "modified": 1, "added": 1}


def test_gate_fires_every_class(spark):
    import __spark_entry__ as E

    out = E.queries()["corpus_snapshot_diff"](spark, "/root/testdata/sf0.01")
    classes = {r.change for r in out.select("change").distinct().collect()}
    assert classes == {"added", "removed", "modified", "unchanged"}
