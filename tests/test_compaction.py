"""Compaction planning (operators/compaction.py)."""

from __future__ import annotations

from newsfeeds_crawler_spark.operators.compaction import (
    compaction_plan,
    compaction_stats,
)


def _plan(spark, rows, **kw):
    df = spark.createDataFrame(rows, "part string, file_id long, bytes long")
    return compaction_plan(df, **kw)


def test_next_fit_grouping_exact(spark):
    # target 100, keep-threshold 75: sizes walk 40,40,40 → groups
    # [0,0],[1]; 70,20,20 → [0,1,1]? no: 70; 70+20=90 ≤100 → same; +20
    # → 110 > 100 → next group
    rows = [
        ("a", 1, 40), ("a", 2, 40), ("a", 3, 40),
        ("b", 1, 70), ("b", 2, 20), ("b", 3, 20),
        ("b", 4, 80),                       # ≥ 75 → keep
    ]
    out = {
        (r.part, r.file_id): r
        for r in _plan(spark, rows, target_bytes=100).collect()
    }
    assert [out[("a", i)].group_id for i in (1, 2, 3)] == [0, 0, 1]
    assert [out[("b", i)].group_id for i in (1, 2, 3)] == [0, 0, 1]
    assert out[("b", 4)].action == "keep"
    assert out[("b", 4)].group_id is None
    assert all(
        r.action == "compact" for k, r in out.items() if k != ("b", 4)
    )


def test_partition_invariance_and_order_by_file_id(spark):
    rows = [("p", i, 30 + (i * 7) % 50) for i in range(200)]
    df = spark.createDataFrame(rows, "part string, file_id long, bytes long")
    a = sorted(map(tuple, compaction_plan(df, target_bytes=120).collect()))
    b = sorted(
        map(
            tuple,
            compaction_plan(
                df.repartition(17).sortWithinPartitions("bytes"),
                target_bytes=120,
            ).collect(),
        )
    )
    assert a == b
    # every group's total respects the target (next-fit invariant: only
    # a group's FIRST file could exceed it, and candidates are < ¾ target)
    import collections

    totals = collections.Counter()
    for part, fid, byt, action, grp in a:
        if action == "compact":
            totals[grp] += byt
    assert all(v <= 120 for v in totals.values())


def test_compaction_stats_rollup(spark):
    rows = [
        ("a", 1, 40), ("a", 2, 40), ("a", 3, 40),   # 2 groups
        ("a", 4, 90),                               # keep
    ]
    plan = _plan(spark, rows, target_bytes=100)
    s = {r.part: r for r in compaction_stats(plan).collect()}["a"]
    assert s.n_files_before == 4
    assert s.n_files_after == 3  # 1 kept + 2 groups
    assert s.total_bytes == 210
    assert s.rewrite_bytes == 120
