"""Zig-zag balanced sharding (operators/balance.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from newsfeeds_crawler_spark.operators.balance import (
    shard_balance_stats,
    zigzag_shards,
)


def test_serpentine_assignment_exact(spark):
    # weights 8,7,6,5,4,3 over 3 shards: ranks 0..5 →
    # pass 0: shards 0,1,2 ; pass 1 (reversed): 2,1,0
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate([8, 7, 6, 5, 4, 3])],
        "doc_id long, n_tokens long",
    )
    out = {r.doc_id: r.shard for r in zigzag_shards(df, 3).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 2, 4: 1, 5: 0}
    stats = {r.shard: r.total_weight
             for r in shard_balance_stats(zigzag_shards(df, 3)).collect()}
    assert stats == {0: 11, 1: 11, 2: 11}  # perfectly balanced here


def test_imbalance_bounded_by_two_max_weights(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    ws = rng.integers(1, 1000, size=500).tolist()
    df = spark.createDataFrame(
        [(i, int(w)) for i, w in enumerate(ws)], "doc_id long, n_tokens long"
    )
    stats = shard_balance_stats(zigzag_shards(df, 7)).collect()
    totals = [r.total_weight for r in stats]
    assert len(totals) == 7
    assert max(totals) - min(totals) <= 2 * max(ws)


def test_grouped_serpentine_and_invariance(spark):
    rows = [(s, i, (i * 37) % 100 + 1) for s in ("a", "b") for i in range(40)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    a = sorted(map(tuple, zigzag_shards(df, 4, group_col="source").collect()))
    b = sorted(
        map(
            tuple,
            zigzag_shards(df.repartition(11), 4, group_col="source").collect(),
        )
    )
    assert a == b
    # each group's serpentine is independent: every shard gets 10 items
    per = (
        shard_balance_stats(
            zigzag_shards(df, 4, group_col="source"), group_col="source"
        )
        .collect()
    )
    assert all(r.n_items == 10 for r in per) and len(per) == 8
