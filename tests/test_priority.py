"""Priority-frontier admission (north_star): (priority, FIFO) ordering."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from newsfeeds_crawler_spark.operators.politeness import admit, priority_score


def _pending(spark, rows):
    # (host, e_epoch, e_rank, e_sub, priority)
    return spark.createDataFrame(
        [(h, e, r, s, float(p)) for h, e, r, s, p in rows],
        ["host", "e_epoch", "e_rank", "e_sub", "priority"],
    )


def _hosts(spark, hosts):
    return spark.createDataFrame(
        [(h, None, 1) for h in hosts],
        "host string, last_access_epoch int, delay_epochs int",
    )


def test_priority_beats_fifo_within_host(spark):
    pending = _pending(
        spark,
        [("h1", 0, 0, 0, 5.0), ("h1", 0, 0, 1, 1.0), ("h2", 0, 1, 0, 0.0)],
    )
    got = admit(pending, _hosts(spark, ["h1", "h2"]), 0, workers=10).collect()
    picked = {r.host: (r.e_sub, r.priority) for r in got}
    assert picked["h1"] == (1, 1.0)  # lower priority value wins over FIFO
    assert picked["h2"] == (0, 0.0)


def test_constant_priority_is_pure_fifo(spark):
    pending = _pending(
        spark,
        [("h1", 0, 0, 1, 0.0), ("h1", 0, 0, 0, 0.0), ("h2", 1, 0, 0, 0.0)],
    )
    got = admit(pending, _hosts(spark, ["h1", "h2"]), 0, workers=10).collect()
    ranks = {r.host: (r.e_epoch, r.e_rank, r.e_sub, r.admit_rank) for r in got}
    assert ranks["h1"][:3] == (0, 0, 0)  # FIFO head of h1
    assert ranks["h1"][3] < ranks["h2"][3]  # earlier epoch first globally


def test_priority_score_deterministic_and_monotone(spark):
    df = spark.createDataFrame(
        [(datetime(2024, 1, 1),), (datetime(2024, 6, 1),), (None,)], ["ts"]
    )
    rows = df.select(
        priority_score(1, F.col("ts"), depth_weight=10.0, recency_weight=1e-6)
        .alias("p")
    ).collect()
    newer, older, null_ts = rows[1].p, rows[0].p, rows[2].p
    assert newer < older  # fresher pubDate → fetched sooner
    assert null_ts == 10.0  # null ts contributes 0 recency
    # weights 0 → constant 0 (FIFO degeneracy)
    zero = df.select(priority_score(1, F.col("ts")).alias("p")).collect()
    assert all(r.p == 0.0 for r in zero)
