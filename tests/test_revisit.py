"""Revisit scheduling (operators/revisit.py): qlog2 exactness +
cross-engine equality, and the Cho & Garcia-Molina schedule semantics."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from newsfeeds_crawler_spark.operators.revisit import (
    QLOG2_SCALE,
    qlog2,
    qlog2_sql,
    revisit_schedule,
)


def test_qlog2_exact_monotone_and_cross_engine(spark):
    n = 8192
    rows = {
        r.id: r.q
        for r in spark.range(1, n).select(
            "id", qlog2(F.col("id")).alias("q")
        ).collect()
    }
    # exact at powers of two
    for p in (1, 2, 4, 64, 1024, 4096):
        assert rows[p] == QLOG2_SCALE * int(math.log2(p))
    # monotone, bounded approximation error (max of log2(1+t)-t ≈ 0.0861)
    assert all(rows[x] <= rows[x + 1] for x in range(1, n - 1))
    assert max(
        abs(rows[x] / QLOG2_SCALE - math.log2(x)) for x in rows
    ) < 0.0862
    # the column impl, its spark-SQL mirror text, and the DuckDB mirror
    # all agree bit-for-bit
    mirror = {
        r.id: r.qs
        for r in spark.range(1, n).selectExpr(
            "id", qlog2_sql("id", engine="spark") + " as qs"
        ).collect()
    }
    assert mirror == rows
    ddb = dict(
        duckdb.sql(
            f"SELECT id, {qlog2_sql('id')} AS q FROM range(1, {n}) t(id)"
        ).fetchall()
    )
    assert ddb == rows


def test_qlog2_large_inputs_stay_exact(spark):
    # q·2^msb has ≤ 13 significant bits, so the internal float division is
    # lossless even when x·S exceeds 2^53: check vs Python integer math
    xs = [2**50, 2**50 - 1, 2**49 + 12345, 3**31]
    got = {
        r.x: r.q
        for r in spark.createDataFrame(
            [(x,) for x in xs], "x long"
        ).select("x", qlog2(F.col("x")).alias("q")).collect()
    }
    for x in xs:
        msb = x.bit_length() - 1
        assert got[x] == msb * QLOG2_SCALE + (x * QLOG2_SCALE >> msb) - QLOG2_SCALE


def test_revisit_schedule_semantics(spark):
    hist = spark.createDataFrame(
        [(1, e, 1) for e in range(10)]       # always changed → min clamp
        + [(2, e, 0) for e in range(10)]     # never changed → max clamp
        + [(3, e, 1 if e % 3 == 0 else 0) for e in range(12)],  # 4/12
        "feed_id int, epoch int, changed int",
    )
    out = {
        r.feed_id: r
        for r in revisit_schedule(hist, max_epochs=50).collect()
    }
    # always-changed: rate_q = qlog2(21) - qlog2(1) ≈ S·log2(21) → interval
    # floors to the min clamp
    assert out[1].interval_epochs == 1
    assert out[1].next_fetch_epoch == 9 + 1
    # never-changed: rate 0 → max clamp
    assert out[2].rate_q == 0
    assert out[2].interval_epochs == 50
    # interior: rate_q/S ≈ log2(25/17) = 0.556…, interval = S div rate_q
    r3 = out[3]
    assert 0 < r3.rate_q < QLOG2_SCALE
    assert r3.interval_epochs == QLOG2_SCALE // r3.rate_q
    assert r3.next_fetch_epoch == 11 + r3.interval_epochs
    # estimator direction: more observed changes ⇒ never a longer interval
    assert (
        out[1].interval_epochs
        <= out[3].interval_epochs
        <= out[2].interval_epochs
    )


def test_revisit_schedule_monotone_in_change_count(spark):
    # fixed n=20 visits, X = 0..20 → rate_q nondecreasing, interval
    # nonincreasing (the proportional-allocation property)
    rows = [
        (x, v, 1 if v < x else 0) for x in range(21) for v in range(20)
    ]
    hist = spark.createDataFrame(rows, "feed_id int, epoch int, changed int")
    out = sorted(
        revisit_schedule(hist).collect(), key=lambda r: r.feed_id
    )
    rates = [r.rate_q for r in out]
    intervals = [r.interval_epochs for r in out]
    assert rates == sorted(rates)
    assert intervals == sorted(intervals, reverse=True)
    assert all(r.n_changed == r.feed_id for r in out)
