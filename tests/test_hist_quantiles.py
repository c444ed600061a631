"""Mergeable histogram quantile sketch (operators/quantiles.hist_*)."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import SparkSession

from newsfeeds_crawler_spark.operators.quantiles import (
    grouped_quantiles_exact,
    hist_quantiles,
    hist_registers,
)


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("histq-test")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def df(spark):
    # skewed lengths across 3 groups, including an exact-multiple-of-width
    # value (bucket edge) and a zero
    rows = [
        ("a", (i * i * 7) % 1913) for i in range(400)
    ] + [("b", i % 64) for i in range(200)] + [
        ("c", 0),
        ("c", 64),
        ("c", 128),
    ]
    return spark.createDataFrame(rows, "g string, v long")


WIDTH = 64


def test_sketch_brackets_exact(df):
    exact = {
        (r["g"], r["q_pct"]): r["v"]
        for r in grouped_quantiles_exact(df, "g", "v").collect()
    }
    est = {
        (r["g"], r["q_pct"]): r["est"]
        for r in hist_quantiles(
            hist_registers(df, "g", "v", width=WIDTH), "g", width=WIDTH
        ).collect()
    }
    assert set(est) == set(exact)
    for k, e in est.items():
        assert e <= exact[k] < e + WIDTH, (k, e, exact[k])


def test_registers_merge_across_epochs(df, spark):
    """Adding two epochs' register tables == registers of the union —
    the property that lets a 100 TB pipeline maintain the sketch
    incrementally instead of re-scanning history."""
    e1 = df.filter(F.col("v") % 2 == 0)
    e2 = df.filter(F.col("v") % 2 == 1)
    merged = (
        hist_registers(e1, "g", "v", width=WIDTH)
        .unionByName(hist_registers(e2, "g", "v", width=WIDTH))
        .groupBy("g", "bucket")
        .agg(F.sum("n").cast("bigint").alias("n"))
    )
    whole = hist_registers(df, "g", "v", width=WIDTH)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    a = sorted(map(tuple, hist_quantiles(merged, "g", width=WIDTH).collect()))
    b = sorted(map(tuple, hist_quantiles(whole, "g", width=WIDTH).collect()))
    assert a == b


def test_partitioning_invariance(df):
    out = lambda d: sorted(
        map(
            tuple,
            hist_quantiles(
                hist_registers(d, "g", "v", width=WIDTH), "g", width=WIDTH
            ).collect(),
        )
    )
    assert out(df.repartition(1)) == out(df.repartition(11))


def test_window_is_over_registers_not_rows(df):
    """The quantile windows must consume the register aggregate (∝ groups
    × buckets), not raw rows: the register table for group b collapses
    200 rows into exactly 1 bucket row."""
    regs = hist_registers(df, "g", "v", width=WIDTH)
    b = regs.filter(F.col("g") == "b").collect()
    assert len(b) == 1 and b[0]["n"] == 200
