"""Caption consolidation over near-dup image clusters (operators/captions)."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import SparkSession

from newsfeeds_crawler_spark.operators.captions import caption_consolidate


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("captions-test")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield s


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "image_id string, phash long, caption string")


def test_canonical_rule_and_stats(spark):
    rows = [
        # cluster 10: longest caption wins outright
        ("a1", 10, "short"),
        ("a2", 10, "a much longer figure caption"),
        ("a3", 10, "mid length one"),
        # cluster 11: length tie -> greater caption string wins
        ("b1", 11, "zebra"),
        ("b2", 11, "apple"),
        # cluster 12: identical captions (dup pair) -> greater image_id,
        # NOT contested (1 distinct caption)
        ("c1", 12, "same text"),
        ("c2", 12, "same text"),
        # cluster 13: singleton
        ("d1", 13, "only"),
    ]
    out = {
        r["cluster"]: r
        for r in caption_consolidate(_pairs(spark, rows), F.col("phash")).collect()
    }
    assert out[10]["canon_caption"] == "a much longer figure caption"
    assert out[10]["canon_image_id"] == "a2"
    assert out[10]["n_pairs"] == 3 and out[10]["n_captions"] == 3
    assert out[10]["contested"] is True
    assert out[11]["canon_caption"] == "zebra"
    assert out[12]["canon_caption"] == "same text"
    assert out[12]["canon_image_id"] == "c2"
    assert out[12]["contested"] is False
    assert out[13]["canon_image_id"] == "d1" and out[13]["contested"] is False


def test_prefix_band_clustering_pools_neardups(spark):
    # phash div 4 pools hashes differing only in the 2 low bits
    rows = [("x1", 100, "aa"), ("x2", 101, "bbb"), ("x3", 104, "cc")]
    out = caption_consolidate(
        _pairs(spark, rows), F.expr("phash div 4")
    ).collect()
    got = {r["cluster"]: (r["n_pairs"], r["canon_caption"]) for r in out}
    assert got == {25: (2, "bbb"), 26: (1, "cc")}


def test_partitioning_invariance(spark):
    rows = [
        (f"i{i}", i % 17, f"caption {i % 5} {'x' * (i % 7)}")
        for i in range(500)
    ]
    df = _pairs(spark, rows)
    a = sorted(
        map(tuple, caption_consolidate(df.repartition(1), F.col("phash")).collect())
    )
    b = sorted(
        map(tuple, caption_consolidate(df.repartition(13), F.col("phash")).collect())
    )
    assert a == b and len(a) == 17


def test_plan_is_one_aggregate_no_join_no_window(spark):
    df = _pairs(spark, [("a", 1, "c")])
    plan = (
        caption_consolidate(df, F.col("phash"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Window" not in plan
