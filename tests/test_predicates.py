from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from newsfeeds_crawler_spark.functions.predicates import (
    is_newer,
    is_newer_py,
    should_fetch,
)

TS = datetime(2026, 1, 1, 12, 0, 30, 500000)  # microseconds matter: truncation


def _rows():
    # (parsed, stored, expect_is_newer) — reference FeedManager.scala:186-189
    return [
        (None, TS, False),                      # parsed null -> skip
        (TS, None, True),                       # stored null -> refetch
        (TS, TS.replace(microsecond=0), False),  # equal after trunc -> skip
        (TS.replace(second=31), TS, True),      # strictly newer -> fetch
        (TS.replace(second=29), TS, False),     # older -> skip
        (TS.replace(microsecond=999999), TS, False),  # sub-second diff ignored
    ]


def test_is_newer_spark_vs_python(spark):
    rows = _rows()
    schema = StructType(
        [
            StructField("parsed", TimestampType()),
            StructField("stored", TimestampType()),
        ]
    )
    df = spark.createDataFrame([(p, s) for p, s, _ in rows], schema)
    got = [
        r["v"]
        for r in df.select(
            is_newer(F.col("parsed"), F.col("stored")).alias("v")
        ).collect()
    ]
    assert got == [e for _, _, e in rows]
    assert [is_newer_py(p, s) for p, s, _ in rows] == got


def test_should_fetch_new_item_always(spark):
    schema = StructType(
        [
            StructField("parsed", TimestampType()),
            StructField("sid", LongType()),
            StructField("stored", TimestampType()),
        ]
    )
    df = spark.createDataFrame([(None, None, None), (None, 1, TS)], schema)
    got = [
        r["v"]
        for r in df.select(
            should_fetch(F.col("parsed"), F.col("sid"), F.col("stored")).alias("v")
        ).collect()
    ]
    assert got == [True, False]  # absent -> fetch even with null parsed date
