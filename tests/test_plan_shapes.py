"""Physical-plan shape pins — the properties that matter at 100 TB.

These assert on the *planned* (not executed) physical plan, so they are
cheap and catch regressions like a broadcast dim silently becoming a
shuffled join or a scan losing column pruning.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from newsfeeds_crawler_spark.operators.politeness import admit


def sparkplan(df) -> str:
    return df._jdf.queryExecution().sparkPlan().toString()


def formatted(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


@pytest.fixture(scope="module")
def sf001(spark):
    return "/root/testdata/sf0.001"


def test_admit_broadcasts_host_dimension(spark):
    pending = spark.createDataFrame(
        [("h1", 0, 0, 0)], ["host", "e_epoch", "e_rank", "e_sub"]
    )
    hosts = spark.createDataFrame(
        [("h1", None, 1)],
        "host string, last_access_epoch int, delay_epochs int",
    )
    plan = sparkplan(admit(pending, hosts, 0, 10))
    # J4: frontier ⋈ hosts must be broadcast — hosts is the small dim
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_admit_partitions_window_by_host(spark):
    pending = spark.createDataFrame(
        [("h1", 0, 0, 0)], ["host", "e_epoch", "e_rank", "e_sub"]
    )
    hosts = spark.createDataFrame(
        [("h1", None, 1)],
        "host string, last_access_epoch int, delay_epochs int",
    )
    plan = sparkplan(admit(pending, hosts, 0, 10))
    # W2 window partitions by host; Spark 4 additionally plans a
    # partial+final WindowGroupLimit, so only each host's rank-1 candidate
    # survives to the exchange — the property that keeps a 10^10 frontier's
    # admission shuffle bounded by #hosts, not frontier size
    assert "windowspecdefinition(host#" in plan
    assert plan.count("WindowGroupLimit") >= 2


def test_text_stats_scan_prunes_columns(spark, sf001):
    import __spark_entry__ as E

    plan = formatted(E.queries()["text_stats"](spark, sf001))
    # only doc_id + text may be read from the documents scan
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read and "text" in read
    assert "lang" not in read and "source" not in read and "n_chars" not in read


def test_filter_pushdown_reaches_parquet_scan(spark, sf001):
    df = (
        spark.read.parquet(f"{sf001}/documents.parquet")
        .filter(F.col("doc_id") < 128)
        .select("doc_id")
    )
    plan = formatted(df)
    assert "PushedFilters" in plan
    assert "LessThan(doc_id,128)" in plan.replace(" ", "")


def test_seen_probe_anti_is_not_per_row(spark, sf001):
    import __spark_entry__ as E

    plan = sparkplan(E.queries()["seen_probe_anti"](spark, sf001))
    # J2 must be a bulk anti join (any strategy), never a correlated lookup
    assert "LeftAnti" in plan


def test_minhash_uses_partial_aggregation(spark, sf001):
    import __spark_entry__ as E

    plan = sparkplan(E.queries()["dedup_simhash"](spark, sf001))
    # explode → groupBy must partial-aggregate before the exchange
    assert plan.count("HashAggregate") >= 2
    assert "Generate explode" in plan or "Generate" in plan
