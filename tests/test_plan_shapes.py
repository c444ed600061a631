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


def test_simhash_signatures_are_map_only(spark, sf001):
    import __spark_entry__ as E

    plan = sparkplan(E.queries()["dedup_simhash"](spark, sf001))
    # the signature fold must stay a per-doc column expression: no explode
    # row blow-up and no content-keyed exchange over document data — the
    # aggregate rides in the scan's project. The _t() ingest rebalance
    # (round-robin, only when scan splits < cores — a small-file artifact)
    # is explicitly allowed; any hash/range/single-partition exchange
    # would mean the signature math itself shuffles.
    assert "Generate" not in plan
    low = plan.lower()
    assert "hashpartitioning" not in low
    assert "rangepartitioning" not in low
    assert "singlepartition" not in low


def test_admit_global_cap_is_two_level_topk(spark):
    """W4: the worker cap must plan as TakeOrderedAndProject (distributed
    partial top-k), never a single-partition Window over all candidates."""
    pending = spark.createDataFrame(
        [("h1", 0, 0, 0)], ["host", "e_epoch", "e_rank", "e_sub"]
    )
    hosts = spark.createDataFrame(
        [("h1", None, 1)],
        "host string, last_access_epoch int, delay_epochs int",
    )
    plan = sparkplan(admit(pending, hosts, 0, 10))
    assert "TakeOrderedAndProject" in plan
    # the only empty-over() window runs above the limit — i.e. the plan
    # string shows the global Window downstream of TakeOrderedAndProject
    head = plan.split("TakeOrderedAndProject")[0]
    assert head.count("windowspecdefinition()") <= head.count("Window")


def test_fifo_topk_query_is_two_level(spark, sf001):
    import __spark_entry__ as E

    plan = sparkplan(E.queries()["frontier_fifo_topk"](spark, sf001))
    assert "TakeOrderedAndProject" in plan


def test_fetch_broadcasts_admitted_not_corpus(spark, tmp_path):
    """J5: the corpus side must never shuffle — admitted (≤ workers rows)
    broadcasts into the corpus scan; with a bucketed corpus the scan is
    partition-pruned to the admitted keys' buckets."""
    from newsfeeds_crawler_spark.operators.fetchparse import fetch
    from newsfeeds_crawler_spark.sources.frontier import write_bucketed

    corpus = spark.range(0, 1000).select(
        F.concat(F.lit("http://h/"), F.col("id")).alias("url_canon"),
        F.lit(200).alias("status"),
        F.lit("b").alias("body"),
        F.lit(None).cast("binary").alias("bytes"),
        F.lit(1).alias("w"), F.lit(1).alias("h"),
        F.lit("ppm").alias("fmt"), F.lit("c").alias("caption"),
        F.lit(0).cast("long").alias("phash"),
    )
    path = str(tmp_path / "corpus_b")
    write_bucketed(
        corpus.withColumn("__h", F.xxhash64("url_canon")), path, key="__h",
        num_buckets=8,
    )
    bucketed = spark.read.parquet(path).drop("__h")
    admitted = corpus.limit(3).select("url_canon")
    out = fetch(admitted, bucketed, num_buckets=8, materialize=False)
    plan = formatted(out)
    assert "BroadcastHashJoin" in plan      # admitted is the build side
    assert "PartitionFilters" in plan       # bucket pruning reached the scan
    assert plan.count("bucket#") >= 1


def test_brute_topk_has_partial_window_group_limit(spark, sf001):
    """ANN brute-force: the per-query rank must plan a PARTIAL (pre-shuffle)
    WindowGroupLimit so each input partition ships only its local top-k per
    query — the per-query partition after the exchange holds ≤ k×P rows,
    never |corpus|."""
    import __spark_entry__ as E

    plan = sparkplan(E.queries()["similarity_brute_topk"](spark, sf001))
    assert "Partial" in plan.split("WindowGroupLimit")[2]
    assert plan.count("WindowGroupLimit") >= 2


def test_bucketed_table_probe_join_shuffles_one_side(spark, tmp_path):
    """J2 storage-partitioned shape: a probe against a Spark-bucketed seen
    store must read the store with NO Exchange — only the candidate side
    shuffles (and results equal a plain join)."""
    from newsfeeds_crawler_spark.tablestore.bucketed import (
        probe_bucketed, write_bucketed_table,
    )

    store = spark.range(0, 10_000).select(
        F.col("id").alias("url_hash"),
        F.concat(F.lit("u"), F.col("id")).alias("url_canon"),
    )
    write_bucketed_table(
        store, "seen_bucketed_test", key="url_hash", num_buckets=8,
        path=str(tmp_path / "seen_tbl"),
    )
    cands = spark.range(0, 20_000, 3).select(F.col("id").alias("url_hash"))
    out = probe_bucketed(cands, "seen_bucketed_test", key="url_hash")
    plan = sparkplan(out)
    # exactly one Exchange: the candidates' alignment repartition — the
    # bucketed scan side must plan none
    assert plan.count("Exchange") == 1
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan
    # value-correctness vs a plain join
    want = cands.join(store, "url_hash", "left")
    assert (
        out.orderBy("url_hash").collect() == want.orderBy("url_hash").collect()
    )
    spark.sql("DROP TABLE seen_bucketed_test")


def test_engine_seen_probe_never_shuffles_the_store(spark, tmp_path):
    """J2 scale shape: the in-engine seen probe must plan the store (the
    10^10-key side) with NO shuffle and NO broadcast-of-store — the store
    streams through BroadcastHashJoin probes of the (small) candidate key
    set. The only allowed Exchange is the candidates' distinct()."""
    from newsfeeds_crawler_spark.operators.seen import probe

    store_path = str(tmp_path / "seen_store")
    spark.range(0, 50_000).select(
        F.concat(F.lit("u"), F.col("id")).alias("url_canon"),
        F.col("id").alias("url_hash"),
        F.col("id").alias("article_id"),
        F.lit(None).cast("timestamp").alias("pub_ts"),
    ).write.parquet(store_path)
    store = spark.read.parquet(store_path)
    cands = spark.range(0, 300, 7).select(
        F.concat(F.lit("u"), F.col("id")).alias("url_canon"),
        F.col("id").alias("url_hash"),
    )
    out = probe(cands, store)
    plan = sparkplan(out)
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    # ≤ 1 hash Exchange total (the candidate distinct) ⇒ the store side
    # cannot have been shuffled
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 1
    # value-correctness vs the naive left join
    naive = cands.join(
        store.select(
            F.col("url_canon").alias("__sk"),
            F.col("article_id").alias("stored_id"),
            F.col("pub_ts").alias("stored_pub_ts"),
        ),
        cands["url_canon"] == F.col("__sk"),
        "left",
    ).withColumn("__seen", F.col("__sk").isNotNull()).drop("__sk")
    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in naive.collect()}
    assert got == want


def test_catalog_bucket_pruned_read(spark, tmp_path):
    """Catalog.read(buckets=...) must read ONLY the requested bucket dirs."""
    from newsfeeds_crawler_spark.tablestore import Catalog

    cat = Catalog(spark, str(tmp_path / "cat"))
    df = spark.range(0, 1_000).select(
        F.concat(F.lit("u"), F.col("id")).alias("url_canon"),
        F.col("id").alias("url_hash"),
        F.col("id").alias("article_id"),
        F.lit(None).cast("timestamp").alias("pub_ts"),
    )
    cat.write_bucketed("seen", df, key="url_hash", num_buckets=16)
    pruned = cat.read("seen", buckets={3, 7})
    # only rows whose pmod(url_hash,16) ∈ {3,7}
    got = {r["url_hash"] for r in pruned.collect()}
    assert got == {i for i in range(1_000) if i % 16 in (3, 7)}
    full = cat.read("seen")
    assert full.count() == 1_000


def _mini_hosts(spark):
    return spark.createDataFrame(
        [("h1", None, 1, None)],
        "host string, last_access_epoch int, delay_epochs int, "
        "robots_disallow string",
    )


def _mini_heads(spark):
    return spark.createDataFrame(
        [("h1", "http://h1/a", 0, 0, 0)],
        ["host", "url_canon", "e_epoch", "e_rank", "e_sub"],
    )


def test_admit_heads_shuffle_mode_never_broadcasts_dim(spark):
    """Big-hosts mode (J4 scale edge): the admissibility join must plan as
    a shuffled-hash join on host — NO BroadcastExchange anywhere in the
    gate. At 10^8 hosts a per-tick broadcast of the dim breaks the epoch;
    on a bucketed catalog this join is storage-partitioned (zero shuffle)."""
    from newsfeeds_crawler_spark.operators.politeness import admit_heads

    plan = sparkplan(
        admit_heads(_mini_heads(spark), _mini_hosts(spark), 0, 10,
                    dim_join="shuffle")
    )
    assert "BroadcastExchange" not in plan
    assert "ShuffledHashJoin" in plan


def test_admit_shuffle_mode_dim_join_not_broadcast(spark):
    """Legacy full-frontier admission in big-hosts mode: the hosts-dim join
    is shuffled-hash; the only remaining broadcast is the ≤workers-row
    winners join-back (which is small by construction)."""
    pending = spark.createDataFrame(
        [("h1", "http://h1/a", 0, 0, 0)],
        ["host", "url_canon", "e_epoch", "e_rank", "e_sub"],
    )
    plan = sparkplan(
        admit(pending, _mini_hosts(spark), 0, 10, dim_join="shuffle")
    )
    assert "ShuffledHashJoin" in plan
    # the winners join-back broadcast is allowed; the dim must not be:
    # every BroadcastExchange input must carry the winners' admit_rank,
    # never the dim's delay_epochs
    for frag in plan.split("BroadcastExchange")[1:]:
        assert "delay_epochs" not in frag.split("Scan")[0][:400]


def test_robots_split_semi_mode_prunes_dim_before_broadcast(spark):
    """Per-tick enqueue robots gate in big-hosts mode: the dim is pruned to
    the probe's hosts by a LeftSemi join BEFORE being broadcast — dim bytes
    shipped ∝ the tick's activity, never |hosts|."""
    from newsfeeds_crawler_spark.operators.politeness import robots_split

    pending = spark.createDataFrame(
        [("h1", "http://h1/a", 0, 0, 0)],
        ["host", "url_canon", "e_epoch", "e_rank", "e_sub"],
    )
    allowed, denied = robots_split(pending, _mini_hosts(spark), dim_join="semi")
    plan = sparkplan(allowed)
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_anchor_topk_has_partial_window_group_limit(spark, sf001):
    """Anchor-text consolidation: the per-dst top-k must plan the same
    PARTIAL + FINAL WindowGroupLimit pair as the ANN rank windows, so a
    hot link target ships ≤ k rows per input partition — never its whole
    anchor profile."""
    import __spark_entry__ as E

    plan = sparkplan(E.queries()["link_anchor_topk"](spark, sf001))
    assert plan.count("WindowGroupLimit") >= 2
    assert "Partial" in plan.split("WindowGroupLimit")[2]
