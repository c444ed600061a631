"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is one operator from SURVEY.md §2 (crawl dataflow)
or one training-data-pipeline operator (dedup / similarity / text analysis /
multimodal), expressed Spark-first over the driver's parquet tables, with a
DuckDB ``oracle_sql()`` mirror. Hash-sensitive operators (MinHash, SimHash,
fingerprints) are built on the engine-portable polynomial hash in
``newsfeeds_crawler_spark.functions.dedup`` so both engines produce
bit-identical values; cosine similarities use an identical left-fold
summation order on both sides.

Reference parity notes cite /root/reference files in the underlying modules.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from newsfeeds_crawler_spark.functions.dedup import (
    MERSENNE31,
    SIMHASH_BITS,
    fingerprint_sql,
    minhash_coeffs,
    shingles_sql,
    tokens_sql,
)
from newsfeeds_crawler_spark.functions.predicates import should_fetch
from newsfeeds_crawler_spark.operators.revisit import qlog2_sql
from newsfeeds_crawler_spark.functions.text import (
    STOPWORDS_DE,
    STOPWORDS_EN,
    STOPWORDS_FR,
    fingerprint64,
    lang_id,
    quality_score,
    stopword_ratio,
    token_count_bpe_ish,
    token_count_ws,
    BPE_ISH_PATTERN,
)
from newsfeeds_crawler_spark.functions.urls import canonicalize_url, url_host
from newsfeeds_crawler_spark.operators.dedup import (
    exact_dups,
    minhash_lsh_pairs,
    simhash_docs,
    simhash_hamming_pairs,
    token_jaccard_pairs,
)
from newsfeeds_crawler_spark.operators.similarity import (
    brute_topk,
    cosine_sql,
    embedding_cosine_pairs,
    ivf_topk,
)
from newsfeeds_crawler_spark.operators.curation import (
    BAND_HIGH_MIN,
    BAND_MID_MIN,
    BENCH_MOD,
    BIGRAM_KEEP_MIN,
    CANARY,
    CANARY_MOD,
    DECONTAM_N,
    LOGP_QUANT,
    MIX_QUANT,
    MIX_TEMPERATURE,
    SAMPLE_BUCKETS,
    SAMPLE_RATE_HIGH,
    SAMPLE_RATE_LOW,
    SAMPLE_RATE_MID,
    SAMPLE_SALT,
    bigram_lm_score,
    decontaminate,
    mixture_weights,
    sample_stratified,
)
from newsfeeds_crawler_spark.operators.textquality import (
    DUP_TRIGRAM_CHAR_MAX,
    MIN_QUALITY,
    curation_verdict,
    PII_EMAIL_RE,
    PII_IPV4_RE,
    PII_PHONE_RE,
    SEGMENT_DUP_MAX,
    SEGMENT_WINDOW,
    TOP_BIGRAM_MAX,
    pii_scrub,
    repetition_stats,
    segment_dedup,
)


#: tables whose consumers do CPU-heavy per-row derivation (shingling,
#: signatures, codecs, vector folds) — the only ones worth a rebalance
#: shuffle when the scan yields fewer splits than cores
_REBALANCE_TABLES = frozenset({"documents", "embeddings"})


def _t(
    spark: SparkSession, sf_dir: str, name: str, rebalance: bool | None = None
) -> DataFrame:
    """Read one test table, rebalancing the PAYLOAD tables when the scan
    yields fewer splits than cores. The sf0.1 files are single-row-group
    parquet, so a CPU-heavy derivation downstream (shingling, signatures,
    phash, vector folds) would otherwise run as ONE task on a 32-core
    session — a small-file artifact, not a plan property; measured at
    sf0.1 the rebalance cuts dedup_token_jaccard 6.0→0.95 s and
    similarity_pq_topk 11.1→1.9 s. The relational tables (orders,
    lineitem, events, ...) feed arithmetic projections where the shuffle
    COSTS more than it buys (~0.3–1.3 s per scan-bound gate, measured
    bench-over-bench), so they read as-is — at real scale every scan
    produces >= cores splits and both branches are no-ops. Round-robin
    repartition is value-neutral: every gate aggregates
    order-independently (int sums / min / max / per-pair folds), which
    check_entry re-verifies."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if rebalance is None:
        rebalance = name in _REBALANCE_TABLES
    if rebalance:
        par = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < par:
            df = df.repartition(par)
    return df


# =====================================================================
# entry — flagship crawl-shaped pipeline on sf0.001
# =====================================================================

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: frontier build → canonicalize → seen anti-join → per-host
    politeness admission (one fetch per host per tick), on sf0.001 events.

    The crawl operators (S2/P6/J2/W1–W3) composed into one plan; the full
    engine with state tables runs in tests/test_crawl_e2e.py.
    """
    ev = _t(spark, "/root/testdata/sf0.001", "events")
    raw = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.concat(
            F.lit("HTTPS://H"),
            (F.col("user_id") % 25).cast("string"),
            F.lit(".Example.COM:443//e//"),
            F.col("event_id").cast("string"),
        ).alias("url"),
    )
    canon = raw.withColumn("url_canon", canonicalize_url("url")).withColumn(
        "host", url_host(F.col("url_canon"), canonical=True)
    )
    seen = canon.filter(F.col("event_type") == "error").select(
        F.col("url_canon").alias("seen_canon")
    )
    frontier = canon.filter(F.col("event_type") != "error").join(
        seen, canon["url_canon"] == F.col("seen_canon"), "left_anti"
    )
    w_host = Window.partitionBy("host").orderBy("ts", "event_id")
    admitted = (
        frontier.withColumn("rn", F.row_number().over(w_host))
        .filter(F.col("rn") == 1)
        .select("host", "url_canon", "event_id", "ts")
    )
    return admitted


# =====================================================================
# shared SQL fragments (DuckDB oracle mirrors)
# =====================================================================

_WS_TOKS = tokens_sql("text")


def _sw_ratio_sql(words: list[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return (
        f"(len(list_filter({_WS_TOKS}, __t -> __t IN ({lst}))) "
        f"/ greatest(len({_WS_TOKS}), 1))"
    )


def _quality_sql() -> str:
    n = "(length(text)::DOUBLE)"
    alpha = "(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE)"
    punct = "(length(regexp_replace(text, '[^!?.,;:]', '', 'g'))::DOUBLE)"
    len_band = f"least({n} / 500.0, 1.0)"
    alpha_ratio = f"({alpha} / greatest({n}, 1.0))"
    punct_pen = f"least({punct} / greatest({n}, 1.0) * 5.0, 1.0)"
    sw = _sw_ratio_sql(STOPWORDS_EN)
    raw = (
        f"0.35 * {len_band} + 0.35 * {alpha_ratio} "
        f"+ 0.3 * least({sw} * 5.0, 1.0) - 0.2 * {punct_pen}"
    )
    return f"round(greatest(least({raw}, 1.0), 0.0), 6)"


def _lang_sql() -> str:
    en, de, fr = (
        _sw_ratio_sql(STOPWORDS_EN),
        _sw_ratio_sql(STOPWORDS_DE),
        _sw_ratio_sql(STOPWORDS_FR),
    )
    return (
        f"CASE WHEN greatest({en}, {de}, {fr}) = 0 THEN 'und' "
        f"WHEN {en} = greatest({en}, {de}, {fr}) THEN 'en' "
        f"WHEN {de} = greatest({en}, {de}, {fr}) THEN 'de' "
        f"ELSE 'fr' END"
    )


def _minhash_sig_sql(hs_expr: str, num_hashes: int = 16, seed: int = 42) -> str:
    parts = [
        f"coalesce(list_min(list_transform({hs_expr}, "
        f"__h -> ({a}::BIGINT * __h + {b}) % {MERSENNE31})), {MERSENNE31})"
        for a, b in minhash_coeffs(num_hashes, seed)
    ]
    return "[" + ", ".join(parts) + "]"


def _band_keys_sql(sig: str, bands: int = 8, rows: int = 2) -> str:
    keys = []
    for b in range(bands):
        cells = " || '_' || ".join(
            f"({sig})[{b * rows + i + 1}]::VARCHAR" for i in range(rows)
        )
        keys.append(f"('{b}' || '_' || {cells})")
    return "[" + ", ".join(keys) + "]"


# =====================================================================
# queries
# =====================================================================

def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/FIXTURES §0 — canonicalization of messy URLs (the seen-set key)."""
    c = _t(spark, sf_dir, "customer")
    u = F.concat(
        F.lit("HTTP://Host"),
        (F.col("c_custkey") % 20).cast("string"),
        F.lit(".Example.COM:80//p//"),
        F.col("c_custkey").cast("string"),
        F.lit("/x?q="),
        F.col("c_custkey").cast("string"),
        F.lit("#frag"),
    )
    return c.select(
        "c_custkey",
        canonicalize_url(u).alias("url_canon"),
        url_host(u).alias("host"),
    )


def q_merge_get_or_create(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/J1 — feed get-or-create as left-anti + union (MERGE shape)."""
    c = _t(spark, sf_dir, "customer")
    seeds = c.filter(F.col("c_custkey") % 7 == 0).select("c_custkey")
    existing = c.filter(F.col("c_custkey") % 14 == 0).select("c_custkey")
    return existing.withColumn("action", F.lit("existing")).unionByName(
        seeds.join(existing, "c_custkey", "left_anti").withColumn(
            "action", F.lit("insert")
        )
    )


def q_seen_probe_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 fast path — definitely-new rows via left_anti (orders with no
    lineitems play 'URLs not yet in the seen store')."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return o.join(li, "o_orderkey", "left_anti").select("o_orderkey", "o_custkey")


def q_seen_probe_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — seen probe with partitioned-Bloom prefilter; bloom "maybe" rows
    resolve through the exact join, "new" rows bypass it — results are
    exactly the plain join's (no false negatives), which the oracle checks."""
    from newsfeeds_crawler_spark.operators.bloom import PartitionedBloom

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cands = o.filter(F.col("o_orderkey") % 5 == 0).select("o_orderkey")
    seen_keys = (
        li.filter(F.col("l_orderkey") % 3 != 0).select("l_orderkey").distinct()
    )
    bloom = PartitionedBloom.build(
        seen_keys.select(F.col("l_orderkey").alias("url_hash")),
        num_buckets=8,
        expected_per_bucket=50_000,
        fpp=0.01,
    )
    maybe, new = bloom.split(cands, "o_orderkey")
    resolved = maybe.join(
        seen_keys.withColumnRenamed("l_orderkey", "__k"),
        maybe["o_orderkey"] == F.col("__k"),
        "left",
    ).select("o_orderkey", F.col("__k").isNotNull().alias("seen"))
    return resolved.unionByName(
        new.select("o_orderkey", F.lit(False).alias("seen"))
    )


def q_recency_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2 — second-truncated recency fetch decision vs the stored row
    (here: each event vs the user's previous event)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    withprev = ev.select(
        "event_id",
        "ts",
        F.lag("ts").over(w).alias("stored_ts"),
        F.lag("event_id").over(w).alias("stored_id"),
    )
    return withprev.select(
        "event_id",
        should_fetch(F.col("ts"), F.col("stored_id"), F.col("stored_ts")).alias(
            "fetch"
        ),
    )


def q_politeness_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1–W3 — top-1-per-host FIFO admission (HttpManager.scala:76-102)."""
    ev = _t(spark, sf_dir, "events")
    hosted = ev.withColumn(
        "host", F.concat(F.lit("h"), (F.col("user_id") % 50).cast("string"))
    )
    w = Window.partitionBy("host").orderBy("ts", "event_id")
    return (
        hosted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("host", "event_id", "ts")
    )


def q_frontier_fifo_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+W4 — global FIFO rank with the worker-pool cap (96 in flight).

    Two-level top-k: orderBy().limit() plans as TakeOrderedAndProject
    (per-partition partial top-k + final merge), so no single-partition
    Window ever sees the full table; the rank window input is ≤ 96 rows.
    """
    ev = _t(spark, sf_dir, "events")
    topk = ev.select("event_id", "ts").orderBy("ts", "event_id").limit(96)
    w = Window.orderBy("ts", "event_id")
    return (
        topk.withColumn("fifo_rank", F.row_number().over(w))
        .select("event_id", F.col("fifo_rank").cast("int"))
    )


def q_frontier_heads_admit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental admission (W2+W3+W4 over a head-candidate table): top-1
    row per host (the heads state the engine maintains incrementally),
    then host admissibility (every 3rd host blocked), two-level top-k
    (TakeOrderedAndProject — no full-table single-partition Window), and
    the worker-cap rank. The full politeness gate reads one row per host,
    never the 10^10-row pending set (plans/driver.py admit_heads path)."""
    ev = _t(spark, sf_dir, "events")
    hosted = ev.select(
        "event_id",
        "ts",
        (F.col("user_id") % 50).cast("long").alias("hostn"),
    )
    w = Window.partitionBy("hostn").orderBy("ts", "event_id")
    heads = (
        hosted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    admissible = heads.filter(F.col("hostn") % 3 != 0)
    topk = admissible.orderBy("ts", "event_id").limit(24)
    w_glob = Window.orderBy("ts", "event_id")
    return topk.withColumn(
        "admit_rank", (F.row_number().over(w_glob) - 1).cast("int")
    ).select("hostn", "event_id", "ts", "admit_rank")


def q_politeness_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host pending quota — the engine's EXACT count-after-departures
    bulk rule (plans/driver.py host_pending_cap path): a host's prior
    stored pending_count (the incrementally-maintained hosts-table column)
    minus this tick's admitted departures gives __mid; an arriving task is
    admitted iff its FIFO position within the tick's arrivals plus __mid
    stays within the cap. Expressed over the driver tables the same way
    the tick does it: one departures aggregate, one broadcast count join,
    one per-host FIFO window — the pending frontier is never scanned.

    Table mapping: arrivals = events rows (hostn = user_id % 50, FIFO key
    (ts, event_id) ~ the frontier's (e_epoch, e_rank, e_sub)); the prior
    counts table derives from orders; the tick's departures from lineitem."""
    ev = _t(spark, sf_dir, "events")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    arrivals = ev.select(
        "event_id", "ts", (F.col("user_id") % 50).cast("long").alias("hostn")
    )
    # hosts.pending_count analog: prior pending rows per host
    prior = orders.groupBy(
        (F.col("o_custkey") % 50).cast("long").alias("hostn")
    ).agg(
        F.sum(F.when(F.col("o_orderkey") % 31 < 2, 1).otherwise(0))
        .cast("long")
        .alias("pending_count")
    )
    # this tick's admitted departures per host (driver.py: dec)
    dep = (
        li.filter((F.col("l_linenumber") == 1) & (F.col("l_partkey") % 41 == 0))
        .groupBy((F.col("l_orderkey") % 50).cast("long").alias("hostn"))
        .agg(F.count(F.lit(1)).cast("long").alias("__dec"))
    )
    # count-after-departures (driver.py: __mid = pending_count − __dec)
    cnt = prior.join(F.broadcast(dep), "hostn", "left").select(
        "hostn",
        (
            F.coalesce(F.col("pending_count"), F.lit(0))
            - F.coalesce(F.col("__dec"), F.lit(0))
        ).alias("mid"),
    )
    wq = Window.partitionBy("hostn").orderBy("ts", "event_id")
    cap = 8
    return (
        arrivals.join(F.broadcast(cnt), "hostn", "left")
        .withColumn("qpos", F.row_number().over(wq).cast("int"))
        .select(
            "hostn",
            "event_id",
            "ts",
            "qpos",
            F.coalesce(F.col("mid"), F.lit(0)).cast("long").alias("mid"),
            (
                F.col("qpos") + F.coalesce(F.col("mid"), F.lit(0))
                <= F.lit(cap)
            ).alias("admitted"),
        )
    )


def q_politeness_depth_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host budgets by DEPTH CLASS (plans/driver.py host_seed_cap =
    depth 0, host_pending_cap = depth 1): each class's pending rows are
    capped independently per host — the same count-after-departures rule
    as politeness_quota, windowed per (host, depth) with a per-depth cap.
    One departures aggregate + one broadcast count join + one window; no
    frontier scan."""
    ev = _t(spark, sf_dir, "events")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    arrivals = ev.select(
        "event_id",
        "ts",
        (F.col("user_id") % 50).cast("long").alias("hostn"),
        (F.col("event_id") % 2).cast("int").alias("depth"),
    )
    prior = orders.groupBy(
        (F.col("o_custkey") % 50).cast("long").alias("hostn"),
        (F.col("o_orderkey") % 2).cast("int").alias("depth"),
    ).agg(
        F.sum(F.when(F.col("o_orderkey") % 37 < 2, 1).otherwise(0))
        .cast("long")
        .alias("pending_count")
    )
    dep = (
        li.filter((F.col("l_linenumber") == 1) & (F.col("l_partkey") % 41 == 0))
        .groupBy(
            (F.col("l_orderkey") % 50).cast("long").alias("hostn"),
            (F.col("l_suppkey") % 2).cast("int").alias("depth"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("__dec"))
    )
    cnt = prior.join(F.broadcast(dep), ["hostn", "depth"], "left").select(
        "hostn",
        "depth",
        (
            F.coalesce(F.col("pending_count"), F.lit(0))
            - F.coalesce(F.col("__dec"), F.lit(0))
        ).alias("mid"),
    )
    wq = Window.partitionBy("hostn", "depth").orderBy("ts", "event_id")
    cap = F.when(F.col("depth") == 0, F.lit(3)).otherwise(F.lit(9))
    return (
        arrivals.join(F.broadcast(cnt), ["hostn", "depth"], "left")
        .withColumn("qpos", F.row_number().over(wq).cast("int"))
        .select(
            "hostn",
            "depth",
            "event_id",
            "ts",
            "qpos",
            F.coalesce(F.col("mid"), F.lit(0)).cast("long").alias("mid"),
            (F.col("qpos") + F.coalesce(F.col("mid"), F.lit(0)) <= cap).alias(
                "admitted"
            ),
        )
    )


def q_robots_asof_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned-robots AS-OF join (the mid-crawl robots refresh's read
    side, plans/driver.py _apply_robots_updates / oracle/refsim.py): for
    every request the rule version in force = the latest version with
    effective_epoch <= request epoch (a version applies at the START of
    its epoch, so an equal-epoch version IS in force — the union tag
    sorts versions before requests).

    Scale shape: the classic single-pass as-of join — union the (small)
    versions table into the requests, ONE window per host carrying the
    last non-null version forward (last ignorenulls over a running ROWS
    frame). No per-request version-scan join, no theta join; cost is one
    shuffle on host + a linear pass, at any version or request count.

    Table mapping: versions from orders (hostn = o_custkey % 40, epoch =
    o_orderkey % 20 + 1, deduped to max o_orderkey per host-epoch);
    requests from events (hostn = user_id % 40, epoch = event_id % 25)."""
    orders = _t(spark, sf_dir, "orders")
    ev = _t(spark, sf_dir, "events")
    versions = orders.groupBy(
        (F.col("o_custkey") % 40).cast("long").alias("hostn"),
        (F.col("o_orderkey") % 20 + 1).cast("int").alias("epoch"),
    ).agg(F.max("o_orderkey").cast("long").alias("rules_id"))
    reqs = ev.select(
        F.col("event_id").cast("long").alias("event_id"),
        (F.col("user_id") % 40).cast("long").alias("hostn"),
        (F.col("event_id") % 25).cast("int").alias("epoch"),
    )
    u = versions.select(
        "hostn",
        "epoch",
        F.lit(0).alias("tag"),
        F.col("epoch").alias("ver_epoch"),
        "rules_id",
        F.lit(None).cast("long").alias("event_id"),
    ).unionByName(
        reqs.select(
            "hostn",
            "epoch",
            F.lit(1).alias("tag"),
            F.lit(None).cast("int").alias("ver_epoch"),
            F.lit(None).cast("long").alias("rules_id"),
            "event_id",
        )
    )
    # ties among same-epoch requests are harmless: request rows carry null
    # version fields, so last(ignorenulls) is invariant to their order
    w = (
        Window.partitionBy("hostn")
        .orderBy("epoch", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn(
            "rule_epoch", F.last("ver_epoch", ignorenulls=True).over(w)
        )
        .withColumn("rid", F.last("rules_id", ignorenulls=True).over(w))
        .filter(F.col("tag") == 1)
        .select(
            "event_id",
            "hostn",
            F.col("epoch").alias("req_epoch"),
            "rule_epoch",
            F.col("rid").alias("rules_id"),
        )
    )


def q_watermark_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A2/S7 — per-feed completion count + watermark aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.max(F.date_trunc("second", F.col("l_shipdate"))).alias("watermark"),
    )


def q_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 — MERGE-upsert read view: latest row per key from an append log."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "value")
    )


def q_host_last_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — per-host last-access max + fetch count (hostAccessMap update)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.max("ts").alias("last_access"),
        F.count(F.lit(1)).cast("bigint").alias("n_fetches"),
    )


def q_status_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — null/error content routed to a status column, not actor kills."""
    ev = _t(spark, sf_dir, "events")
    status = (
        F.when(F.col("event_type") == "error", F.lit("dead"))
        .when(F.col("value") < 5.0, F.lit("skipped"))
        .otherwise(F.lit("ok"))
    )
    return ev.select(status.alias("status")).groupBy("status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup — hash-groupBy survivorship table (all groups). A
    plain hash aggregate needs no input rebalance (map-side combine
    already parallelizes the reduce; the shuffle would only tax it)."""
    d = _t(spark, sf_dir, "documents", rebalance=False)
    return d.groupBy(F.md5(F.col("text")).alias("text_md5")).agg(
        F.min("doc_id").cast("bigint").alias("rep_id"),
        F.count(F.lit(1)).cast("bigint").alias("dup_count"),
    )


def q_dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup — only duplicated groups (dup_count > 1)."""
    return exact_dups(
        _t(spark, sf_dir, "documents", rebalance=False), "doc_id", "text"
    )


def q_dedup_token_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram(1) Jaccard near-dup pairs, blocked on (lang, length bucket)."""
    d = _t(spark, sf_dir, "documents").withColumn(
        "len_blk", (F.col("n_chars") / 64).cast("bigint")
    )
    return token_jaccard_pairs(
        d, "doc_id", "text", ["lang", "len_blk"], threshold=0.2
    )


def q_dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental LSH dedup probe (operators/dedup.incremental_lsh_probe):
    documents with doc_id % 3 == 0 are the NEW epoch batch, the rest are
    the existing corpus; each new doc is probed through the LSH band
    index (candidates = shared band key with an existing doc) and
    verified with exact shingle Jaccard >= 0.2. Per-batch-doc verdict:
    candidate count, is_dup, best match (highest Jaccard, lowest id)."""
    from newsfeeds_crawler_spark.operators.dedup import incremental_lsh_probe

    d = _t(spark, sf_dir, "documents")
    return incremental_lsh_probe(
        d.filter(F.col("doc_id") % 3 != 0),
        d.filter(F.col("doc_id") % 3 == 0),
        "doc_id",
        "text",
        threshold=0.2,
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(8 bands × 2 rows) → verified Jaccard ≥ 0.2 pairs."""
    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        num_hashes=16,
        bands=8,
        k_shingle=3,
        threshold=0.2,
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash per document (explode + per-bit vote aggregate)."""
    return simhash_docs(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash hamming-join: banded candidates (3×8-bit bands — full recall
    for distance ≤ 2 by pigeonhole), bit_count(xor) verification."""
    return simhash_hamming_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", max_dist=2
    )


def q_similarity_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for query vectors vec_id < 8."""
    e = _t(spark, sf_dir, "embeddings")
    return brute_topk(e, e.filter(F.col("vec_id") < 8), k=5)


def q_similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF single-probe cosine top-5 (centroids = vec_id % 50 == 0)."""
    e = _t(spark, sf_dir, "embeddings")
    return ivf_topk(
        e,
        e.filter(F.col("vec_id") < 8),
        e.filter(F.col("vec_id") % 50 == 0),
        k=5,
    )


def q_similarity_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF MULTI-probe (n_probe=2) cosine top-5 — recovers single-probe's
    cell-boundary misses at 2x candidate cost, still never |corpus|."""
    e = _t(spark, sf_dir, "embeddings")
    return ivf_topk(
        e,
        e.filter(F.col("vec_id") < 8),
        e.filter(F.col("vec_id") % 50 == 0),
        k=5,
        n_probe=2,
    )


def q_dedup_minhash_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS from the MinHash+LSH pairs: connected components
    by iterative min-label propagation (operators/dedup.neardup_components)
    — the keep-one-per-cluster view a training pipeline applies. The DuckDB
    oracle computes the same closure with a recursive CTE, so the gate is
    hash-checked end-to-end (shingles → signatures → bands → pairs →
    components)."""
    from newsfeeds_crawler_spark.operators.dedup import neardup_components

    pairs = q_dedup_minhash_lsh(spark, sf_dir)
    return neardup_components(pairs)


def q_similarity_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-5 (codebook = vec_id % 25 == 0 rows,
    64-dim vectors in 8 subspaces): the corpus is searched through its
    8-code representation only — the billion-vector memory path. Exact
    DuckDB mirror (same codebook rows, same rounded subspace L2², same
    j-ordered ADC fold), so this gate is hash-checked, not rows-only."""
    from newsfeeds_crawler_spark.operators.similarity import pq_topk

    e = _t(spark, sf_dir, "embeddings")
    return pq_topk(
        e,
        e.filter(F.col("vec_id") < 8),
        e.filter(F.col("vec_id") % 25 == 0),
        dim=64,
        n_sub=8,
        k=5,
    )


def q_similarity_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed ANN (operators/similarity.ivfpq_topk): coarse
    inverted lists (centroids = vec_id % 50 == 0, multi-probe n_probe=2)
    with PQ codes inside each list (codebook = vec_id % 25 == 0, 64-dim in
    8 subspaces) — the FAISS-IVFPQ layout, searched through codes only.
    Exact DuckDB mirror (same assignment, same rounded subspace L2², same
    j-ordered ADC fold), so the gate is hash-checked."""
    from newsfeeds_crawler_spark.operators.similarity import ivfpq_topk

    e = _t(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        e,
        e.filter(F.col("vec_id") < 8),
        e.filter(F.col("vec_id") % 50 == 0),
        e.filter(F.col("vec_id") % 25 == 0),
        dim=64,
        n_sub=8,
        k=5,
        n_probe=2,
    )


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, IVF-cell blocked (sim >= 0.3)."""
    e = _t(spark, sf_dir, "embeddings")
    return embedding_cosine_pairs(
        e, e.filter(F.col("vec_id") % 50 == 0), threshold=0.3
    )


def q_text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF retrieval (operators/tfidf.py): every 37th document queries
    the whole documents table, top-5 matches by tf-idf cosine. Weights are
    integer-quantized (round((ln((N+1)/(df+1))+1)·10⁴)) so every dot/norm
    is an exact int64 sum — order-independent, hence oracle-HASHABLE —
    and only the final score divides in double (round 6dp)."""
    from newsfeeds_crawler_spark.operators.tfidf import tfidf_topk

    d = _t(spark, sf_dir, "documents")
    return tfidf_topk(d, d.filter(F.col("doc_id") % 37 == 0), k=5)


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish) and rolling-hash fingerprint
    (whole-document hashing → the Arrow twin; values bit-identical to the
    expression fold, so the DuckDB mirror is unchanged)."""
    from newsfeeds_crawler_spark.functions.text import fingerprint64_arrow

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count_ws(F.col("text")).alias("n_tok_ws"),
        token_count_bpe_ish(F.col("text")).alias("n_tok_bpe"),
        fingerprint64_arrow(F.col("text")).alias("fp64"),
    )


def q_text_lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic + quality score + stopword ratio."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        lang_id(F.col("text")).alias("lang_pred"),
        quality_score(F.col("text")).alias("quality"),
        F.round(stopword_ratio(F.col("text")), 6).alias("stop_ratio"),
    )


def q_text_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (operators/textquality.py): top-
    bigram occurrence fraction + duplicated-trigram character fraction +
    the keep/drop verdict, per document."""
    return repetition_stats(_t(spark, sf_dir, "documents"))


def q_dedup_segment_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style cross-document segment dedup (operators/textquality.py):
    16-token windows fingerprinted corpus-wide; per-doc duplicated-segment
    ratio and keep flag."""
    return segment_dedup(_t(spark, sf_dir, "documents"))


def q_dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring span removal (operators/spandedup.py),
    the Lee et al. 2022 pass: rolling 8-token window fingerprints →
    corpus-wide occurrence count → per-doc maximal-interval merge. The
    gate plants cross-doc and within-doc boilerplate by doc_id arithmetic
    (mirrored in the oracle) so real spans exist; output is the exact
    integer span set (doc_id, span_id, start_tok, end_tok, ...)."""
    from newsfeeds_crawler_spark.operators.spandedup import (
        BOILER_A,
        BOILER_B,
        duplicate_spans,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    salted = F.concat(
        F.col("text"),
        F.when(did % 4 == 0, F.lit(" " + BOILER_A)).otherwise(F.lit("")),
        F.when(did % 6 == 0, F.lit(" " + BOILER_B)).otherwise(F.lit("")),
        F.when(did % 10 == 0, F.lit(" " + BOILER_A)).otherwise(F.lit("")),
    )
    return duplicate_spans(d.select("doc_id", salted.alias("text")))


def q_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (operators/textquality.py): deterministic synthetic
    email/phone/IPv4 injection (arithmetic on doc_id, mirrored in the
    oracle), regex counts, placeholder redaction verified by hashing the
    scrubbed text on both engines."""
    return pii_scrub(_t(spark, sf_dir, "documents"))


def q_curation_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation pipeline (operators/textquality.py): repetition +
    segment-dedup + quality-score rules joined per doc into keep/drop with
    a precedence-ordered reason code."""
    return curation_verdict(_t(spark, sf_dir, "documents"))


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (operators/sessionize.py): 30-minute
    inter-event gaps split each user's event stream into sessions —
    integer-microsecond gaps and a cumulative int session id, so the
    segmentation is exact and hash-checked."""
    from newsfeeds_crawler_spark.operators.sessionize import sessionize

    return sessionize(_t(spark, sf_dir, "events"))


def q_link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration integer PageRank (operators/linkgraph.py) over a
    deterministic host link graph derived from events (src = user_id mod
    997, dst = event_id mod 997): host-authority crawl priority whose
    int64 rank units are exact and order-independent, so the 3-iteration
    fixpoint hash-matches DuckDB's unrolled-CTE mirror."""
    from newsfeeds_crawler_spark.operators.linkgraph import pagerank_iter

    ev = _t(spark, sf_dir, "events")
    edges = ev.select(
        (F.col("user_id") % 997).alias("src"),
        (F.col("event_id") % 997).alias("dst"),
    )
    return pagerank_iter(edges, iters=3)


def q_politeness_adaptive_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive per-host crawl delay (operators/quantiles.
    adaptive_crawl_delay): exact p95 of synthetic per-host fetch
    latencies (arithmetic on event ids, per-host ranges spanning three
    regimes so BOTH clamps and the interior rule bind), delay =
    clamp(2·p95, 500, 30000) ms — all integer, hash-exact."""
    from newsfeeds_crawler_spark.operators.quantiles import (
        adaptive_crawl_delay,
    )

    ev = _t(spark, sf_dir, "events")
    lat = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 50).cast("string")).alias(
            "host"
        ),
        (
            (F.col("event_id") * 7919)
            % (F.lit(100) + ((F.col("user_id") % 50) % 7) * F.lit(8000))
        ).cast("bigint").alias("latency_ms"),
    )
    return adaptive_crawl_delay(lat)


def q_feed_revisit_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revisit scheduling from observed change rates (operators/revisit.
    revisit_schedule): the Cho & Garcia-Molina change-frequency estimator
    -ln((n-X+1/2)/(n+1/2)) computed in integer-quantized log2 (bin/div
    arithmetic — cross-engine bit-exact, see operators/revisit.py), with
    revisit interval ∝ 1/rate clamped both ways. Synthetic per-feed visit
    logs over events span five classes: never-changed (max clamp binds),
    always-changed (min clamp binds), and three interior periodic rates."""
    from newsfeeds_crawler_spark.operators.revisit import revisit_schedule

    ev = _t(spark, sf_dir, "events")
    fid = (F.col("user_id") % 200).cast("bigint")
    cls = fid % 5
    eid = F.col("event_id")
    changed = (
        F.when(cls == 0, F.lit(0))
        .when(cls == 1, F.lit(1))
        .otherwise(F.when(eid % cls == 0, F.lit(1)).otherwise(F.lit(0)))
    ).cast("bigint")
    hist = ev.select(
        fid.alias("feed_id"),
        (eid % 997).cast("bigint").alias("epoch"),
        changed.alias("changed"),
    )
    return revisit_schedule(hist)


def q_image_aspect_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-bucketed training batch/shard manifest (operators/
    multimodal.aspect_bucket_shards): the same deterministic (w, h)
    derivation as image_metadata_verdict, quarter-unit aspect classes,
    32-image batches, 8 batches per shard — exact window arithmetic."""
    from newsfeeds_crawler_spark.operators.multimodal import (
        aspect_bucket_shards,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    img = d.select(
        did.alias("image_id"),
        (F.lit(16) + (did * 37) % 1009).cast("int").alias("w"),
        (F.lit(16) + (did * 61) % 1009).cast("int").alias("h"),
    )
    return aspect_bucket_shards(img)


def q_text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style benchmark decontamination (operators/curation.py): the
    doc_id % 37 slice is the benchmark set; training docs are flagged when
    any distinct 5-gram also occurs in the benchmark slice. A canary
    phrase is planted on both sides (arithmetic on doc_id) so the gate
    verifies real hits. Benchmark grams broadcast; the corpus side never
    shuffles."""
    return decontaminate(_t(spark, sf_dir, "documents"))


def q_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quality-stratified sampling (operators/curation.py):
    quality bands map to integer keep-thresholds over the portable
    fingerprint of 'sample#'||doc_id — identical keep set on any cluster
    size, partitioning, or engine. Map-only projection."""
    return sample_stratified(_t(spark, sf_dir, "documents"))


def q_url_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-blocklist URL filtering (operators/blocklist.py): events-
    derived URLs across three host classes — bare, sub.-prefixed (the
    suffix rule must fire), and an xh-prefixed decoy (dot-bounded
    matching must NOT fire on 'xh5…' for rule 'h5…') — against a 5-rule
    list including an overlapping pair (h9 + sub.h9) where the
    most-specific rule must win. Suffix explode + broadcast join + one
    longest-match aggregate; hash-exact."""
    from newsfeeds_crawler_spark.operators.blocklist import blocklist_filter

    ev = _t(spark, sf_dir, "events")
    k = (F.col("user_id") % 40).cast("string")
    cls = F.col("user_id") % 3
    host = (
        F.when(cls == 1, F.concat(F.lit("sub.h"), k, F.lit(".example.com")))
        .when(cls == 2, F.concat(F.lit("xh"), k, F.lit(".example.com")))
        .otherwise(F.concat(F.lit("h"), k, F.lit(".example.com")))
    )
    urls = ev.select(
        F.concat(
            F.lit("https://"), host, F.lit("/p"), F.col("event_id").cast("string")
        ).alias("url")
    )
    rules = spark.createDataFrame(
        [
            ("h5.example.com",),
            ("h17.example.com",),
            ("h9.example.com",),
            ("sub.h9.example.com",),
            ("example.net",),
        ],
        "domain string",
    )
    return blocklist_filter(urls, rules)


def q_text_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-level cleaning (operators/textclean.py): synthetic
    multi-line documents over doc_id with four planted line classes —
    valid sentence, too-short, no terminal punctuation, valid — cleaned
    with the real array-expression filter; the oracle mirrors the same
    list pipeline in DuckDB, hash-checking the CLEANED TEXT itself.
    Line counts vary per doc (3..7) so the document-level min-lines
    verdict fires both ways."""
    from newsfeeds_crawler_spark.operators.textclean import c4_clean

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id")
    )
    line = (
        "case (doc_id + j) % 4 "
        "when 1 then concat('Short no. ', cast(j as string)) "
        "when 2 then concat('No terminal punctuation on line ', "
        "cast(j as string), ' of this doc') "
        "else concat('  A valid retained sentence number ', "
        "cast(j as string), ' for document ', cast(doc_id as string), "
        "'.  ') end"
    )
    body = (
        "array_join(transform(sequence(0, cast(doc_id % 5 as int) + 2), "
        f"j -> {line}), '\\n')"
    )
    docs = d.selectExpr("doc_id", f"({body}) as text")
    return c4_clean(docs)


def q_corpus_zigzag_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zig-zag balanced sharding (operators/balance.py): per-source
    serpentine assignment of documents (deterministic weights from
    doc_id arithmetic) over 8 shards — rank by (weight desc, id), shard
    = boustrophedon(rank). Pure int64 window arithmetic, hash-exact."""
    from newsfeeds_crawler_spark.operators.balance import zigzag_shards

    d = _t(spark, sf_dir, "documents").select(
        "source",
        F.col("doc_id").cast("bigint").alias("doc_id"),
        ((F.col("doc_id") * 37) % 1000 + 1).cast("bigint").alias("n_tokens"),
    )
    return zigzag_shards(d, 8, group_col="source")


def q_frontier_kmv_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV synopsis + distinct estimate (operators/kmv.py): per-host k=64
    smallest distinct URL fingerprints over events-derived URLs — two of
    eight hosts have < k distinct URLs (exact-count regime), the rest
    estimate via the Beyer (k−1)·M div h_(k) form. Output = synopsis rows
    joined with the per-host estimate, all integer, hash-exact."""
    from newsfeeds_crawler_spark.operators.kmv import (
        kmv_estimate,
        kmv_synopsis,
    )

    ev = _t(spark, sf_dir, "events")
    grp = F.concat(F.lit("g"), (F.col("user_id") % 8).cast("string"))
    val = F.when(
        F.col("user_id") % 8 < 2,
        F.concat(F.lit("u"), (F.col("event_id") % 30).cast("string")),
    ).otherwise(F.concat(F.lit("u"), F.col("event_id").cast("string")))
    urls = ev.select(grp.alias("grp"), val.alias("url"))
    syn = kmv_synopsis(urls, "grp", "url", k=64)
    est = kmv_estimate(syn, "grp", k=64)
    return syn.join(est, "grp").select(
        "grp", "value", "h", "rk", "n_kept", "est_distinct"
    )


def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embeddings table (operators/
    vecquant.py): per-dimension affine min/max codebook (one explode +
    64-row stats aggregate, broadcast back), q = round((v−min)·254/span)
    − 127 — identical double arithmetic + half-up rounding on both
    engines (values are non-negative pre-round, so DuckDB's
    half-away-from-zero agrees with Spark's HALF_UP)."""
    from newsfeeds_crawler_spark.operators.vecquant import quantize_int8

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return quantize_int8(emb)


def q_corpus_expire_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot expiry planning (operators/retention.py): 20 synthetic
    snapshot versions (epoch = 13v mod 40) with events-derived
    many-to-many file references; live = last 3 versions ∪ epoch ≥ 30
    (both rules bind), deletable = files with ZERO live references —
    the reference-counted expire_snapshots shape, rank window + one
    left-anti join, hash-exact."""
    from newsfeeds_crawler_spark.operators.retention import expire_plan

    ev = _t(spark, sf_dir, "events")
    snaps = spark.range(1, 21).select(
        F.col("id").alias("version"), ((F.col("id") * 13) % 40).alias("epoch")
    )
    # file f_k is referenced by a 3-version window starting at k%18+1, so
    # files whose window misses every live version are genuinely dead
    fk = F.col("event_id") % 347
    manifests = ev.select(
        (fk % 18 + 1 + F.col("event_id") % 3).cast("bigint").alias("version"),
        F.concat(F.lit("f"), fk.cast("string")).alias("file"),
    )
    return expire_plan(snaps, manifests, keep_last=3, keep_min_epoch=38)


def q_corpus_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning (operators/compaction.py): a
    synthetic file manifest over orders (40 partitions, deterministic
    sizes spanning keep and compact tiers) planned with the Iceberg
    binPack rule — files ≥ ¾ target kept, smaller ones next-fit
    bin-packed per partition in file order via the sequential
    applyInPandas kernel. The DuckDB oracle replays the identical walk
    as a recursive CTE, pinning the stateful group assignment exactly."""
    from newsfeeds_crawler_spark.operators.compaction import compaction_plan

    o = _t(spark, sf_dir, "orders")
    manifest = o.select(
        F.concat(F.lit("p"), (F.col("o_orderkey") % 40).cast("string")).alias(
            "part"
        ),
        F.col("o_orderkey").cast("bigint").alias("file_id"),
        (((F.col("o_orderkey") * 7919) % 1_300_000) + 1000)
        .cast("bigint")
        .alias("bytes"),
    )
    return compaction_plan(manifest)


def q_corpus_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (operators/importance.py): hashed-bigram
    log-likelihood ratio of a target slice (doc_id % 37 == 1, the same
    in-domain convention as text_decontaminate's benchmark slice) vs the
    whole corpus, per-bucket log-ratios quantized to micro-nats before
    the int64 dot product, then deterministic Gumbel-top-k selection
    (k=200) keyed on score + hash-derived Gumbel noise. Hash-exact: the
    only floats are one ln per bucket and one per-id Gumbel draw, both
    rounded to integers pre-sum (the curation bigram-LM discipline)."""
    from newsfeeds_crawler_spark.operators.importance import (
        importance_resample,
        importance_weights,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    target_ids = d.filter(F.col("doc_id") % 37 == 1).select("doc_id")
    scored = importance_weights(d, target_ids=target_ids)
    return importance_resample(scored, 200)


def q_text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained add-one-smoothed bigram LM scoring (CCNet-style
    perplexity ranking, operators/curation.py): per-gram log-probs
    quantized to integer micro-nats before the per-doc sum, so doc scores
    are exact order-independent int64 sums; only the final average
    divides."""
    return bigram_lm_score(_t(spark, sf_dir, "documents"))


def q_corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing weights (operators/curation.py):
    w_s ∝ tokens_s^0.7 normalized over sources, with raw weights
    quantized to micro-units so the normalizing sum is exact int64."""
    return mixture_weights(_t(spark, sf_dir, "documents"))


def q_text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-merge BPE tokenizer (operators/bpe.py): merges trained on
    the documents table itself (one word-count aggregate + bounded top-k +
    driver-side merge loop), then an Arrow-batched encode. Rows-only check
    (training+encode is iterative — no SQL oracle); every row self-verifies:
    ``ok`` = concatenating a doc's tokens reproduces its whitespace-stripped
    lowercased text AND the subword count lies in [word count, char count].
    """
    from newsfeeds_crawler_spark.operators.bpe import bpe_encode, learn_merges

    d = _t(spark, sf_dir, "documents")
    merges = learn_merges(d, n_merges=64, vocab_size=5000)
    enc = bpe_encode(d, merges)
    stripped = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", "")
    n_words = token_count_ws(F.col("text"))
    return enc.select(
        "doc_id",
        F.size("bpe_toks").cast("bigint").alias("n_bpe"),
        n_words.alias("n_words"),
        (
            (F.concat_ws("", F.col("bpe_toks")) == stripped)
            & (F.size("bpe_toks") >= n_words)
            & (F.size("bpe_toks") <= F.length(stripped))
        ).alias("ok"),
    )


def q_url_template_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL template mining (operators/urlmine.url_templates): events-derived
    URLs across three path families per host — a bounded /page/{n}
    listing, an unbounded /cal/2024/d{n} calendar (the planted crawler
    trap: distinct fan-out >= 50 flags it), and the dominant
    /item{n}/v{n} content family. Top-3 templates per host by count."""
    from newsfeeds_crawler_spark.operators.urlmine import url_templates

    ev = _t(spark, sf_dir, "events")
    uid, eid = F.col("user_id"), F.col("event_id")
    url = F.concat(
        F.lit("https://h"),
        (uid % 25).cast("string"),
        F.lit(".example.com"),
        F.when(
            eid % 5 == 0,
            F.concat(F.lit("/page/"), (eid % 97).cast("string")),
        )
        .when(
            eid % 5 == 1,
            F.concat(F.lit("/cal/2024/d"), eid.cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit("/item"),
                (eid % 50).cast("string"),
                F.lit("/v"),
                uid.cast("string"),
            )
        ),
    )
    return url_templates(
        ev.select(url.alias("url")), k=3, trap_min_distinct=50
    )


def q_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff (operators/snapshotdiff.py): two synthetic
    snapshots of documents — ids % 7 == 1 absent from OLD (added),
    % 7 == 2 absent from NEW (removed), % 7 == 3 edited in NEW
    (modified) — classified per id via portable fingerprints and one
    full-outer join. Every class fires; hash-exact."""
    from newsfeeds_crawler_spark.operators.snapshotdiff import snapshot_diff

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    old = d.filter(did % 7 != 1)
    new = d.filter(did % 7 != 2).select(
        "doc_id",
        F.when(did % 7 == 3, F.concat(F.col("text"), F.lit(" rev2")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return snapshot_diff(old, new)


def q_metrics_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-dashboard rollup: per (event_type, user-bucket) counts with
    subtotal and grand-total rows (ROLLUP grouping sets)."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "user_bucket", (F.col("user_id") % 10).cast("bigint")
    )
    return ev.rollup("event_type", "user_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def q_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-rate dashboard: per-source doc counts, distinct texts, and the
    duplicate fraction a curation pipeline tracks."""
    d = _t(spark, sf_dir, "documents", rebalance=False)
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count_distinct(F.col("text")).cast("bigint").alias("n_distinct"),
        F.round(
            F.lit(1.0)
            - F.count_distinct(F.col("text"))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("dup_rate"),
    )


def q_image_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4 — multimodal plumbing: deterministic synthetic images encoded per
    row (PPM/BMP/zlib-PNG/lossy-DCT by doc_id % 4) inside mapInPandas, then
    the real decode_images operator; a second mapInPandas independently
    recomputes the source image and verifies ok = no decode error AND phash
    match AND pixels exact for lossless / PSNR >= 40dB for lossy (the
    input_hint invariant). Rows-only check (no SQL-expressible oracle for
    binary codecs)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        BooleanType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from newsfeeds_crawler_spark.functions import codecs
    from newsfeeds_crawler_spark.operators.multimodal import decode_images

    d = _t(spark, sf_dir, "documents", rebalance=False).filter(F.col("doc_id") < 128).select("doc_id")
    fmts = ["ppm", "bmp", "png", "dct"]

    def _src(did: int) -> np.ndarray:
        rng = np.random.default_rng(int(did))
        return rng.integers(0, 256, size=(8, 12, 3), dtype=np.uint8)

    enc_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("bytes", BinaryType()),
            StructField("fmt", StringType()),
            StructField("src_phash", LongType()),
        ]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                img = _src(did)
                fmt = fmts[int(did) % 4]
                enc = codecs.encode_image(img, fmt)
                # declared phash = phash of the DECODED pixels (exact for
                # lossless; post-roundtrip for lossy — FIXTURES.md contract)
                ph = codecs.phash64(
                    codecs.decode_image(enc, fmt) if fmt in codecs.LOSSY else img
                )
                rows.append((int(did), enc, fmt, ph))
            yield pd.DataFrame(rows, columns=[f.name for f in enc_schema.fields])

    dec = decode_images(d.mapInPandas(encode, enc_schema))
    ver_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("fmt", StringType()),
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
            StructField("ok", BooleanType()),
        ]
    )

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                did, fmt = int(r["doc_id"]), r["fmt"]
                ok = (
                    pd.isna(r["decode_error"])
                    and not pd.isna(r["dec_phash"])
                    and int(r["dec_phash"]) == int(r["src_phash"])
                )
                if ok:
                    src = _src(did)
                    got = np.frombuffer(bytes(r["pixels"]), dtype=np.uint8)
                    ok = got.size == src.size
                    if ok:
                        got = got.reshape(src.shape)
                        ok = (
                            codecs.psnr(got, src) >= 40.0
                            if fmt in codecs.LOSSY
                            else bool(np.array_equal(got, src))
                        )
                rows.append(
                    (did, fmt, int(r["dec_w"]), int(r["dec_h"]), bool(ok))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in ver_schema.fields])

    return dec.select(
        "doc_id", "fmt", "dec_w", "dec_h", "pixels", "decode_error",
        "dec_phash", "src_phash",
    ).mapInPandas(verify, ver_schema)


def q_image_resize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4b — resize plumbing: decode → nearest-neighbor resize (numpy
    gather inside mapInPandas) → self-verification against an independent
    recompute from the deterministic source image. Rows-only check (binary
    payloads have no SQL-expressible oracle); ok must be true for all rows.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType, BooleanType, IntegerType, LongType, StringType,
        StructField, StructType,
    )

    from newsfeeds_crawler_spark.functions import codecs
    from newsfeeds_crawler_spark.operators.multimodal import (
        decode_images, resize_images,
    )

    d = _t(spark, sf_dir, "documents", rebalance=False).filter(F.col("doc_id") < 96).select("doc_id")
    enc_schema = StructType([
        StructField("doc_id", LongType()),
        StructField("bytes", BinaryType()),
        StructField("fmt", StringType()),
    ])

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fmts = ["ppm", "bmp", "png"]
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                rng = np.random.default_rng(int(did) + 7)
                img = rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8)
                rows.append((int(did), codecs.encode_image(img, fmts[int(did) % 3]),
                             fmts[int(did) % 3]))
            yield pd.DataFrame(rows, columns=[f.name for f in enc_schema.fields])

    OW, OH = 7, 5
    resized = resize_images(decode_images(d.mapInPandas(encode, enc_schema)), OW, OH)
    ver_schema = StructType([
        StructField("doc_id", LongType()),
        StructField("res_w", IntegerType()),
        StructField("res_h", IntegerType()),
        StructField("ok", BooleanType()),
    ])

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                rng = np.random.default_rng(int(r["doc_id"]) + 7)
                img = rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8)
                yi = (np.arange(OH) * 10) // OH
                xi = (np.arange(OW) * 14) // OW
                want = img[yi][:, xi].tobytes()
                rows.append((int(r["doc_id"]), int(r["res_w"]), int(r["res_h"]),
                             bytes(r["resized"]) == want))
            yield pd.DataFrame(rows, columns=[f.name for f in ver_schema.fields])

    return resized.select("doc_id", "res_w", "res_h", "resized").mapInPandas(
        verify, ver_schema
    )


def q_image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4d — image near-dup via perceptual hash: deterministic images with
    PLANTED near-duplicates (odd doc_id = lightly perturbed copy of the
    previous even doc_id's image), encoded in mixed formats (incl. the lossy
    DCT one), decoded by the real decode_images operator, then paired by the
    banded 64-bit hamming join (never all-pairs). Self-verification is
    in-plan: a brute-force all-pairs bit_count join over the same decoded
    hashes must produce the IDENTICAL pair set — full recall (pigeonhole)
    and precision checked row by row. Rows-only (binary codecs have no SQL
    oracle); ok must be true for every row and the planted pairs make the
    result non-empty."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from newsfeeds_crawler_spark.functions import codecs
    from newsfeeds_crawler_spark.operators.multimodal import (
        decode_images,
        phash_hamming_pairs,
    )

    d = _t(spark, sf_dir, "documents", rebalance=False).filter(F.col("doc_id") < 128).select("doc_id")
    fmts = ["ppm", "bmp", "png", "dct"]

    enc_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("bytes", BinaryType()),
            StructField("fmt", StringType()),
        ]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                rng = np.random.default_rng(did & ~1)  # pair shares a seed
                img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
                if did % 2:  # planted near-dup: tiny additive perturbation
                    img = np.clip(img.astype(np.int16) + 2, 0, 255).astype(
                        np.uint8
                    )
                rows.append((did, codecs.encode_image(img, fmts[did % 4]),
                             fmts[did % 4]))
            yield pd.DataFrame(rows, columns=[f.name for f in enc_schema.fields])

    dec = decode_images(d.mapInPandas(encode, enc_schema)).select(
        "doc_id", "dec_phash"
    ).localCheckpoint(eager=False)
    MAX_DIST, BANDS = 3, 4
    fast = phash_hamming_pairs(dec, "doc_id", "dec_phash", MAX_DIST, BANDS)
    l, r = dec.alias("l"), dec.alias("r")
    brute = (
        l.crossJoin(r)
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
            F.expr("bit_count(l.dec_phash ^ r.dec_phash)").cast("int").alias(
                "hamming_brute"
            ),
        )
        .filter(F.col("hamming_brute") <= MAX_DIST)
    )
    return (
        fast.join(brute, ["id_a", "id_b"], "full_outer")
        .select(
            "id_a",
            "id_b",
            F.coalesce("hamming", "hamming_brute").alias("hamming"),
            (
                F.col("hamming").isNotNull()
                & F.col("hamming_brute").isNotNull()
                & (F.col("hamming") == F.col("hamming_brute"))
            ).alias("ok"),
        )
        .orderBy("id_a", "id_b")
    )


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4c — frame-sampler plumbing (video codec honestly stubbed: payload
    = concatenated fixed-size frames): one row per sampled frame with a
    deterministic frame_idx and a self-check that the frame slice equals
    an independent recompute. Rows-only check."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType, BooleanType, IntegerType, LongType, StructField,
        StructType,
    )

    from newsfeeds_crawler_spark.operators.multimodal import sample_frames

    d = _t(spark, sf_dir, "documents", rebalance=False).filter(F.col("doc_id") < 64).select("doc_id")
    FRAME, EVERY, NFRAMES = 16, 3, 12
    enc_schema = StructType([
        StructField("doc_id", LongType()),
        StructField("video", BinaryType()),
    ])

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                rng = np.random.default_rng(int(did) + 99)
                rows.append((int(did),
                             rng.integers(0, 256, size=FRAME * NFRAMES,
                                          dtype=np.uint8).tobytes()))
            yield pd.DataFrame(rows, columns=["doc_id", "video"])

    frames = sample_frames(d.mapInPandas(encode, enc_schema), EVERY, FRAME)
    ver_schema = StructType([
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ok", BooleanType()),
    ])

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                did, idx = int(r["doc_id"]), int(r["frame_idx"])
                rng = np.random.default_rng(did + 99)
                buf = rng.integers(0, 256, size=FRAME * NFRAMES,
                                   dtype=np.uint8).tobytes()
                want = buf[idx * FRAME:(idx + 1) * FRAME]
                rows.append((did, idx, bytes(r["frame"]) == want))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "ok"])

    return frames.select("doc_id", "frame_idx", "frame").mapInPandas(
        verify, ver_schema
    )


def q_robots_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt parsing (north_star; no reference analog) — synthetic
    two-group robots bodies derived from doc_id; the googlebot group's
    Crawl-delay/Disallow must NOT bind to '*' (group binding), so the
    expected values are a pure function of doc_id that DuckDB computes
    WITHOUT a parser — an independent semantic oracle."""
    from newsfeeds_crawler_spark.functions.robots import (
        crawl_delay_ms,
        disallow_prefixes,
    )

    d = _t(spark, sf_dir, "documents", rebalance=False).filter(F.col("doc_id") < 512)
    body = F.concat(
        F.lit("# synthetic robots\n"),
        F.lit("User-agent: googlebot\nCrawl-delay: 9\nDisallow: /g"),
        (F.col("doc_id") % 3).cast("string"),
        F.lit("\n\nUser-agent: *\nCrawl-delay: "),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("\nDisallow: /p"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit("\nDisallow:\n"),  # empty value: contributes nothing
    )
    return d.select(
        "doc_id",
        crawl_delay_ms(body).cast("int").alias("delay_ms"),
        F.array_join(disallow_prefixes(body), ",").alias("disallow_csv"),
    )


def q_sitemap_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap parse UDTF (operators/sitemap.sitemap_entries): synthetic
    sitemaps.org documents built per doc_id — urlset docs, sitemapindex
    docs (doc_id % 7 == 1), and an invalid-XML class (doc_id % 7 == 0,
    parse fails → zero rows) — parsed with the real Arrow-vectorized XML
    UDTF and exploded to entry rows. lastmod is present on 2/3 of entries
    (null-ts P1 semantics on the rest). The DuckDB oracle reconstructs
    the expected entries directly from the generative rule — it never
    parses XML — so the parser is checked against independent ground
    truth, hash-exact including the timestamps."""
    from newsfeeds_crawler_spark.operators.sitemap import sitemap_entries

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id")
    )
    fmt = "'yyyy-MM-dd''T''HH:mm:ss''Z'''"
    lastmod = (
        "case when (doc_id + j) % 3 != 0 then "
        "concat('<lastmod>', date_format(timestamp'2026-03-01 00:00:00' "
        "+ make_dt_interval(cast((doc_id*31 + j*7) % 28 as int), 0, 0, "
        f"cast((doc_id*11 + j*13) % 86400 as int)), {fmt}), "
        "'</lastmod>') else '' end"
    )
    url_entry = (
        "concat('<url><loc>https://h', cast(doc_id % 50 as string), "
        "'.example.com/p', cast(doc_id as string), '/', cast(j as string), "
        f"'</loc>', {lastmod}, '</url>')"
    )
    sm_entry = (
        "concat('<sitemap><loc>https://h', cast(doc_id % 50 as string), "
        "'.example.com/sm', cast(doc_id as string), '_', cast(j as string), "
        f"'.xml</loc>', {lastmod}, '</sitemap>')"
    )
    ns = 'xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\"'
    body = (
        "case when doc_id % 7 = 0 then '<urlset xmlns=' "
        f"when doc_id % 7 = 1 then concat('<sitemapindex {ns}>', "
        "array_join(transform(sequence(0, cast(doc_id % 4 as int)), "
        f"j -> {sm_entry}), ''), '</sitemapindex>') "
        f"else concat('<urlset {ns}>', "
        "array_join(transform(sequence(0, cast(doc_id % 4 as int)), "
        f"j -> {url_entry}), ''), '</urlset>') end"
    )
    docs = d.selectExpr("doc_id", f"({body}) as body")
    out = sitemap_entries(docs, "body", ("doc_id",))
    return out.select(
        "doc_id",
        "kind",
        F.col("entry_idx").cast("int").alias("entry_idx"),
        "loc",
        "lastmod_ts",
    )


def q_robots_sitemaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap discovery from robots.txt (functions/robots.sitemap_urls):
    generative robots bodies across four classes — none / one / two
    mixed-case Sitemap lines / one with a trailing comment — extracted
    with the group-independent regex (sitemaps.org robots extension);
    the oracle reconstructs the expected URLs from the class rule."""
    from newsfeeds_crawler_spark.functions.robots import sitemap_urls

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id")
    )
    h = F.concat(F.lit("https://h"), (F.col("doc_id") % 50).cast("string"),
                 F.lit(".example.com"))
    cls = F.col("doc_id") % 4
    body = F.concat(
        F.lit("User-agent: *\nDisallow: /p"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit("\n"),
        F.when(cls == 1, F.concat(F.lit("Sitemap: "), h, F.lit("/sitemap.xml\n")))
        .when(
            cls == 2,
            F.concat(
                F.lit("sitemap:"), h, F.lit("/sm_a.xml\n"),
                F.lit("SITEMAP: "), h, F.lit("/sm_b.xml\n"),
            ),
        )
        .when(
            cls == 3,
            F.concat(F.lit("Sitemap: "), h, F.lit("/s.xml # mirror note\n")),
        )
        .otherwise(F.lit("")),
    )
    return d.select(
        "doc_id", F.posexplode(sitemap_urls(body)).alias("sm_idx", "sitemap_url")
    ).select("doc_id", F.col("sm_idx").cast("int").alias("sm_idx"), "sitemap_url")


def q_frontier_skew_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven skew/salting plan (operators/skew.py): per-host row
    counts over events with a planted hot host (~30% of all rows) →
    fanout = clamp(ceil(n/target), 1, max) — the operational form of the
    engine's hot-host salting. target=500/max=8 make the interior rule,
    the lower clamp, and the max clamp all bind. Integer arithmetic,
    hash-exact."""
    from newsfeeds_crawler_spark.operators.skew import key_counts, salt_plan

    ev = _t(spark, sf_dir, "events")
    host = F.when(F.col("user_id") % 10 < 3, F.lit("hot.example.com")).otherwise(
        F.concat(F.lit("h"), (F.col("user_id") % 200).cast("string"))
    )
    return salt_plan(
        key_counts(ev.select(host.alias("host")), "host"),
        target_rows=500,
        max_fanout=8,
    )


def q_caption_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caption↔image consistency score (multimodal quality column): each
    document gets a deterministic synthetic phash and a caption carrying
    phash-band tag tokens — mislabeled rows (doc_id % 7 == 3) tag with a
    shifted phash. operators/multimodal.caption_image_consistency scores
    the agreement; DuckDB mirrors the same arithmetic exactly (the
    synthetic phash is kept positive so ``//``-banding matches
    ``shiftrightunsigned``). Pure Catalyst expressions end to end."""
    from newsfeeds_crawler_spark.operators.multimodal import (
        caption_image_consistency,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ph = (F.col("doc_id") * F.lit(2654435761) + F.lit(40503)).cast("long")
    tag_ph = F.when(F.col("doc_id") % 7 == 3, ph + F.lit(1)).otherwise(ph)
    tags = F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit("img"),
                F.shiftrightunsigned(tag_ph, 16 * k)
                .bitwiseAND(F.lit(0xFFFF))
                .cast("string"),
            )
            for k in range(4)
        ],
    )
    tagged = d.select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" "), tags).alias("caption"),
        ph.alias("phash"),
    )
    return caption_image_consistency(
        tagged, caption_col="caption", phash_col="phash"
    ).select(F.col("doc_id").cast("long"), "consistency")


def q_image_metadata_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataComp/LAION-style metadata curation pass
    (operators/multimodal.image_metadata_verdict): each document becomes an
    (image_id, w, h, fmt, caption, phash) row by doc_id arithmetic —
    planted undersized/extreme-aspect sizes, disallowed formats, a
    one-token caption every 11th row, and a shared phash every 9th row so
    EVERY rule fires — then the verdict applies resolution/aspect/format/
    caption-length/keep-lowest-id-dup rules with a precedence reason
    code. Pure Catalyst + one window; the oracle mirrors the arithmetic."""
    from newsfeeds_crawler_spark.operators.multimodal import (
        image_metadata_verdict,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    img = d.select(
        did.alias("image_id"),
        (F.lit(16) + (did * 37) % 1009).cast("int").alias("w"),
        (F.lit(16) + (did * 61) % 1009).cast("int").alias("h"),
        F.element_at(
            F.array(
                F.lit("png"), F.lit("jpeg"), F.lit("gif"), F.lit("bmp")
            ),
            (did % 4 + 1).cast("int"),
        ).alias("fmt"),
        F.when(did % 11 == 0, F.lit("x")).otherwise(F.col("text")).alias(
            "caption"
        ),
        F.when(did % 9 == 0, F.lit(777))
        .otherwise(did * 2654435761 + 17)
        .cast("long")
        .alias("phash"),
    )
    return image_metadata_verdict(img)


def q_caption_consolidation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical caption per near-dup image cluster (operators/captions):
    LAION/DataComp-style consolidation of a crawled (image, caption)
    corpus. Each document becomes a pair with a deterministic phash whose
    high bits encode the cluster (doc_id % 97) and whose 2 low bits vary
    within it; ``phash div 256`` pools the near-dups and one hash
    aggregate picks the canonical pair (longest caption, ties by caption
    then image_id) plus contest stats. DuckDB mirrors the max-struct rule
    with a row_number window."""
    from newsfeeds_crawler_spark.operators.captions import caption_consolidate

    d = _t(spark, sf_dir, "documents")
    pairs = d.select(
        F.concat(F.lit("img"), F.col("doc_id").cast("string")).alias(
            "image_id"
        ),
        ((F.col("doc_id") % 97) * 256 + F.col("doc_id") % 13)
        .cast("long")
        .alias("phash"),
        F.substring(
            F.col("text"), 1, (F.lit(10) + F.col("doc_id") % 41).cast("int")
        ).alias("caption"),
    )
    return caption_consolidate(pairs, F.expr("phash div 256"))


def q_link_anchor_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text consolidation (operators/linkgraph.anchor_topk): the
    per-target top-3 anchor strings over the events-derived link graph
    (the same src/dst arithmetic as link_pagerank, plus a deterministic
    anchor token). One (dst, anchor) count aggregate + the partial+final
    WindowGroupLimit top-k."""
    from newsfeeds_crawler_spark.operators.linkgraph import anchor_topk

    ev = _t(spark, sf_dir, "events")
    edges = ev.select(
        (F.col("user_id") % 997).cast("bigint").alias("src"),
        (F.col("event_id") % 997).cast("bigint").alias("dst"),
        F.concat(
            F.lit("anchor"),
            ((F.col("user_id") + F.col("event_id")) % 23).cast("string"),
        ).alias("anchor"),
    )
    return anchor_topk(edges, k=3)


def q_corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing (operators/packing.py): concat-then-chunk
    layout per source shard — exclusive prefix sums of token counts in
    doc_id order, 1024-token sequences, exact int64 window arithmetic."""
    from newsfeeds_crawler_spark.operators.packing import pack_sequences

    return pack_sequences(_t(spark, sf_dir, "documents"))


def q_similarity_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-quantized Lloyd's k-means (operators/kmeans.py): trains the
    coarse centroids the IVF/IVF-PQ indexes consume (k=8, 2 iterations,
    seeds = the 8 lowest vec_id % 50 == 0 vectors). Components quantized
    once to 1/10^6 units; distances and centroid means are exact int64
    sums / truncating divisions, so the trained centroids are
    bit-identical on any engine or partitioning and the oracle unrolls
    the same two iterations as CTEs."""
    from newsfeeds_crawler_spark.operators.kmeans import kmeans_train

    return kmeans_train(
        _t(spark, sf_dir, "embeddings"), k=8, iters=2, stride=50
    ).select(
        F.col("cell").cast("int"),
        F.col("pos").cast("int"),
        "c_q",
        "n_members",
    )


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (operators/semdedup.py): k-means-clustered embeddings,
    within-cluster cosine >= 0.3 pairs, greedy lowest-id-survives keep
    rule. Training and assignment are exact int64 (the kmeans operator);
    only the pair cosine is double (same left fold as the oracle, rounded
    8 dp before the compare), so the verdict frame hash-matches."""
    from newsfeeds_crawler_spark.operators.semdedup import semantic_dedup

    return semantic_dedup(_t(spark, sf_dir, "embeddings"), k=8, iters=2)


def q_frontier_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-URL cardinality (operators/sketches.py): the
    mergeable per-epoch "distinct canonical URLs seen" sketch a 10^10-URL
    frontier reports instead of COUNT(DISTINCT). Registers (m=256, max-rho
    per bucket over the portable fingerprint) AND the integer-division
    estimate are both engine-exact; rel_err_pct shows the estimator's
    quality against the exact distinct on the same rows."""
    from newsfeeds_crawler_spark.operators.sketches import hll_cardinality

    ev = _t(spark, sf_dir, "events")
    key = F.concat(
        F.lit("https://h"),
        (F.col("user_id") % 25).cast("string"),
        F.lit(".example.com/e/"),
        (F.col("event_id") % 4096).cast("string"),
    )
    return hll_cardinality(ev, key)


def q_link_bfs_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop BFS crawl-depth labels (operators/linkgraph.py) over
    the same 997-node host graph as link_pagerank, seeds = src hosts
    divisible by 100: min link-distance within 3 hops — the depth CLASS
    the per-depth quota budgets key on. Pure integer mins ⇒ exact; the
    oracle unrolls the 3 relaxation rounds."""
    from newsfeeds_crawler_spark.operators.linkgraph import bfs_depth

    ev = _t(spark, sf_dir, "events")
    edges = ev.select(
        (F.col("user_id") % 997).alias("src"),
        (F.col("event_id") % 997).alias("dst"),
    )
    seeds = edges.select(F.col("src").alias("node")).filter(
        F.col("node") % 100 == 0
    )
    return bfs_depth(edges, seeds, iters=3)


def q_frontier_hot_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch hot-host detection (operators/sketches.py): the
    frequency twin of frontier_distinct_hll — per-host event counts
    estimated from a d=4 × 2048-cell sketch that merges across epochs by
    ADDITION, vs a planted 75%-on-20-hosts skew. For every distinct host:
    exact count, CMS estimate, and the one-sided overcount (est ≥ exact
    always — the CMS guarantee, hash-pinned via the ok column). Both the
    registers and the estimates are engine-exact integers."""
    from newsfeeds_crawler_spark.operators.sketches import (
        cms_counts,
        cms_lookup,
    )

    ev = _t(spark, sf_dir, "events")
    host = F.concat(
        F.lit("h"),
        F.when(
            F.col("event_id") % 4 < 3, F.col("user_id") % 20
        ).otherwise(F.lit(20) + F.col("user_id") % 2000).cast("string"),
    )
    keyed = ev.select(host.alias("host"))
    sketch = cms_counts(keyed, F.col("host"))
    exact = keyed.groupBy("host").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact")
    )
    est = cms_lookup(keyed, sketch, F.col("host")).withColumnRenamed(
        "k", "host"
    )
    return exact.join(est, "host").select(
        "host",
        "n_exact",
        "n_est",
        (F.col("n_est") - F.col("n_exact")).alias("overcount"),
        (F.col("n_est") >= F.col("n_exact")).alias("ok"),
    )


def q_text_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language p50/p90/p99 document-length cuts
    (operators/quantiles.py): PERCENTILE_DISC by integer rank arithmetic
    — value at 1-based rank ceil(q·n/100) — one per-group sort window,
    map-side quantile filter."""
    from newsfeeds_crawler_spark.operators.quantiles import (
        grouped_quantiles_exact,
    )

    return grouped_quantiles_exact(
        _t(spark, sf_dir, "documents"), "lang", "n_chars", (50, 90, 99)
    )


def q_text_length_sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable histogram-sketch quantiles (operators/quantiles.py,
    hist_registers → hist_quantiles): the scale handoff the exact
    operator documents — register table bucket = n_chars div 64,
    add-mergeable across epochs, quantile = lower edge of the first
    bucket whose cumulative count reaches rank (q·n+99) div 100. Pure
    int64, so registers AND estimates hash-match DuckDB; est ≤ exact <
    est+64 vs text_length_quantiles by construction (pytest-pinned)."""
    from newsfeeds_crawler_spark.operators.quantiles import (
        hist_quantiles,
        hist_registers,
    )

    regs = hist_registers(
        _t(spark, sf_dir, "documents"), "lang", "n_chars", width=64
    )
    return hist_quantiles(regs, "lang", (50, 90, 99), width=64)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "url_canonicalize": q_url_canonicalize,
        "merge_get_or_create": q_merge_get_or_create,
        "seen_probe_anti": q_seen_probe_anti,
        "seen_probe_bloom": q_seen_probe_bloom,
        "recency_predicate": q_recency_predicate,
        "politeness_admission": q_politeness_admission,
        "frontier_fifo_topk": q_frontier_fifo_topk,
        "frontier_heads_admit": q_frontier_heads_admit,
        "politeness_quota": q_politeness_quota,
        "politeness_depth_quota": q_politeness_depth_quota,
        "robots_asof_rules": q_robots_asof_rules,
        "watermark_agg": q_watermark_agg,
        "upsert_latest": q_upsert_latest,
        "host_last_access": q_host_last_access,
        "status_routing": q_status_routing,
        "dedup_exact": q_dedup_exact,
        "dedup_exact_groups": q_dedup_exact_groups,
        "dedup_token_jaccard": q_dedup_token_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_incremental_lsh": q_dedup_incremental_lsh,
        "dedup_minhash_components": q_dedup_minhash_components,
        "dedup_simhash": q_dedup_simhash,
        "dedup_simhash_hamming": q_dedup_simhash_hamming,
        "similarity_brute_topk": q_similarity_brute_topk,
        "similarity_ivf_topk": q_similarity_ivf_topk,
        "similarity_pq_topk": q_similarity_pq_topk,
        "similarity_ivf_multiprobe": q_similarity_ivf_multiprobe,
        "similarity_ivfpq_topk": q_similarity_ivfpq_topk,
        "dedup_embedding_cosine": q_dedup_embedding_cosine,
        "dedup_semantic": q_dedup_semantic,
        "text_stats": q_text_stats,
        "text_repetition_quality": q_text_repetition_quality,
        "dedup_segment_exact": q_dedup_segment_exact,
        "dedup_span_removal": q_dedup_span_removal,
        "text_pii_scrub": q_text_pii_scrub,
        "curation_verdict": q_curation_verdict,
        "events_sessionize": q_events_sessionize,
        "link_pagerank": q_link_pagerank,
        "link_bfs_depth": q_link_bfs_depth,
        "link_anchor_topk": q_link_anchor_topk,
        "corpus_pack_sequences": q_corpus_pack_sequences,
        "similarity_kmeans_train": q_similarity_kmeans_train,
        "frontier_distinct_hll": q_frontier_distinct_hll,
        "frontier_hot_hosts": q_frontier_hot_hosts,
        "text_length_quantiles": q_text_length_quantiles,
        "politeness_adaptive_delay": q_politeness_adaptive_delay,
        "feed_revisit_schedule": q_feed_revisit_schedule,
        "image_aspect_shards": q_image_aspect_shards,
        "text_length_sketch_quantiles": q_text_length_sketch_quantiles,
        "text_decontaminate": q_text_decontaminate,
        "corpus_sample": q_corpus_sample,
        "text_bigram_lm": q_text_bigram_lm,
        "corpus_importance_resample": q_corpus_importance_resample,
        "corpus_compaction_plan": q_corpus_compaction_plan,
        "frontier_kmv_sample": q_frontier_kmv_sample,
        "corpus_zigzag_shards": q_corpus_zigzag_shards,
        "text_c4_clean": q_text_c4_clean,
        "url_blocklist_filter": q_url_blocklist_filter,
        "embedding_quantize_int8": q_embedding_quantize_int8,
        "corpus_expire_plan": q_corpus_expire_plan,
        "corpus_mixture_weights": q_corpus_mixture_weights,
        "text_tfidf_topk": q_text_tfidf_topk,
        "text_lang_quality": q_text_lang_quality,
        "text_bpe_tokens": q_text_bpe_tokens,
        "metrics_rollup": q_metrics_rollup,
        "corpus_snapshot_diff": q_corpus_snapshot_diff,
        "url_template_mining": q_url_template_mining,
        "dedup_rate_by_source": q_dedup_rate_by_source,
        "caption_consistency": q_caption_consistency,
        "caption_consolidation": q_caption_consolidation,
        "image_metadata_verdict": q_image_metadata_verdict,
        "image_decode_roundtrip": q_image_decode_roundtrip,
        "robots_parse": q_robots_parse,
        "sitemap_parse": q_sitemap_parse,
        "robots_sitemaps": q_robots_sitemaps,
        "frontier_skew_plan": q_frontier_skew_plan,
        "image_resize_roundtrip": q_image_resize_roundtrip,
        "image_phash_neardup": q_image_phash_neardup,
        "frame_sample": q_frame_sample,
    }


# =====================================================================
# oracle SQL (DuckDB)
# =====================================================================

def _kmeans_ctes(
    k: int = 8, iters: int = 2, stride: int = 50, scale: int = 10**6
) -> str:
    """The WITH-body of the kmeans mirror (quantize → seed → per-iteration
    assign/update CTEs, ending at ``ce{iters}``) — shared by the trainer
    gate and the SemDeDup gate, which appends its own consumers."""
    parts = [
        f"""
        WITH vx AS (
            SELECT vec_id AS id, t.pos::INT AS pos,
                   floor(CAST(embedding[t.pos + 1] AS DOUBLE)
                         * {scale}.0)::BIGINT AS v_q
            FROM embeddings,
                 UNNEST(generate_series(0, len(embedding) - 1)) AS t(pos)
        ),
        seeds AS (
            SELECT id, (row_number() OVER (ORDER BY id) - 1)::INT AS cell
            FROM (SELECT DISTINCT id FROM vx WHERE id % {stride} = 0
                  ORDER BY id LIMIT {k})
        ),
        ce0 AS (SELECT cell, pos, v_q AS c_q FROM vx JOIN seeds USING (id))"""
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f""",
        d{i} AS (SELECT vx.id, ce.cell,
                        sum((vx.v_q - ce.c_q)
                            * (vx.v_q - ce.c_q))::BIGINT AS d
                 FROM vx JOIN ce{p} ce USING (pos) GROUP BY 1, 2),
        a{i} AS (SELECT id, cell FROM (
                     SELECT id, cell, row_number() OVER (
                         PARTITION BY id ORDER BY d, cell) AS rn
                     FROM d{i}) WHERE rn = 1),
        u{i} AS (SELECT a.cell, vx.pos,
                        (sum(vx.v_q) // count(*))::BIGINT AS u_q,
                        count(*)::BIGINT AS n
                 FROM a{i} a JOIN vx USING (id) GROUP BY 1, 2),
        ce{i} AS (SELECT ce.cell, ce.pos,
                         coalesce(u.u_q, ce.c_q)::BIGINT AS c_q,
                         coalesce(u.n, 0)::BIGINT AS n_members
                  FROM ce{p} ce LEFT JOIN u{i} u
                  ON ce.cell = u.cell AND ce.pos = u.pos)"""
        )
    return "".join(parts)


def _kmeans_oracle_sql(
    k: int = 8, iters: int = 2, stride: int = 50, scale: int = 10**6
) -> str:
    """DuckDB mirror of operators/kmeans.kmeans_train — the same quantize
    → assign (argmin by (d, cell)) → integer-mean update chain, one CTE
    block per Lloyd's iteration. `//` and Spark's `div` both truncate
    toward zero (probed), so negative component sums divide identically."""
    return (
        _kmeans_ctes(k, iters, stride, scale)
        + f"""
        SELECT cell, pos, c_q, n_members FROM ce{iters}"""
    )


def _semdedup_oracle_sql(
    k: int = 8,
    iters: int = 2,
    stride: int = 50,
    scale: int = 10**6,
    threshold: float = 0.3,
) -> str:
    """DuckDB mirror of operators/semdedup.semantic_dedup: the trainer's
    CTE chain, the same integer-L2 argmin assignment (tie-break on cell),
    the within-cell pair scan with the identical left-fold cosine rounded
    at 8 dp, and the greedy lowest-id-survives keep rule."""
    cos = cosine_sql("ea.embedding", "eb.embedding")
    return (
        _kmeans_ctes(k, iters, stride, scale)
        + f""",
        dv AS (SELECT vx.id, ce.cell,
                      sum((vx.v_q - ce.c_q)
                          * (vx.v_q - ce.c_q))::BIGINT AS d
               FROM vx JOIN ce{iters} ce USING (pos) GROUP BY 1, 2),
        asg AS (SELECT id, cell FROM (
                    SELECT id, cell, row_number() OVER (
                        PARTITION BY id ORDER BY d, cell) AS rn
                    FROM dv) WHERE rn = 1),
        p AS (SELECT id_a, id_b FROM (
                  SELECT a.id AS id_a, b.id AS id_b,
                         round({cos}, 8) AS sim
                  FROM asg a JOIN asg b ON a.cell = b.cell AND a.id < b.id
                  JOIN embeddings ea ON ea.vec_id = a.id
                  JOIN embeddings eb ON eb.vec_id = b.id)
              WHERE sim >= {threshold}),
        nd AS (SELECT id, count(*)::BIGINT AS n_dups FROM (
                   SELECT id_a AS id FROM p
                   UNION ALL SELECT id_b AS id FROM p)
               GROUP BY 1),
        drp AS (SELECT DISTINCT id_b AS id FROM p)
        SELECT asg.id::BIGINT AS vec_id, asg.cell::INT AS cell,
               coalesce(nd.n_dups, 0)::BIGINT AS n_dups,
               (drp.id IS NULL) AS keep
        FROM asg LEFT JOIN nd ON asg.id = nd.id
                 LEFT JOIN drp ON asg.id = drp.id"""
    )


def _hll_oracle_sql() -> str:
    """DuckDB mirror of operators/sketches.hll_cardinality over the
    derived URL key — same portable hash, same splitmix-style 62-bit
    avalanche mixer (limb multiplies, power-of-two masks), comparison-sum
    bitlen, max-rho registers, and two-step integer estimate."""
    from newsfeeds_crawler_spark.operators.sketches import (
        HLL_ALPHA_DEN,
        HLL_ALPHA_NUM,
        HLL_M,
        HLL_M_BITS,
        HLL_RMAX,
        HLL_W,
        mix62_sql,
    )

    key = (
        "'https://h' || (user_id % 25)::VARCHAR || "
        "'.example.com/e/' || (event_id % 4096)::VARCHAR"
    )
    bitlen = " + ".join(f"(payload >= {2**b})::BIGINT" for b in range(HLL_W))
    big = HLL_M * HLL_M * (1 << HLL_RMAX)
    top_shift = 62 - HLL_M_BITS - HLL_W
    mix_ctes = ",\n        ".join(
        f"{name} AS (SELECT {expr} FROM {prev})"
        for (name, expr), prev in zip(
            mix62_sql("h"),
            ["h"] + [n for n, _ in mix62_sql("h")][:-1],
        )
    )
    return f"""
        WITH k AS (SELECT {key} AS key FROM events),
        h AS (SELECT {fingerprint_sql('key')} AS h FROM k),
        {mix_ctes},
        br AS (SELECT (z & {HLL_M - 1})::BIGINT AS bucket,
                      (z >> {HLL_M_BITS + top_shift})::BIGINT AS payload
               FROM m5),
        rh AS (SELECT bucket, ({HLL_W + 1} - ({bitlen}))::INT AS rho
               FROM br),
        regs AS (SELECT bucket, max(rho) AS rho FROM rh GROUP BY 1),
        allb AS (SELECT range::BIGINT AS bucket FROM range({HLL_M})),
        r2 AS (SELECT allb.bucket, coalesce(regs.rho, 0)::INT AS rho
               FROM allb LEFT JOIN regs USING (bucket)),
        s AS (SELECT sum(1::BIGINT << ({HLL_RMAX} - rho))::BIGINT AS s
              FROM r2),
        est AS (SELECT (({HLL_ALPHA_NUM} * ({big} // s))
                        // {HLL_ALPHA_DEN})::BIGINT AS n_est FROM s),
        ex AS (SELECT count(DISTINCT key)::BIGINT AS n_exact FROM k)
        SELECT bucket, rho, n_est, n_exact,
               round((n_est - n_exact)::DOUBLE * 100.0 / n_exact, 2)
                   AS rel_err_pct
        FROM r2, est, ex
    """


def _cms_oracle_sql() -> str:
    """DuckDB mirror of operators/sketches.cms_counts + cms_lookup over
    the planted-skew host key — same portable hash, same per-row salted
    mix62 chains (prefixed CTEs: one for the sketch build, one for the
    probes), same dense grid and min-over-rows estimate."""
    from newsfeeds_crawler_spark.operators.sketches import (
        CMS_D,
        CMS_W_BITS,
        MASK62,
        _cms_salts,
        mix62_sql,
    )

    w = 1 << CMS_W_BITS
    host = (
        "'h' || (CASE WHEN event_id % 4 < 3 THEN user_id % 20 "
        "ELSE 20 + (user_id % 2000) END)::VARCHAR"
    )
    salts = ", ".join(
        f"({i}, {s}::BIGINT)" for i, s in enumerate(_cms_salts(CMS_D))
    )

    def chain(expr: str, carry: tuple[str, ...], prefix: str, src: str) -> str:
        steps = mix62_sql(expr, carry, prefix)
        out, prev = [], src
        for name, sel in steps:
            out.append(f"{name} AS (SELECT {sel} FROM {prev})")
            prev = name
        return ",\n        ".join(out)

    build = chain(
        f"(h + salt) & {MASK62}", ("row_id",), "cb", "e0"
    )
    probe = chain(
        f"(h + salt) & {MASK62}", ("host", "row_id"), "cp", "p0"
    )
    return f"""
        WITH k AS (SELECT {host} AS host FROM events),
        hh AS (SELECT {fingerprint_sql('host')} AS h FROM k),
        salts AS (SELECT * FROM (VALUES {salts}) AS t(row_id, salt)),
        e0 AS (SELECT hh.h, s.row_id, s.salt FROM hh, salts AS s),
        {build},
        hit AS (SELECT row_id, (z & {w - 1})::BIGINT AS bucket,
                       count(*)::BIGINT AS cnt
                FROM cb5 GROUP BY 1, 2),
        grid AS (SELECT r.range::INT AS row_id, b.range::BIGINT AS bucket
                 FROM range({CMS_D}) r, range({w}) b),
        counts AS (SELECT grid.row_id, grid.bucket,
                          coalesce(hit.cnt, 0)::BIGINT AS cnt
                   FROM grid LEFT JOIN hit USING (row_id, bucket)),
        dk AS (SELECT DISTINCT host FROM k),
        ph AS (SELECT host, {fingerprint_sql('host')} AS h FROM dk),
        p0 AS (SELECT ph.host, ph.h, s.row_id, s.salt FROM ph, salts AS s),
        {probe},
        pb AS (SELECT host, row_id, (z & {w - 1})::BIGINT AS bucket
               FROM cp5),
        est AS (SELECT pb.host, min(counts.cnt)::BIGINT AS n_est
                FROM pb JOIN counts USING (row_id, bucket) GROUP BY 1),
        ex AS (SELECT host, count(*)::BIGINT AS n_exact FROM k GROUP BY 1)
        SELECT ex.host, ex.n_exact, est.n_est,
               (est.n_est - ex.n_exact)::BIGINT AS overcount,
               est.n_est >= ex.n_exact AS ok
        FROM ex JOIN est USING (host)
    """


def oracle_sql() -> dict[str, str]:
    jac = (
        "round(len(list_intersect(a.toks, b.toks)) "
        "/ greatest(len(list_distinct(list_concat(a.toks, b.toks))), 1), 6)"
    )
    gjac = (
        "round(len(list_intersect(g_a, g_b)) "
        "/ greatest(len(list_distinct(list_concat(g_a, g_b))), 1), 6)"
    )
    cos = cosine_sql("q_vec", "n_vec")
    ccos = cosine_sql("vec", "c_vec")

    def _pq_l2(x: str, y: str) -> str:
        """Per-subspace L2² mirror of operators.similarity._l2sq over the
        8-wide slice at subspace ``j`` (column in scope): same left fold,
        same double math, subtraction evaluated twice, rounded at 8 dp."""
        xs = f"list_slice({x}, j*8 + 1, j*8 + 8)"
        ys = f"list_slice({y}, j*8 + 1, j*8 + 8)"
        diff = f"(__v::DOUBLE - ({ys})[__i]::DOUBLE)"
        return (
            f"round(list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform({xs}, (__v, __i) -> {diff} * {diff})), "
            f"(__a, __p) -> __a + __p), 8)"
        )

    sig = _minhash_sig_sql("hs")
    # shared by dedup_minhash_lsh (the pair finder) and
    # dedup_minhash_components (transitive closure over those pairs)
    inc_jac = (
        "round(len(list_intersect(g_n, g_o)) "
        "/ greatest(len(list_distinct(list_concat(g_n, g_o))), 1), 6)"
    )
    inc_probe_sql = f"""
            WITH g AS (
                SELECT doc_id, {shingles_sql('text', 3)} AS grams
                FROM documents),
            h AS (
                SELECT doc_id, grams,
                       list_transform(grams,
                           __g -> {fingerprint_sql('__g')}) AS hs
                FROM g),
            s AS (SELECT doc_id, grams, {_minhash_sig_sql('hs')} AS sig
                  FROM h),
            b AS (SELECT doc_id, grams,
                         unnest({_band_keys_sql('sig')}) AS band_key FROM s),
            cand AS (
                SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id,
                       n.grams AS g_n, o.grams AS g_o
                FROM b n JOIN b o USING (band_key)
                WHERE n.doc_id % 3 = 0 AND o.doc_id % 3 <> 0),
            v AS (SELECT new_id, old_id, {inc_jac} AS jaccard FROM cand),
            q AS (SELECT new_id, old_id, jaccard FROM v
                  WHERE jaccard >= 0.2),
            best AS (SELECT new_id, old_id, jaccard FROM (
                         SELECT new_id, old_id, jaccard, row_number() OVER (
                             PARTITION BY new_id
                             ORDER BY jaccard DESC, old_id) AS rn FROM q)
                     WHERE rn = 1),
            nc AS (SELECT new_id, count(*)::BIGINT AS n_candidates
                   FROM cand GROUP BY 1)
            SELECT d.doc_id::BIGINT AS doc_id,
                   coalesce(nc.n_candidates, 0)::BIGINT AS n_candidates,
                   (best.old_id IS NOT NULL) AS is_dup,
                   best.old_id::BIGINT AS match_id,
                   best.jaccard AS match_jaccard
            FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 0) d
            LEFT JOIN nc ON d.doc_id = nc.new_id
            LEFT JOIN best ON d.doc_id = best.new_id
        """
    minhash_pairs_sql = f"""
            WITH g AS (
                SELECT doc_id, {shingles_sql('text', 3)} AS grams FROM documents),
            h AS (
                SELECT doc_id, grams,
                       list_transform(grams, __g -> {fingerprint_sql('__g')}) AS hs
                FROM g),
            s AS (SELECT doc_id, grams, {sig} AS sig FROM h),
            b AS (SELECT doc_id, grams,
                         unnest({_band_keys_sql('sig')}) AS band_key FROM s),
            cand AS (
                SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
                       a.grams AS g_a, b2.grams AS g_b
                FROM b a JOIN b b2 USING (band_key)
                WHERE a.doc_id < b2.doc_id)
            SELECT id_a::BIGINT AS id_a, id_b::BIGINT AS id_b, jaccard FROM (
                SELECT id_a, id_b, {gjac} AS jaccard FROM cand)
            WHERE jaccard >= 0.2
        """
    # shared by text_repetition_quality and curation_verdict
    repetition_sql = f"""
            WITH t AS (SELECT doc_id, {tokens_sql('text')} AS toks
                       FROM documents),
            g AS (
                SELECT doc_id, 2 AS n,
                       unnest(CASE WHEN len(toks) >= 2 THEN
                           list_transform(generate_series(0, len(toks) - 2),
                               __i -> array_to_string(
                                   toks[__i + 1 : __i + 2], ' '))
                           ELSE CAST([] AS VARCHAR[]) END) AS gram
                FROM t
                UNION ALL
                SELECT doc_id, 3 AS n,
                       unnest(CASE WHEN len(toks) >= 3 THEN
                           list_transform(generate_series(0, len(toks) - 3),
                               __i -> array_to_string(
                                   toks[__i + 1 : __i + 3], ' '))
                           ELSE CAST([] AS VARCHAR[]) END) AS gram
                FROM t),
            pg AS (SELECT doc_id, n, gram, count(*) AS cnt
                   FROM g GROUP BY 1, 2, 3),
            pn AS (SELECT doc_id, n, max(cnt) AS top_cnt, sum(cnt) AS tot,
                          sum(cnt * len(gram)) AS tot_chars,
                          sum(CASE WHEN cnt >= 2 THEN cnt * len(gram)
                              ELSE 0 END) AS dup_chars
                   FROM pg GROUP BY 1, 2),
            pv AS (SELECT doc_id,
                          max(CASE WHEN n = 2 THEN
                              round(top_cnt::DOUBLE / tot, 6) END) AS tb,
                          max(CASE WHEN n = 3 THEN
                              round(dup_chars::DOUBLE
                                    / greatest(tot_chars, 1), 6) END) AS dt
                   FROM pn GROUP BY 1)
            SELECT doc_id,
                   coalesce(tb, 0.0) AS top_bigram_frac,
                   coalesce(dt, 0.0) AS dup_trigram_char_frac,
                   (coalesce(tb, 0.0) <= {TOP_BIGRAM_MAX}
                    AND coalesce(dt, 0.0) <= {DUP_TRIGRAM_CHAR_MAX})
                       AS rep_ok
            FROM documents LEFT JOIN pv USING (doc_id)
        """
    segment_sql = f"""
            WITH t AS (SELECT doc_id, {tokens_sql('text')} AS toks
                       FROM documents),
            s AS (SELECT doc_id,
                         unnest(list_transform(
                             generate_series(0,
                                 CAST(ceil(len(toks) / {SEGMENT_WINDOW}.0)
                                      AS BIGINT) - 1),
                             __i -> array_to_string(
                                 toks[__i * {SEGMENT_WINDOW} + 1
                                      : __i * {SEGMENT_WINDOW}
                                        + {SEGMENT_WINDOW}], ' '))) AS seg
                  FROM t),
            h AS (SELECT doc_id, {fingerprint_sql('seg')} AS sh FROM s),
            c AS (SELECT sh, count(*) AS occ FROM h GROUP BY 1),
            p AS (SELECT doc_id, count(*) AS n_segments,
                         sum(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) AS n_dup
                  FROM h JOIN c USING (sh) GROUP BY 1)
            SELECT doc_id, n_segments::BIGINT AS n_segments,
                   n_dup::BIGINT AS n_dup_segments,
                   round(n_dup::DOUBLE / n_segments, 6) AS dup_ratio,
                   (round(n_dup::DOUBLE / n_segments, 6)
                    < {SEGMENT_DUP_MAX}) AS keep
            FROM p
        """
    from newsfeeds_crawler_spark.operators.spandedup import (
        BOILER_A,
        BOILER_B,
        SPAN_WINDOW,
    )

    _w = SPAN_WINDOW
    span_sql = f"""
            WITH salted AS (
                SELECT doc_id,
                       text
                       || CASE WHEN doc_id % 4 = 0
                               THEN ' {BOILER_A}' ELSE '' END
                       || CASE WHEN doc_id % 6 = 0
                               THEN ' {BOILER_B}' ELSE '' END
                       || CASE WHEN doc_id % 10 = 0
                               THEN ' {BOILER_A}' ELSE '' END AS text
                FROM documents),
            t AS (SELECT doc_id, {tokens_sql('text')} AS toks FROM salted),
            w AS (SELECT doc_id, g.i::BIGINT AS i,
                         array_to_string(
                             toks[g.i + 1 : g.i + {_w}], ' ') AS gram
                  FROM t, UNNEST(generate_series(0, len(toks) - {_w}))
                          AS g(i)
                  WHERE len(toks) >= {_w}),
            h AS (SELECT doc_id, i, {fingerprint_sql('gram')} AS gh FROM w),
            c AS (SELECT gh, count(*) AS c FROM h GROUP BY 1),
            d AS (SELECT doc_id, i FROM h JOIN c USING (gh) WHERE c >= 2),
            f AS (SELECT doc_id, i,
                         CASE WHEN lag(i) OVER win IS NULL
                                OR i - lag(i) OVER win > {_w}
                              THEN 1 ELSE 0 END AS ns
                  FROM d WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
            sp AS (SELECT doc_id, i,
                          sum(ns) OVER (PARTITION BY doc_id ORDER BY i
                                        ROWS UNBOUNDED PRECEDING) AS sid
                   FROM f)
            SELECT doc_id, sid::BIGINT AS span_id,
                   min(i)::BIGINT AS start_tok,
                   (max(i) + {_w - 1})::BIGINT AS end_tok,
                   (max(i) - min(i) + {_w})::BIGINT AS span_tokens,
                   count(*)::BIGINT AS n_windows
            FROM sp GROUP BY 1, 2
        """
    simhash_votes = ", ".join(
        f"sum(((h // {2**b}) % 2) * 2 - 1) AS v{b}" for b in range(SIMHASH_BITS)
    )
    simhash_val = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {2**b} ELSE 0 END)" for b in range(SIMHASH_BITS)
    )
    return {
        "robots_parse": (
            "SELECT doc_id, "
            "((doc_id % 7) * 1000)::INT AS delay_ms, "
            "'/p' || (doc_id % 5)::VARCHAR AS disallow_csv "
            "FROM documents WHERE doc_id < 512"
        ),
        "sitemap_parse": """
            WITH d AS (SELECT doc_id::BIGINT AS doc_id FROM documents
                       WHERE doc_id % 7 <> 0),
            e AS (SELECT doc_id,
                         unnest(generate_series(0, doc_id % 4)) AS j
                  FROM d)
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 1 THEN 'sitemapindex'
                        ELSE 'urlset' END AS kind,
                   j::INT AS entry_idx,
                   CASE WHEN doc_id % 7 = 1
                        THEN 'https://h' || (doc_id % 50)::VARCHAR
                             || '.example.com/sm' || doc_id::VARCHAR
                             || '_' || j::VARCHAR || '.xml'
                        ELSE 'https://h' || (doc_id % 50)::VARCHAR
                             || '.example.com/p' || doc_id::VARCHAR
                             || '/' || j::VARCHAR END AS loc,
                   CASE WHEN (doc_id + j) % 3 <> 0
                        THEN TIMESTAMP '2026-03-01 00:00:00'
                             + ((doc_id*31 + j*7) % 28)
                               * INTERVAL '1 day'
                             + ((doc_id*11 + j*13) % 86400)
                               * INTERVAL '1 second'
                        ELSE NULL END AS lastmod_ts
            FROM e
        """,
        "url_canonicalize": """
            SELECT c_custkey,
                   'http://host' || (c_custkey % 20) || '.example.com/p/'
                       || c_custkey || '/x?q=' || c_custkey AS url_canon,
                   'host' || (c_custkey % 20) || '.example.com' AS host
            FROM customer
        """,
        "merge_get_or_create": """
            SELECT c_custkey, 'existing' AS action FROM customer
            WHERE c_custkey % 14 = 0
            UNION ALL
            SELECT c_custkey, 'insert' AS action FROM customer
            WHERE c_custkey % 7 = 0 AND c_custkey % 14 <> 0
        """,
        "seen_probe_anti": """
            SELECT o_orderkey, o_custkey FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                              WHERE l.l_orderkey = o.o_orderkey)
        """,
        "seen_probe_bloom": """
            SELECT o_orderkey,
                   EXISTS (SELECT 1 FROM lineitem l
                           WHERE l.l_orderkey = o.o_orderkey
                             AND l.l_orderkey % 3 <> 0) AS seen
            FROM orders o WHERE o_orderkey % 5 = 0
        """,
        "recency_predicate": """
            SELECT event_id,
                   CASE WHEN stored_id IS NULL THEN TRUE
                        WHEN ts IS NULL THEN FALSE
                        WHEN stored_ts IS NULL THEN TRUE
                        ELSE date_trunc('second', ts) > date_trunc('second', stored_ts)
                   END AS fetch
            FROM (SELECT event_id, ts,
                         lag(ts) OVER w AS stored_ts,
                         lag(event_id) OVER w AS stored_id
                  FROM events
                  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        """,
        "politeness_admission": """
            SELECT 'h' || (user_id % 50) AS host, event_id, ts FROM events
            QUALIFY row_number() OVER (
                PARTITION BY 'h' || (user_id % 50) ORDER BY ts, event_id) = 1
        """,
        "frontier_fifo_topk": """
            SELECT event_id, fifo_rank::INT AS fifo_rank FROM (
                SELECT event_id,
                       row_number() OVER (ORDER BY ts, event_id) AS fifo_rank
                FROM events)
            WHERE fifo_rank <= 96
        """,
        "frontier_heads_admit": """
            WITH heads AS (
                SELECT hostn, event_id, ts FROM (
                    SELECT (user_id % 50)::BIGINT AS hostn, event_id, ts,
                           row_number() OVER (
                               PARTITION BY user_id % 50
                               ORDER BY ts, event_id) AS rn
                    FROM events)
                WHERE rn = 1),
            adm AS (SELECT * FROM heads WHERE hostn % 3 <> 0)
            SELECT hostn, event_id, ts,
                   (row_number() OVER (ORDER BY ts, event_id) - 1)::INT
                       AS admit_rank
            FROM adm
            ORDER BY ts, event_id LIMIT 24
        """,
        "politeness_quota": """
            WITH prior AS (
                SELECT (o_custkey % 50)::BIGINT AS hostn,
                       sum(CASE WHEN o_orderkey % 31 < 2 THEN 1 ELSE 0
                           END)::BIGINT AS pending_count
                FROM orders GROUP BY 1),
            dep AS (
                SELECT (l_orderkey % 50)::BIGINT AS hostn,
                       count(*)::BIGINT AS ndep
                FROM lineitem
                WHERE l_linenumber = 1 AND l_partkey % 41 = 0
                GROUP BY 1),
            cnt AS (
                SELECT p.hostn,
                       coalesce(p.pending_count, 0) - coalesce(d.ndep, 0)
                           AS mid
                FROM prior p LEFT JOIN dep d USING (hostn)),
            arr AS (
                SELECT (user_id % 50)::BIGINT AS hostn, event_id, ts,
                       (row_number() OVER (
                            PARTITION BY user_id % 50
                            ORDER BY ts, event_id))::INT AS qpos
                FROM events)
            SELECT a.hostn, a.event_id, a.ts, a.qpos,
                   coalesce(c.mid, 0)::BIGINT AS mid,
                   (a.qpos + coalesce(c.mid, 0)) <= 8 AS admitted
            FROM arr a LEFT JOIN cnt c USING (hostn)
        """,
        "politeness_depth_quota": """
            WITH prior AS (
                SELECT (o_custkey % 50)::BIGINT AS hostn,
                       (o_orderkey % 2)::INT AS depth,
                       sum(CASE WHEN o_orderkey % 37 < 2 THEN 1 ELSE 0
                           END)::BIGINT AS pending_count
                FROM orders GROUP BY 1, 2),
            dep AS (
                SELECT (l_orderkey % 50)::BIGINT AS hostn,
                       (l_suppkey % 2)::INT AS depth,
                       count(*)::BIGINT AS ndep
                FROM lineitem
                WHERE l_linenumber = 1 AND l_partkey % 41 = 0
                GROUP BY 1, 2),
            cnt AS (
                SELECT p.hostn, p.depth,
                       coalesce(p.pending_count, 0) - coalesce(d.ndep, 0)
                           AS mid
                FROM prior p LEFT JOIN dep d USING (hostn, depth)),
            arr AS (
                SELECT (user_id % 50)::BIGINT AS hostn,
                       (event_id % 2)::INT AS depth, event_id, ts,
                       (row_number() OVER (
                            PARTITION BY user_id % 50, event_id % 2
                            ORDER BY ts, event_id))::INT AS qpos
                FROM events)
            SELECT a.hostn, a.depth, a.event_id, a.ts, a.qpos,
                   coalesce(c.mid, 0)::BIGINT AS mid,
                   (a.qpos + coalesce(c.mid, 0))
                       <= (CASE WHEN a.depth = 0 THEN 3 ELSE 9 END)
                       AS admitted
            FROM arr a LEFT JOIN cnt c USING (hostn, depth)
        """,
        "robots_asof_rules": """
            WITH versions AS (
                SELECT (o_custkey % 40)::BIGINT AS hostn,
                       (o_orderkey % 20 + 1)::INT AS epoch,
                       max(o_orderkey)::BIGINT AS rules_id
                FROM orders GROUP BY 1, 2),
            reqs AS (
                SELECT event_id::BIGINT AS event_id,
                       (user_id % 40)::BIGINT AS hostn,
                       (event_id % 25)::INT AS epoch
                FROM events),
            u AS (
                SELECT hostn, epoch, 0 AS tag, epoch AS ver_epoch,
                       rules_id, NULL::BIGINT AS event_id
                FROM versions
                UNION ALL
                SELECT hostn, epoch, 1, NULL::INT, NULL::BIGINT, event_id
                FROM reqs)
            SELECT event_id, hostn, epoch AS req_epoch,
                   last_value(ver_epoch IGNORE NULLS) OVER w AS rule_epoch,
                   last_value(rules_id IGNORE NULLS) OVER w AS rules_id
            FROM u
            WINDOW w AS (PARTITION BY hostn ORDER BY epoch, tag
                         ROWS UNBOUNDED PRECEDING)
            QUALIFY tag = 1
        """,
        "watermark_agg": """
            SELECT l_orderkey, count(*)::BIGINT AS n_items,
                   max(date_trunc('second', l_shipdate)) AS watermark
            FROM lineitem GROUP BY l_orderkey
        """,
        "upsert_latest": """
            SELECT user_id, event_id, ts, value FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        """,
        "host_last_access": """
            SELECT user_id, max(ts) AS last_access, count(*)::BIGINT AS n_fetches
            FROM events GROUP BY user_id
        """,
        "status_routing": """
            SELECT status, count(*)::BIGINT AS n FROM (
                SELECT CASE WHEN event_type = 'error' THEN 'dead'
                            WHEN value < 5.0 THEN 'skipped'
                            ELSE 'ok' END AS status
                FROM events)
            GROUP BY status
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_md5, min(doc_id)::BIGINT AS rep_id,
                   count(*)::BIGINT AS dup_count
            FROM documents GROUP BY md5(text)
        """,
        "dedup_exact_groups": """
            SELECT md5(text) AS text_md5, min(doc_id)::BIGINT AS rep_id,
                   count(*)::BIGINT AS dup_count
            FROM documents GROUP BY md5(text) HAVING count(*) > 1
        """,
        "dedup_token_jaccard": f"""
            WITH s AS (
                SELECT doc_id, lang, n_chars // 64 AS len_blk,
                       list_distinct({_WS_TOKS}) AS toks
                FROM documents)
            SELECT id_a, id_b, jaccard FROM (
                SELECT a.doc_id::BIGINT AS id_a, b.doc_id::BIGINT AS id_b,
                       {jac} AS jaccard
                FROM s a JOIN s b
                  ON a.lang = b.lang AND a.len_blk = b.len_blk
                 AND a.doc_id < b.doc_id)
            WHERE jaccard >= 0.2
        """,
        "dedup_minhash_lsh": minhash_pairs_sql,
        "dedup_incremental_lsh": inc_probe_sql,
        "dedup_minhash_components": f"""
            WITH RECURSIVE
            pairs AS ({minhash_pairs_sql}),
            edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                      UNION SELECT id_b, id_a FROM pairs),
            verts AS (SELECT DISTINCT a AS v FROM edges),
            reach(v, m) AS (
                SELECT v, v FROM verts
                UNION
                SELECT e.a, r.m FROM edges e JOIN reach r ON r.v = e.b),
            comp AS (SELECT v, min(m) AS c FROM reach GROUP BY v)
            SELECT v::BIGINT AS doc_id, c::BIGINT AS component,
                   (v = c) AS is_canonical
            FROM comp
        """,
        "dedup_simhash_hamming": f"""
            WITH toks AS (
                SELECT doc_id, unnest(list_distinct(string_split_regex(
                    lower(trim(text)), '\\s+'))) AS tok FROM documents),
            h AS (SELECT doc_id, {fingerprint_sql("tok")} AS h FROM toks),
            votes AS (SELECT doc_id, {simhash_votes} FROM h GROUP BY doc_id),
            sh AS (SELECT doc_id::BIGINT AS id,
                          ({simhash_val})::BIGINT AS simhash FROM votes),
            banded AS (
                SELECT id, simhash, d, (simhash // d) % 256 AS bv
                FROM sh, (SELECT unnest([1, 256, 65536]) AS d)),
            cand AS (
                SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                       a.simhash AS s_a, b.simhash AS s_b
                FROM banded a JOIN banded b USING (d, bv)
                WHERE a.id < b.id)
            SELECT id_a, id_b, bit_count(xor(s_a, s_b))::INT AS hamming
            FROM cand WHERE bit_count(xor(s_a, s_b)) <= 2
        """,
        "caption_consistency": """
            WITH base AS (
                SELECT doc_id,
                       (doc_id * 2654435761 + 40503)::BIGINT AS ph
                FROM documents),
            t AS (
                SELECT doc_id, ph,
                       CASE WHEN doc_id % 7 = 3 THEN ph + 1 ELSE ph END AS tph
                FROM base),
            cap AS (
                SELECT d.doc_id, t.ph,
                       string_split(
                           d.text || ' img' || (t.tph % 65536)::VARCHAR
                           || ' img' || ((t.tph // 65536) % 65536)::VARCHAR
                           || ' img' || ((t.tph // 4294967296) % 65536)::VARCHAR
                           || ' img' || ((t.tph // 281474976710656) % 65536)::VARCHAR,
                           ' ') AS toks
                FROM documents d JOIN t USING (doc_id))
            SELECT doc_id::BIGINT AS doc_id,
                   (list_contains(toks, 'img' || (ph % 65536)::VARCHAR)::INT
                  + list_contains(toks, 'img' || ((ph // 65536) % 65536)::VARCHAR)::INT
                  + list_contains(toks, 'img' || ((ph // 4294967296) % 65536)::VARCHAR)::INT
                  + list_contains(toks, 'img' || ((ph // 281474976710656) % 65536)::VARCHAR)::INT
                   ) / 4.0 AS consistency
            FROM cap
        """,
        "image_metadata_verdict": r"""
            WITH img AS (
                SELECT doc_id AS image_id,
                       (16 + (doc_id * 37) % 1009)::INT AS w,
                       (16 + (doc_id * 61) % 1009)::INT AS h,
                       (['png', 'jpeg', 'gif', 'bmp'])[(doc_id % 4 + 1)::INT]
                           AS fmt,
                       CASE WHEN doc_id % 11 = 0 THEN 'x' ELSE text END
                           AS caption,
                       (CASE WHEN doc_id % 9 = 0 THEN 777
                             ELSE doc_id * 2654435761 + 17 END)::BIGINT
                           AS phash
                FROM documents),
            t AS (
                SELECT image_id, w, h, fmt,
                       len(string_split_regex(lower(trim(caption)),
                           '\s+'))::INT AS n_caption_tokens,
                       (image_id > min(image_id) OVER (PARTITION BY phash))
                           AS phash_dup
                FROM img),
            r AS (
                SELECT *,
                       CASE WHEN w < 64 OR h < 64 THEN 'too_small'
                            WHEN 10 * greatest(w, h) > 35 * least(w, h)
                                THEN 'bad_aspect'
                            WHEN fmt NOT IN ('png', 'jpeg')
                                THEN 'bad_format'
                            WHEN n_caption_tokens < 3
                              OR n_caption_tokens > 256
                                THEN 'caption_length'
                            WHEN phash_dup THEN 'phash_dup'
                            ELSE 'ok' END AS reason
                FROM t)
            SELECT image_id::BIGINT AS image_id, w, h, fmt,
                   n_caption_tokens, phash_dup, reason,
                   (reason = 'ok') AS keep
            FROM r
        """,
        "caption_consolidation": """
            WITH pairs AS (
                SELECT 'img' || doc_id::VARCHAR AS image_id,
                       ((doc_id % 97) * 256 + doc_id % 13)::BIGINT AS phash,
                       substr(text, 1, 10 + (doc_id % 41)) AS caption
                FROM documents),
            ranked AS (
                SELECT phash // 256 AS cluster, image_id, caption,
                       row_number() OVER (
                           PARTITION BY phash // 256
                           ORDER BY length(caption) DESC, caption DESC,
                                    image_id DESC) AS rn
                FROM pairs),
            stats AS (
                SELECT phash // 256 AS cluster,
                       COUNT(*)::BIGINT AS n_pairs,
                       COUNT(DISTINCT caption)::BIGINT AS n_captions
                FROM pairs GROUP BY 1)
            SELECT s.cluster::BIGINT AS cluster, s.n_pairs, s.n_captions,
                   s.n_captions > 1 AS contested,
                   r.image_id AS canon_image_id,
                   r.caption AS canon_caption
            FROM stats s JOIN ranked r ON r.cluster = s.cluster AND r.rn = 1
        """,
        "dedup_simhash": f"""
            WITH tok AS (
                SELECT doc_id,
                       unnest(list_distinct({_WS_TOKS})) AS tok
                FROM documents),
            h AS (SELECT doc_id, {fingerprint_sql('tok')} AS h FROM tok),
            votes AS (SELECT doc_id, {simhash_votes} FROM h GROUP BY doc_id)
            SELECT doc_id::BIGINT AS id, ({simhash_val})::BIGINT AS simhash
            FROM votes
        """,
        "similarity_brute_topk": f"""
            WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec
                       FROM embeddings WHERE vec_id < 8),
            c AS (SELECT vec_id AS n_id, embedding AS n_vec FROM embeddings),
            s AS (SELECT q_id, n_id, round({cos}, 8) AS sim
                  FROM q, c WHERE n_id <> q_id)
            SELECT q_id::BIGINT AS q_id, n_id::BIGINT AS n_id, sim,
                   rank::INT AS rank
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM s)
            WHERE rank <= 5
        """,
        "similarity_ivf_topk": f"""
            WITH cent AS (SELECT vec_id AS cell, embedding AS c_vec
                          FROM embeddings WHERE vec_id % 50 = 0),
            v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
            asg AS (
                SELECT id, cell, vec FROM (
                    SELECT id, cell, vec, row_number() OVER (
                        PARTITION BY id
                        ORDER BY round({ccos}, 8) DESC, cell) AS rn
                    FROM v, cent)
                WHERE rn = 1),
            q AS (SELECT id AS q_id, cell, vec AS q_vec FROM asg WHERE id < 8),
            s AS (SELECT q_id, a.id AS n_id,
                         round({cosine_sql('q_vec', 'a.vec')}, 8) AS sim
                  FROM asg a JOIN q USING (cell) WHERE a.id <> q_id)
            SELECT q_id::BIGINT AS q_id, n_id::BIGINT AS n_id, sim,
                   rank::INT AS rank
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM s)
            WHERE rank <= 5
        """,
        "similarity_pq_topk": f"""
            WITH cb AS (SELECT vec_id AS cw, embedding AS c_vec
                        FROM embeddings WHERE vec_id % 25 = 0),
            v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
            subs AS (SELECT j FROM range(8) t(j)),
            cd AS (SELECT id, j, cw, {_pq_l2('vec', 'c_vec')} AS d
                   FROM v, cb, subs),
            enc AS (SELECT id, j, cw FROM (
                        SELECT id, j, cw, row_number() OVER (
                            PARTITION BY id, j ORDER BY d, cw) AS rn
                        FROM cd)
                    WHERE rn = 1),
            q AS (SELECT vec_id AS q_id, embedding AS q_vec
                  FROM embeddings WHERE vec_id < 8),
            lut AS (SELECT q_id, j, cw, {_pq_l2('q_vec', 'c_vec')} AS d
                    FROM q, cb, subs),
            s AS (SELECT q_id, id,
                         round(list_reduce(
                             list_prepend(0.0::DOUBLE, list(d ORDER BY j)),
                             (__a, __p) -> __a + __p), 8) AS adc
                  FROM enc JOIN lut USING (j, cw)
                  WHERE id <> q_id GROUP BY q_id, id)
            SELECT q_id::BIGINT AS q_id, id::BIGINT AS n_id, adc,
                   rank::INT AS rank
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY q_id ORDER BY adc, id) AS rank FROM s)
            WHERE rank <= 5
        """,
        "similarity_ivf_multiprobe": f"""
            WITH cent AS (SELECT vec_id AS cell, embedding AS c_vec
                          FROM embeddings WHERE vec_id % 50 = 0),
            v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
            asg AS (
                SELECT id, cell, vec FROM (
                    SELECT id, cell, vec, row_number() OVER (
                        PARTITION BY id
                        ORDER BY round({ccos}, 8) DESC, cell) AS rn
                    FROM v, cent)
                WHERE rn = 1),
            qasg AS (
                SELECT id, cell, vec FROM (
                    SELECT id, cell, vec, row_number() OVER (
                        PARTITION BY id
                        ORDER BY round({ccos}, 8) DESC, cell) AS rn
                    FROM v, cent)
                WHERE rn <= 2 AND id < 8),
            q AS (SELECT id AS q_id, cell, vec AS q_vec FROM qasg),
            s AS (SELECT DISTINCT q_id, a.id AS n_id,
                         round({cosine_sql('q_vec', 'a.vec')}, 8) AS sim
                  FROM asg a JOIN q USING (cell) WHERE a.id <> q_id)
            SELECT q_id::BIGINT AS q_id, n_id::BIGINT AS n_id, sim,
                   rank::INT AS rank
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM s)
            WHERE rank <= 5
        """,
        "similarity_ivfpq_topk": f"""
            WITH cent AS (SELECT vec_id AS cell, embedding AS c_vec
                          FROM embeddings WHERE vec_id % 50 = 0),
            cb AS (SELECT vec_id AS cw, embedding AS c_vec
                   FROM embeddings WHERE vec_id % 25 = 0),
            v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
            asg AS (
                SELECT id, cell FROM (
                    SELECT id, cell, row_number() OVER (
                        PARTITION BY id
                        ORDER BY round({ccos}, 8) DESC, cell) AS rn
                    FROM v, cent)
                WHERE rn = 1),
            qasg AS (
                SELECT id AS q_id, cell FROM (
                    SELECT id, cell, row_number() OVER (
                        PARTITION BY id
                        ORDER BY round({ccos}, 8) DESC, cell) AS rn
                    FROM v, cent)
                WHERE rn <= 2 AND id < 8),
            subs AS (SELECT j FROM range(8) t(j)),
            cd AS (SELECT id, j, cw, {_pq_l2('vec', 'c_vec')} AS d
                   FROM v, cb, subs),
            enc AS (SELECT id, j, cw FROM (
                        SELECT id, j, cw, row_number() OVER (
                            PARTITION BY id, j ORDER BY d, cw) AS rn
                        FROM cd)
                    WHERE rn = 1),
            q AS (SELECT vec_id AS q_id, embedding AS q_vec
                  FROM embeddings WHERE vec_id < 8),
            lut AS (SELECT q_id, j, cw, {_pq_l2('q_vec', 'c_vec')} AS d
                    FROM q, cb, subs),
            cand AS (SELECT DISTINCT qa.q_id, a.id AS n_id
                     FROM asg a JOIN qasg qa USING (cell)
                     WHERE a.id <> qa.q_id),
            s AS (SELECT c.q_id, c.n_id,
                         round(list_reduce(
                             list_prepend(0.0::DOUBLE, list(l.d ORDER BY l.j)),
                             (__a, __p) -> __a + __p), 8) AS adc
                  FROM cand c
                  JOIN enc e ON e.id = c.n_id
                  JOIN lut l ON l.q_id = c.q_id AND l.j = e.j AND l.cw = e.cw
                  GROUP BY c.q_id, c.n_id)
            SELECT q_id::BIGINT AS q_id, n_id::BIGINT AS n_id, adc,
                   rank::INT AS rank
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY q_id ORDER BY adc, n_id) AS rank FROM s)
            WHERE rank <= 5
        """,
        "dedup_embedding_cosine": f"""
            WITH cent AS (SELECT vec_id AS cell, embedding AS c_vec
                          FROM embeddings WHERE vec_id % 50 = 0),
            v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
            asg AS (
                SELECT id, cell, vec FROM (
                    SELECT id, cell, vec, row_number() OVER (
                        PARTITION BY id
                        ORDER BY round({ccos}, 8) DESC, cell) AS rn
                    FROM v, cent)
                WHERE rn = 1)
            SELECT id_a, id_b, sim FROM (
                SELECT a.id::BIGINT AS id_a, b.id::BIGINT AS id_b,
                       round({cosine_sql('a.vec', 'b.vec')}, 8) AS sim
                FROM asg a JOIN asg b USING (cell)
                WHERE a.id < b.id)
            WHERE sim >= 0.3
        """,
        "text_tfidf_topk": """
            WITH tf AS (
                SELECT doc_id AS id, term,
                       least(count(*), 10000)::BIGINT AS tf
                FROM (SELECT doc_id,
                             unnest(string_split_regex(lower(trim(text)),
                                                       '\\s+')) AS term
                      FROM documents)
                WHERE term <> '' GROUP BY 1, 2
            ), nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
            idf AS (
                SELECT term,
                       round((ln((nd.n + 1.0) / (count(*) + 1.0)) + 1.0)
                             * 10000)::BIGINT AS iw
                FROM tf, nd GROUP BY term, nd.n
            ), dw AS (
                SELECT id, term, tf * iw AS w FROM tf JOIN idf USING (term)
            ), dn AS (SELECT id, sum(w * w)::BIGINT AS n2 FROM dw GROUP BY id),
            qw AS (SELECT id AS qid, term, w AS qwv FROM dw
                   WHERE qid % 37 = 0),
            qn AS (SELECT qid, sum(qwv * qwv)::BIGINT AS qn2
                   FROM qw GROUP BY qid),
            dt AS (
                SELECT qid, id, sum(w * qwv)::BIGINT AS dot
                FROM dw JOIN qw USING (term) WHERE id <> qid GROUP BY 1, 2
            ), scored AS (
                SELECT qid, id,
                       round(dot / (sqrt(qn2::DOUBLE) * sqrt(n2::DOUBLE)),
                             6) AS score
                FROM dt JOIN dn USING (id) JOIN qn USING (qid)
            )
            SELECT qid AS query_id,
                   (row_number() OVER (
                        PARTITION BY qid
                        ORDER BY score DESC, id ASC))::INT AS rank,
                   id AS match_id, score
            FROM scored QUALIFY rank <= 5
        """,
        "text_stats": f"""
            SELECT doc_id,
                   (CASE WHEN trim(text) = '' THEN 0
                         ELSE len(string_split_regex(trim(text), '\\s+'))
                    END)::BIGINT AS n_tok_ws,
                   len(regexp_extract_all(text,
                       '{BPE_ISH_PATTERN}'))::BIGINT AS n_tok_bpe,
                   {fingerprint_sql('text')} AS fp64
            FROM documents
        """,
        "text_lang_quality": f"""
            SELECT doc_id,
                   {_lang_sql()} AS lang_pred,
                   {_quality_sql()} AS quality,
                   round({_sw_ratio_sql(STOPWORDS_EN)}, 6) AS stop_ratio
            FROM documents
        """,
        "text_repetition_quality": repetition_sql,
        "dedup_segment_exact": segment_sql,
        "dedup_span_removal": span_sql,
        "curation_verdict": f"""
            WITH rep AS ({repetition_sql}),
            seg AS ({segment_sql}),
            q AS (SELECT doc_id, {_quality_sql()} AS quality
                  FROM documents)
            SELECT doc_id, quality, rep_ok, seg.keep AS seg_keep,
                   (CASE WHEN NOT rep_ok THEN 'repetition'
                         WHEN NOT seg.keep THEN 'dup_segments'
                         WHEN quality < {MIN_QUALITY} THEN 'low_quality'
                         ELSE 'ok' END) AS reason,
                   (rep_ok AND seg.keep AND quality >= {MIN_QUALITY})
                       AS keep
            FROM q JOIN rep USING (doc_id) JOIN seg USING (doc_id)
        """,
        "text_pii_scrub": f"""
            WITH s AS (
                SELECT doc_id, text
                    || (CASE WHEN doc_id % 3 = 0 THEN
                        ' contact user' || doc_id::VARCHAR
                        || '@example.com ok' ELSE '' END)
                    || (CASE WHEN doc_id % 5 = 0 THEN
                        ' call 555-' || (doc_id % 900 + 100)::VARCHAR
                        || '-' || (doc_id % 9000 + 1000)::VARCHAR
                        ELSE '' END)
                    || (CASE WHEN doc_id % 7 = 0 THEN
                        ' at 10.' || (doc_id % 256)::VARCHAR || '.0.'
                        || ((doc_id * 7) % 256)::VARCHAR || ' end'
                        ELSE '' END) AS salted
                FROM documents),
            r AS (SELECT doc_id, salted,
                         regexp_replace(regexp_replace(regexp_replace(
                             salted,
                             '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                             '{PII_IPV4_RE}', '<IP>', 'g'),
                             '{PII_PHONE_RE}', '<PHONE>', 'g') AS scrubbed
                  FROM s)
            SELECT doc_id,
                   len(regexp_extract_all(salted,
                       '{PII_EMAIL_RE}'))::BIGINT AS n_email,
                   len(regexp_extract_all(salted,
                       '{PII_PHONE_RE}'))::BIGINT AS n_phone,
                   len(regexp_extract_all(salted,
                       '{PII_IPV4_RE}'))::BIGINT AS n_ipv4,
                   {fingerprint_sql('scrubbed')} AS fp_scrubbed,
                   (NOT (regexp_matches(scrubbed, '{PII_EMAIL_RE}')
                      OR regexp_matches(scrubbed, '{PII_PHONE_RE}')
                      OR regexp_matches(scrubbed, '{PII_IPV4_RE}')))
                       AS clean
            FROM r
        """,
        "events_sessionize": """
            WITH b AS (SELECT user_id, event_id,
                              epoch_us(ts)::BIGINT AS ts_us FROM events),
            o AS (SELECT user_id, event_id, ts_us,
                         CASE WHEN lag(ts_us) OVER w IS NULL
                                OR ts_us - lag(ts_us) OVER w > 1800000000
                              THEN 1 ELSE 0 END AS ns
                  FROM b
                  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
            s AS (SELECT user_id, ts_us,
                         sum(ns) OVER (PARTITION BY user_id
                                       ORDER BY ts_us, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sid
                  FROM o)
            SELECT user_id, sid::BIGINT AS session_id,
                   count(*)::BIGINT AS n_events,
                   min(ts_us) AS start_us, max(ts_us) AS end_us,
                   (max(ts_us) - min(ts_us))::BIGINT AS duration_us
            FROM s GROUP BY 1, 2
        """,
        "link_anchor_topk": """
            WITH e AS (SELECT (user_id % 997)::BIGINT AS src,
                              (event_id % 997)::BIGINT AS dst,
                              'anchor' ||
                              ((user_id + event_id) % 23)::VARCHAR AS anchor
                       FROM events),
            c AS (SELECT dst, anchor, count(*)::BIGINT AS cnt
                  FROM e GROUP BY 1, 2),
            r AS (SELECT dst, anchor, cnt,
                         row_number() OVER (PARTITION BY dst
                                            ORDER BY cnt DESC, anchor)
                             AS rank
                  FROM c)
            SELECT dst::BIGINT AS dst, anchor, cnt, rank::INT AS rank
            FROM r WHERE rank <= 3
        """,
        "corpus_pack_sequences": r"""
            WITH b AS (SELECT doc_id, source AS shard,
                              len(string_split_regex(lower(trim(text)),
                                  '\s+'))::BIGINT AS n_tokens
                       FROM documents),
            s AS (SELECT doc_id, shard, n_tokens,
                         coalesce(sum(n_tokens) OVER (
                             PARTITION BY shard ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0)::BIGINT
                             AS start_offset
                  FROM b)
            SELECT doc_id::BIGINT AS doc_id, shard, n_tokens, start_offset,
                   (start_offset // 1024)::BIGINT AS first_seq,
                   ((start_offset + n_tokens - 1) // 1024)::BIGINT
                       AS last_seq,
                   ((start_offset + n_tokens - 1) // 1024
                    - start_offset // 1024 + 1)::BIGINT AS n_seqs,
                   ((start_offset + n_tokens - 1) // 1024
                    > start_offset // 1024) AS spans_boundary,
                   ((start_offset + n_tokens - 1) % 1024 = 1023)
                       AS ends_on_boundary
            FROM s
        """,
        "link_pagerank": """
            WITH e AS (SELECT DISTINCT (user_id % 997)::BIGINT AS src,
                              (event_id % 997)::BIGINT AS dst FROM events),
            n AS (SELECT DISTINCT node FROM
                  (SELECT src AS node FROM e
                   UNION ALL SELECT dst AS node FROM e)),
            od AS (SELECT src, count(*)::BIGINT AS outdeg FROM e GROUP BY 1),
            r0 AS (SELECT node, 1000000000000::BIGINT AS rank_q FROM n),
            c1 AS (SELECT dst AS node, sum(rank_q // outdeg)::BIGINT AS s
                   FROM e JOIN r0 ON e.src = r0.node JOIN od USING (src)
                   GROUP BY 1),
            r1 AS (SELECT n.node, (150000000000
                       + (85 * coalesce(s, 0)) // 100)::BIGINT AS rank_q
                   FROM n LEFT JOIN c1 USING (node)),
            c2 AS (SELECT dst AS node, sum(rank_q // outdeg)::BIGINT AS s
                   FROM e JOIN r1 ON e.src = r1.node JOIN od USING (src)
                   GROUP BY 1),
            r2 AS (SELECT n.node, (150000000000
                       + (85 * coalesce(s, 0)) // 100)::BIGINT AS rank_q
                   FROM n LEFT JOIN c2 USING (node)),
            c3 AS (SELECT dst AS node, sum(rank_q // outdeg)::BIGINT AS s
                   FROM e JOIN r2 ON e.src = r2.node JOIN od USING (src)
                   GROUP BY 1),
            r3 AS (SELECT n.node, (150000000000
                       + (85 * coalesce(s, 0)) // 100)::BIGINT AS rank_q
                   FROM n LEFT JOIN c3 USING (node))
            SELECT node, rank_q,
                   round(rank_q::DOUBLE / 1000000000000, 6) AS rank
            FROM r3
        """,
        "text_decontaminate": f"""
            WITH s AS (SELECT doc_id, (doc_id % {BENCH_MOD} = 0) AS is_bench,
                              text || (CASE WHEN doc_id % {BENCH_MOD} = 0
                                              OR doc_id % {CANARY_MOD} = 0
                                       THEN '{CANARY}' ELSE '' END) AS salted
                       FROM documents),
            t AS (SELECT doc_id, is_bench, {tokens_sql('salted')} AS toks
                  FROM s),
            g AS (SELECT doc_id, is_bench,
                         CASE WHEN len(toks) >= {DECONTAM_N} THEN
                             list_distinct(list_transform(
                                 generate_series(0, len(toks) - {DECONTAM_N}),
                                 __i -> array_to_string(
                                     toks[__i + 1 : __i + {DECONTAM_N}], ' ')))
                         ELSE CAST([] AS VARCHAR[]) END AS grams
                  FROM t),
            bg AS (SELECT DISTINCT {fingerprint_sql('gram')} AS gh
                   FROM (SELECT unnest(grams) AS gram FROM g WHERE is_bench)),
            tg AS (SELECT doc_id, {fingerprint_sql('gram')} AS gh
                   FROM (SELECT doc_id, unnest(grams) AS gram
                         FROM g WHERE NOT is_bench)),
            ov AS (SELECT doc_id, count(*)::BIGINT AS n_overlap
                   FROM tg JOIN bg USING (gh) GROUP BY 1)
            SELECT g.doc_id, len(grams)::BIGINT AS n_grams,
                   coalesce(n_overlap, 0)::BIGINT AS n_overlap,
                   coalesce(n_overlap, 0) > 0 AS contaminated
            FROM g LEFT JOIN ov ON g.doc_id = ov.doc_id
            WHERE NOT is_bench
        """,
        "corpus_sample": f"""
            WITH b AS (SELECT doc_id,
                          (CASE WHEN {_quality_sql()} >= {BAND_HIGH_MIN}
                                THEN 'high'
                                WHEN {_quality_sql()} >= {BAND_MID_MIN}
                                THEN 'mid'
                                ELSE 'low' END) AS band,
                          ({fingerprint_sql(
                              "'" + SAMPLE_SALT + "' || doc_id::VARCHAR")}
                           % {SAMPLE_BUCKETS})::BIGINT AS bucket
                       FROM documents)
            SELECT doc_id, band, bucket,
                   (bucket < CASE WHEN band = 'high' THEN {SAMPLE_RATE_HIGH}
                                  WHEN band = 'mid' THEN {SAMPLE_RATE_MID}
                                  ELSE {SAMPLE_RATE_LOW} END) AS kept
            FROM b
        """,
        "url_blocklist_filter": r"""
            WITH u AS (
                SELECT 'https://'
                       || CASE WHEN user_id % 3 = 1
                               THEN 'sub.h' || (user_id % 40)::VARCHAR
                                    || '.example.com'
                               WHEN user_id % 3 = 2
                               THEN 'xh' || (user_id % 40)::VARCHAR
                                    || '.example.com'
                               ELSE 'h' || (user_id % 40)::VARCHAR
                                    || '.example.com' END
                       || '/p' || event_id::VARCHAR AS url
                FROM events),
            b AS (SELECT url,
                         regexp_extract(url,
                             '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1) AS host
                  FROM u),
            rules AS (SELECT * FROM (VALUES ('h5.example.com'),
                          ('h17.example.com'), ('h9.example.com'),
                          ('sub.h9.example.com'), ('example.net')) r(d)),
            ex AS (SELECT url, host,
                          unnest(list_transform(
                              generate_series(1,
                                  len(string_split(host, '.'))),
                              i -> array_to_string(
                                  string_split(host, '.')[i:
                                      len(string_split(host, '.'))],
                                  '.'))) AS sfx
                   FROM b),
            hits AS (SELECT url, max_by(d, length(d)) AS matched_rule
                     FROM ex JOIN rules ON ex.sfx = rules.d
                     GROUP BY url)
            SELECT b.url, b.host,
                   (hits.matched_rule IS NOT NULL) AS blocked,
                   hits.matched_rule
            FROM b LEFT JOIN hits ON b.url = hits.url
        """,
        "text_c4_clean": r"""
            WITH d AS (SELECT doc_id::BIGINT AS doc_id FROM documents),
            t AS (SELECT doc_id,
                         list_transform(
                             generate_series(0, doc_id % 5 + 2),
                             j -> CASE (doc_id + j) % 4
                                  WHEN 1 THEN 'Short no. ' || j::VARCHAR
                                  WHEN 2 THEN
                                      'No terminal punctuation on line '
                                      || j::VARCHAR || ' of this doc'
                                  ELSE '  A valid retained sentence number '
                                       || j::VARCHAR || ' for document '
                                       || doc_id::VARCHAR || '.  ' END)
                             AS lines
                  FROM d),
            k AS (SELECT doc_id, len(lines)::BIGINT AS n_lines,
                         list_transform(list_filter(lines,
                             l -> regexp_matches(trim(l), '[.!?"]$')
                                  AND len(string_split_regex(trim(l),
                                          '\s+')) >= 5),
                             l -> trim(l)) AS kept
                  FROM t)
            SELECT doc_id, n_lines, len(kept)::BIGINT AS n_kept_lines,
                   (len(kept) >= 3) AS keep,
                   array_to_string(kept, chr(10)) AS cleaned_text
            FROM k
        """,
        "corpus_zigzag_shards": """
            WITH b AS (SELECT source, doc_id::BIGINT AS doc_id,
                              ((doc_id * 37) % 1000 + 1)::BIGINT
                                  AS n_tokens
                       FROM documents),
            r AS (SELECT source, doc_id, n_tokens,
                         (row_number() OVER (
                              PARTITION BY source
                              ORDER BY n_tokens DESC, doc_id) - 1)::BIGINT
                             AS rank
                  FROM b)
            SELECT source, doc_id, n_tokens, rank,
                   (CASE WHEN (rank // 8) % 2 = 0 THEN rank % 8
                         ELSE 7 - rank % 8 END)::INT AS shard
            FROM r
        """,
        "frontier_kmv_sample": f"""
            WITH v AS (SELECT DISTINCT
                           'g' || (user_id % 8)::VARCHAR AS grp,
                           CASE WHEN user_id % 8 < 2
                                THEN 'u' || (event_id % 30)::VARCHAR
                                ELSE 'u' || event_id::VARCHAR END AS value
                       FROM events),
            h AS (SELECT grp, value, {fingerprint_sql('value')} AS h FROM v),
            r AS (SELECT grp, value, h,
                         row_number() OVER (PARTITION BY grp
                                            ORDER BY h, value)::INT AS rk
                  FROM h),
            s AS (SELECT * FROM r WHERE rk <= 64),
            e AS (SELECT grp, count(*)::BIGINT AS n_kept,
                         max(h)::BIGINT AS hk
                  FROM s GROUP BY 1)
            SELECT s.grp, s.value, s.h, s.rk, e.n_kept,
                   (CASE WHEN e.n_kept < 64 THEN e.n_kept
                         ELSE (63::BIGINT * 2147483647)
                              // greatest(e.hk, 1) END)::BIGINT
                       AS est_distinct
            FROM s JOIN e ON s.grp = e.grp
        """,
        "embedding_quantize_int8": """
            WITH x AS (SELECT vec_id,
                              unnest(list_transform(embedding,
                                  (__v, __i) -> {'d': __i - 1, 'v': __v}))
                                  AS s
                       FROM embeddings),
            e AS (SELECT vec_id, s.d::INT AS dim, s.v::DOUBLE AS v FROM x),
            m AS (SELECT dim, min(v) AS dmin, max(v) AS dmax
                  FROM e GROUP BY 1)
            SELECT e.vec_id, e.dim,
                   (CASE WHEN dmax = dmin THEN 0
                         ELSE least(greatest(
                             round((v - dmin) * 254 / (dmax - dmin), 0)::INT
                             - 127, -127), 127) END)::INT AS qv
            FROM e JOIN m USING (dim)
        """,
        "corpus_expire_plan": """
            WITH s AS (SELECT v::BIGINT AS version,
                              ((v * 13) % 40)::BIGINT AS epoch
                       FROM range(1, 21) t(v)),
            r AS (SELECT version, epoch,
                         row_number() OVER (ORDER BY version DESC)::BIGINT
                             AS rk
                  FROM s),
            lv AS (SELECT version, (rk <= 3 OR epoch >= 38) AS live FROM r),
            m AS (SELECT DISTINCT
                         ((event_id % 347) % 18 + 1
                          + event_id % 3)::BIGINT AS version,
                         'f' || (event_id % 347)::VARCHAR AS file
                  FROM events),
            refs AS (SELECT m.version, m.file, lv.live
                     FROM m JOIN lv USING (version)),
            livef AS (SELECT DISTINCT file FROM refs WHERE live),
            dead AS (SELECT file, version FROM refs
                     WHERE file NOT IN (SELECT file FROM livef))
            SELECT file, count(*)::BIGINT AS n_refs,
                   max(version)::BIGINT AS last_ref_version
            FROM dead GROUP BY 1
        """,
        "robots_sitemaps": """
            WITH d AS (SELECT doc_id::BIGINT AS doc_id,
                              'https://h' || (doc_id % 50)::VARCHAR
                              || '.example.com' AS h,
                              doc_id % 4 AS cls
                       FROM documents)
            SELECT doc_id, 0::INT AS sm_idx,
                   CASE WHEN cls = 1 THEN h || '/sitemap.xml'
                        WHEN cls = 2 THEN h || '/sm_a.xml'
                        ELSE h || '/s.xml' END AS sitemap_url
            FROM d WHERE cls IN (1, 2, 3)
            UNION ALL
            SELECT doc_id, 1::INT AS sm_idx, h || '/sm_b.xml' AS sitemap_url
            FROM d WHERE cls = 2
        """,
        "frontier_skew_plan": """
            WITH k AS (
                SELECT CASE WHEN user_id % 10 < 3 THEN 'hot.example.com'
                            ELSE 'h' || (user_id % 200)::VARCHAR END AS key,
                       count(*)::BIGINT AS n_rows
                FROM events GROUP BY 1)
            SELECT key, n_rows,
                   least(greatest((n_rows + 499) // 500, 1), 8)::INT
                       AS fanout,
                   (least(greatest((n_rows + 499) // 500, 1), 8) > 1)
                       AS hot
            FROM k
        """,
        "corpus_compaction_plan": """
            WITH RECURSIVE m AS (
                SELECT 'p' || (o_orderkey % 40)::VARCHAR AS part,
                       o_orderkey::BIGINT AS file_id,
                       (((o_orderkey * 7919) % 1300000) + 1000)::BIGINT
                           AS bytes
                FROM orders),
            k AS (SELECT part, file_id, bytes, 'keep' AS action,
                         NULL::BIGINT AS group_id
                  FROM m WHERE bytes >= 750000),
            c AS (SELECT part, file_id, bytes,
                         row_number() OVER (PARTITION BY part
                                            ORDER BY file_id)::BIGINT AS rn
                  FROM m WHERE bytes < 750000),
            walk AS (
                SELECT part, file_id, bytes, rn,
                       0::BIGINT AS group_id, bytes AS acc
                FROM c WHERE rn = 1
                UNION ALL
                SELECT c.part, c.file_id, c.bytes, c.rn,
                       CASE WHEN w.acc + c.bytes > 1000000
                            THEN w.group_id + 1 ELSE w.group_id END,
                       CASE WHEN w.acc + c.bytes > 1000000
                            THEN c.bytes ELSE w.acc + c.bytes END
                FROM c JOIN walk w
                  ON c.part = w.part AND c.rn = w.rn + 1)
            SELECT part, file_id, bytes, action, group_id FROM k
            UNION ALL
            SELECT part, file_id, bytes, 'compact' AS action, group_id
            FROM walk
        """,
        "corpus_importance_resample": f"""
            WITH t AS (SELECT doc_id, {tokens_sql('text')} AS toks
                       FROM documents),
            g AS (SELECT doc_id,
                         unnest(CASE WHEN len(toks) >= 2 THEN
                             list_transform(
                                 generate_series(0, len(toks) - 2),
                                 __i -> array_to_string(
                                     toks[__i + 1 : __i + 2], ' '))
                         ELSE CAST([] AS VARCHAR[]) END) AS gram
                  FROM t),
            occ AS (SELECT doc_id,
                           (({fingerprint_sql('gram')}) % 4096)::INT
                               AS feat,
                           count(*)::BIGINT AS c_doc
                    FROM g GROUP BY 1, 2),
            cr AS (SELECT feat, sum(c_doc)::BIGINT AS c_r
                   FROM occ GROUP BY 1),
            ct AS (SELECT feat, sum(c_doc)::BIGINT AS c_t
                   FROM occ WHERE doc_id % 37 = 1 GROUP BY 1),
            tot AS (SELECT ((SELECT sum(c_r) FROM cr) + 4096)::DOUBLE
                               AS den_r,
                           (coalesce((SELECT sum(c_t) FROM ct), 0)
                            + 4096)::DOUBLE AS den_t),
            w AS (SELECT cr.feat,
                         round(ln(((coalesce(c_t, 0) + 1)::DOUBLE * den_r)
                                  / ((c_r + 1)::DOUBLE * den_t))
                               * 1000000, 0)::BIGINT AS w_q
                  FROM cr LEFT JOIN ct USING (feat) CROSS JOIN tot),
            pd AS (SELECT doc_id, sum(c_doc)::BIGINT AS n_feats,
                          sum(c_doc * w_q)::BIGINT AS score_q
                   FROM occ JOIN w USING (feat) GROUP BY 1),
            r AS (SELECT d.doc_id,
                         coalesce(n_feats, 0)::BIGINT AS n_feats,
                         coalesce(score_q, 0)::BIGINT AS score_q
                  FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id),
            k AS (SELECT doc_id, n_feats, score_q,
                         (CASE WHEN n_feats > 0 THEN
                             round(score_q::DOUBLE / n_feats / 1000000, 6)
                          ELSE 0.0 END) AS avg_logratio,
                         round(-ln(-ln(
                             (({fingerprint_sql(
                                 "'g#' || doc_id::VARCHAR")})
                              % 2147483647 + 1)::DOUBLE
                             / 2147483649.0))
                               * 1000000, 0)::BIGINT AS gumbel_q
                  FROM r),
            s AS (SELECT doc_id, n_feats, score_q, avg_logratio, gumbel_q,
                         (score_q + gumbel_q)::BIGINT AS key_q,
                         row_number() OVER (
                             ORDER BY score_q + gumbel_q DESC, doc_id
                         )::INT AS rank
                  FROM k)
            SELECT doc_id, n_feats, score_q, avg_logratio, gumbel_q,
                   key_q, rank
            FROM s WHERE rank <= 200
        """,
        "text_bigram_lm": f"""
            WITH t AS (SELECT doc_id, {tokens_sql('text')} AS toks
                       FROM documents),
            uni AS (SELECT w, count(*)::BIGINT AS c1
                    FROM (SELECT unnest(toks) AS w FROM t) GROUP BY 1),
            v AS (SELECT count(*)::BIGINT AS nv FROM uni),
            occ AS (SELECT doc_id, gram, count(*)::BIGINT AS c_doc
                    FROM (SELECT doc_id,
                                 unnest(CASE WHEN len(toks) >= 2 THEN
                                     list_transform(
                                         generate_series(0, len(toks) - 2),
                                         __i -> array_to_string(
                                             toks[__i + 1 : __i + 2], ' '))
                                 ELSE CAST([] AS VARCHAR[]) END) AS gram
                          FROM t)
                    GROUP BY 1, 2),
            c2 AS (SELECT gram, sum(c_doc)::BIGINT AS cg FROM occ GROUP BY 1),
            gl AS (SELECT gram,
                          round(ln((cg + 1)::DOUBLE / (c1 + nv)::DOUBLE)
                                * {LOGP_QUANT}, 0)::BIGINT AS logp_q
                   FROM c2 JOIN uni ON split_part(c2.gram, ' ', 1) = uni.w
                   CROSS JOIN v),
            pd AS (SELECT doc_id, sum(c_doc)::BIGINT AS n_bigrams,
                          sum(c_doc * logp_q)::BIGINT AS sum_logp_q
                   FROM occ JOIN gl USING (gram) GROUP BY 1),
            r AS (SELECT d.doc_id,
                         coalesce(n_bigrams, 0)::BIGINT AS n_bigrams,
                         coalesce(sum_logp_q, 0)::BIGINT AS sum_logp_q
                  FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id)
            SELECT doc_id, n_bigrams, sum_logp_q,
                   (CASE WHEN n_bigrams > 0 THEN
                       round(sum_logp_q::DOUBLE / n_bigrams / {LOGP_QUANT}, 6)
                    ELSE 0.0 END) AS avg_logprob,
                   (n_bigrams > 0 AND
                    (CASE WHEN n_bigrams > 0 THEN
                        round(sum_logp_q::DOUBLE / n_bigrams
                              / {LOGP_QUANT}, 6)
                     ELSE 0.0 END) >= {BIGRAM_KEEP_MIN}) AS lm_keep
            FROM r
        """,
        "corpus_mixture_weights": f"""
            WITH s AS (SELECT source, count(*)::BIGINT AS n_docs,
                              sum(CASE WHEN trim(text) = '' THEN 0
                                  ELSE len(string_split_regex(trim(text),
                                           '\\s+'))
                                  END)::BIGINT AS n_tokens
                       FROM documents GROUP BY 1),
            w AS (SELECT source, n_docs, n_tokens,
                         round(pow(n_tokens::DOUBLE, {MIX_TEMPERATURE})
                               * {MIX_QUANT}, 0)::BIGINT AS w_q
                  FROM s),
            t AS (SELECT sum(w_q)::BIGINT AS w_tot FROM w)
            SELECT source, n_docs, n_tokens,
                   round(w_q::DOUBLE / w_tot, 6) AS weight
            FROM w CROSS JOIN t
        """,
        "metrics_rollup": """
            SELECT event_type, user_bucket, count(*)::BIGINT AS n,
                   round(sum(value), 4) AS sum_value
            FROM (SELECT event_type, (user_id % 10)::BIGINT AS user_bucket,
                         value FROM events)
            GROUP BY ROLLUP (event_type, user_bucket)
        """,
        "dedup_rate_by_source": """
            SELECT source, count(*)::BIGINT AS n_docs,
                   count(DISTINCT text)::BIGINT AS n_distinct,
                   round(1.0 - count(DISTINCT text) / count(*)::DOUBLE, 6)
                       AS dup_rate
            FROM documents GROUP BY source
        """,
        "similarity_kmeans_train": _kmeans_oracle_sql(),
        "dedup_semantic": _semdedup_oracle_sql(),
        "frontier_distinct_hll": _hll_oracle_sql(),
        "frontier_hot_hosts": _cms_oracle_sql(),
        "link_bfs_depth": """
            WITH e AS (SELECT DISTINCT (user_id % 997)::BIGINT AS src,
                              (event_id % 997)::BIGINT AS dst FROM events),
            d0 AS (SELECT DISTINCT src AS node, 0::INT AS depth
                   FROM e WHERE src % 100 = 0),
            r1 AS (SELECT node, min(depth)::INT AS depth FROM (
                       SELECT node, depth FROM d0
                       UNION ALL
                       SELECT e.dst AS node, (d.depth + 1)::INT AS depth
                       FROM e JOIN d0 d ON e.src = d.node) GROUP BY 1),
            r2 AS (SELECT node, min(depth)::INT AS depth FROM (
                       SELECT node, depth FROM r1
                       UNION ALL
                       SELECT e.dst AS node, (d.depth + 1)::INT AS depth
                       FROM e JOIN r1 d ON e.src = d.node) GROUP BY 1),
            r3 AS (SELECT node, min(depth)::INT AS depth FROM (
                       SELECT node, depth FROM r2
                       UNION ALL
                       SELECT e.dst AS node, (d.depth + 1)::INT AS depth
                       FROM e JOIN r2 d ON e.src = d.node) GROUP BY 1)
            SELECT node, depth FROM r3
        """,
        "url_template_mining": """
            WITH u AS (
                SELECT 'https://h' || (user_id % 25)::VARCHAR
                       || '.example.com'
                       || CASE WHEN event_id % 5 = 0
                               THEN '/page/' || (event_id % 97)::VARCHAR
                               WHEN event_id % 5 = 1
                               THEN '/cal/2024/d' || event_id::VARCHAR
                               ELSE '/item' || (event_id % 50)::VARCHAR
                                    || '/v' || user_id::VARCHAR END AS url
                FROM events),
            b AS (SELECT regexp_extract(url,
                             '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1) AS host,
                         regexp_replace(regexp_replace(url,
                             '^[a-z][a-z0-9+.-]*://[^/?#]*', ''),
                             '[0-9]+', '{n}', 'g') AS template,
                         url
                  FROM u),
            c AS (SELECT host, template, count(*)::BIGINT AS n_urls,
                         count(DISTINCT url)::BIGINT AS n_distinct_urls
                  FROM b GROUP BY 1, 2),
            r AS (SELECT host, template, n_urls, n_distinct_urls,
                         row_number() OVER (PARTITION BY host
                                            ORDER BY n_urls DESC, template)
                             AS rank
                  FROM c)
            SELECT host, template, n_urls, n_distinct_urls,
                   rank::INT AS rank, (n_distinct_urls >= 50) AS trap
            FROM r WHERE rank <= 3
        """,
        "corpus_snapshot_diff": f"""
            WITH o AS (SELECT doc_id, {fingerprint_sql('text')} AS old_fp
                       FROM documents WHERE doc_id % 7 <> 1),
            n AS (SELECT doc_id,
                         {fingerprint_sql(
                             "CASE WHEN doc_id % 7 = 3"
                             " THEN text || ' rev2' ELSE text END")}
                             AS new_fp
                  FROM documents WHERE doc_id % 7 <> 2)
            SELECT coalesce(o.doc_id, n.doc_id)::BIGINT AS doc_id,
                   o.old_fp, n.new_fp,
                   CASE WHEN o.old_fp IS NULL THEN 'added'
                        WHEN n.new_fp IS NULL THEN 'removed'
                        WHEN o.old_fp <> n.new_fp THEN 'modified'
                        ELSE 'unchanged' END AS change
            FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        """,
        "politeness_adaptive_delay": """
            WITH lat AS (
                SELECT 'h' || (user_id % 50)::VARCHAR AS host,
                       ((event_id * 7919)
                        % (100 + ((user_id % 50) % 7) * 8000))::BIGINT
                           AS latency_ms
                FROM events),
            r AS (SELECT host, latency_ms,
                         row_number() OVER (
                             PARTITION BY host
                             ORDER BY latency_ms)::BIGINT AS rn,
                         count(*) OVER (PARTITION BY host)::BIGINT AS n
                  FROM lat)
            SELECT host, n AS n_samples, latency_ms AS p95_ms,
                   least(greatest(latency_ms * 2, 500), 30000)::BIGINT
                       AS delay_ms
            FROM r WHERE rn = (95 * n + 99) // 100
        """,
        "feed_revisit_schedule": f"""
            WITH h AS (
                SELECT (user_id % 200)::BIGINT AS feed_id,
                       (event_id % 997)::BIGINT AS epoch,
                       (CASE WHEN (user_id % 200) % 5 = 0 THEN 0
                             WHEN (user_id % 200) % 5 = 1 THEN 1
                             WHEN event_id % ((user_id % 200) % 5) = 0
                                  THEN 1
                             ELSE 0 END)::BIGINT AS changed
                FROM events),
            a AS (SELECT feed_id, count(*)::BIGINT AS n_visits,
                         sum(changed)::BIGINT AS n_changed,
                         max(epoch)::BIGINT AS last_epoch
                  FROM h GROUP BY 1),
            r AS (SELECT feed_id, n_visits, n_changed,
                         ({qlog2_sql('n_visits * 2 + 1')}
                          - {qlog2_sql('(n_visits - n_changed) * 2 + 1')}
                         )::BIGINT AS rate_q,
                         last_epoch
                  FROM a),
            i AS (SELECT feed_id, n_visits, n_changed, rate_q, last_epoch,
                         least(greatest(4096 // greatest(rate_q, 1), 1),
                               1024)::BIGINT AS interval_epochs
                  FROM r)
            SELECT feed_id, n_visits, n_changed, rate_q, interval_epochs,
                   (last_epoch + interval_epochs)::BIGINT
                       AS next_fetch_epoch
            FROM i
        """,
        "image_aspect_shards": """
            WITH img AS (
                SELECT doc_id AS image_id,
                       (16 + (doc_id * 37) % 1009)::INT AS w,
                       (16 + (doc_id * 61) % 1009)::INT AS h
                FROM documents),
            b AS (SELECT image_id,
                         least(greatest((w * 4) // h, 1), 8)::INT AS bucket
                  FROM img),
            p AS (SELECT image_id, bucket,
                         (row_number() OVER (
                              PARTITION BY bucket
                              ORDER BY image_id) - 1)::BIGINT
                             AS pos_in_bucket,
                         count(*) OVER (PARTITION BY bucket)::BIGINT AS nb
                  FROM b)
            SELECT image_id::BIGINT AS image_id, bucket, pos_in_bucket,
                   (pos_in_bucket // 32)::BIGINT AS batch,
                   ((pos_in_bucket // 32) // 8)::BIGINT AS shard,
                   ((pos_in_bucket // 32) < (nb // 32)) AS batch_is_full
            FROM p
        """,
        "text_length_quantiles": """
            WITH r AS (SELECT lang, n_chars,
                              row_number() OVER (
                                  PARTITION BY lang
                                  ORDER BY n_chars)::BIGINT AS rn,
                              count(*) OVER (
                                  PARTITION BY lang)::BIGINT AS n
                       FROM documents),
            q AS (SELECT unnest([50, 90, 99])::INT AS q_pct)
            SELECT lang, q_pct, n_chars, n
            FROM r, q WHERE rn = (q_pct * n + 99) // 100
        """,
        "text_length_sketch_quantiles": """
            WITH reg AS (
                SELECT lang, (n_chars // 64)::INT AS bucket,
                       count(*)::BIGINT AS n
                FROM documents GROUP BY 1, 2),
            cum AS (
                SELECT lang, bucket,
                       sum(n) OVER (PARTITION BY lang
                                    ORDER BY bucket)::BIGINT AS cum,
                       sum(n) OVER (PARTITION BY lang)::BIGINT AS n
                FROM reg),
            q AS (SELECT unnest([50, 90, 99])::INT AS q_pct),
            hit AS (
                SELECT lang, q_pct, bucket, n
                FROM cum, q WHERE cum >= (q_pct * n + 99) // 100),
            f AS (
                SELECT lang, q_pct, min(bucket) AS bucket, max(n) AS n
                FROM hit GROUP BY 1, 2)
            SELECT lang, q_pct, (bucket * 64)::BIGINT AS est, n FROM f
        """,
        # image_decode_roundtrip: intentionally omitted (rows-only check) —
        # binary image codecs are not SQL-expressible.
        # text_bpe_tokens: intentionally omitted (rows-only check) — BPE
        # training/encode is an iterative merge loop; every row carries a
        # self-verifying ``ok`` (detokenization identity + count bounds).
    }
