"""State-table schemas (SURVEY.md §1.3, FIXTURES.md §2).

Append-mode tables (articles/metrics/errors) must keep ONE schema across all
snapshots — every writer conforms through these StructTypes.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# parsedItemsMap + HttpManager.taskList analog (FeedManager.scala:37,
# HttpManager.scala:40) — one row per crawl task, FIFO key (e_epoch, e_rank, e_sub)
FRONTIER_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_canon", StringType(), False),
        StructField("url_hash", LongType(), False),
        StructField("host", StringType(), False),
        StructField("kind", StringType(), False),            # feed | article
        StructField("feed_canon", StringType(), True),
        StructField("parsed_pub_ts", TimestampType(), True),  # item ts from RSS
        StructField("e_epoch", IntegerType(), False),
        StructField("e_rank", IntegerType(), False),
        StructField("e_sub", IntegerType(), False),
        # priority frontier (north_star): admission orders by (priority,
        # FIFO key) ascending — 0.0 everywhere degenerates to the
        # reference's pure mailbox FIFO, which the equivalence oracle runs
        StructField("priority", DoubleType(), False),
        # state: pending | fetched | done | skipped | robots_denied |
        # quota_denied (host_pending_cap crawl-trap guard) | stalled
        StructField("state", StringType(), False),
        StructField("fetch_epoch", IntegerType(), True),
        StructField("admit_rank", IntegerType(), True),
    ]
)

# hostAccessMap analog (HttpManager.scala:30,131-143) + robots rules
HOSTS_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("host_hash", LongType(), False),
        StructField("delay_epochs", IntegerType(), False),
        StructField("robots_disallow", StringType(), True),
        StructField("last_access_epoch", IntegerType(), True),
        # number of pending frontier rows on this host — maintained
        # incrementally (per-tick deltas, never a frontier scan) ONLY when
        # the host_pending_cap crawl-trap guard is on; carried as-is (the
        # init-time seed counts) otherwise
        StructField("pending_count", LongType(), True),
    ]
)

# feed table analog (mysql-create-db.sql:1-5) + crawl progress
FEEDS_SCHEMA = StructType(
    [
        StructField("feed_canon", StringType(), False),
        StructField("url", StringType(), False),
        StructField("host", StringType(), False),
        StructField("seed_idx", IntegerType(), False),
        # state: pending | crawling | done | done_empty | dead
        StructField("state", StringType(), False),
        StructField("parsed_pub_ts", TimestampType(), True),  # A2 watermark value
        StructField("last_pub_ts", TimestampType(), True),    # persisted watermark
        StructField("done_epoch", IntegerType(), True),
        # A1 countdown state (parsedItemsMap.size analog, FeedManager.scala:37,
        # 153-162): maintained incrementally (+enqueued −processed per epoch)
        # so feed completion never scans the whole pending frontier
        StructField("pending_items", IntegerType(), True),
        # per-feed liveness clock (ReceiveTimeout analog, FeedManager.scala:
        # 31-33,67-69): last epoch this feed's countdown made progress
        # (items enqueued or processed) — maintained in the same touched-
        # bucket merge; the feed_stall_epochs sweep quarantines feeds whose
        # clock stops while the rest of the crawl proceeds
        StructField("last_progress_epoch", IntegerType(), True),
    ]
)

# article table analog (mysql-create-db.sql:7-14), append-only log;
# latest row per url_canon is the seen store / final article state
ARTICLES_SCHEMA = StructType(
    [
        StructField("url_canon", StringType(), False),
        StructField("url_hash", LongType(), False),
        StructField("article_id", LongType(), True),   # preseen ids; null for new
        StructField("pub_ts", TimestampType(), True),
        StructField("caption", StringType(), True),
        StructField("feed_canon", StringType(), True),
        StructField("action", StringType(), False),    # preseen | insert | update
        StructField("epoch", IntegerType(), False),
        StructField("phash", LongType(), True),        # corpus-declared
        StructField("w", IntegerType(), True),
        StructField("h", IntegerType(), True),
        StructField("fmt", StringType(), True),
        StructField("pixels", BinaryType(), True),     # decoded RGB (north_star)
        StructField("dec_phash", LongType(), True),    # recomputed from pixels
        # hive-style partition column (north_star: pixels+captions written
        # back "with explicit partitioning on host-bucket"); LAST because
        # partition columns come last on read
        StructField("host_bucket", IntegerType(), True),
    ]
)

METRICS_SCHEMA = StructType(
    [
        StructField("epoch", IntegerType(), False),
        StructField("host_bucket", IntegerType(), False),
        StructField("urls_fetched", LongType(), False),
        StructField("politeness_stalls", LongType(), False),
        StructField("dedup_hits", LongType(), False),
        StructField("enqueued", LongType(), False),
        StructField("robots_denied", LongType(), False),
    ]
)

ERRORS_SCHEMA = StructType(
    [
        StructField("epoch", IntegerType(), False),
        StructField("stage", StringType(), False),  # decode | parse | extract | stall_timeout
        StructField("url_canon", StringType(), True),
        StructField("error", StringType(), True),
        # the offending payload, dumped for debugging — the reference
        # writes it to a numbered file on parse and extraction failures
        # (util/ErrorDumping.scala:17-27, used from ParsingManager.scala:
        # 40-45 and ExtractionManager.scala:37-42); null for stages with
        # no body to dump (decode works on binary pixels, stalls have none)
        StructField("payload", StringType(), True),
    ]
)

# seen-probe store: ONE row per url_canon (latest pub_ts + preseen id),
# maintained incrementally per epoch — the probe path never re-derives
# latest-per-key from the append-only articles log
SEEN_URLS_SCHEMA = StructType(
    [
        StructField("url_canon", StringType(), False),
        StructField("url_hash", LongType(), False),
        StructField("article_id", LongType(), True),
        StructField("pub_ts", TimestampType(), True),
    ]
)

STATE_TABLES = [
    "frontier",      # pending tasks only — rewritten per epoch
    "frontier_heads",  # top-1-per-host head candidates (incremental admission)
    "frontier_log",  # terminal transitions — append-only
    "seen_urls",     # probe store — one row per URL, incrementally merged
    "hosts",
    "feeds",
    "articles",
    "metrics",
    "errors",
    "seen_filter",  # persisted bloom/cuckoo blobs (present when enabled)
    "robots_updates",  # mid-crawl robots refresh schedule (static, written once)
]
