"""Gap-based sessionization: segment an ordered event stream into sessions
wherever the inter-event gap exceeds a threshold — the standard operator a
crawl/metrics pipeline uses to turn raw fetch or user events into per-host
fetch sessions / per-user activity sessions (e.g. for politeness-stall
analysis or training-data session windows).

Exactness: gaps are compared in integer MICROSECONDS (``unix_micros`` /
DuckDB ``epoch_us``), the new-session flag is 0/1, and the session id is a
cumulative int sum — no floats anywhere, so the segmentation is
bit-identical across engines and partitionings and the gate hash-matches.

100 TB shape: one shuffle on the partition key (user/host) feeds both
window passes (lag → cumulative sum; same window spec, so Spark reuses the
sort) and the final per-session aggregate — cost ∝ |events|, bounded by
the hottest key's partition (hot hosts are exactly what the crawl's
salting handles upstream). No driver state, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_US = 1800 * 1_000_000  # 30 min


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_us: int = SESSION_GAP_US,
) -> DataFrame:
    """Per-key sessions: a new session starts at the first event and at
    every event whose gap from the previous one exceeds ``gap_us``.

    Output per (key, session): ``session_id`` (1-based within key),
    ``n_events``, ``start_us``, ``end_us``, ``duration_us`` — all exact
    int64.
    """
    # parquet ts columns are TIMESTAMP_NTZ; the session timezone is pinned
    # to UTC (session.py), so the cast is the identity mapping DuckDB's
    # epoch_us applies to naive timestamps
    base = events.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(w)
    flagged = base.select(
        "user_id",
        "event_id",
        "ts_us",
        F.when(prev.isNull() | (F.col("ts_us") - prev > gap_us), 1)
        .otherwise(0)
        .alias("ns"),
    )
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = flagged.select(
        "user_id",
        "ts_us",
        F.sum("ns").over(wc).cast("bigint").alias("session_id"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        (F.max("ts_us") - F.min("ts_us")).cast("bigint").alias("duration_us"),
    )
