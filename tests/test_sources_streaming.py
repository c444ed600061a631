"""sources/ (generative frontier, bucketed storage) and streaming/ (micro-
batch admission, watermark windows)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from newsfeeds_crawler_spark.sources.frontier import (
    generative_frontier,
    generative_seen,
    read_bucket,
    write_bucketed,
)
from newsfeeds_crawler_spark.streaming.frontier_stream import (
    _admit_batch,
    host_fetch_windows,
    read_admitted,
    stream_crawl,
)


def test_generative_frontier_shape_and_determinism(spark):
    f1 = generative_frontier(spark, 1000, 10)
    f2 = generative_frontier(spark, 1000, 10)
    assert f1.count() == 1000
    assert f1.select("host").distinct().count() == 10
    r1 = {r.id: r.url_hash for r in f1.collect()}
    r2 = {r.id: r.url_hash for r in f2.collect()}
    assert r1 == r2
    # canonical form is lower-case, port-stripped, slash-collapsed
    row = f1.filter(F.col("id") == 7).collect()[0]
    assert row.url_canon == "http://host7.example.com/page/7"


def test_generative_seen_hashes_agree_with_frontier(spark):
    f = generative_frontier(spark, 100, 10)
    s = generative_seen(spark, 50, 10, stride=2)
    hits = f.join(s, "url_hash", "left_semi").count()
    assert hits == 50  # exactly the even ids


def test_bucketed_write_prunes_partitions(spark, tmp_path):
    path = str(tmp_path / "bucketed")
    f = generative_frontier(spark, 500, 10)
    write_bucketed(f, path, num_buckets=8)
    one = read_bucket(spark, path, 3)
    # pruned read only touches bucket=3 files
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert one.count() > 0
    total = sum(
        read_bucket(spark, path, b).count() for b in range(8)
    )
    assert total == 500
    assert "bucket" in plan


def test_stream_crawl_matches_batch_semantics(spark, tmp_path):
    frontier_dir = str(tmp_path / "frontier_in")
    workdir = str(tmp_path / "stream_work")
    os.makedirs(frontier_dir)
    # two micro-batches, overlapping URLs: batch1 ids 0..99, batch2 50..149
    base = generative_frontier(spark, 150, 5).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        "url_canon",
        "url_hash",
        "host",
        F.lit(None).cast("timestamp").alias("enqueue_ts"),
        F.col("id").alias("seq"),
    )
    base.filter(F.col("seq") < 100).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "b1")
    )
    base.filter(F.col("seq") >= 50).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "b2")
    )
    # land batch files in order (separate mtimes so the stream sees b1 first)
    for i, src in enumerate(["b1", "b2"]):
        for fn in os.listdir(str(tmp_path / src)):
            if fn.endswith(".parquet"):
                os.rename(
                    str(tmp_path / src / fn), f"{frontier_dir}/batch{i}.parquet"
                )
        time.sleep(1.1)
    q = stream_crawl(spark, frontier_dir, workdir, workers=3)
    q.awaitTermination(120)
    admitted = read_admitted(spark, workdir)
    rows = admitted.orderBy("batch_id", "admit_rank").collect()
    # batch semantics: per batch, one URL per host (5 hosts), capped at 3
    for bid in {r.batch_id for r in rows}:
        batch_rows = [r for r in rows if r.batch_id == bid]
        assert len(batch_rows) <= 3
        hosts = [r.host for r in batch_rows]
        assert len(hosts) == len(set(hosts))
    # streamed seen-set: a URL admitted in batch 0 is never re-admitted
    seqs = [r.seq for r in rows]
    assert len(seqs) == len(set(seqs))


def test_host_fetch_windows_batch_semantics(spark):
    # watermark logic is exercised on a batch frame (same expression tree);
    # full streaming watermark behavior needs a long-running source
    df = spark.createDataFrame(
        [("h1", "2024-01-01 00:01:00"), ("h1", "2024-01-01 00:04:00"),
         ("h2", "2024-01-01 00:12:00")],
        ["host", "ts"],
    ).select("host", F.col("ts").cast("timestamp").alias("fetch_ts"))
    out = {
        (r.host, str(r.win_start)): r.n_fetched
        for r in host_fetch_windows(df).collect()
    }
    assert out[("h1", "2024-01-01 00:00:00")] == 2
    assert out[("h2", "2024-01-01 00:10:00")] == 1


def _stream_batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "url string, url_canon string, url_hash long, host string, "
        "enqueue_ts timestamp, seq long",
    )


def test_admit_batch_carries_pending_and_is_idempotent(spark, tmp_path):
    """Non-admitted rows must re-enter later batches (pending state), and
    replaying a batch must not duplicate any sink row."""
    wd = str(tmp_path / "wd")
    b0 = _stream_batch(spark, [
        ("u0", "u0", 10, "h0", None, 0),
        ("u1", "u1", 11, "h0", None, 1),   # loses host top-1
        ("u2", "u2", 12, "h1", None, 2),   # loses worker cap
    ])
    _admit_batch(b0, wd, workers=1, batch_id=0)
    got0 = read_admitted(spark, wd)
    assert [r.seq for r in got0.collect()] == [0]

    empty = _stream_batch(spark, [])
    _admit_batch(empty, wd, workers=1, batch_id=1)
    got01 = {r.seq for r in read_admitted(spark, wd).collect()}
    assert got01 == {0, 1}  # pending u1 carried in and admitted

    # replay batch 1 (checkpoint replay after crash): same state, no dups
    _admit_batch(empty, wd, workers=1, batch_id=1)
    rows = read_admitted(spark, wd).collect()
    assert sorted(r.seq for r in rows) == [0, 1]

    # batch 2 drains the remaining pending row
    _admit_batch(empty, wd, workers=1, batch_id=2)
    assert {r.seq for r in read_admitted(spark, wd).collect()} == {0, 1, 2}


def test_stateful_host_gate_matches_batch_politeness(spark, tmp_path):
    """applyInPandasWithState politeness gate: streamed admissions must
    equal a pure-python replay of the same per-host W1-W3 discipline
    (FIFO per host, top-1 per tick, crawl-delay budget in ticks)."""
    from newsfeeds_crawler_spark.streaming.frontier_stream import (
        FRONTIER_STREAM_SCHEMA,
    )
    from newsfeeds_crawler_spark.streaming.stateful_gate import stream_host_gate

    frontier_dir = str(tmp_path / "gate_in")
    workdir = str(tmp_path / "gate_wd")
    os.makedirs(frontier_dir)
    # 3 micro-batches; every batch carries rows for every host (the
    # deterministic subset of the gate's semantics — see module docstring)
    hosts = ["h0", "h1"]
    batches = []
    seq = 0
    for b in range(3):
        rows = []
        for h in hosts:
            for j in range(2):
                rows.append((f"u{seq}", f"u{seq}", seq * 7, h, None, seq))
                seq += 1
        batches.append(rows)
    for b, rows in enumerate(batches):
        df = spark.createDataFrame(rows, FRONTIER_STREAM_SCHEMA)
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"gb{b}"))
        for fn in os.listdir(str(tmp_path / f"gb{b}")):
            if fn.endswith(".parquet"):
                os.rename(
                    str(tmp_path / f"gb{b}" / fn),
                    f"{frontier_dir}/batch{b}.parquet",
                )
        time.sleep(1.1)

    delay = 2  # admissible every 2nd tick
    q = stream_host_gate(
        spark, frontier_dir, workdir, FRONTIER_STREAM_SCHEMA,
        delay_batches=delay,
    )
    q.awaitTermination(120)
    got = {
        (r.host, r.seq, r.gate_tick)
        for r in spark.read.parquet(os.path.join(workdir, "gated")).collect()
    }

    # pure-python replay of W1-W3 over the same tick sequence
    state = {h: {"pend": [], "ticks": 0, "last": -(10**9)} for h in hosts}
    want = set()
    for rows in batches:
        for h in hosts:
            st = state[h]
            st["pend"].extend(s for (_, _, _, hh, _, s) in rows if hh == h)
            st["pend"].sort()
            st["ticks"] += 1
            if st["pend"] and st["ticks"] - st["last"] >= delay:
                want.add((h, st["pend"].pop(0), st["ticks"]))
                st["last"] = st["ticks"]
    assert got == want and got  # non-empty, exact


def test_read_admitted_empty_workdir_returns_typed_empty(spark, tmp_path):
    """A fresh workdir (no committed batch yet) must read as an empty
    typed frame, not raise a zero-path error."""
    got = read_admitted(spark, str(tmp_path / "fresh"))
    assert got.count() == 0
    assert "url_hash" in got.columns and "admit_rank" in got.columns


def test_stateful_gate_timeout_drains_all_parked_rows(spark, tmp_path):
    """With the processing-time timeout armed, a host with N parked rows
    and NO further input must drain all N (one per firing) — the timeout
    re-arms while parked rows remain, including on timed-out firings."""
    from newsfeeds_crawler_spark.streaming.frontier_stream import (
        FRONTIER_STREAM_SCHEMA,
    )
    from newsfeeds_crawler_spark.streaming.stateful_gate import stream_host_gate

    frontier_dir = str(tmp_path / "drain_in")
    workdir = str(tmp_path / "drain_wd")
    os.makedirs(frontier_dir)
    rows = [(f"u{i}", f"u{i}", i * 7, "h0", None, i) for i in range(3)]
    df = spark.createDataFrame(rows, FRONTIER_STREAM_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "drain_b0"))
    for fn in os.listdir(str(tmp_path / "drain_b0")):
        if fn.endswith(".parquet"):
            os.rename(
                str(tmp_path / "drain_b0" / fn), f"{frontier_dir}/batch0.parquet"
            )

    q = stream_host_gate(
        spark, frontier_dir, workdir, FRONTIER_STREAM_SCHEMA,
        delay_batches=1, timeout=True,
    )
    gated_dir = os.path.join(workdir, "gated")
    try:
        deadline = time.time() + 90
        n = 0
        while time.time() < deadline:
            try:
                n = spark.read.parquet(gated_dir).count()
            except Exception:
                n = 0
            if n >= 3:
                break
            time.sleep(1.0)
    finally:
        q.stop()
    assert n == 3, f"only {n}/3 parked rows drained"
    got = spark.read.parquet(gated_dir)
    assert {r.seq for r in got.collect()} == {0, 1, 2}
    # FIFO within the host: admission tick order follows seq order
    ticks = {r.seq: r.gate_tick for r in got.collect()}
    assert ticks[0] < ticks[1] < ticks[2]
