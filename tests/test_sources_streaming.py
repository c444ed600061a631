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


def _land_batches(spark, tmp_path, frontier_dir, batches, schema, tag=""):
    os.makedirs(frontier_dir, exist_ok=True)
    for b, rows in enumerate(batches):
        df = spark.createDataFrame(rows, schema)
        stage = str(tmp_path / f"tws{tag}{b}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        for fn in os.listdir(stage):
            if fn.endswith(".parquet"):
                os.rename(f"{stage}/{fn}", f"{frontier_dir}/batch{b}.parquet")
        time.sleep(1.1)


def _mk_gate_batches(hosts, n_batches=3, per_host=2):
    batches, seq = [], 0
    for _ in range(n_batches):
        rows = []
        for h in hosts:
            for _ in range(per_host):
                rows.append((f"u{seq}", f"u{seq}", seq * 7, h, None, seq))
                seq += 1
        batches.append(rows)
    return batches


class _FakeValueState:
    def __init__(self):
        self.v = None

    def exists(self):
        return self.v is not None

    def get(self):
        return self.v

    def update(self, v):
        self.v = tuple(v)

    def clear(self):
        self.v = None


class _FakeListState:
    def __init__(self):
        self.v = None

    def exists(self):
        return self.v is not None

    def get(self):
        return iter(self.v or [])

    def put(self, rows):
        self.v = [tuple(t) for t in rows]

    def clear(self):
        self.v = None


class _FakeHandle:
    """In-memory StatefulProcessorHandle: per-key state + timer registry —
    lets the HostGateProcessor state machine run without the TWS runtime
    (which needs the protobuf wire protocol, absent in this sandbox)."""

    def __init__(self):
        self.states = {}
        self.timers = set()
        self.key = None

    def getValueState(self, name, schema, ttlDurationMs=None):
        return _KeyedProxy(self, name, _FakeValueState)

    def getListState(self, name, schema, ttlDurationMs=None):
        return _KeyedProxy(self, name, _FakeListState)

    def registerTimer(self, ts):
        self.timers.add((self.key, ts))

    def _state(self, name, cls):
        return self.states.setdefault((self.key, name), cls())


class _KeyedProxy:
    """Routes state calls to the handle's current key (the runtime scopes
    state per grouping key; the fake reproduces that with a key switch)."""

    def __init__(self, handle, name, cls):
        self.h, self.name, self.cls = handle, name, cls

    def __getattr__(self, attr):
        return getattr(self.h._state(self.name, self.cls), attr)


class _FakeTimerValues:
    def __init__(self, now_ms=0):
        self.now = now_ms

    def getCurrentProcessingTimeInMs(self):
        return self.now

    def getCurrentWatermarkInMs(self):
        return -1


def test_tws_processor_matches_applyinpandaswithstate(spark, tmp_path):
    """The HostGateProcessor state machine (driven through an in-memory
    handle — see tws_gate module docstring on runtime gating) must produce
    the SAME admission sequence as the streamed applyInPandasWithState
    gate on the same batch sequence."""
    import pandas as pd

    from newsfeeds_crawler_spark.streaming.frontier_stream import (
        FRONTIER_STREAM_SCHEMA,
    )
    from newsfeeds_crawler_spark.streaming.stateful_gate import stream_host_gate
    from newsfeeds_crawler_spark.streaming.tws_gate import HostGateProcessor

    batches = _mk_gate_batches(["h0", "h1"])
    delay = 2

    old_in = str(tmp_path / "old_in")
    _land_batches(spark, tmp_path, old_in, batches, FRONTIER_STREAM_SCHEMA, "a")
    q1 = stream_host_gate(
        spark, old_in, str(tmp_path / "old_wd"), FRONTIER_STREAM_SCHEMA,
        delay_batches=delay,
    )
    q1.awaitTermination(120)
    got_old = {
        (r.host, r.seq, r.gate_tick)
        for r in spark.read.parquet(
            os.path.join(str(tmp_path / "old_wd"), "gated")
        ).collect()
    }

    proc = HostGateProcessor(delay)
    handle = _FakeHandle()
    proc.init(handle)
    got_new = set()
    for rows in batches:
        for h in ["h0", "h1"]:
            handle.key = h
            pdf = pd.DataFrame(
                [r for r in rows if r[3] == h],
                columns=["url", "url_canon", "url_hash", "host",
                         "enqueue_ts", "seq"],
            )
            for out in proc.handleInputRows((h,), iter([pdf]),
                                            _FakeTimerValues()):
                got_new.update(
                    zip(out["host"], out["seq"], out["gate_tick"])
                )
    assert got_new == got_old and got_new


def test_tws_processor_timer_drain_and_rearm():
    """handleExpiredTimer drains one parked row per firing and re-arms
    the timer while rows remain — N parked rows with no input drain in
    exactly N firings, FIFO."""
    import pandas as pd

    from newsfeeds_crawler_spark.streaming.tws_gate import HostGateProcessor

    proc = HostGateProcessor(1, timers=True)
    handle = _FakeHandle()
    proc.init(handle)
    handle.key = "h0"
    pdf = pd.DataFrame(
        [(f"u{i}", f"u{i}", i * 7, "h0", None, i) for i in range(3)],
        columns=["url", "url_canon", "url_hash", "host", "enqueue_ts", "seq"],
    )
    admitted = []
    for out in proc.handleInputRows(("h0",), iter([pdf]), _FakeTimerValues(0)):
        admitted.extend(zip(out["seq"], out["gate_tick"]))
    assert admitted == [(0, 1)]
    assert handle.timers  # parked rows → timer armed

    class _Exp:
        def getExpiryTimeInMs(self):
            return 0

    fires = 0
    while handle.timers and fires < 10:
        handle.timers.clear()  # runtime consumes the expired timer
        for out in proc.handleExpiredTimer(
            ("h0",), _FakeTimerValues(1000 * (fires + 1)), _Exp()
        ):
            admitted.extend(zip(out["seq"], out["gate_tick"]))
        fires += 1
    assert [s for s, _ in admitted] == [0, 1, 2]  # FIFO, all drained
    assert fires == 2  # re-armed exactly while rows remained
    ticks = [t for _, t in admitted]
    assert ticks[0] < ticks[1] < ticks[2]


def test_tws_gate_matches_applyinpandaswithstate(spark, tmp_path):
    """transformWithStateInPandas gate (typed ListState queue + ValueState
    clock, RocksDB store) must produce the SAME admission sequence as the
    applyInPandasWithState gate on the same frontier files."""
    from newsfeeds_crawler_spark.streaming.frontier_stream import (
        FRONTIER_STREAM_SCHEMA,
    )
    from newsfeeds_crawler_spark.streaming.stateful_gate import stream_host_gate
    from newsfeeds_crawler_spark.streaming.tws_gate import (
        HAS_TWS,
        stream_host_gate_tws,
    )

    if not HAS_TWS:
        import pytest

        pytest.skip(
            "TWS runtime unavailable (needs Spark>=4 API + protobuf runtime)"
        )

    batches = _mk_gate_batches(["h0", "h1"])
    delay = 2

    old_in = str(tmp_path / "old_in")
    _land_batches(spark, tmp_path, old_in, batches, FRONTIER_STREAM_SCHEMA, "a")
    q1 = stream_host_gate(
        spark, old_in, str(tmp_path / "old_wd"), FRONTIER_STREAM_SCHEMA,
        delay_batches=delay,
    )
    q1.awaitTermination(120)

    new_in = str(tmp_path / "new_in")
    _land_batches(spark, tmp_path, new_in, batches, FRONTIER_STREAM_SCHEMA, "b")
    q2 = stream_host_gate_tws(
        spark, new_in, str(tmp_path / "new_wd"), FRONTIER_STREAM_SCHEMA,
        delay_batches=delay,
    )
    q2.awaitTermination(120)

    def rows(wd):
        return {
            (r.host, r.seq, r.gate_tick)
            for r in spark.read.parquet(
                os.path.join(str(tmp_path / wd), "gated")
            ).collect()
        }

    got_old, got_new = rows("old_wd"), rows("new_wd")
    assert got_new == got_old and got_new  # non-empty, exact equivalence


def test_tws_gate_timers_drain_all_parked_rows(spark, tmp_path):
    """Per-host registerTimer drain: a host with N parked rows and NO
    further input drains all N (one per firing), FIFO, the timer re-armed
    from handleExpiredTimer while rows remain."""
    from newsfeeds_crawler_spark.streaming.frontier_stream import (
        FRONTIER_STREAM_SCHEMA,
    )
    from newsfeeds_crawler_spark.streaming.tws_gate import (
        HAS_TWS,
        stream_host_gate_tws,
    )

    if not HAS_TWS:
        import pytest

        pytest.skip(
            "TWS runtime unavailable (needs Spark>=4 API + protobuf runtime)"
        )

    frontier_dir = str(tmp_path / "twsd_in")
    rows = [(f"u{i}", f"u{i}", i * 7, "h0", None, i) for i in range(3)]
    _land_batches(
        spark, tmp_path, frontier_dir, [rows], FRONTIER_STREAM_SCHEMA, "d"
    )
    workdir = str(tmp_path / "twsd_wd")
    q = stream_host_gate_tws(
        spark, frontier_dir, workdir, FRONTIER_STREAM_SCHEMA,
        delay_batches=1, timers=True,
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
    ticks = {r.seq: r.gate_tick for r in got.collect()}
    assert set(ticks) == {0, 1, 2}
    assert ticks[0] < ticks[1] < ticks[2]  # FIFO drain order
