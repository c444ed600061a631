"""Politeness gate on Spark 4's ``transformWithStateInPandas``.

The successor API to ``applyInPandasWithState`` (stateful_gate.py): the
same per-host W1–W3 discipline —

- W1: within a host, tasks admit in ``seq`` (FIFO) order;
- W2: at most ONE admission per host per gate tick;
- W3: a host is admissible only every ``delay_batches`` ticks —

but expressed with the new API's strengths instead of the old one's
workarounds:

- **Typed composite state.** The parked FIFO queue is a ``ListState`` of
  (url, url_canon, seq, url_hash) tuples and the tick clock a two-field
  ``ValueState`` — no ``\\x1f``-joined string encoding of the queue the
  flat single-row state of ``applyInPandasWithState`` forced.
- **Explicit per-key timers.** Drain-without-input uses
  ``handle.registerTimer`` + ``handleExpiredTimer`` (one timer per host,
  re-armed while its queue is non-empty) instead of the blanket
  ``setTimeoutDuration`` on every invocation.
- **RocksDB state store.** ``transformWithState`` requires the RocksDB
  provider — which is also the store that survives 10^5-host state at
  scale (changelog checkpointing, no executor-heap residency).

Semantics are pinned equal to the old gate by
``test_tws_gate_matches_applyinpandaswithstate``: same frontier files →
byte-identical admission sequence (host, seq, gate_tick).

Timer semantics caveat (inherent to the API, documented not hidden):
processing-time timers fire on wall-clock and drain parked rows with no
further input — the long-running deployment mode. Event-time timers fire
only when the WATERMARK advances, and the watermark only advances when
new data arrives; a drain-without-input guarantee is therefore
impossible in event-time mode, so ``time_mode="eventTime"`` is supported
for pipelines that want replay-deterministic drains keyed to the data's
own clock, while the default drain mode stays processing-time (mirror of
stateful_gate.py).

Reference analog: per-host crawl state in ``HttpManager.hostAccessMap``
(HttpManager.scala:30,96-102) — here sharded across executors, stored in
RocksDB, checkpointed, and replayable.

Runtime gating: executing a TWS query needs the protobuf runtime (the
state server speaks ``pyspark/sql/streaming/proto/StateMessage_pb2``);
``HAS_TWS`` is True only when both the Spark 4 API and protobuf are
present. The processor's state machine itself is pure Python over the
handle interfaces, so ``test_tws_processor_matches_applyinpandaswithstate``
pins gate equivalence by driving ``HostGateProcessor`` through an
in-memory handle on every environment; the end-to-end streaming-query
equivalence/drain tests additionally run wherever protobuf is installed.
"""

from __future__ import annotations

import os
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame

from .stateful_gate import GATE_OUTPUT_SCHEMA

try:  # Spark >= 4.0
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    HAS_TWS_API = True
except ImportError:  # pragma: no cover - older Spark
    HAS_TWS_API = False
    StatefulProcessor = object  # type: ignore[assignment,misc]

try:
    # the TWS state-server protocol is protobuf-framed
    # (pyspark/sql/streaming/proto/StateMessage_pb2) — the python API can
    # be present while the protobuf RUNTIME is not; gate on both so the
    # processor class stays importable/testable everywhere and only query
    # EXECUTION requires the full runtime
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAS_PROTOBUF = True
except ImportError:  # pragma: no cover - minimal sandboxes
    HAS_PROTOBUF = False

HAS_TWS = HAS_TWS_API and HAS_PROTOBUF

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

_PARKED_SCHEMA = "url string, url_canon string, seq bigint, url_hash bigint"
_CLOCK_SCHEMA = "ticks int, last_admit int"
_NEVER = -(10**9)


class HostGateProcessor(StatefulProcessor):
    """Keyed W1–W3 politeness state machine (one instance per partition,
    state resolved per key by the handle)."""

    def __init__(self, delay_batches: int, timers: bool = False,
                 timer_interval_ms: int = 1000):
        self.delay = int(delay_batches)
        self.timers = timers
        self.timer_interval_ms = timer_interval_ms

    # ------------------------------------------------------------- API
    def init(self, handle: "StatefulProcessorHandle") -> None:
        self.handle = handle
        self.clock = handle.getValueState("clock", _CLOCK_SCHEMA)
        self.parked = handle.getListState("parked", _PARKED_SCHEMA)

    def handleInputRows(
        self,
        key: Tuple[Any, ...],
        rows: Iterator[pd.DataFrame],
        timerValues: "TimerValues",
    ) -> Iterator[pd.DataFrame]:
        new = []
        for pdf in rows:
            new.extend(
                zip(
                    pdf["url"].astype(str),
                    pdf["url_canon"].astype(str),
                    (int(s) for s in pdf["seq"]),
                    (int(h) for h in pdf["url_hash"]),
                )
            )
        yield from self._tick(key[0], new, timerValues)

    def handleExpiredTimer(
        self,
        key: Tuple[Any, ...],
        timerValues: "TimerValues",
        expiredTimerInfo: "ExpiredTimerInfo",
    ) -> Iterator[pd.DataFrame]:
        # a drain firing is a gate tick with no new input; the expired
        # timer is consumed, _tick re-arms one iff rows remain parked
        yield from self._tick(key[0], [], timerValues)

    def close(self) -> None:
        pass

    # ----------------------------------------------------------- logic
    def _tick(self, host, new_rows, timerValues) -> Iterator[pd.DataFrame]:
        got = self.clock.get() if self.clock.exists() else None
        ticks, last_admit = (int(got[0]), int(got[1])) if got else (0, _NEVER)
        pend = [
            (str(t[0]), str(t[1]), int(t[2]), int(t[3]))
            for t in self.parked.get()
        ] if self.parked.exists() else []
        pend.extend(new_rows)
        pend.sort(key=lambda t: t[2])  # W1: FIFO by seq
        ticks += 1
        admitted = []
        if pend and ticks - last_admit >= self.delay:  # W3 budget
            admitted.append(pend.pop(0))               # W2 top-1
            last_admit = ticks
        self.clock.update((ticks, last_admit))
        if pend:
            self.parked.put(pend)
            if self.timers:
                self.handle.registerTimer(
                    timerValues.getCurrentProcessingTimeInMs()
                    + self.timer_interval_ms
                )
        else:
            self.parked.clear()
        if admitted:
            yield pd.DataFrame(
                {
                    "host": [host] * len(admitted),
                    "url": [t[0] for t in admitted],
                    "url_canon": [t[1] for t in admitted],
                    "url_hash": [t[3] for t in admitted],
                    "seq": [t[2] for t in admitted],
                    "gate_tick": [ticks] * len(admitted),
                }
            )


def tws_host_gate(
    frontier: DataFrame,
    delay_batches: int = 1,
    timers: bool = False,
    time_mode: str | None = None,
) -> DataFrame:
    """Apply the gate to a streaming frontier DataFrame with columns
    (url, url_canon, url_hash, host, seq). ``time_mode`` defaults to
    "processingTime" when ``timers`` else "none" (the deterministic
    batch-equivalence mode; registerTimer is illegal in "none")."""
    mode = time_mode or ("processingTime" if timers else "none")
    return frontier.groupBy("host").transformWithStateInPandas(
        HostGateProcessor(delay_batches, timers=timers),
        GATE_OUTPUT_SCHEMA,
        "append",
        mode,
    )


def stream_host_gate_tws(
    spark,
    frontier_dir: str,
    workdir: str,
    schema,
    delay_batches: int = 1,
    max_files_per_trigger: int = 1,
    timers: bool = False,
    trigger_secs: float = 0.0,
):
    """Streaming deployment mirror of ``stateful_gate.stream_host_gate``:
    files land in ``frontier_dir``, admitted rows append to
    ``workdir``/gated, state lives in RocksDB under the checkpoint.

    ``timers=False`` (default) drains the input dir with ``availableNow``
    — the deterministic mode the equivalence test pins. ``timers=True``
    runs a continuous trigger with per-host processing-time timers so
    parked rows drain with no further input; stop the query explicitly.

    The RocksDB provider conf is set on the session before ``start()``
    (captured into the query) and restored after, so co-resident
    ``applyInPandasWithState`` queries keep their default provider.
    """
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(frontier_dir)
        )
        gated = tws_host_gate(
            stream.select("url", "url_canon", "url_hash", "host", "seq"),
            delay_batches=delay_batches,
            timers=timers,
        )
        writer = gated.writeStream
        if timers:
            writer = writer.trigger(
                processingTime=f"{max(trigger_secs, 1.0)} seconds"
            )
        else:
            writer = writer.trigger(availableNow=True)
        return (
            writer.option(
                "checkpointLocation", os.path.join(workdir, "_tws_ckpt")
            )
            .format("parquet")
            .option("path", os.path.join(workdir, "gated"))
            .start()
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
