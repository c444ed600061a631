"""True stateful-streaming politeness gate — ``applyInPandasWithState``.

The foreachBatch front-end (frontier_stream.py) re-reads its seen/pending
state from parquet every micro-batch. This module is the idiomatic
Structured Streaming alternative: per-host crawl state lives in the
streaming state store (checkpointed, exactly-once), and the politeness
discipline runs as a keyed stateful operator:

- W1: within a host, tasks admit in ``seq`` (FIFO) order;
- W2: at most ONE admission per host per gate tick;
- W3: a host is admissible only every ``delay_batches`` ticks
  (its crawl-delay budget, virtual time = gate invocations);
- non-admitted rows persist in the host's state and drain on later ticks.

The global worker cap (W4) is deliberately NOT here: a keyed operator
sees one host group at a time, so a global cap needs the downstream
top-k (see operators/politeness.admit) over this gate's output. The gate
is the stateful, scale-bearing part — state is partitioned by host across
executors exactly like the reference's per-host ``hostAccessMap``
(HttpManager.scala:30,96-102) but sharded, checkpointed, and replayable.

Caveat (documented, inherent to keyed state): a host's group function
only runs on ticks where the batch carries rows for that host or a
timeout fires; ``stream_host_gate(timeout=True)`` therefore arms a
processing-time timeout — re-armed while parked rows remain — so parked
rows drain even when no new input arrives for the host. The
batch-equivalence test drives data-carrying ticks only (availableNow,
no timeout), which is the deterministic subset; the drain test pins the
timeout path.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

GATE_OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("url", StringType(), False),
        StructField("url_canon", StringType(), False),
        StructField("url_hash", LongType(), False),
        StructField("seq", LongType(), False),
        StructField("gate_tick", IntegerType(), False),  # admission tick
    ]
)

# per-host crawl state: virtual tick counter, last admission tick, and the
# parked FIFO remainder (urls ∥ canon ∥ hashes ∥ seqs kept aligned)
GATE_STATE_SCHEMA = StructType(
    [
        StructField("ticks", IntegerType()),
        StructField("last_admit", IntegerType()),
        StructField("p_urls", StringType()),    # \x1f-joined (state rows
        StructField("p_canon", StringType()),   # must be flat; arrays of
        StructField("p_seqs", StringType()),    # strings encode the queue)
        StructField("p_hashes", StringType()),
    ]
)

_SEP = "\x1f"


def _gate_fn(delay_batches: int):
    def gate(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        host = key[0]
        if state.exists:
            ticks, last_admit, pu, pc, ps, ph = state.get
            pend = list(zip(
                pu.split(_SEP) if pu else [],
                pc.split(_SEP) if pc else [],
                [int(x) for x in ps.split(_SEP)] if ps else [],
                [int(x) for x in ph.split(_SEP)] if ph else [],
            ))
        else:
            ticks, last_admit, pend = 0, -(10**9), []
        for pdf in pdfs:
            for _, r in pdf.iterrows():
                pend.append(
                    (r["url"], r["url_canon"], int(r["seq"]), int(r["url_hash"]))
                )
        pend.sort(key=lambda t: t[2])  # W1: FIFO by seq
        ticks += 1
        admitted = []
        if pend and ticks - last_admit >= delay_batches:  # W3 budget
            admitted.append(pend.pop(0))                  # W2 top-1
            last_admit = ticks
        state.update((
            ticks,
            last_admit,
            _SEP.join(t[0] for t in pend),
            _SEP.join(t[1] for t in pend),
            _SEP.join(str(t[2]) for t in pend),
            _SEP.join(str(t[3]) for t in pend),
        ))
        # drain guarantee: while parked rows remain, keep the processing-time
        # timeout armed — INCLUDING on timed-out invocations. A host with N
        # parked rows and no further input needs N admission firings; arming
        # only on data invocations (hasTimedOut False) would drain exactly
        # one row after the first timeout and then stall forever.
        if pend and hasattr(state, "setTimeoutDuration"):
            try:
                state.setTimeoutDuration(1000)  # drain parked rows
            except Exception:
                pass  # NoTimeout config (batch-equivalence tests)
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

    return gate


def stateful_host_gate(
    frontier: DataFrame,
    delay_batches: int = 1,
    timeout: bool = False,
) -> DataFrame:
    """Apply the keyed politeness gate to a (streaming or batch) frontier
    DataFrame with columns (url, url_canon, url_hash, host, seq)."""
    conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout
        else GroupStateTimeout.NoTimeout
    )
    return frontier.groupBy("host").applyInPandasWithState(
        _gate_fn(delay_batches),
        GATE_OUTPUT_SCHEMA,
        GATE_STATE_SCHEMA,
        "append",
        conf,
    )


def stream_host_gate(
    spark,
    frontier_dir: str,
    workdir: str,
    schema,
    delay_batches: int = 1,
    max_files_per_trigger: int = 1,
    timeout: bool = False,
    trigger_secs: float = 0.0,
):
    """Streaming deployment: files land in ``frontier_dir``, admitted rows
    append to ``workdir``/gated, state lives in the streaming checkpoint.

    ``timeout=False`` (default) runs ``availableNow``: drain the input
    directory, one micro-batch per file, then stop — the deterministic mode
    the batch-equivalence test pins. ``timeout=True`` runs a continuous
    ``processingTime`` trigger with the gate's processing-time timeout
    armed, so parked rows drain even when no new input arrives for their
    host (the long-running deployment mode); stop the query explicitly."""
    import os

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(frontier_dir)
    )
    gated = stateful_host_gate(
        stream.select("url", "url_canon", "url_hash", "host", "seq"),
        delay_batches=delay_batches,
        timeout=timeout,
    )
    writer = gated.writeStream
    if timeout:
        writer = writer.trigger(processingTime=f"{max(trigger_secs, 1.0)} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return (
        writer.option("checkpointLocation", os.path.join(workdir, "_gate_ckpt"))
        .format("parquet")
        .option("path", os.path.join(workdir, "gated"))
        .start()
    )
