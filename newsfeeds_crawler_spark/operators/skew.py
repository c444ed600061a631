"""Data-driven skew planning: turn per-key frequency stats into salting
fan-outs — the operational form of the hot-host salting the politeness
scheduler applies (SURVEY §2.5: "salted repartitionByRange on host_hash"
per north_rule) and of AQE's skew-join splitting, but for the plan nodes
AQE cannot rewrite (window partitions, stateful-gate keys, bucketed state
merges).

A key whose row count exceeds ``target_rows`` gets
``fanout = clamp(ceil(n / target_rows), 1, max_fanout)`` sub-keys; rows
then carry ``salt = pmod(xxhash64(row-discriminator), fanout)``, so the
hot key's window/aggregate work spreads over ``fanout`` partitions.
Integer arithmetic throughout (ceil = (n + t − 1) div t), so the plan is
bit-identical on any engine/partitioning and the gate hash-checks.

100 TB shape: the plan derives from a key-count aggregate (map-side
combinable, reducer rows ∝ distinct keys — or a fixed-rate SAMPLE of the
input when even distinct keys are huge; counts then scale by the inverse
rate, same arithmetic). Only hot rows (fanout > 1) matter downstream, so
``apply_salt`` broadcasts the hot subset of the plan — bounded by
|rows| / target_rows, a few thousand keys even at 10^10 rows — and every
cold row short-circuits to salt 0 without touching the dimension.

The two-phase consumer shape (partial per (key, salt), final per key) is
the standard salted-aggregate contract; for the politeness window the
engine instead salts only ENQUEUE-time sequencing, which is why the plan
here stops at (key, fanout) and leaves phase-2 semantics to the caller.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TARGET_ROWS = 1_000_000  # rows per task a window/agg comfortably holds
MAX_FANOUT = 256


def key_counts(df: DataFrame, key_col: str) -> DataFrame:
    """Per-key row counts: (key, n_rows). One map-side-combinable hash
    aggregate; feed a sampled frame when distinct keys explode."""
    return df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )


def salt_plan(
    counts: DataFrame,
    target_rows: int = TARGET_ROWS,
    max_fanout: int = MAX_FANOUT,
) -> DataFrame:
    """Fan-out plan from key counts: (key, n_rows, fanout:int, hot:bool).

    fanout = clamp(ceil(n_rows / target_rows), 1, max_fanout); ``hot``
    marks keys that actually split (the only rows a consumer must ship).
    """
    t = int(target_rows)
    fanout = F.least(
        F.greatest(
            F.expr(f"(n_rows + {t} - 1) div {t}").cast("bigint"), F.lit(1)
        ),
        F.lit(int(max_fanout)).cast("bigint"),
    ).cast("int")
    return counts.select(
        "key",
        "n_rows",
        fanout.alias("fanout"),
        (fanout > 1).alias("hot"),
    )


def apply_salt(
    df: DataFrame,
    plan: DataFrame,
    key_col: str,
    discriminator: Column,
) -> DataFrame:
    """Attach ``salt`` (0-based, < fanout) and ``fanout`` columns.

    ``discriminator`` is any deterministic per-row column (a row id, the
    URL hash) — NOT random — so replays salt identically. Only the hot
    subset of the plan is broadcast; cold keys take salt 0 / fanout 1
    via the null-extension of the left join."""
    hot = plan.filter(F.col("hot")).select(
        F.col("key").alias(key_col), "fanout"
    )
    joined = df.join(F.broadcast(hot), key_col, "left")
    fo = F.coalesce(F.col("fanout"), F.lit(1)).cast("int")
    return joined.withColumn("fanout", fo).withColumn(
        "salt", F.pmod(F.xxhash64(discriminator), fo).cast("int")
    )
