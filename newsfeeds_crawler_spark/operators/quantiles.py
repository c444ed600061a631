"""Exact grouped quantiles by rank arithmetic — corpus length/score
distribution reporting (the per-language p50/p90/p99 length cuts a
filtering pipeline publishes alongside its keep-rates).

Exact, not sketched: the selected value is the element at 1-based rank
ceil(q·n/100) in the group's sorted order (PERCENTILE_DISC semantics),
computed with integer arithmetic — ``(q·n + 99) div 100`` — over a
row_number window. No interpolation, no floats, so any engine returns the
identical row and the DuckDB oracle hash-matches.

100 TB shape: ONE shuffle (the per-group sort window); the quantile filter
is a map-side predicate on (rn, n). Rank selection only depends on the
VALUE order, so ties need no tiebreak column. Cost is the per-group sort —
the honest price of exact order statistics; when groups are few and huge,
swap in a mergeable sketch (KLL/t-digest) and keep this as the verifier at
sample scale. Group skew = one straggler partition per hot group; at that
point quantiles-by-sketch is the scale path, which is why this operator
reports exact cuts and documents the handoff.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hist_registers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    width: int = 64,
) -> DataFrame:
    """Mergeable fixed-width histogram registers: (group, bucket:int, n).

    The scale handoff :func:`grouped_quantiles_exact`'s docstring promises:
    a 100 TB corpus doesn't sort per group per report — it maintains a
    histogram register table (bucket = ``value div width``, non-negative
    values) that merges across epochs/partitions by ADDING counts (the
    same register-table shape as ``sketches.cms_counts``), and reads
    quantiles off the cumulative counts. Register count ∝ groups ×
    (max_value/width), independent of row count; everything is int64, so
    registers AND estimates are bit-identical on any engine/partitioning.
    """
    return (
        df.select(
            group_col,
            F.col(value_col).cast("bigint").alias("__v"),
        )
        .groupBy(
            group_col,
            F.expr(f"__v div {int(width)}").cast("int").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def hist_quantiles(
    registers: DataFrame,
    group_col: str,
    qs_pct: Sequence[int] = (50, 90, 99),
    width: int = 64,
) -> DataFrame:
    """Quantile estimates from histogram registers →
    (group, q_pct:int, est, n:bigint).

    Same rank rule as the exact operator — 1-based rank
    ``(q·n + 99) div 100`` — resolved to the first bucket whose cumulative
    count reaches the rank; the estimate is that bucket's LOWER edge
    (``bucket · width``), so ``est ≤ exact < est + width`` always (the
    sketch guarantee the gate's ``ok`` column asserts). The window runs
    over registers (∝ groups × buckets), never over input rows.
    """
    w = Window.partitionBy(group_col).orderBy("bucket")
    wn = Window.partitionBy(group_col)
    cum = registers.select(
        group_col,
        "bucket",
        F.sum("n").over(w).cast("bigint").alias("cum"),
        F.sum("n").over(wn).cast("bigint").alias("n"),
    )
    qs = F.explode(
        F.array(*[F.lit(int(q)).cast("int") for q in qs_pct])
    ).alias("q_pct")
    ranked = cum.select(group_col, "bucket", "cum", "n", qs).filter(
        F.col("cum") >= F.expr("(q_pct * n + 99) div 100")
    )
    first = ranked.groupBy(group_col, "q_pct").agg(
        F.min("bucket").alias("bucket"), F.max("n").alias("n")
    )
    return first.select(
        group_col,
        "q_pct",
        (F.col("bucket").cast("bigint") * F.lit(int(width))).alias("est"),
        "n",
    )


def grouped_quantiles_exact(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs_pct: Sequence[int] = (50, 90, 99),
) -> DataFrame:
    """Per-group exact percentiles → (group, q_pct:int, value, n:bigint)."""
    reserved = {"rn", "n", "q_pct"}
    if group_col in reserved or value_col in reserved:
        raise ValueError(
            f"group/value columns may not be named {sorted(reserved)} — "
            "they collide with the output rank/count/quantile columns"
        )
    w = Window.partitionBy(group_col).orderBy(value_col)
    wn = Window.partitionBy(group_col)
    ranked = df.select(group_col, value_col).select(
        group_col,
        value_col,
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
    )
    qs = F.explode(
        F.array(*[F.lit(int(q)).cast("int") for q in qs_pct])
    ).alias("q_pct")
    return (
        ranked.select(group_col, value_col, "rn", "n", qs)
        .filter(F.col("rn") == F.expr("(q_pct * n + 99) div 100"))
        .select(group_col, "q_pct", value_col, "n")
    )


def adaptive_crawl_delay(
    latencies: DataFrame,
    host_col: str = "host",
    ms_col: str = "latency_ms",
    q_pct: int = 95,
    mult: int = 2,
    min_ms: int = 500,
    max_ms: int = 30000,
) -> DataFrame:
    """Adaptive per-host politeness delay from observed fetch latencies:
    ``delay_ms = clamp(mult × p{q_pct}(latency), min_ms, max_ms)`` — the
    standard server-load-respecting heuristic (e.g. the `Crawl-delay`
    guidance in IETF robots discussions and open crawlers like Heritrix
    pace requests off recent response times; a host answering slowly gets
    a longer delay, bounded both ways).

    Composes :func:`grouped_quantiles_exact`, so the percentile is the
    exact PERCENTILE_DISC rank selection — integer in, integer out, no
    interpolation — and the clamp is integer arithmetic: bit-identical on
    any engine/partitioning, hence the gate hash-checks. The output
    column set matches the engine's hosts-dimension delay column
    (``delay_ms``), so the frame joins straight onto the politeness
    scheduler as an override.

    100 TB shape: one per-host sort window ∝ |observations| (bounded by
    the hottest host; a latency log is naturally time-bucketed upstream,
    which caps it), then map-only arithmetic. The histogram-register
    sketch (:func:`hist_quantiles`) is the documented handoff when even
    per-host sorts stop being affordable.
    """
    q = grouped_quantiles_exact(latencies, host_col, ms_col, (q_pct,))
    raw = F.col(ms_col).cast("bigint") * F.lit(mult)
    return q.select(
        F.col(host_col),
        F.col("n").alias("n_samples"),
        F.col(ms_col).cast("bigint").alias(f"p{q_pct}_ms"),
        F.least(
            F.greatest(raw, F.lit(min_ms).cast("bigint")),
            F.lit(max_ms).cast("bigint"),
        ).alias("delay_ms"),
    )
