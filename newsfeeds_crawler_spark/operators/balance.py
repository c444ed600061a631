"""Balanced shard assignment by zig-zag (boustrophedon) ranking — the
deterministic, shuffle-friendly approximation of LPT (longest-processing-
time) greedy bin packing used to lay out training shards with near-equal
token mass (and map tasks with near-equal bytes).

Items are ranked by descending weight; rank r goes to shard
``r mod W`` on even passes and ``W−1−(r mod W)`` on odd passes
(serpentine order), so each pass hands every shard exactly one item and
adjacent passes reverse direction — the heaviest and lightest items of
consecutive passes pair up. For W shards and n ≥ W items the resulting
imbalance is bounded by the largest single weight (LPT-style guarantee;
with serpentine pairing the max−min gap after any EVEN number of full
passes is at most max_weight − min_weight of one pass pair); the unit
test pins a ≤ 2·max_weight bound plus exactness on planted inputs.

Everything is one global rank — planned as the partial+final top-k-free
sort window — plus map-side arithmetic: cross-engine exact (int64 only),
so the gate hash-checks. At 10^9 items a single global rank window is
the honest cost; when even that is too hot, rank within
``pre_group`` instead (per-source serpentine, the same column), which
this operator exposes as an optional grouping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zigzag_shards(
    items: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
    group_col: str | None = None,
) -> DataFrame:
    """Assign each item a shard: (*group, id, weight, rank, shard).

    Rank orders by (weight desc, id) — deterministic under ties; shard =
    serpentine(rank). With ``group_col`` the serpentine runs per group
    (per-source balanced shards, no global window)."""
    w = int(n_shards)
    if group_col is None:
        win = Window.orderBy(F.col("__wt").desc(), F.col(id_col))
        gcols: list[str] = []
    else:
        win = Window.partitionBy(group_col).orderBy(
            F.col("__wt").desc(), F.col(id_col)
        )
        gcols = [group_col]
    base = items.select(
        *gcols,
        F.col(id_col),
        F.col(weight_col).cast("bigint").alias("__wt"),
    )
    rank = F.row_number().over(win) - 1
    ranked = base.withColumn("rank", rank.cast("bigint"))
    pass_no = F.expr(f"rank div {w}")
    pos = F.col("rank") % w
    shard = F.when(pass_no % 2 == 0, pos).otherwise(w - 1 - pos)
    return ranked.select(
        *gcols,
        id_col,
        F.col("__wt").alias(weight_col),
        "rank",
        shard.cast("int").alias("shard"),
    )


def shard_balance_stats(assigned: DataFrame, weight_col: str = "n_tokens",
                        group_col: str | None = None) -> DataFrame:
    """Per-shard mass + the imbalance a training run cares about."""
    keys = ([group_col] if group_col else []) + ["shard"]
    return assigned.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(weight_col).cast("bigint").alias("total_weight"),
    )
