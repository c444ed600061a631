"""KMV (k-minimum-values) synopses: one deterministic, mergeable
structure that yields BOTH a uniform distinct-value sample and a
distinct-count estimate (Bar-Yossef et al. 2002; Beyer et al., SIGMOD
2007, "On synopses for distinct value estimation under multiset
operations" — the unbiased estimator (k−1)/U_(k)).

Why alongside the HLL gate (operators/sketches.py): HLL registers give a
cardinality estimate only; the KMV synopsis additionally IS a uniform
without-replacement sample of the distinct values (hash-order sampling),
so the same k rows drive dedup-rate dashboards, per-host URL sampling
for manual inspection, and set-operation estimates (union = merge, then
re-trim to k; intersection via the Jaccard of synopses). Everything is
the engine-portable polynomial fingerprint — no randomness, replays and
merges are bit-identical.

Arithmetic: hashes live in [0, M−1], M = 2^31 − 1 (functions/text.
fingerprint64). With U_(k) ≈ h_k/M the Beyer estimator (k−1)/U_(k)
becomes D̂ = (k−1)·M div h_k — exact int64 division; when a group holds
fewer than k distinct hashes the synopsis is the whole distinct set and
the count is EXACT (n_kept), the estimator's standard exact regime.

100 TB shape: one distinct aggregate keyed (group, hash) with map-side
combine, then the partial+final WindowGroupLimit rank (each partition
ships ≤ k rows per group — the same plan shape as the anchor top-k), so
a hot group never concentrates more than k rows per upstream partition.
Merging two epochs' synopses = union + re-rank + trim, the same window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from newsfeeds_crawler_spark.functions.text import fingerprint64_arrow

KMV_K = 64
FP_M = 2_147_483_647  # fingerprint64 modulus (2^31 − 1); hashes < M


def kmv_synopsis(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """Per-group k smallest distinct value hashes:
    (group, value, h, rk ∈ 1..k).

    Hash ties (fingerprint collisions across distinct values) break on
    the value itself, so the synopsis is a pure function of the value
    SET — partition- and merge-order-invariant."""
    hashed = (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(value_col).cast("string").alias("value"),
        )
        .distinct()
        .withColumn("h", fingerprint64_arrow(F.col("value")))
    )
    w = Window.partitionBy("grp").orderBy("h", "value")
    return (
        hashed.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= int(k))
        .select(F.col("grp").alias(group_col), "value", "h", "rk")
    )


def kmv_estimate(
    synopsis: DataFrame,
    group_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """Distinct-count estimate per group from a synopsis:
    (group, n_kept, est_distinct).

    n_kept < k ⇒ the synopsis saw every distinct value ⇒ exact count;
    otherwise D̂ = (k−1)·M div h_(k) (Beyer et al. unbiased form)."""
    agg = synopsis.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.max("h").cast("bigint").alias("__hk"),
    )
    kk = F.lit(int(k)).cast("bigint")
    num = (kk - 1) * F.lit(FP_M).cast("bigint")
    # h_(k) = 0 only when "" is among the k smallest (fingerprint64('')=0);
    # clamp to 1 — the estimate saturates instead of dividing by zero.
    # The division is exact in doubles: q·h and h are both < 2^53.
    hk = F.greatest(F.col("__hk"), F.lit(1).cast("bigint"))
    est = F.when(F.col("n_kept") < kk, F.col("n_kept")).otherwise(
        ((num - num % hk) / hk).cast("bigint")
    )
    return agg.select(group_col, "n_kept", est.alias("est_distinct"))
