"""Revisit scheduling from observed change rates — the incremental-crawl
freshness policy (Cho & Garcia-Molina, "Estimating Frequency of Change",
ACM TOIT 3(3) 2003; Coffman/Liu/Weber's earlier page-refresh analysis).

A feed revisited n times with X observed changes gets the bias-corrected
change-rate estimate r_hat = -ln((n - X + 1/2)/(n + 1/2)) changes per
observation interval (Cho & GM §4 — the naive X/n estimator
systematically underestimates fast-changing pages because a visit only
reveals *whether* a change happened since last time, not how many). The
revisit interval is then set inversely proportional to the estimated rate
(refresh effort ∝ change rate — proportional allocation), clamped both
ways so dead feeds are still probed occasionally and hot feeds don't
monopolize the frontier.

Cross-engine determinism (the reason this module owns a "log"): libm
``ln`` is NOT bit-stable between the JVM and C (Math.log is a platform
intrinsic; glibc may differ in the last ulp), so the rate is computed in
an integer-quantized log2: for int64 x ≥ 1,

    qlog2(x) = msb·S + (x·S div 2^msb) − S,   msb = length(bin(x)) − 1

— the piecewise-linear (mantissa) approximation of S·log2(x), exact at
powers of two, monotone, max error ≈ 0.086·S, pure int64 arithmetic
(``bin``/``length``/``div``/``<<`` exist in both Spark SQL and DuckDB),
so the gate hash-matches. With num = 2n+1 and den = 2(n−X)+1 the
estimator becomes rate_q = qlog2(num) − qlog2(den) ≥ 0 (S·log2 units of
the TOIT estimator: rate_q/S ≈ r_hat/ln 2; X=0 ⇒ 0, X=n ⇒ qlog2(2n+1)).
The interval rule is interval = clamp(S·target div max(rate_q, 1), lo,
hi): a feed estimated to change ~once per observation interval
(rate_q ≈ S·log2 e ≈ 1.44·S) revisits faster than one changing every
tenth visit, proportionally.

100 TB shape: one hash aggregate keyed on the feed id (map-side combine,
reducer rows ∝ distinct feeds, never history rows) followed by map-only
integer arithmetic — no window, no join, no driver round-trip. The
``next_fetch_epoch`` output joins onto the frontier as an admission
predicate (fetch iff current_epoch ≥ next_fetch_epoch), the same
dimension shape as the hosts politeness table, so the big-hosts
``dim_join`` modes apply unchanged.

Reference analog: the reference refetches every feed exactly once per run
(FeedManager.scala:46-51 — no revisit policy at all); this operator is
the scale-path replacement deciding *when* a feed re-enters the frontier
across runs, driven by the per-feed watermark/change history the engine
already persists (plans/driver.py watermark sink, S7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: fixed-point scale of the quantized log2 (12 fractional bits)
QLOG2_SCALE = 4096


def qlog2(x: Column, scale: int = QLOG2_SCALE) -> Column:
    """Integer-quantized log2 of a positive int64 column: monotone, exact
    at powers of two, max error ≈ 0.086·scale, pure int64 (see module
    docstring). ``x·scale`` must stay under 2^63 (x ≤ 2^50 at S=4096).
    The float division below is lossless for ANY such x: the numerator is
    q·2^msb with q = x·S div 2^msb ∈ [S, 2S] — at most 13 significant
    bits — so both operands and the quotient are exact doubles."""
    s = F.lit(int(scale)).cast("bigint")
    xb = x.cast("bigint")
    msb = (F.length(F.bin(xb)) - F.lit(1)).cast("int")
    # (x·S - x·S mod 2^msb) / 2^msb == x·S div 2^msb, and the float
    # division is mathematically exact (numerator is a multiple of the
    # power-of-two denominator), so the cast back to bigint is lossless.
    num = xb * s
    pow2 = F.call_function("shiftleft", F.lit(1).cast("bigint"), msb)
    floordiv = ((num - num % pow2) / pow2).cast("bigint")
    return msb.cast("bigint") * s + floordiv - s


def revisit_schedule(
    history: DataFrame,
    id_col: str = "feed_id",
    changed_col: str = "changed",
    epoch_col: str = "epoch",
    scale: int = QLOG2_SCALE,
    target_q: int = 1,
    min_epochs: int = 1,
    max_epochs: int = 1024,
) -> DataFrame:
    """Per-feed revisit schedule from a visit-observation log.

    ``history`` rows are revisit observations: (id, epoch of the visit,
    changed ∈ {0,1} — whether the feed content differed from the previous
    visit). Output: (id, n_visits, n_changed, rate_q, interval_epochs,
    next_fetch_epoch = last visit epoch + interval). All int64.
    """
    agg = history.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_visits"),
        F.sum(F.col(changed_col).cast("bigint")).cast("bigint").alias("n_changed"),
        F.max(F.col(epoch_col).cast("bigint")).alias("__last_epoch"),
    )
    n, x = F.col("n_visits"), F.col("n_changed")
    rate_q = qlog2(n * 2 + 1, scale) - qlog2((n - x) * 2 + 1, scale)
    out = agg.withColumn("rate_q", rate_q)
    budget = F.lit(int(scale) * int(target_q)).cast("bigint")
    denom = F.greatest(F.col("rate_q"), F.lit(1).cast("bigint"))
    interval = F.least(
        F.greatest(
            ((budget - budget % denom) / denom).cast("bigint"),
            F.lit(int(min_epochs)).cast("bigint"),
        ),
        F.lit(int(max_epochs)).cast("bigint"),
    )
    return out.withColumn("interval_epochs", interval).select(
        id_col,
        "n_visits",
        "n_changed",
        "rate_q",
        "interval_epochs",
        (F.col("__last_epoch") + F.col("interval_epochs")).alias(
            "next_fetch_epoch"
        ),
    )


def revisit_observations(
    prior_feeds: DataFrame,
    feeds: DataFrame,
    epoch: int,
    key_col: str = "feed_canon",
    wm_col: str = "last_pub_ts",
) -> DataFrame:
    """One revisit-history increment from two runs' feeds tables:
    (key, epoch, changed) rows ready to append to the history table that
    :func:`revisit_schedule` aggregates.

    ``changed = 1`` iff the persisted watermark moved between the runs
    (null-safe inequality: a watermark appearing, vanishing, or changing
    all count — the engine only advances watermarks when a feed's batch
    completes, S7/A2, so watermark movement IS the observable "content
    changed" signal the estimator needs). Feeds absent from the prior run
    are omitted: a first visit is not a revisit observation (Cho & GM
    count change observations over n *re*-accesses).

    100 TB shape: one equi join on the feed key ∝ |feeds| — the feeds
    dimension, never the frontier.
    """
    p = prior_feeds.select(
        F.col(key_col).alias("__k"), F.col(wm_col).alias("__wm_prior")
    )
    n = feeds.select(
        F.col(key_col).alias("__k"), F.col(wm_col).alias("__wm_new")
    )
    return n.join(p, "__k").select(
        F.col("__k").alias(key_col),
        F.lit(int(epoch)).cast("bigint").alias("epoch"),
        (~F.col("__wm_new").eqNullSafe(F.col("__wm_prior")))
        .cast("bigint")
        .alias("changed"),
    )


def due_seeds(
    seeds: DataFrame,
    schedule: DataFrame,
    run_epoch: int,
    url_col: str = "url",
    key_col: str = "feed_canon",
) -> tuple[DataFrame, DataFrame]:
    """Split a seed list by the revisit schedule → (due, deferred).

    Seeds join the schedule on the canonical URL; a seed with no schedule
    row (never revisited) is always due, one with
    ``next_fetch_epoch > run_epoch`` is deferred to a later run. The due
    frame feeds straight into ``CrawlEngine(seeds=...)`` — deferral is a
    pre-engine gate, so the crawl itself (order, seen set, politeness) is
    bit-identical to a run seeded with the due list directly.

    100 TB shape: one equi join seeds ⋈ schedule on the feed key (both
    ∝ |feeds|); AQE picks broadcast vs shuffle by size, same degrade path
    as the hosts dimension.
    """
    from newsfeeds_crawler_spark.functions.urls import canonicalize_url

    s = seeds.withColumn("__canon", canonicalize_url(F.col(url_col)))
    sch = schedule.select(
        F.col(key_col).alias("__canon"),
        F.col("next_fetch_epoch").alias("__next"),
    )
    j = s.join(sch, "__canon", "left")
    due = (
        j.filter(F.col("__next").isNull() | (F.col("__next") <= int(run_epoch)))
        .drop("__canon", "__next")
    )
    deferred = (
        j.filter(F.col("__next") > int(run_epoch)).drop("__canon", "__next")
    )
    return due, deferred


def qlog2_sql(x_sql: str, scale: int = QLOG2_SCALE, engine: str = "duckdb") -> str:
    """The qlog2 expression as SQL text for the given engine — kept next
    to the column implementation so the DuckDB oracle mirrors it exactly.
    ``engine='spark'`` emits the same arithmetic with Spark's ``div``."""
    s = int(scale)
    m = f"(length(bin(({x_sql})::BIGINT)) - 1)"
    if engine == "spark":
        m = f"(length(bin(cast(({x_sql}) as bigint))) - 1)"
        return (
            f"({m} * {s} + (({x_sql}) * {s}) div "
            f"shiftleft(cast(1 as bigint), {m}) - {s})"
        )
    return f"({m} * {s} + (({x_sql}) * {s}) // (1::BIGINT << {m}) - {s})"
