"""Per-host politeness admission — the W1–W5 crawl-order core as DataFrame ops.

Reference: HttpManager.scala:65-143 — a single global FIFO with skip-scan
(a free worker takes the first task whose host is admissible, skipping
blocked hosts) under a global ``workers`` in-flight cap. Deterministic
virtual-time re-expression (SURVEY.md §2.5):

- FIFO order      = (e_epoch, e_rank, e_sub) composite key — W1;
- per-host pick   = row_number over Window.partitionBy(host) == 1 — W2;
- host admissible = epoch >= last_access_epoch + delay_epochs — W3;
- workers cap     = global FIFO row_number <= workers — W4;
- tick            = one epoch of the driver loop — W5.

Scale note (10^10 frontier): the per-host window shuffles on ``host`` — a
hot host is ONE partition's worth of rows, so the pending set is pre-ranked
with ``salt = pmod(e_sub, S)`` sub-windows when a skew threshold trips (see
``admit``'s ``salt_partitions``): rank-1-per-(host,salt) first (parallel),
then rank-1-per-host over the S survivors — two narrow windows instead of
one skewed one. The global cap ranks only the per-host winners
(cardinality <= #admissible hosts, not frontier size), and only the top
``workers`` of them; when ``workers`` >= candidate count the sort is skipped
entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

FIFO_KEY = ["e_epoch", "e_rank", "e_sub"]


def _dim_side(dim: DataFrame, dim_join: str, probe: DataFrame | None = None):
    """Shape the hosts-dimension side of an admission/robots join.

    The hosts dimension is usually dwarfed by the frontier — but at a
    10^8-host web crawl the dim itself is GBs, and broadcasting it to every
    executor each tick breaks the epoch (SURVEY.md §2.3 J4's own scale
    caveat). Modes:

    - ``broadcast``: ship the whole dim (correct while |hosts| fits the
      driver + executors; the default under ``hosts_broadcast_max``).
    - ``shuffle``: shuffled-hash join on ``host`` — both sides repartition
      on the key, nothing is shipped whole. With hosts and frontier_heads
      both bucketed on ``xxhash64(host)`` (the catalog layout), a real
      Iceberg/bucketed-table deployment plans this as a storage-partitioned
      join with zero shuffle; here the hint pins ShuffledHashJoin (no
      broadcast, no sort-merge sort).
    - ``semi``: prune the dim to the PROBE side's hosts first (broadcast
      the probe's distinct hosts — ∝ per-tick activity — as a left-semi
      filter), then broadcast the pruned dim back. The per-tick shape for
      tiny-probe × huge-dim joins (enqueue-time robots gate): dim bytes
      shipped ∝ the tick's active hosts, never |hosts|.
    """
    if dim_join == "broadcast":
        return F.broadcast(dim)
    if dim_join == "shuffle":
        return dim.hint("shuffle_hash")
    if dim_join == "semi":
        if probe is None:
            raise ValueError("dim_join='semi' needs the probe side")
        return F.broadcast(
            dim.join(
                F.broadcast(probe.select("host").distinct()),
                "host",
                "left_semi",
            )
        )
    raise ValueError(f"bad dim_join {dim_join!r}")


def _order_key(pending: DataFrame) -> list:
    """Admission order: (priority, FIFO key) ascending when a priority
    column exists (north_star priority frontier — breadth-depth + recency
    score), else the bare FIFO key (reference mailbox order). A constant
    priority column is exactly FIFO, which the equivalence oracle runs."""
    key = [F.col(c) for c in FIFO_KEY]
    if "priority" in pending.columns:
        key = [F.col("priority"), *key]
    return key


def priority_score(
    depth,
    pub_ts,
    depth_weight: float = 0.0,
    recency_weight: float = 0.0,
):
    """Deterministic breadth-depth + feed-recency score (lower = sooner).

    depth: hops from the seed (feed = 0, its articles = 1, ...);
    pub_ts: the item's parsed pubDate. Newer items score lower (crawled
    earlier); deeper pages score higher (breadth-first bias). Both weights
    0.0 → constant 0.0 → pure FIFO. No wall clock anywhere: recency is the
    absolute pubDate epoch-second, a pure function of the input.
    """
    d = depth if isinstance(depth, Column) else F.lit(float(depth))
    ts = F.coalesce(
        F.unix_timestamp(pub_ts).cast("double"), F.lit(0.0)
    )
    return (
        d.cast("double") * F.lit(float(depth_weight))
        - ts * F.lit(float(recency_weight))
    )


def head_candidates(
    cand: DataFrame, salt_partitions: int = 0
) -> DataFrame:
    """Top-1 pending row per host under the admission order key — the
    incremental head-candidate state next to the bucketed frontier.

    Valid ONLY for order keys that are a STATIC function of the row
    (priority + FIFO key): a host's head then changes only when its pending
    set changes, so the heads table is maintainable by recomputing just the
    hosts touched by a tick's admissions/enqueues (the driver's w_heads).
    The starvation guard's age-class flip is epoch-dependent and breaks
    this invariant — the driver falls back to full-frontier admission when
    it is enabled.

    ``salt_partitions`` > 0 pre-ranks with a salted sub-window (same
    hot-host skew treatment as :func:`admit`): rank-1-per-(host,salt)
    first, then rank-1-per-host over the S survivors.
    """
    key = _order_key(cand)
    if salt_partitions > 0:
        w_salt = Window.partitionBy("host", "__salt").orderBy(*key)
        cand = (
            cand.withColumn(
                "__salt", F.pmod(F.col("e_sub"), F.lit(salt_partitions))
            )
            .withColumn("__rs", F.row_number().over(w_salt))
            .filter(F.col("__rs") == 1)
            .drop("__salt", "__rs")
        )
    w_host = Window.partitionBy("host").orderBy(*key)
    return (
        cand.withColumn("__rn", F.row_number().over(w_host))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def admit_heads(
    heads: DataFrame,
    host_state: DataFrame,
    epoch: int,
    workers: int,
    dim_join: str = "broadcast",
) -> DataFrame:
    """Admission over the per-host head-candidate table: ONE row per host,
    so no per-host window is needed at all — the whole politeness gate is
    a scan + admissibility filter (W3) + two-level top-k (W4, planned as
    TakeOrderedAndProject) + a rank window over ≤ ``workers`` survivors.

    Admission input rows ∝ #hosts-with-pending-work (the heads table),
    never O(|pending frontier|) — the reference analog is that
    HttpManager's skip-scan walks from the list HEAD and never re-sorts
    the whole list (HttpManager.scala:76-94). Heads carry full frontier
    rows, so there is no join back to the pending set either.

    ``dim_join``: how the hosts dimension joins in (see :func:`_dim_side`)
    — ``broadcast`` while |hosts| is broadcast-sized, ``shuffle`` for a
    10^8-host crawl where heads is itself ∝ |hosts| (shuffled-hash on
    ``host``; a storage-partitioned join on a bucketed catalog).
    """
    key = _order_key(heads)
    cand = heads.join(
        _dim_side(
            host_state.select("host", "last_access_epoch", "delay_epochs"),
            dim_join,
            probe=heads,
        ),
        "host",
        "left",
    ).filter(
        F.col("last_access_epoch").isNull()
        | (F.lit(epoch) >= F.col("last_access_epoch") + F.col("delay_epochs"))
    ).drop("last_access_epoch", "delay_epochs")
    topk = cand.orderBy(*key).limit(workers)
    w_glob = Window.orderBy(*key)  # input bounded by limit(workers)
    return topk.drop("admit_rank").withColumn(
        "admit_rank", F.row_number().over(w_glob) - 1
    )


def robots_split(
    pending: DataFrame, hosts: DataFrame, dim_join: str = "broadcast"
) -> tuple[DataFrame, DataFrame]:
    """Split pending tasks into (allowed, denied) by robots disallow prefixes.

    ``hosts.robots_disallow`` is a newline-joined prefix list. The path is
    derived from the canonical URL. New-engine semantics (north_star); no
    reference analog.

    ``dim_join`` (see :func:`_dim_side`): ``broadcast`` for a
    broadcast-sized hosts dim; ``semi`` for the per-tick enqueue gate at
    10^8 hosts (prune the dim to the tick's hosts — ∝ activity — before
    broadcasting); ``shuffle`` for the one-time seed gate at init, where
    the pending side is itself ∝ |hosts|.
    """
    # path = canonical URL minus "scheme://host" (canonical path starts at '/')
    path = F.expr(
        "substring(substring_index(url_canon, '://', -1), "
        "length(substring_index(substring_index(url_canon, '://', -1), '/', 1)) + 1)"
    )
    joined = pending.join(
        _dim_side(hosts.select("host", "robots_disallow"), dim_join, probe=pending),
        "host",
        "left",
    ).withColumn("__path", F.when(path == "", F.lit("/")).otherwise(path))
    denied_cond = F.col("robots_disallow").isNotNull() & (
        F.exists(
            F.split(F.col("robots_disallow"), "\n"),
            lambda p: (p != F.lit("")) & F.col("__path").startswith(p),
        )
    )
    allowed = joined.filter(~denied_cond).drop("robots_disallow", "__path")
    denied = joined.filter(denied_cond).drop("robots_disallow", "__path")
    return allowed, denied


def admit(
    pending: DataFrame,
    host_state: DataFrame,
    epoch: int,
    workers: int,
    salt_partitions: int = 0,
    starvation_epochs: int = 0,
    dim_join: str = "broadcast",
) -> DataFrame:
    """Admit up to ``workers`` tasks for this epoch, one per admissible host,
    FIFO order. Returns the admitted tasks with ``admit_rank`` (0-based).

    ``host_state``: host, last_access_epoch, delay_epochs — joined per
    ``dim_join`` (broadcast by default; ``shuffle`` above
    ``hosts_broadcast_max``, see :func:`_dim_side`).
    ``salt_partitions`` > 0 pre-ranks with a salted sub-window (hot-host skew).

    LATE MATERIALIZATION: the windows rank a narrow projection (host +
    order key only — fixed-width longs plus one small string), so the
    frontier's URL strings never enter the window shuffles/sorts; the
    winning keys (≤ ``workers`` rows) broadcast-join back to ``pending``
    to recover full rows. At a 10^10 frontier the window sort dominates
    admission cost, and sorting 30-byte keys instead of ~250-byte rows is
    the difference.
    """
    narrow_cols = ["host", *FIFO_KEY] + (
        ["priority"] if "priority" in pending.columns else []
    )
    narrow = pending.select(*narrow_cols)
    key = _order_key(narrow)
    age_cols: list[str] = []
    if starvation_epochs > 0:
        # starvation guard for the priority frontier: a row pending for
        # >= starvation_epochs ticks escalates ahead of every fresh row
        # (FIFO within the escalated class). Linear priority aging cannot
        # do this — p_i − a·(t − e_i) shifts all rows by the same t term,
        # leaving relative order fixed forever; a class flip is the
        # minimal change that actually re-orders. No reference analog
        # (the mailbox is FIFO and cannot starve); guards the north_star
        # priority ordering.
        narrow = narrow.withColumn(
            "__age",
            F.when(
                F.lit(epoch) - F.col("e_epoch") >= starvation_epochs,
                F.lit(0),
            ).otherwise(F.lit(1)),
        )
        key = [F.col("__age"), *key]
        age_cols = ["__age"]
    if salt_partitions > 0:
        w_salt = Window.partitionBy("host", "__salt").orderBy(*key)
        narrow = (
            narrow.withColumn(
                "__salt", F.pmod(F.col("e_sub"), F.lit(salt_partitions))
            )
            .withColumn("__rs", F.row_number().over(w_salt))
            .filter(F.col("__rs") == 1)
            .drop("__salt", "__rs")
        )
    w_host = Window.partitionBy("host").orderBy(*key)
    head = narrow.withColumn("__rn_host", F.row_number().over(w_host)).filter(
        F.col("__rn_host") == 1
    )
    cand = head.join(
        _dim_side(
            host_state.select("host", "last_access_epoch", "delay_epochs"),
            dim_join,
            probe=head,
        ),
        "host",
        "left",
    ).filter(
        F.col("last_access_epoch").isNull()
        | (F.lit(epoch) >= F.col("last_access_epoch") + F.col("delay_epochs"))
    )
    # W4 worker cap as a TWO-LEVEL top-k: orderBy().limit(k) plans as
    # TakeOrderedAndProject (per-partition top-k, then a final merge of
    # ≤ k×P survivors) — no single-partition Window over all candidates,
    # which at 10^8 admissible hosts would be one task sorting everything.
    # The residual rank window then sees ≤ ``workers`` rows.
    topk = cand.select(*FIFO_KEY, "host", *age_cols, *(
        ["priority"] if "priority" in cand.columns else []
    )).orderBy(*key).limit(workers)
    w_glob = Window.orderBy(*key)  # input bounded by limit(workers)
    winners = (
        topk.withColumn("admit_rank", F.row_number().over(w_glob) - 1)
        .select(*FIFO_KEY, "host", "admit_rank")
    )
    # FIFO key is unique per task; winners <= workers rows -> broadcast.
    # pending may carry a (null) admit_rank column of its own — the
    # winners' rank replaces it.
    return pending.drop("admit_rank").join(
        F.broadcast(winners), [*FIFO_KEY, "host"], "inner"
    )
