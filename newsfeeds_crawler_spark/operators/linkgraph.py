"""Link-graph authority scoring for crawl prioritization: a fixed-iteration
PageRank over the host link graph, computed entirely in integer arithmetic
so the result is bit-identical on any engine, cluster size, or partitioning
— the DuckDB oracle unrolls the same iterations as CTEs and hash-matches.

Why it's here: the engine's frontier is FIFO-per-host (reference parity,
``operators/politeness.py``); a production crawl at 10^10 URLs additionally
prioritizes by host authority (breadth-depth/quality scores). PageRank
(Page et al. 1999 — public algorithm) over the host→host link graph is the
canonical authority signal; this operator produces that score as a column
joinable onto the frontier.

Determinism: classic PageRank iterates ``r' = (1−d)/N + d·Σ r/outdeg`` in
floating point — sums of doubles are order-dependent, so a shuffle-order
change (or another engine) flips low bits. Here every rank is an int64 in
units of ``scale`` (default 10^12 = rank 1.0): contributions are integer
divisions ``rank_q div outdeg``, the damping is ``(85·Σ) div 100``
(d = 0.85 exactly), and the base term ``(15·scale) div 100``. All sums are
exact int64, so iteration k's ranks are IDENTICAL everywhere. Truncation
bias is < iters·outdeg ulps of 10^-12 — irrelevant for a priority score,
decisive for cross-engine verification.

Dangling nodes (no out-edges) leak their mass — the standard "weak"
PageRank variant; redistribution would need a per-iteration global scalar,
which is one more aggregate if ever needed.

100 TB shape: per iteration, one join of edges⋈ranks on src (both sides
hash-partitioned on the same key — the shuffle is ∝ |edges| once; ranks
are tiny next to edges and co-partition for free on reuse) and one
map-side-combinable sum keyed on dst. ``iters`` is fixed and small (3–10),
so the plan is a short chain of join+agg stages, no driver-side loop state
beyond the loop counter. int64 headroom: 85·N·scale must stay < 2^63 —
at 10^8 hosts drop ``scale`` to 10^9 (still nano-rank resolution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PAGERANK_SCALE = 10**12  # rank 1.0 in integer units
PAGERANK_ITERS = 3


def pagerank_iter(
    edges: DataFrame,
    iters: int = PAGERANK_ITERS,
    src_col: str = "src",
    dst_col: str = "dst",
    scale: int = PAGERANK_SCALE,
) -> DataFrame:
    """Fixed-iteration integer PageRank (d = 0.85) over distinct edges.

    Output per node (union of srcs and dsts): ``rank_q`` (int64, units of
    ``scale`` — exact, order-independent) and ``rank`` (double, 6 dp).
    """
    e = edges.select(
        F.col(src_col).cast("bigint").alias("src"),
        F.col(dst_col).cast("bigint").alias("dst"),
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("outdeg")
    )
    base = (15 * scale) // 100  # (1-d)·scale, exact (scale % 100 == 0)
    rank = nodes.select(
        "node", F.lit(scale).cast("bigint").alias("rank_q")
    )
    for _ in range(iters):
        contrib = (
            e.join(rank.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_q div outdeg").alias("c"),
            )
        )
        sums = contrib.groupBy("node").agg(
            F.sum("c").cast("bigint").alias("s")
        )
        rank = nodes.join(sums, "node", "left").select(
            "node",
            (
                F.lit(base).cast("bigint")
                + F.expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")
            ).alias("rank_q"),
        )
    return rank.select(
        F.col("node").cast("bigint").alias("node"),
        "rank_q",
        F.round(F.col("rank_q").cast("double") / scale, 6).alias("rank"),
    )


def bfs_depth(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Bounded-hop BFS: min link-distance from the seed set, the crawl
    DEPTH CLASS of every reachable host (the quantity the per-depth quota
    budgets key on, ``plans/driver.py host_seed_cap``/``host_pending_cap``
    — depth 0 = seeds, depth 1 = first-hop enqueues, ...).

    Fixed ``iters`` relaxation rounds: depth_{k+1}(v) = min(depth_k(v),
    min over edges u→v of depth_k(u)+1) — pure integer mins, so the result
    is exactly order-independent and the DuckDB oracle unrolls the same
    rounds as CTEs. Nodes not reached within ``iters`` hops are absent
    (a crawl cares about the near frontier; raise ``iters`` to widen).

    100 TB shape: per round, one edges⋈depths join on src (edges
    hash-partitioned once and reused; depths ≤ reached nodes) and one
    map-side-combinable min keyed dst — the same join+agg chain as
    :func:`pagerank_iter`. O(diameter-bounded) rounds, no driver state.
    """
    e = edges.select(
        F.col(src_col).cast("bigint").alias("src"),
        F.col(dst_col).cast("bigint").alias("dst"),
    ).distinct()
    depth = seeds.select(
        F.col(seeds.columns[0]).cast("bigint").alias("node")
    ).distinct().select("node", F.lit(0).cast("int").alias("depth"))
    for _ in range(iters):
        relaxed = (
            e.join(depth.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("depth") + 1).cast("int").alias("depth"),
            )
        )
        depth = (
            depth.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("depth").cast("int").alias("depth"))
        )
    return depth.select(F.col("node").cast("bigint").alias("node"), "depth")


def anchor_topk(
    edges: DataFrame,
    k: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Anchor-text consolidation: for every link target, the top-k anchor
    strings pointing at it, by occurrence count (ties broken on the anchor
    string, then deterministic rank).

    The canonical web-graph operator behind page-title/ranking signals
    (anchor text describes the TARGET page better than its own content —
    the classic observation in Brin & Page 1998 §2.2 and TREC web-track
    anchor-text runs): a crawl emits (src, dst, anchor) link records; the
    consolidated per-target anchor profile joins onto the frontier as a
    relevance prior, and at training-data scale the same aggregate builds
    the (url, anchor-context) pairs used for retrieval corpora.

    100 TB shape: one hash aggregate keyed (dst, anchor) — map-side
    combinable, width ∝ distinct (dst, anchor) pairs — then the per-dst
    top-k rank window, which Spark plans as a PARTIAL + FINAL
    WindowGroupLimit pair: each input partition ships only its local
    top-k per dst, so the post-shuffle partition holds ≤ k×P rows per
    dst, never the full anchor profile. A hot dst (everyone links the
    same homepage) is bounded the same way. Self-links count; the caller
    filters if the policy says otherwise.
    """
    cnt = (
        edges.groupBy(
            F.col(dst_col).alias("dst"), F.col(anchor_col).alias("anchor")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    w = Window.partitionBy("dst").orderBy(
        F.col("cnt").desc(), F.col("anchor")
    )
    return (
        cnt.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("dst").cast("bigint"),
            "anchor",
            "cnt",
            F.col("rank").cast("int"),
        )
    )
