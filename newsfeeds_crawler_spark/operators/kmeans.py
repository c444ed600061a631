"""Distributed k-means (Lloyd's) over embedding columns, in integer
arithmetic so training is bit-identical on any engine, cluster size, or
partitioning — the DuckDB oracle unrolls the same iterations as CTEs and
hash-matches the final centroids.

Why it's here: the ANN operators (``operators/similarity.py``) take a
*centroids* DataFrame — IVF coarse cells, IVF-PQ inverted lists. The gates
exercise them with arithmetic stand-in centroids (``vec_id % 50 == 0``);
a production index at 10^9–10^10 vectors TRAINS those centroids with
Lloyd's iterations over a sample. This operator is that trainer, and its
output plugs straight into ``assign_cells`` / ``ivf_topk`` / ``ivfpq_topk``
(pinned by ``test_kmeans_centroids_compose_with_ivf``).

Determinism: classic k-means is float — centroid means are sums of doubles
whose value depends on reduction order, so two runs (or two engines) drift
in low bits and can flip argmin assignments. Here every vector component is
quantized ONCE to int64 units of ``1/scale`` (``floor(v · scale)`` — floor,
not round: IEEE-754 double multiply then floor is exactly reproducible in
Spark and DuckDB, with no half-even/half-up disagreement), distances are
exact int64 sums of squared integer diffs, the argmin tie-breaks on cell
id, and centroid updates are integer floor-division means. Iteration k's
centroids are therefore IDENTICAL everywhere — the property the oracle
gate needs, and the property that makes a resumed/re-run index build
reproduce the same inverted lists.

100 TB shape (per iteration):
- assignment = exploded vectors ⋈ broadcast(exploded centroids) on ``pos``
  (k·dim rows — always broadcastable; k beyond broadcast size means you
  want a coarser two-level index, not bigger Lloyd's) → one partial-agg
  shuffle keyed (id, cell) for the distance sums → one min-struct aggregate
  keyed id. Map-side combine applies to both aggregates.
- update = assignment ⋈ exploded vectors (co-keyed on id) → one
  partial-agg shuffle keyed (cell, pos). Sums are exact int64:
  |v_q| ≤ scale·max|v|, so a cell of n members needs n·scale·max|v| < 2^63
  — at scale=10^6 and unit-norm embeddings that is ~10^12 members per
  cell, far beyond any real inverted list.
- ``iters`` is fixed and small; the exploded vector frame is checkpointed
  once and reused, so the plan is a short chain of join+agg stages.

Empty cells keep their previous centroid (mirrored in the oracle with a
left join + coalesce) — the standard "do not teleport" choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KMEANS_SCALE = 10**6  # component 1.0 in integer units
KMEANS_ITERS = 2


def quantize_explode(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = KMEANS_SCALE,
) -> DataFrame:
    """(id, vec) → exploded (id, pos, v_q) with v_q = floor(double(v)·scale).

    floor after a double multiply is the one float→int path both engines
    reproduce bit-exactly (no rounding-mode disagreement); everything
    downstream of this projection is pure int64.
    """
    return vectors.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.posexplode(vec_col).alias("pos", "v"),
    ).select(
        "id",
        F.col("pos").cast("int").alias("pos"),
        F.floor(F.col("v").cast("double") * F.lit(float(scale)))
        .cast("bigint")
        .alias("v_q"),
    )


def init_centroids(
    vx: DataFrame, k: int, stride: int = 50
) -> DataFrame:
    """Deterministic seeding: the k lowest-id vectors among id % stride == 0
    (stride spreads the seeds across the id space), ranked by id → cell
    0..k-1. k·dim rows — driver-free, SQL-mirrorable.
    """
    seed_ids = (
        vx.select("id")
        .distinct()
        .filter(F.col("id") % stride == 0)
        .orderBy("id")
        .limit(k)
        .select(
            "id",
            (F.row_number().over(Window.orderBy("id")) - 1)
            .cast("int")
            .alias("cell"),
        )
    )
    return vx.join(seed_ids, "id").select(
        "cell", "pos", F.col("v_q").alias("c_q")
    )


def assign_nearest(vx: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest centroid per vector by exact integer L2², tie-break on cell.

    centroids: exploded (cell, pos, c_q). Returns (id, cell, d).
    """
    dists = (
        vx.join(F.broadcast(centroids), "pos")
        .groupBy("id", "cell")
        .agg(
            F.sum(
                (F.col("v_q") - F.col("c_q"))
                * (F.col("v_q") - F.col("c_q"))
            )
            .cast("bigint")
            .alias("d")
        )
    )
    best = dists.groupBy("id").agg(
        F.min(F.struct("d", "cell")).alias("m")
    )
    return best.select(
        "id",
        F.col("m.cell").alias("cell"),
        F.col("m.d").alias("d"),
    )


def kmeans_train(
    vectors: DataFrame,
    k: int = 8,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = KMEANS_SCALE,
    stride: int = 50,
) -> DataFrame:
    """Fixed-iteration integer Lloyd's. Returns the final centroids
    exploded as (cell:int, pos:int, c_q:bigint, n_members:bigint) where
    n_members counts the LAST assignment (0 ⇒ the cell kept its previous
    centroid). ``c_q`` is in units of ``1/scale``.
    """
    vx = quantize_explode(vectors, id_col, vec_col, scale).localCheckpoint()
    ce = init_centroids(vx, k, stride)
    asg = None
    for _ in range(iters):
        asg = assign_nearest(vx, ce)
        upd = (
            asg.join(vx, "id")
            .groupBy("cell", "pos")
            .agg(
                F.sum("v_q").cast("bigint").alias("s"),
                F.count(F.lit(1)).cast("bigint").alias("n"),
            )
            .select("cell", "pos", F.expr("s div n").alias("u_q"), "n")
        )
        ce = (
            ce.join(upd, ["cell", "pos"], "left")
            .select(
                "cell",
                "pos",
                F.coalesce("u_q", "c_q").alias("c_q"),
                F.coalesce("n", F.lit(0).cast("bigint")).alias("n_members"),
            )
            .localCheckpoint()
        )
    return ce.select("cell", "pos", "c_q", "n_members")


def centroids_to_vectors(
    centroids: DataFrame, scale: int = KMEANS_SCALE
) -> DataFrame:
    """Reshape exploded trained centroids into the (vec_id, embedding)
    layout ``operators/similarity.assign_cells`` expects (float components
    = c_q / scale; vec_id = cell id)."""
    return (
        centroids.groupBy("cell")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "c_q"))).alias("ps")
        )
        .select(
            F.col("cell").cast("bigint").alias("vec_id"),
            F.transform(
                "ps",
                lambda s: (s["c_q"].cast("double") / F.lit(float(scale)))
                .cast("float"),
            ).alias("embedding"),
        )
    )
