"""SemDeDup — semantic deduplication over an embedding column: cluster
the corpus with k-means, then inside each cluster drop all but one member
of every near-duplicate group (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication").

This composes two operators that are already oracle-pinned on their own:

- the integer-quantized Lloyd's trainer (``operators/kmeans.py``) supplies
  the clusters — components quantized once to 1/10^6, distances and means
  exact int64, so the clustering is bit-identical on any engine or
  partitioning;
- the within-cluster pair scan reuses the IVF-blocked cosine shape of
  ``operators/similarity.embedding_cosine_pairs`` — deterministic
  left-fold double dot/norms, rounded at 8 dp before the threshold
  compare, the exact arithmetic the DuckDB mirror reproduces.

Keep rule: the paper keeps one representative per duplicate group; the
deterministic distributed variant here is the standard greedy "keep the
lowest id": a vector is DROPPED iff some LOWER-id vector in its cluster is
within the similarity threshold (i.e. it appears as the higher side of a
qualifying pair). One anti-join — no iterative clique finding — and the
survivor set is stable under any partitioning. (Chained near-dups a—b—c
where sim(a,c) < τ keep only a; that is the greedy choice the pairwise
rule implies, documented here because the transitive variant —
``dedup.neardup_components`` — exists when full groups are wanted.)

100 TB shape: training is the kmeans operator's short join+agg chain
(centroids always broadcastable); assignment is one partial-agg shuffle
keyed (id, cell); the pair scan shuffles both sides on ``cell`` — bounded
by the largest cluster, never |corpus|² (k controls the block size, and a
skewed mega-cluster is the signal to raise k or recurse, exactly as the
paper shards by cluster). The drop decision is one aggregate + one
anti-join on id. Nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from newsfeeds_crawler_spark.operators.kmeans import (
    KMEANS_SCALE,
    assign_nearest,
    kmeans_train,
    quantize_explode,
)
from newsfeeds_crawler_spark.operators.similarity import _dot, _norm

SEMDEDUP_THRESHOLD = 0.3


def semantic_dedup(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    stride: int = 50,
    threshold: float = SEMDEDUP_THRESHOLD,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = KMEANS_SCALE,
) -> DataFrame:
    """Per-vector SemDeDup verdict.

    Output: ``vec_id``, ``cell`` (trained cluster), ``n_dups`` (qualifying
    near-dup neighbors on either side), ``keep`` (False iff a lower-id
    cluster-mate is within ``threshold`` cosine).
    """
    ce = kmeans_train(
        embeddings, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
        scale=scale, stride=stride,
    )
    vx = quantize_explode(embeddings, id_col, vec_col, scale)
    asg = assign_nearest(vx, ce).select("id", "cell")
    base = (
        embeddings.select(
            F.col(id_col).cast("bigint").alias("id"),
            F.col(vec_col).alias("vec"),
            _norm(F.col(vec_col)).alias("nrm"),
        )
        .join(asg, "id")
    )
    a = base.select(
        "cell", F.col("id").alias("id_a"), F.col("vec").alias("v_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = base.select(
        "cell", F.col("id").alias("id_b"), F.col("vec").alias("v_b"),
        F.col("nrm").alias("nrm_b"),
    )
    pairs = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("v_a"), F.col("v_b"))
                / (F.col("nrm_a") * F.col("nrm_b")),
                8,
            ).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )
    nd = (
        pairs.select(F.col("id_a").alias("id"))
        .unionAll(pairs.select(F.col("id_b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_dups"))
    )
    dropped = pairs.select(F.col("id_b").alias("id")).distinct().select(
        "id", F.lit(False).alias("keep")
    )
    return (
        base.select("id", "cell")
        .join(nd, "id", "left")
        .join(dropped, "id", "left")
        .select(
            F.col("id").alias("vec_id"),
            F.col("cell").cast("int").alias("cell"),
            F.coalesce("n_dups", F.lit(0)).cast("bigint").alias("n_dups"),
            F.coalesce("keep", F.lit(True)).alias("keep"),
        )
    )
