"""SemDeDup — semantic deduplication over an embedding column: cluster
the corpus with k-means, then inside each cluster drop all but one member
of every near-duplicate group (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication").

This composes two operators that are already oracle-pinned on their own:

- the integer-quantized Lloyd's trainer (``operators/kmeans.py``) supplies
  the clusters — components quantized once to 1/10^6, distances and means
  exact int64, so the clustering is bit-identical on any engine or
  partitioning;
- the within-cluster pair scan computes the same deterministic left-fold
  double dot/norms as ``operators/similarity.embedding_cosine_pairs``,
  rounded at 8 dp before the threshold compare — the exact arithmetic the
  DuckDB mirror reproduces.

Keep rule: the paper keeps one representative per duplicate group; the
deterministic distributed variant here is the standard greedy "keep the
lowest id": a vector is DROPPED iff some LOWER-id vector in its cluster is
within the similarity threshold (i.e. it appears as the higher side of a
qualifying pair). One anti-join — no iterative clique finding — and the
survivor set is stable under any partitioning. (Chained near-dups a—b—c
where sim(a,c) < τ keep only a; that is the greedy choice the pairwise
rule implies, documented here because the transitive variant —
``dedup.neardup_components`` — exists when full groups are wanted.)

Physical pair scan (``impl``), bit-identical outputs either way
(``tests/test_semdedup.py`` pins equality, the oracle gate pins both
against DuckDB):

- ``"arrow"`` (default) — ``applyInPandas`` per cluster: each vector
  ships ONCE (one shuffle keyed ``cell``), and the n×n pair-dot matrix
  accumulates one DIMENSION at a time from a zero seed, so every pair's
  partial sums are exactly ``((0.0 + p0) + p1) + ...`` — the Catalyst
  fold order — with norms/divide as single correctly-rounded IEEE ops;
  rounding + threshold stay in Catalyst. This is the per-cluster-shard
  matmul shape the paper runs at scale. Measured at sf0.1 (2 000 vecs,
  k=8, ~250k pairs × 64 dims): whole gate 6.7 → 4.6 s warm; the expr
  pair scan alone ~4 s → ~1 s.
- ``"expr"`` — pure-Catalyst cell self-join + interpreted HOF fold; kept
  as the no-Python equivalence reference. A first Arrow attempt — a
  pair-wise pandas UDF on the joined frame — measured SLOWER than expr
  (8.1 vs 6.7 s): the join materializes both vectors per pair, so the
  UDF shipped ~250k × 2 × 64 doubles through Arrow; the per-cluster
  matrix variant exists precisely to ship each vector once.

100 TB shape: training is the kmeans operator's short join+agg chain
(centroids always broadcastable); assignment is one partial-agg shuffle
keyed (id, cell); the pair scan shuffles vectors once on ``cell`` —
work and memory bounded by the largest cluster (n_cell² doubles), never
|corpus|² — k controls the block size, and a skewed mega-cluster is the
signal to raise k or recurse, exactly as the paper shards by cluster.
The drop decision is one aggregate + one anti-join on id. Nothing
driver-side.
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


def _assigned_base(
    embeddings: DataFrame,
    k: int,
    iters: int,
    stride: int,
    id_col: str,
    vec_col: str,
    scale: int,
) -> DataFrame:
    """(id, cell, vec, nrm): every vector with its trained-cluster id and
    precomputed left-fold norm."""
    ce = kmeans_train(
        embeddings, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
        scale=scale, stride=stride,
    )
    vx = quantize_explode(embeddings, id_col, vec_col, scale)
    asg = assign_nearest(vx, ce).select("id", "cell")
    return (
        embeddings.select(
            F.col(id_col).cast("bigint").alias("id"),
            F.col(vec_col).alias("vec"),
            _norm(F.col(vec_col)).alias("nrm"),
        )
        .join(asg, "id")
    )


def _pairs_from_base(
    base: DataFrame, threshold: float, impl: str
) -> DataFrame:
    """Qualifying within-cluster pairs (id_a < id_b, sim >= threshold)."""
    if impl == "arrow":
        import numpy as np
        import pandas as pd

        def _cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("id", kind="mergesort")
            ids = pdf["id"].to_numpy()
            n = len(ids)
            if n < 2:
                return pd.DataFrame(
                    {"id_a": ids[:0], "id_b": ids[:0],
                     "sim_raw": np.zeros(0)}
                )
            x = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["vec"]],
                dtype=np.float64,
            )
            d = x.shape[1]
            # accumulate the pair-dot matrix and the self-dot vector one
            # DIMENSION at a time from a zero seed: per pair that is
            # exactly ((0.0 + p0) + p1) + ... — the Catalyst fold order —
            # so dots, norms (IEEE sqrt is correctly rounded), the
            # product, and the division are all bit-identical to "expr"
            acc = np.zeros((n, n), dtype=np.float64)
            nacc = np.zeros(n, dtype=np.float64)
            for i in range(d):
                c = x[:, i]
                acc += c[:, None] * c[None, :]
                nacc += c * c
            nrm = np.sqrt(nacc)
            ia, ib = np.triu_indices(n, 1)
            sim = acc[ia, ib] / (nrm[ia] * nrm[ib])
            return pd.DataFrame(
                {"id_a": ids[ia], "id_b": ids[ib], "sim_raw": sim}
            )

        raw = (
            base.select("cell", "id", "vec")
            .groupBy("cell")
            .applyInPandas(
                _cell_pairs, "id_a long, id_b long, sim_raw double"
            )
        )
        return raw.select(
            "id_a", "id_b", F.round("sim_raw", 8).alias("sim")
        ).filter(F.col("sim") >= threshold)
    if impl == "expr":
        a = base.select(
            "cell", F.col("id").alias("id_a"), F.col("vec").alias("v_a"),
            F.col("nrm").alias("nrm_a"),
        )
        b = base.select(
            "cell", F.col("id").alias("id_b"), F.col("vec").alias("v_b"),
            F.col("nrm").alias("nrm_b"),
        )
        return (
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
    raise ValueError(f"unknown semantic_dedup impl {impl!r}")


def semantic_pairs(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    stride: int = 50,
    threshold: float = SEMDEDUP_THRESHOLD,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = KMEANS_SCALE,
    impl: str = "arrow",
) -> DataFrame:
    """The qualifying near-duplicate pair list: (id_a, id_b, sim) with
    id_a < id_b, both in the same trained cluster, sim >= threshold."""
    base = _assigned_base(
        embeddings, k, iters, stride, id_col, vec_col, scale
    )
    return _pairs_from_base(base, threshold, impl)


def semantic_dedup(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    stride: int = 50,
    threshold: float = SEMDEDUP_THRESHOLD,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = KMEANS_SCALE,
    impl: str = "arrow",
) -> DataFrame:
    """Per-vector SemDeDup verdict.

    Output: ``vec_id``, ``cell`` (trained cluster), ``n_dups`` (qualifying
    near-dup neighbors on either side), ``keep`` (False iff a lower-id
    cluster-mate is within ``threshold`` cosine).
    """
    base = _assigned_base(
        embeddings, k, iters, stride, id_col, vec_col, scale
    )
    pairs = _pairs_from_base(base, threshold, impl)
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
