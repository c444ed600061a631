"""Scalar int8 embedding quantization — per-dimension affine min/max
(the standard "SQ8" vector-storage compressor: FAISS
ScalarQuantizer.QT_8bit, Milvus/pgvector int8 storage): 4× smaller
embedding columns with a bounded per-value reconstruction error, the
usual first step before ANN indexing when the corpus outgrows float32.

q_d(v) = round((v − min_d) · 254 / (max_d − min_d)) − 127 ∈ [−127, 127],
with degenerate dimensions (max = min) mapping to 0. Dequantization
v̂ = min_d + (q + 127)·(max_d − min_d)/254 reconstructs within half a
step — |v − v̂| ≤ (max_d − min_d)/508 + float slack — which the unit test
pins; the driver gate pins the quantized values themselves against a
DuckDB mirror (identical double arithmetic + half-up round on both
engines, the curation-module rounding discipline).

100 TB shape: the stats pass is one explode + per-dimension min/max hash
aggregate — map-side combinable, reducer rows = |dims| (64 here), i.e.
effectively free; the encode pass is map-only with the 64-row stats
table broadcast. Both passes stay in whole-stage codegen (zip_with /
transform expressions, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q_LEVELS = 254  # symmetric int8 range −127..127


def dim_stats(
    vectors: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension (dim, dmin, dmax) over the corpus — 0-based dims."""
    return (
        vectors.select(
            F.posexplode(F.col(vec_col)).alias("dim", "__v")
        )
        .groupBy("dim")
        .agg(
            F.min(F.col("__v").cast("double")).alias("dmin"),
            F.max(F.col("__v").cast("double")).alias("dmax"),
        )
    )


def quantize_int8(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stats: DataFrame | None = None,
) -> DataFrame:
    """Quantized values, exploded: (id, dim:int, qv:int ∈ [−127, 127]).

    ``stats`` defaults to :func:`dim_stats` of the input — pass a frozen
    stats frame to encode new batches against an existing codebook (the
    incremental-ingest path; out-of-range values clamp)."""
    if stats is None:
        stats = dim_stats(vectors, vec_col)
    ex = vectors.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col)).alias("dim", "__v"),
    )
    v = F.col("__v").cast("double")
    span = F.col("dmax") - F.col("dmin")
    raw = (
        F.round((v - F.col("dmin")) * Q_LEVELS / span, 0).cast("int")
        - 127
    )
    qv = F.when(span == 0, F.lit(0)).otherwise(
        F.least(F.greatest(raw, F.lit(-127)), F.lit(127))
    )
    return ex.join(F.broadcast(stats), "dim").select(
        id_col, F.col("dim").cast("int").alias("dim"), qv.cast("int").alias("qv")
    )


def dequantize(
    quantized: DataFrame,
    stats: DataFrame,
) -> DataFrame:
    """Reconstruct doubles: (id, dim, v_hat) — for error audits and for
    serving paths that re-rank int8 candidates in float."""
    vhat = F.col("dmin") + (
        (F.col("qv") + 127).cast("double")
        * (F.col("dmax") - F.col("dmin"))
        / Q_LEVELS
    )
    cols = [c for c in quantized.columns if c not in ("dim", "qv")]
    return quantized.join(F.broadcast(stats), "dim").select(
        *cols, "dim", vhat.alias("v_hat")
    )
