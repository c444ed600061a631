"""Int8 embedding quantization (operators/vecquant.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from newsfeeds_crawler_spark.operators.vecquant import (
    dequantize,
    dim_stats,
    quantize_int8,
)


def _vectors(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_quantize_range_and_extremes(spark):
    df = _vectors(
        spark,
        [(1, [0.0, -1.0, 5.0]), (2, [10.0, 1.0, 5.0]), (3, [5.0, 0.0, 5.0])],
    )
    q = {(r.vec_id, r.dim): r.qv for r in quantize_int8(df).collect()}
    # min maps to −127, max to +127, midpoint to 0
    assert q[(1, 0)] == -127 and q[(2, 0)] == 127 and q[(3, 0)] == 0
    assert q[(1, 1)] == -127 and q[(2, 1)] == 127
    # degenerate dimension (all equal) → 0
    assert q[(1, 2)] == q[(2, 2)] == q[(3, 2)] == 0
    assert all(-127 <= v <= 127 for v in q.values())


def test_roundtrip_error_within_half_step(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.normal(size=16)]) for i in range(200)
    ]
    df = _vectors(spark, rows)
    stats = dim_stats(df).cache()
    q = quantize_int8(df, stats=stats)
    rec = dequantize(q, stats)
    joined = rec.join(
        df.select("vec_id", F.posexplode("embedding").alias("dim", "v")),
        ["vec_id", "dim"],
    ).select(
        "vec_id",
        "dim",
        (F.abs(F.col("v_hat") - F.col("v").cast("double"))).alias("err"),
    )
    steps = {r.dim: (r.dmax - r.dmin) / 254 for r in stats.collect()}
    errs = joined.collect()
    assert all(r.err <= steps[r.dim] / 2 + 1e-9 for r in errs)


def test_frozen_stats_clamp_out_of_range(spark):
    base = _vectors(spark, [(1, [0.0, 0.0]), (2, [1.0, 10.0])])
    stats = dim_stats(base)
    newb = _vectors(spark, [(3, [2.0, -5.0])])  # outside the frozen range
    q = {(r.vec_id, r.dim): r.qv
         for r in quantize_int8(newb, stats=stats).collect()}
    assert q[(3, 0)] == 127 and q[(3, 1)] == -127


def test_partition_invariance(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(300)]
    df = _vectors(spark, rows)
    a = sorted(map(tuple, quantize_int8(df).collect()))
    b = sorted(map(tuple, quantize_int8(df.repartition(9)).collect()))
    assert a == b
