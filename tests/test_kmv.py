"""KMV synopses (operators/kmv.py): exactness below k, estimator
accuracy above k, mergeability, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from newsfeeds_crawler_spark.operators.kmv import (
    KMV_K,
    kmv_estimate,
    kmv_synopsis,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "grp string, url string")


def test_exact_below_k_and_duplicate_insensitive(spark):
    rows = [("a", f"u{i}") for i in range(20)] * 3  # dups must not count
    out = kmv_synopsis(_df(spark, rows), "grp", "url", k=64)
    assert out.count() == 20
    est = kmv_estimate(out, "grp", k=64).first()
    assert (est.n_kept, est.est_distinct) == (20, 20)


def test_estimator_accuracy_above_k(spark):
    n = 5000
    rows = [("a", f"https://h{i}.example.com/p{i}") for i in range(n)]
    syn = kmv_synopsis(_df(spark, rows), "grp", "url", k=256)
    est = kmv_estimate(syn, "grp", k=256).first().est_distinct
    # KMV relative error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(est - n) / n < 0.25, est


def test_synopsis_partition_invariant_and_merge(spark):
    rows = [("a", f"u{i}") for i in range(1000)]
    df = _df(spark, rows)
    a = sorted(map(tuple, kmv_synopsis(df, "grp", "url", k=32).collect()))
    b = sorted(
        map(tuple, kmv_synopsis(df.repartition(13), "grp", "url", k=32).collect())
    )
    assert a == b and len(a) == 32
    # merge = union of two halves' synopses, re-ranked and trimmed —
    # equals the synopsis of the union (the mergeability property)
    h1 = df.filter(F.col("url").substr(2, 10).cast("long") % 2 == 0)
    h2 = df.subtract(h1)
    s1 = kmv_synopsis(h1, "grp", "url", k=32)
    s2 = kmv_synopsis(h2, "grp", "url", k=32)
    merged = kmv_synopsis(
        s1.unionByName(s2).select("grp", F.col("value").alias("url")),
        "grp",
        "url",
        k=32,
    )
    assert sorted(map(tuple, merged.collect())) == a


def test_rank_orders_by_hash_and_groups_isolated(spark):
    rows = [("a", f"u{i}") for i in range(100)] + [
        ("b", f"v{i}") for i in range(5)
    ]
    syn = kmv_synopsis(_df(spark, rows), "grp", "url", k=8).collect()
    by_grp = {}
    for r in syn:
        by_grp.setdefault(r.grp, []).append(r)
    assert len(by_grp["a"]) == 8 and len(by_grp["b"]) == 5
    for g, rs in by_grp.items():
        rs = sorted(rs, key=lambda r: r.rk)
        assert [r.h for r in rs] == sorted(r.h for r in rs)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
