"""DSIR importance resampling (operators/importance.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from newsfeeds_crawler_spark.operators.importance import (
    importance_resample,
    importance_weights,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_importance_weights_direction(spark):
    # in-domain docs talk about spark clusters; out-domain about cooking.
    raw = _docs(
        spark,
        [(i, "spark cluster shuffle join " * 5) for i in range(10)]
        + [(100 + i, "butter flour sugar oven " * 5) for i in range(10)],
    )
    target = raw.filter(F.col("doc_id") < 3)  # target = spark-domain slice
    scored = {r.doc_id: r for r in importance_weights(raw, target).collect()}
    spark_scores = [scored[i].avg_logratio for i in range(10)]
    cook_scores = [scored[100 + i].avg_logratio for i in range(10)]
    assert min(spark_scores) > max(cook_scores)
    # identical docs score identically (pure function of content)
    assert len(set(spark_scores)) == 1 and len(set(cook_scores)) == 1


def test_importance_weights_short_docs_zero(spark):
    raw = _docs(spark, [(1, "one"), (2, ""), (3, "a b")])
    out = {r.doc_id: r for r in importance_weights(raw, raw).collect()}
    assert out[1].n_feats == 0 and out[1].score_q == 0
    assert out[2].n_feats == 0
    assert out[3].n_feats == 1  # one bigram


def test_resample_topk_deterministic_and_partition_invariant(spark):
    raw = _docs(
        spark,
        [(i, f"tok{i % 7} tok{(i * 3) % 7} tok{i % 5}") for i in range(60)],
    )
    target = raw.filter(F.col("doc_id") % 7 == 0)
    scored = importance_weights(raw, target)
    a = importance_resample(scored, 15).collect()
    b = importance_resample(scored.repartition(13), 15).collect()
    assert len(a) == 15
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    ranks = sorted((r.rank, r.key_q, r.doc_id) for r in a)
    # rank follows (key_q desc, doc_id asc) exactly
    keys = [(-r.key_q, r.doc_id) for r in sorted(a, key=lambda r: r.rank)]
    assert keys == sorted(keys)
    assert [r[0] for r in ranks] == list(range(1, 16))
    # the selected set is the true top-15 of the full keyed frame
    from newsfeeds_crawler_spark.operators.importance import gumbel_q

    full = scored.withColumn(
        "key_q",
        F.col("score_q") + gumbel_q(F.col("doc_id").cast("string")),
    ).collect()
    expect = sorted(full, key=lambda r: (-r.key_q, r.doc_id))[:15]
    assert {r.doc_id for r in a} == {r.doc_id for r in expect}


def test_gumbel_perturbation_changes_tail_order_only_sometimes(spark):
    # with all-equal scores the selection is decided purely by the
    # deterministic Gumbel draws — i.e. a reproducible uniform sample
    raw = _docs(spark, [(i, "same text here") for i in range(40)])
    scored = importance_weights(raw, raw.limit(5))
    sel = {r.doc_id for r in importance_resample(scored, 10).collect()}
    sel2 = {r.doc_id for r in importance_resample(scored, 10).collect()}
    assert sel == sel2 and len(sel) == 10
