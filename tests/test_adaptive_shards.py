"""Adaptive crawl delay (operators/quantiles.adaptive_crawl_delay) and
aspect-bucket shard manifest (operators/multimodal.aspect_bucket_shards)."""

from __future__ import annotations

from newsfeeds_crawler_spark.operators.multimodal import aspect_bucket_shards
from newsfeeds_crawler_spark.operators.quantiles import adaptive_crawl_delay


def test_adaptive_delay_exact_p95_and_clamps(spark):
    rows = (
        # host "slow": 100 samples 0..99 * 1000ms -> p95 = 95_000 -> max clamp
        [("slow", i * 1000) for i in range(100)]
        # host "fast": 100 samples 0..99 ms -> p95 = 95 -> 190 -> min clamp
        + [("fast", i) for i in range(100)]
        # host "mid": 100 samples 0..99 * 20 -> p95 = 1900 -> 3800 interior
        + [("mid", i * 20) for i in range(100)]
    )
    lat = spark.createDataFrame(rows, "host string, latency_ms long")
    out = {r.host: r for r in adaptive_crawl_delay(lat).collect()}
    # PERCENTILE_DISC rank (95*100+99)//100 = 95 -> the 95th smallest,
    # which is value index 94 (0-based) = 94*unit
    assert out["slow"].p95_ms == 94_000 and out["slow"].delay_ms == 30_000
    assert out["fast"].p95_ms == 94 and out["fast"].delay_ms == 500
    assert out["mid"].p95_ms == 1880 and out["mid"].delay_ms == 3760
    assert all(r.n_samples == 100 for r in out.values())


def test_adaptive_delay_gate_regimes_all_bind(spark):
    """The driver gate's synthetic latencies must exercise min-clamp,
    interior, and max-clamp, or the oracle check proves less than it
    claims."""
    import __spark_entry__ as E

    out = E.queries()["politeness_adaptive_delay"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert any(r.delay_ms == 500 for r in out)
    assert any(r.delay_ms == 30_000 for r in out)
    assert any(500 < r.delay_ms < 30_000 for r in out)


def _img(spark, rows):
    return spark.createDataFrame(rows, "image_id long, w int, h int")


def test_aspect_buckets_and_batch_layout(spark):
    # 70 square images (bucket 4) with batch_size=32: batches 0,1 full,
    # batch 2 holds 6 tail rows; one wide image lands alone in bucket 8
    rows = [(i, 512, 512) for i in range(70)] + [(1000, 4096, 256)]
    out = {
        r.image_id: r
        for r in aspect_bucket_shards(
            _img(spark, rows), batch_size=32, batches_per_shard=2
        ).collect()
    }
    sq = [out[i] for i in range(70)]
    assert all(r.bucket == 4 for r in sq)
    assert [r for r in sq if r.batch == 0 and not r.batch_is_full] == []
    assert sum(1 for r in sq if r.batch == 2) == 6
    assert all(not r.batch_is_full for r in sq if r.batch == 2)
    # shard = batch div 2
    assert {r.batch: r.shard for r in sq} == {0: 0, 1: 0, 2: 1}
    # position follows id order
    assert out[0].pos_in_bucket == 0 and out[69].pos_in_bucket == 69
    assert out[1000].bucket == 8  # (4096*4) div 256 = 64 -> clamped to 8
    assert not out[1000].batch_is_full


def test_aspect_shards_partition_invariance(spark):
    rows = [(i, 64 + (i * 13) % 500, 64 + (i * 29) % 500) for i in range(300)]
    df = _img(spark, rows)
    a = sorted(map(tuple, aspect_bucket_shards(df).collect()))
    b = sorted(map(tuple, aspect_bucket_shards(df.repartition(7)).collect()))
    assert a == b
