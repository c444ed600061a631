"""Partitioned cuckoo filter: no false negatives, bounded FPR, deletion."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from newsfeeds_crawler_spark.operators.cuckoo import (
    CuckooTable,
    PartitionedCuckoo,
)


def test_table_no_false_negatives_and_bounded_fpr():
    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)
    keys = np.unique(keys)
    t = CuckooTable.with_capacity(len(keys))
    inserted = t.add_many(keys)
    assert inserted == len(keys)  # capacity sized → no drops
    assert t.contains_many(keys).all()  # no false negatives
    probe = rng.integers(-(2**62), 2**62, size=50_000, dtype=np.int64)
    probe = np.setdiff1d(probe, keys)
    fpr = t.contains_many(probe).mean()
    assert fpr < 0.01  # 16-bit fp, 4 slots → ~2^-13 per slot pair


def test_table_delete_removes_membership():
    keys = np.arange(1, 5_001, dtype=np.int64) * 7919
    t = CuckooTable.with_capacity(len(keys))
    t.add_many(keys)
    victims = keys[::10]
    removed = t.delete_many(victims)
    assert removed == len(victims)
    assert not t.contains_many(victims).any() or (
        # deleted keys may still collide with OTHER keys' fingerprints —
        # allow the structural FPR, not stale entries
        t.contains_many(victims).mean() < 0.01
    )
    survivors = np.setdiff1d(keys, victims)
    assert t.contains_many(survivors).all()  # deletes never harm others


def test_roundtrip_bytes():
    keys = np.arange(100, dtype=np.int64)
    t = CuckooTable.with_capacity(1000)
    t.add_many(keys)
    t2 = CuckooTable.from_bytes(t.to_bytes(), t.n_items)
    assert t2.contains_many(keys).all()


def test_partitioned_split_no_false_negatives(spark):
    seen = spark.range(0, 5_000).select((F.col("id") * 2654435761).alias("k"))
    pc = PartitionedCuckoo.build(
        seen, key="k", num_partitions=8, expected_per_partition=2_000
    )
    cands = spark.range(0, 10_000).select((F.col("id") * 2654435761).alias("k"))
    maybe, new = pc.split(cands, "k")
    maybe_ids = {r.k for r in maybe.collect()}
    seen_ids = {r.k for r in seen.collect()}
    assert seen_ids <= maybe_ids  # every true member says maybe
    assert len(maybe_ids) - len(seen_ids) < 200  # FPs bounded
    assert maybe.count() + new.count() == 10_000


def test_partitioned_incremental_add_delete(spark):
    seen = spark.range(0, 1_000).select(F.col("id").alias("k"))
    pc = PartitionedCuckoo.build(
        seen, key="k", num_partitions=4, expected_per_partition=2_000
    )
    pc.add_keys(np.arange(1_000, 1_100))
    assert pc.delete_keys(np.arange(0, 50)) == 50
    cands = spark.range(0, 1_100).select(F.col("id").alias("k"))
    flags = {
        r["k"]: r["__maybe_seen"]
        for r in pc.contains_col(cands, "k").collect()
    }
    assert all(flags[k] for k in range(50, 1_100))  # survivors + added
    fp_rate = sum(flags[k] for k in range(0, 50)) / 50
    assert fp_rate < 0.2  # deleted keys mostly gone (collisions allowed)


def test_crawl_with_cuckoo_prefilter_identical(spark, tmp_path):
    from newsfeeds_crawler_spark.oracle import simulate
    from newsfeeds_crawler_spark.plans import CrawlConfig, CrawlEngine
    from newsfeeds_crawler_spark.synth import CorpusSpec, synthesize
    from newsfeeds_crawler_spark.synth.tables import (
        corpus_df, hosts_df, preseen_df, seeds_df,
    )

    corpus = synthesize(CorpusSpec(n_feeds=5, items_per_feed=6, n_hosts=4))
    oracle = simulate(corpus)
    eng = CrawlEngine(
        spark, str(tmp_path / "cuckoo"),
        corpus_df(spark, corpus).cache(), hosts_df(spark, corpus),
        seeds_df(spark, corpus), preseen_df(spark, corpus),
        CrawlConfig(workers=corpus.spec.workers, seen_filter="cuckoo",
                    bloom_expected_per_bucket=1000),
    )
    eng.run()
    got = [
        (r["url_canon"], r["fetch_epoch"], r["admit_rank"])
        for r in eng.crawl_order().collect()
    ]
    assert got == oracle.crawl_order


def test_incremental_adds_grow_by_chaining_stash_stays_tiny():
    """A partition whose table saturates must open a new chained table
    instead of degrading into unbounded stash appends (probe = linear
    scan); membership must stay exact across the chain."""
    from newsfeeds_crawler_spark.operators.cuckoo import _pack_chain, _unpack_chain

    pc = PartitionedCuckoo({0: [CuckooTable.with_capacity(256)]}, 1)
    all_keys = []
    for step in range(40):  # 40 x 200 = 8000 keys into a 256-capacity start
        ks = np.arange(step * 200, step * 200 + 200, dtype=np.int64) * 7919 + 1
        pc.add_keys(ks)
        all_keys.append(ks)
    keys = np.concatenate(all_keys)
    chain = pc.chains[0]
    assert len(chain) > 1  # it actually grew
    for t in chain:
        assert len(t.stash) <= 16  # stash invariant holds under heavy load
    from newsfeeds_crawler_spark.operators.cuckoo import _chain_contains

    assert _chain_contains(chain, keys).all()  # no false negatives
    # serialization round-trips the whole chain (versioned header format)
    chain2 = _unpack_chain(_pack_chain(chain), sum(t.n_items for t in chain))
    assert len(chain2) == len(chain)
    assert _chain_contains(chain2, keys).all()


def test_chained_filter_df_roundtrip_and_delete(spark):
    pc = PartitionedCuckoo({0: [CuckooTable.with_capacity(128)]}, 1)
    keys = np.arange(1, 2001, dtype=np.int64)
    pc.add_keys(keys)
    assert len(pc.chains[0]) > 1
    pc2 = PartitionedCuckoo.from_df(pc.to_df(spark), 1)
    assert len(pc2.chains[0]) == len(pc.chains[0])
    # deletes find keys living in ANY table of the chain
    assert pc2.delete_keys(np.array([1, 500, 1999], dtype=np.int64)) == 3
    cands = spark.range(1, 2001).select(F.col("id").alias("k"))
    flags = {
        r["k"]: r["__maybe_seen"] for r in pc2.contains_col(cands, "k").collect()
    }
    assert sum(flags.values()) >= 2000 - 3  # survivors all positive


def test_legacy_blob_trailer_collision_parses_as_raw_table():
    """A pre-trailer blob whose last 8 bytes happen to decode as
    [n, STASH_MAGIC] must NOT be misparsed as a stash trailer — the
    validated parse falls back to the raw-table interpretation."""
    keys = np.arange(1, 101, dtype=np.int64) * 31
    t = CuckooTable.with_capacity(500)
    t.add_many(keys)
    # forge the collision in the final bucket's last two slots:
    # trailer uint32[1] = slots[2] | slots[3]<<16 = 0x0C0C0C0C
    t.table[-1, 2] = 0x0C0C
    t.table[-1, 3] = 0x0C0C
    t.table[-1, 0] = 0xFFFF  # "n_stash" low half — absurd count
    raw_legacy = t.table.tobytes()  # old format: table bytes only
    t2 = CuckooTable.from_bytes(raw_legacy, t.n_items)
    assert t2.table.shape == t.table.shape  # parsed as raw, not corrupted
    # keys whose buckets the forgery itself clobbered are excluded — the
    # point is the PARSE: under the old heuristic the blob tail was
    # stripped as a fake stash and every key's bucket index shifted
    from newsfeeds_crawler_spark.operators.cuckoo import (
        _alt_index,
        _fingerprint,
        _index1,
    )

    nb = t.table.shape[0]
    u = keys.astype(np.uint64)
    i1 = _index1(u, nb)
    i2 = _alt_index(i1, _fingerprint(u), nb).astype(np.int64)
    safe = keys[(i1 != nb - 1) & (i2 != nb - 1)]
    assert len(safe) > 50
    assert t2.contains_many(safe).all()
