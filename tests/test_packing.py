"""Training-sequence packing (operators/packing.py): exact offsets,
boundary flags, per-shard isolation, rollup accounting, and partition
invariance."""

from __future__ import annotations

from newsfeeds_crawler_spark.operators.packing import (
    pack_sequences,
    shard_pack_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def _words(n):
    return " ".join(["w"] * n)


def test_offsets_and_boundaries_exact(spark):
    # shard A in doc_id order: 5, 8, 3 tokens with seq_len=8
    #   doc 1: [0..4]   -> seq 0 only
    #   doc 2: [5..12]  -> seqs 0-1, spans
    #   doc 3: [13..15] -> seq 1, ends exactly on the boundary (15 % 8 = 7)
    d = _docs(
        spark,
        [
            (1, _words(5), "A"),
            (2, _words(8), "A"),
            (3, _words(3), "A"),
        ],
    )
    out = {r.doc_id: r for r in pack_sequences(d, seq_len=8).collect()}
    assert (out[1].start_offset, out[1].first_seq, out[1].last_seq) == (0, 0, 0)
    assert not out[1].spans_boundary and not out[1].ends_on_boundary
    assert (out[2].start_offset, out[2].first_seq, out[2].last_seq) == (5, 0, 1)
    assert out[2].spans_boundary and out[2].n_seqs == 2
    assert (out[3].start_offset, out[3].first_seq, out[3].last_seq) == (13, 1, 1)
    assert out[3].ends_on_boundary and not out[3].spans_boundary


def test_shards_pack_independently(spark):
    d = _docs(
        spark,
        [
            (1, _words(6), "A"),
            (2, _words(6), "B"),  # B restarts at offset 0
            (3, _words(2), "B"),
        ],
    )
    out = {r.doc_id: r for r in pack_sequences(d, seq_len=8).collect()}
    assert out[2].start_offset == 0
    assert out[3].start_offset == 6


def test_doc_id_order_not_input_order(spark):
    d = _docs(
        spark,
        [
            (9, _words(4), "A"),
            (1, _words(4), "A"),  # lower id packs first despite row order
        ],
    )
    out = {r.doc_id: r for r in pack_sequences(d, seq_len=8).collect()}
    assert out[1].start_offset == 0 and out[9].start_offset == 4


def test_rollup_accounting(spark):
    d = _docs(
        spark,
        [(i, _words(5 + i % 3), "A") for i in range(10)]
        + [(100 + i, _words(7), "B") for i in range(4)],
    )
    stats = {r.shard: r for r in shard_pack_stats(d, seq_len=8).collect()}
    per_doc = pack_sequences(d, seq_len=8).collect()
    for shard, r in stats.items():
        total = sum(p.n_tokens for p in per_doc if p.shard == shard)
        assert r.total_tokens == total
        assert r.full_seqs * 8 + r.tail_tokens == total
        assert r.n_spanning_docs == sum(
            1 for p in per_doc if p.shard == shard and p.spans_boundary
        )


def test_partition_invariance(spark):
    d = _docs(
        spark,
        [(i, _words(3 + i % 7), f"s{i % 3}") for i in range(60)],
    )
    a = sorted(map(tuple, pack_sequences(d, seq_len=16).collect()))
    b = sorted(
        map(tuple, pack_sequences(d.repartition(11), seq_len=16).collect())
    )
    assert a == b
