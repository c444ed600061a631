"""Curation operators (operators/curation.py): benchmark decontamination,
deterministic stratified sampling, self-trained bigram-LM scoring, and
mixture weights — planted-example semantics plus a full gate-vs-DuckDB
hash check at sf0.001 (the driver repeats it at sf0.01 through
__spark_entry__)."""

from __future__ import annotations

import math

import duckdb
import pytest

from newsfeeds_crawler_spark.operators.curation import (
    BIGRAM_KEEP_MIN,
    CANARY,
    LOGP_QUANT,
    SAMPLE_BUCKETS,
    SAMPLE_RATE_HIGH,
    SAMPLE_RATE_LOW,
    SAMPLE_RATE_MID,
    bigram_lm_score,
    decontaminate,
    mixture_weights,
    sample_stratified,
)

# ------------------------------------------------------- decontamination


def test_decontaminate_planted_overlap(spark):
    # doc 0 is the benchmark slice (0 % 37 == 0); doc 2 shares a 5-gram
    # with it verbatim; doc 1 is clean; doc 3 is too short to emit grams.
    bench = "alpha beta gamma delta epsilon zeta eta"
    docs = spark.createDataFrame(
        [
            (0, bench),
            (1, " ".join(f"u{i}" for i in range(10))),
            (2, "x y alpha beta gamma delta epsilon z"),
            (3, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in decontaminate(docs, bench_mod=37).collect()}
    assert set(rows) == {1, 2, 3}  # benchmark doc 0 excluded
    assert not rows[1].contaminated and rows[1].n_overlap == 0
    assert rows[2].contaminated and rows[2].n_overlap == 1
    assert rows[3].n_grams == 0 and not rows[3].contaminated


def test_decontaminate_canary_plants_hits(spark):
    # with default mods, doc 0 is bench and doc 11/22/... are train docs
    # carrying the planted canary — every canary 5-gram overlaps.
    n_canary_grams = len(CANARY.split()) - 4
    docs = spark.createDataFrame(
        [(i, f"filler{i} " + " ".join(f"t{i}x{j}" for j in range(6)))
         for i in range(40)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in decontaminate(docs).collect()}
    assert rows[11].contaminated and rows[11].n_overlap >= n_canary_grams
    assert rows[22].contaminated
    assert not rows[1].contaminated


def test_decontaminate_broadcast_off_same_result(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}w{j}" for j in range(8))) for i in range(30)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, decontaminate(docs, broadcast_bench=True).collect()))
    b = sorted(map(tuple, decontaminate(docs, broadcast_bench=False).collect()))
    assert a == b


# ------------------------------------------------- deterministic sampling


def test_sample_thresholds_and_determinism(spark):
    docs = spark.createDataFrame(
        [(i, "the of and to a in is it " * 20) for i in range(200)],
        "doc_id long, text string",
    )
    out1 = {r.doc_id: r for r in sample_stratified(docs).collect()}
    out2 = {r.doc_id: r for r in sample_stratified(docs.repartition(7)).collect()}
    # identical decisions regardless of partitioning
    assert {k: tuple(v) for k, v in out1.items()} == {
        k: tuple(v) for k, v in out2.items()
    }
    for r in out1.values():
        thr = {"high": SAMPLE_RATE_HIGH, "mid": SAMPLE_RATE_MID,
               "low": SAMPLE_RATE_LOW}[r.band]
        assert 0 <= r.bucket < SAMPLE_BUCKETS
        assert r.kept == (r.bucket < thr)


def test_sample_rate_approximates_threshold(spark):
    # one band, many docs: empirical keep rate ≈ thr/buckets
    docs = spark.createDataFrame(
        [(i, "the of and to a in is it " * 20) for i in range(2000)],
        "doc_id long, text string",
    )
    out = sample_stratified(docs).collect()
    assert {r.band for r in out} == {"high"}
    rate = sum(r.kept for r in out) / len(out)
    assert abs(rate - SAMPLE_RATE_HIGH / SAMPLE_BUCKETS) < 0.05


# --------------------------------------------------- bigram LM scoring


def test_bigram_lm_hand_computed(spark):
    # corpus: "a b a b", "a c", "solo" → vocab {a,b,c,solo} V=4
    # unigrams: a:3 b:2 c:1 solo:1
    # bigrams:  "a b":2 "b a":1 "a c":1
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c"), (3, "solo")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in bigram_lm_score(docs).collect()}

    def q(c2, c1):
        return round(math.log((c2 + 1) / (c1 + 4)) * LOGP_QUANT)

    # doc 1: grams a b (×2, logp q(2,3)), b a (×1, q(1,2))
    exp1 = 2 * q(2, 3) + q(1, 2)
    assert rows[1].n_bigrams == 3 and rows[1].sum_logp_q == exp1
    assert rows[1].avg_logprob == round(exp1 / 3 / LOGP_QUANT, 6)
    # doc 2: gram a c (×1, q(1,3))
    assert rows[2].n_bigrams == 1 and rows[2].sum_logp_q == q(1, 3)
    # doc 3: single token → no bigrams, dropped by keep
    assert rows[3].n_bigrams == 0 and rows[3].sum_logp_q == 0
    assert rows[3].avg_logprob == 0.0 and not rows[3].lm_keep


def test_bigram_lm_keep_binds_both_ways(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = bigram_lm_score(docs).collect()
    kept = sum(r.lm_keep for r in out)
    assert 0 < kept < len(out)
    for r in out:
        if r.n_bigrams > 0:
            assert r.lm_keep == (r.avg_logprob >= BIGRAM_KEEP_MIN)


# ----------------------------------------------------- mixture weights


def test_mixture_weights_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "s1", "a b c d"), (2, "s1", "e f"), (3, "s2", "g h")],
        "doc_id long, source string, text string",
    )
    out = {r.source: r for r in mixture_weights(docs).collect()}
    assert out["s1"].n_docs == 2 and out["s1"].n_tokens == 6
    assert out["s2"].n_docs == 1 and out["s2"].n_tokens == 2
    wq1 = round(6**0.7 * 1_000_000)
    wq2 = round(2**0.7 * 1_000_000)
    assert out["s1"].weight == round(wq1 / (wq1 + wq2), 6)
    assert out["s2"].weight == round(wq2 / (wq1 + wq2), 6)
    assert abs(out["s1"].weight + out["s2"].weight - 1.0) < 1e-5


# ------------------------------------------------- gate-vs-DuckDB mirror


@pytest.mark.parametrize(
    "gate",
    [
        "text_decontaminate",
        "corpus_sample",
        "text_bigram_lm",
        "corpus_mixture_weights",
    ],
)
def test_gate_matches_duckdb_oracle(spark, sf_dir, gate):
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from tools.check_entry import canon_hash

    sdf = entry.queries()[gate](spark, sf_dir)
    srows, scols = sdf.collect(), sdf.columns
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    cur = con.execute(entry.oracle_sql()[gate])
    dcols = [c[0] for c in cur.description]
    drows = cur.fetchall()
    assert len(srows) == len(drows)
    assert sorted(scols) == sorted(dcols)
    assert canon_hash([tuple(r) for r in srows], scols) == canon_hash(
        drows, dcols
    )
