"""Corpus-quality operators (operators/textquality.py): repetition
filters, segment dedup, PII scrub — planted-example semantics plus a
full gate-vs-DuckDB hash check at sf0.001 (the driver repeats it at
sf0.01 through __spark_entry__)."""

from __future__ import annotations

import duckdb
import pytest

from newsfeeds_crawler_spark.operators.textquality import (
    curation_verdict,
    pii_scrub,
    repetition_stats,
    segment_dedup,
)

UNIQ = " ".join(f"w{i}" for i in range(40))  # 40 distinct tokens
LOOP = "spam ham " * 30  # one bigram dominates
SHARED16 = " ".join(f"s{i}" for i in range(16))  # a full shared window


def test_repetition_flags_looping_doc(spark):
    docs = spark.createDataFrame(
        [(0, UNIQ), (1, LOOP), (2, "a b")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert rows[0].rep_ok and rows[0].top_bigram_frac < 0.1
    # "spam ham spam ham ..." → 'spam ham' is 30 of 59 bigrams, every
    # trigram occurs ≥ 2× → both fractions blow the thresholds
    assert not rows[1].rep_ok
    assert rows[1].top_bigram_frac > 0.5
    assert rows[1].dup_trigram_char_frac == 1.0
    # 2 tokens → one bigram (frac 1.0 > 0.2 ⇒ drop), no trigram
    assert rows[2].top_bigram_frac == 1.0
    assert rows[2].dup_trigram_char_frac == 0.0 and not rows[2].rep_ok


def test_repetition_short_doc_has_row(spark):
    docs = spark.createDataFrame([(7, "solo")], "doc_id long, text string")
    rows = repetition_stats(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.top_bigram_frac == 0.0 and r.dup_trigram_char_frac == 0.0
    assert r.rep_ok


def test_segment_dedup_cross_doc_and_within_doc(spark):
    docs = spark.createDataFrame(
        [
            (0, SHARED16 + " " + UNIQ),          # window 0 shared with doc 1
            (1, SHARED16 + " tail only here"),   # window 0 shared with doc 0
            (2, UNIQ.replace("w", "x")),         # fully unique
            (3, SHARED16 + " " + SHARED16),      # window repeated WITHIN doc
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in segment_dedup(docs).collect()}
    assert rows[0].n_segments == 4 and rows[0].n_dup_segments == 1
    assert rows[0].keep
    assert rows[1].n_dup_segments == 1 and rows[1].n_segments == 2
    assert rows[1].dup_ratio == 0.5 and not rows[1].keep  # ratio < 0.5 fails
    assert rows[2].n_dup_segments == 0 and rows[2].keep
    assert rows[3].n_dup_segments == 2 and not rows[3].keep


def test_pii_scrub_counts_and_clean(spark):
    # doc_id 105 = 3·5·7 → all three classes injected; 1 → none
    docs = spark.createDataFrame(
        [(105, "hello world"), (1, "hello world")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert (rows[105].n_email, rows[105].n_phone, rows[105].n_ipv4) == (1, 1, 1)
    assert (rows[1].n_email, rows[1].n_phone, rows[1].n_ipv4) == (0, 0, 0)
    assert rows[105].clean and rows[1].clean
    # no injection ⇒ the scrubbed text IS the original; pin its poly hash
    fp = 0
    for ch in "hello world":
        fp = (fp * 131 + ord(ch)) % (2**31 - 1)
    assert rows[1].fp_scrubbed == fp
    assert rows[105].fp_scrubbed != fp  # placeholders changed the bytes


def test_curation_verdict_reason_precedence(spark):
    # doc 1 fails repetition AND (via self-duplicated windows) segments:
    # repetition must win the reason by precedence; doc 0 passes all rules
    docs = spark.createDataFrame(
        [(0, UNIQ + " the a and of to in is it that for"), (1, LOOP)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in curation_verdict(docs).collect()}
    assert rows[1].reason == "repetition" and not rows[1].keep
    assert rows[0].rep_ok and rows[0].seg_keep
    assert rows[0].keep == (rows[0].quality >= 0.3)
    assert rows[0].reason in ("ok", "low_quality")


@pytest.mark.parametrize(
    "gate",
    [
        "text_repetition_quality",
        "dedup_segment_exact",
        "text_pii_scrub",
        "curation_verdict",
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
