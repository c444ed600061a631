"""Exact duplicated-substring span removal (operators/spandedup.py):
planted-span semantics, maximal-interval merging, within-doc repeats,
summary accounting, and partitioning invariance."""

from __future__ import annotations

from newsfeeds_crawler_spark.operators.spandedup import (
    duplicate_spans,
    span_removal_summary,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _uw(n, prefix):
    """n globally-unique filler tokens (never part of any duplicate)."""
    return " ".join(f"{prefix}{i}" for i in range(n))


DUP8 = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
DUP12 = DUP8 + " india juliett kilo"  # 11... make it 12
DUP12 = DUP8 + " india juliett kilo lima"  # 12 tokens


def test_no_duplicates_no_spans(spark):
    d = _docs(spark, [(1, _uw(20, "a")), (2, _uw(20, "b"))])
    assert duplicate_spans(d, window=8).count() == 0


def test_planted_cross_doc_span_positions(spark):
    # DUP12 at token offset 5 in doc 1 and offset 0 in doc 2: 5 rolling
    # 8-windows each, merged into ONE maximal 12-token span per doc
    d = _docs(
        spark,
        [
            (1, _uw(5, "a") + " " + DUP12 + " " + _uw(6, "c")),
            (2, DUP12 + " " + _uw(9, "d")),
        ],
    )
    rows = {
        (r.doc_id, r.span_id): r
        for r in duplicate_spans(d, window=8).collect()
    }
    assert set(rows) == {(1, 1), (2, 1)}
    r1, r2 = rows[(1, 1)], rows[(2, 1)]
    assert (r1.start_tok, r1.end_tok, r1.span_tokens, r1.n_windows) == (
        5, 16, 12, 5,
    )
    assert (r2.start_tok, r2.end_tok, r2.span_tokens, r2.n_windows) == (
        0, 11, 12, 5,
    )


def test_within_doc_repeat_is_a_duplicate(spark):
    # DUP8 appears twice inside ONE doc, separated by unique filler: both
    # occurrences are flagged (occurrence count >= 2 anywhere), as two
    # separate maximal spans
    d = _docs(
        spark,
        [(7, DUP8 + " " + _uw(10, "x") + " " + DUP8)],
    )
    rows = sorted(
        duplicate_spans(d, window=8).collect(), key=lambda r: r.start_tok
    )
    assert [(r.start_tok, r.end_tok) for r in rows] == [(0, 7), (18, 25)]


def test_adjacent_duplicate_regions_merge(spark):
    # two docs share the SAME 16-token region (DUP8 twice back-to-back):
    # every window inside — including the ones straddling the middle — is
    # duplicated, so each doc reports ONE merged 16-token span
    text = DUP8 + " " + DUP8
    d = _docs(
        spark,
        [(1, text + " " + _uw(4, "p")), (2, _uw(3, "q") + " " + text)],
    )
    rows = {r.doc_id: r for r in duplicate_spans(d, window=8).collect()}
    assert rows[1].start_tok == 0 and rows[1].end_tok == 15
    assert rows[2].start_tok == 3 and rows[2].end_tok == 18
    assert rows[1].span_tokens == rows[2].span_tokens == 16
    assert rows[1].n_windows == 9  # positions 0..8


def test_summary_accounts_every_token_once(spark):
    d = _docs(
        spark,
        [
            (1, _uw(5, "a") + " " + DUP12 + " " + _uw(6, "c")),
            (2, DUP12 + " " + _uw(9, "d")),
            (3, _uw(15, "e")),  # no spans
            (4, "tiny doc"),  # shorter than the window
        ],
    )
    out = {r.doc_id: r for r in span_removal_summary(d, window=8).collect()}
    assert set(out) == {1, 2, 3, 4}
    for r in out.values():
        assert r.kept_tokens + r.removed_tokens == r.n_tokens
    assert out[1].removed_tokens == 12 and out[1].n_spans == 1
    assert out[2].removed_tokens == 12 and out[2].n_spans == 1
    assert out[3].removed_tokens == 0 and out[3].n_spans == 0
    assert out[4].n_tokens == 2 and out[4].removed_tokens == 0


def test_partition_invariance(spark):
    docs = [
        (i, (DUP12 + " " if i % 3 == 0 else "") + _uw(10, f"u{i}_"))
        for i in range(30)
    ]
    d = _docs(spark, docs)
    a = sorted(map(tuple, duplicate_spans(d, window=8).collect()))
    b = sorted(
        map(tuple, duplicate_spans(d.repartition(7), window=8).collect())
    )
    assert a == b and len(a) == 10
