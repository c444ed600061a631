"""TF-IDF retrieval (operators/tfidf.py) — exact equality vs a pure-Python
replication of the integer-quantized contract, plus ranking sanity."""

from __future__ import annotations

import math

import pytest

from newsfeeds_crawler_spark.operators.tfidf import SCALE, tfidf_topk

DOCS = [
    (0, "spark shuffle join broadcast join"),
    (1, "spark shuffle join broadcast join"),          # exact dup of 0
    (2, "spark window rank filter"),
    (3, "duck oracle hash gate gate gate"),
    (4, "broadcast join spark"),
    (5, "completely different words entirely"),
    (6, "window rank spark filter extra"),
]


def _py_tfidf_topk(docs, query_ids, k):
    toks = {i: t.lower().split() for i, t in docs}
    tf = {i: {} for i, _ in docs}
    for i, ts in toks.items():
        for t in ts:
            tf[i][t] = tf[i].get(t, 0) + 1
    n = len(docs)
    df = {}
    for i in tf:
        for t in tf[i]:
            df[t] = df.get(t, 0) + 1
    iw = {
        t: round((math.log((n + 1.0) / (d + 1.0)) + 1.0) * SCALE)
        for t, d in df.items()
    }
    w = {i: {t: c * iw[t] for t, c in tf[i].items()} for i in tf}
    n2 = {i: sum(v * v for v in ws.values()) for i, ws in w.items()}
    out = []
    for q in query_ids:
        scored = []
        for i in w:
            if i == q:
                continue
            dot = sum(w[q][t] * w[i][t] for t in w[q] if t in w[i])
            if dot == 0:
                continue  # engine only scores docs sharing a term
            s = round(dot / (math.sqrt(n2[q]) * math.sqrt(n2[i])), 6)
            scored.append((i, s))
        scored.sort(key=lambda p: (-p[1], p[0]))
        for r, (i, s) in enumerate(scored[:k], 1):
            out.append((q, r, i, s))
    return sorted(out)


@pytest.fixture(scope="module")
def result(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = docs.filter("doc_id in (0, 3, 5)")
    rows = tfidf_topk(docs, qs, k=3).collect()
    return sorted(
        (r["query_id"], r["rank"], r["match_id"], r["score"]) for r in rows
    )


def test_matches_python_replication_exactly(result):
    assert result == _py_tfidf_topk(DOCS, [0, 3, 5], 3)


def test_exact_duplicate_ranks_first_with_cosine_one(result):
    top = {(q, r): (m, s) for q, r, m, s in result}
    assert top[(0, 1)] == (1, 1.0)


def test_disjoint_doc_gets_no_matches(result):
    # doc 5 shares no term with any other doc -> inverted-index join
    # yields nothing for it (never a cross join producing zero scores)
    assert not [r for r in result if r[0] == 5]


def test_shuffle_path_equals_broadcast_path_and_plan(spark):
    """Vocab/query sets past broadcast size: pinning idf_join='shuffle' and
    broadcast_queries=False must produce bit-identical results to the
    broadcast path — and the pinned plan must contain shuffled-hash joins
    with NO BroadcastExchange anywhere (the OOM shape at a 100 TB corpus
    where queries are a fixed corpus fraction)."""
    # a synthetic large-vocab corpus: every doc contributes unique terms
    # plus a shared core so the inverted index has real candidate pairs
    rows = [
        (i, f"core{i % 7} shared spark u{i}a u{i}b u{i}c u{(i * 13) % 200}x")
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    qs = docs.filter("doc_id % 9 = 0")

    base = tfidf_topk(docs, qs, k=5)
    pinned = tfidf_topk(
        docs, qs, k=5, broadcast_queries=False, idf_join="shuffle"
    )
    # sparkPlan is pre-EnsureRequirements (exchange nodes not yet
    # inserted), so pin the JOIN nodes: all shuffled-hash, zero broadcast
    plan = pinned._jdf.queryExecution().sparkPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, pinned.collect())
    )


def test_auto_query_broadcast_threshold(spark):
    """broadcast_queries=None sizes the query set: below the threshold the
    plan broadcasts, above it the scoring join is shuffle-hash."""
    rows = [(i, f"alpha beta w{i}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    qs = docs.filter("doc_id < 20")
    small = tfidf_topk(docs, qs, k=3, max_broadcast_queries=30)
    assert "BroadcastHashJoin" in small._jdf.queryExecution().sparkPlan().toString()
    big = tfidf_topk(docs, qs, k=3, max_broadcast_queries=10)
    p2 = big._jdf.queryExecution().sparkPlan().toString()
    assert "ShuffledHashJoin" in p2
    assert sorted(map(tuple, small.collect())) == sorted(map(tuple, big.collect()))


def test_tf_clamp_keeps_degenerate_doc_inside_int64(spark):
    """A degenerate repeated-token document (tf ≈ 10⁶) must not abort with
    an ANSI int64 overflow: tf clamps at TF_CLAMP on both engines."""
    from newsfeeds_crawler_spark.operators.tfidf import TF_CLAMP, doc_terms

    big_doc = "word " * 50_000
    docs = spark.createDataFrame(
        [(0, big_doc), (1, "word other text"), (2, "unrelated stuff")],
        "doc_id long, text string",
    )
    dt = {(r["__id"], r["term"]): r["tf"] for r in doc_terms(docs).collect()}
    assert dt[(0, "word")] == TF_CLAMP
    out = tfidf_topk(docs, docs.filter("doc_id = 1"), k=2).collect()
    assert [r["match_id"] for r in out][0] == 0  # the clamped doc still tops
