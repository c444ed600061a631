"""Integer PageRank (operators/linkgraph.py): hand-computed fixpoint on a
tiny graph, partitioning invariance, and the gate-vs-DuckDB hash check at
sf0.001 (the driver repeats it at sf0.01 through __spark_entry__)."""

from __future__ import annotations

import duckdb
import pytest

from newsfeeds_crawler_spark.operators.linkgraph import (
    PAGERANK_SCALE,
    pagerank_iter,
)

S = PAGERANK_SCALE


def test_pagerank_hand_computed(spark):
    # a(1)->b(2), a->c(3), b->a; c is dangling (leaks mass — weak variant)
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 1)], "src long, dst long"
    )
    r = {row.node: row for row in pagerank_iter(e, iters=3).collect()}
    # iter1: a=0.15S+0.85S=S          b=c=0.15S+0.85(S//2)=575e9
    # iter2: a=0.15S+0.85*575e9       b=c unchanged (a's rank back to S-ish)
    # iter3 worked through exactly in integers:
    assert r[1].rank_q == 638_750_000_000
    assert r[2].rank_q == 421_468_750_000
    assert r[3].rank_q == r[2].rank_q  # same in-flow (half of a's rank)
    assert r[1].rank == round(638_750_000_000 / S, 6)


def test_pagerank_partitioning_invariant(spark):
    e = spark.createDataFrame(
        [(i % 13, (i * 7) % 13) for i in range(60)], "src long, dst long"
    )
    a = sorted(map(tuple, pagerank_iter(e, iters=3).collect()))
    b = sorted(map(tuple, pagerank_iter(e.repartition(7), iters=3).collect()))
    assert a == b  # exact int64 ranks — no float drift across plans


def test_pagerank_dedups_edges_and_unions_nodes(spark):
    # duplicate edges count once; dst-only node appears with base+inflow
    e = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 2)], "src long, dst long"
    )
    r = {row.node: row for row in pagerank_iter(e, iters=1).collect()}
    assert set(r) == {1, 2}
    assert r[2].rank_q == (15 * S) // 100 + (85 * S) // 100  # outdeg 1, whole rank flows
    assert r[1].rank_q == (15 * S) // 100  # no in-edges


def test_gate_matches_duckdb_oracle(spark, sf_dir):
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from tools.check_entry import canon_hash

    sdf = entry.queries()["link_pagerank"](spark, sf_dir)
    srows, scols = sdf.collect(), sdf.columns
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    cur = con.execute(entry.oracle_sql()["link_pagerank"])
    dcols = [c[0] for c in cur.description]
    drows = cur.fetchall()
    assert len(srows) == len(drows)
    assert sorted(scols) == sorted(dcols)
    assert canon_hash([tuple(r) for r in srows], scols) == canon_hash(
        drows, dcols
    )


def test_anchor_topk_counts_ties_and_k(spark):
    from newsfeeds_crawler_spark.operators.linkgraph import anchor_topk

    edges = spark.createDataFrame(
        # dst 1: "home" x3, "news" x2, "blog" x2, "zzz" x1 -> top3 =
        # home(1), blog(2, tie broken on string), news(3)
        [(0, 1, "home")] * 3
        + [(0, 1, "news")] * 2
        + [(0, 1, "blog")] * 2
        + [(0, 1, "zzz")]
        + [(5, 2, "only")],
        "src long, dst long, anchor string",
    )
    out = sorted(
        anchor_topk(edges, k=3).collect(),
        key=lambda r: (r.dst, r.rank),
    )
    assert [(r.dst, r.anchor, r.cnt, r.rank) for r in out] == [
        (1, "home", 3, 1),
        (1, "blog", 2, 2),
        (1, "news", 2, 3),
        (2, "only", 1, 1),
    ]


def test_anchor_topk_partition_invariance(spark):
    from newsfeeds_crawler_spark.operators.linkgraph import anchor_topk

    edges = spark.createDataFrame(
        [(i, i % 5, f"a{(i * 7) % 3}") for i in range(200)],
        "src long, dst long, anchor string",
    )
    a = sorted(map(tuple, anchor_topk(edges, k=2).collect()))
    b = sorted(map(tuple, anchor_topk(edges.repartition(9), k=2).collect()))
    assert a == b
