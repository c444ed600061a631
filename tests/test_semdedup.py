"""SemDeDup (operators/semdedup.py): planted near-duplicate groups, the
greedy lowest-id keep rule, and partitioning invariance."""

from __future__ import annotations

from newsfeeds_crawler_spark.operators.semdedup import semantic_dedup


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _vecs(spark):
    """Two well-separated clusters of 8 vectors each (ids 0.. along two
    orthogonal base directions + tiny deterministic jitter), with exact
    duplicates planted: ids 100/101 duplicate id 0, id 102 duplicates
    id 8. Seeds (stride=2) cover both clusters."""
    rows = []
    for i in range(8):
        j = 0.001 * i
        rows.append((2 * i, [1.0, j, 0.0, 0.0]))          # cluster A: ids 0,2,..,14
        rows.append((2 * i + 1, [0.0, 0.0, 1.0, j]))      # cluster B: odd ids
    rows.append((100, [1.0, 0.0, 0.0, 0.0]))  # dup of id 0
    rows.append((101, [2.0, 0.0, 0.0, 0.0]))  # same direction as id 0
    rows.append((102, [0.0, 0.0, 1.0, 0.0]))  # dup of id 1
    return _emb(spark, rows)


def test_lowest_id_survives(spark):
    out = {
        r.vec_id: r
        for r in semantic_dedup(
            _vecs(spark), k=2, iters=2, stride=2, threshold=0.999
        ).collect()
    }
    assert len(out) == 19
    # id 0 is the lowest member of the {0, 100, 101} duplicate group
    assert out[0].keep and out[0].n_dups >= 2
    assert not out[100].keep and not out[101].keep
    # id 1 is the lowest of {1, 102}
    assert out[1].keep and not out[102].keep
    # jittered cluster-mates are below the 0.999 threshold vs each other?
    # cos([1,0],[1,0.007]) ~ 0.99998 > 0.999 — so id 14 may be dropped by
    # id 0's group too; just assert every drop has a qualifying lower id
    for vid, r in out.items():
        if not r.keep:
            assert r.n_dups >= 1
            assert any(
                out[o].cell == r.cell and o < vid for o in out
            )


def test_clusters_separate_and_no_cross_cluster_drops(spark):
    out = {
        r.vec_id: r
        for r in semantic_dedup(
            _vecs(spark), k=2, iters=2, stride=2, threshold=0.999
        ).collect()
    }
    cells_a = {out[i].cell for i in (0, 2, 4, 100, 101)}
    cells_b = {out[i].cell for i in (1, 3, 5, 102)}
    assert len(cells_a) == 1 and len(cells_b) == 1
    assert cells_a != cells_b  # orthogonal directions land apart


def test_threshold_one_keeps_only_exact_directions(spark):
    # threshold above the jitter cosines: only the planted exact/parallel
    # duplicates can qualify
    out = semantic_dedup(
        _vecs(spark), k=2, iters=2, stride=2, threshold=0.99999999
    ).collect()
    dropped = sorted(r.vec_id for r in out if not r.keep)
    assert dropped == [100, 101, 102]


def test_partition_invariance(spark):
    df = _vecs(spark)
    a = sorted(
        map(
            tuple,
            semantic_dedup(df, k=2, iters=2, stride=2).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            semantic_dedup(
                df.repartition(7), k=2, iters=2, stride=2
            ).collect(),
        )
    )
    assert a == b


def test_semantic_pairs_impls_bit_equal_on_awkward_doubles(spark):
    """The per-cell matrix twin (impl='arrow') must produce BITWISE the
    same pair sims as the Catalyst fold path (impl='expr') including on
    awkward components (negative zeros, denormals, large/small mixes):
    dims accumulate in the same left-fold order from the same 0.0 seed,
    and sqrt / multiply / divide are single correctly-rounded IEEE ops.
    threshold=-2 keeps EVERY pair so all sims are compared."""
    import struct

    from newsfeeds_crawler_spark.operators.semdedup import semantic_pairs

    rows = [
        (1, [1.0, 2.0, 3.0, 4.0]),
        (2, [1.0, 2.0, 3.0, 4.0]),
        # note: the column is array<float>, so components below float32
        # range flush to 0f — and a zero NORM is out of contract (ANSI
        # divide-by-zero in the expr path, ±inf in numpy). 1e-40 is a
        # float32 DENORMAL that still squares to a normal double.
        (3, [-0.0, 0.0, -0.0, 1e-40]),
        (4, [5e-30, -5e-30, 2.3e-10, 1.0]),
        (5, [0.1, 0.2, 0.30000000000000004, -0.7]),
        (6, [3.141592653589793, -2.718281828459045, 1.5, -0.5]),
    ]
    df = _emb(spark, [(i, [float(x) for x in v]) for i, v in rows])

    def grab(impl):
        out = semantic_pairs(
            df, k=2, iters=2, stride=1, threshold=-2.0, impl=impl
        ).collect()
        return sorted(
            (r.id_a, r.id_b, struct.pack("<d", r.sim)) for r in out
        )

    a, b = grab("expr"), grab("arrow")
    assert len(a) > 0 and a == b


def test_semantic_dedup_impls_bit_equal(spark):
    df = _vecs(spark)
    a = sorted(
        map(
            tuple,
            semantic_dedup(df, k=2, iters=2, stride=2, impl="expr").collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            semantic_dedup(df, k=2, iters=2, stride=2, impl="arrow").collect(),
        )
    )
    assert a == b
