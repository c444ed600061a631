"""Training-data pipeline operators: dedup (exact/Jaccard/MinHash/SimHash)
and embedding similarity (brute top-k, IVF probe)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from newsfeeds_crawler_spark.functions.dedup import (
    MERSENNE31,
    minhash_coeffs,
)
from newsfeeds_crawler_spark.operators.dedup import (
    exact_dups,
    minhash_lsh_pairs,
    simhash_docs,
    token_jaccard_pairs,
)
from newsfeeds_crawler_spark.operators.similarity import brute_topk, ivf_topk

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the old river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the old river bend"),
    (2, "a completely different document about spark shuffles and partitions"),
    (3, "the quick brown fox jumps over the lazy dog near the old river bank"),
    (4, "short text"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dups_finds_identical(docs):
    rows = exact_dups(docs, "doc_id", "text").collect()
    assert len(rows) == 1
    assert rows[0].rep_id == 0 and rows[0].dup_count == 2


def test_minhash_coeffs_deterministic():
    assert minhash_coeffs(4) == minhash_coeffs(4)
    for a, b in minhash_coeffs(32):
        assert 1 <= a < MERSENNE31 and 0 <= b < MERSENNE31


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0  # identical
    assert (0, 1) in pairs  # one-word-off near dup
    assert all(a != 2 and b != 2 for a, b in pairs)  # unrelated doc excluded


def test_token_jaccard_blocked(docs, spark):
    d = docs.withColumn("blk", F.lit(1))
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in token_jaccard_pairs(
            d, "doc_id", "text", ["blk"], threshold=0.5
        ).collect()
    }
    assert pairs[(0, 3)] == 1.0
    # docs 0/1 share 11 of 13 distinct tokens (bank vs bend)
    assert pairs[(0, 1)] == round(11 / 13, 6)
    assert (2, 4) not in pairs and (0, 2) not in pairs


def test_simhash_identical_docs_equal(docs):
    sh = {r.id: r.simhash for r in simhash_docs(docs, "doc_id", "text").collect()}
    assert sh[0] == sh[3]
    # near-dup docs differ in few bits; unrelated docs in many
    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(sh[0], sh[1]) <= ham(sh[0], sh[2])


VECS = [
    (0, [1.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0]),
    (2, [0.0, 1.0, 0.0]),
    (3, [0.0, 0.9, 0.1]),
    (4, [-1.0, 0.0, 0.0]),
    (5, [0.7, 0.7, 0.0]),
]


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in VECS], ["vec_id", "embedding"]
    )


def test_brute_topk_orders_by_cosine(vecs):
    res = brute_topk(vecs, vecs.filter(F.col("vec_id") == 0), k=3).collect()
    assert [r.n_id for r in sorted(res, key=lambda r: r.rank)] == [1, 5, 2]
    top = next(r for r in res if r.rank == 1)
    assert math.isclose(top.sim, 0.9 / math.sqrt(0.82), rel_tol=1e-6)


def test_ivf_topk_probes_one_cell(vecs):
    # centroids: x-axis (0) and y-axis (2) → cells split the space
    cents = vecs.filter(F.col("vec_id").isin(0, 2))
    res = ivf_topk(vecs, vecs.filter(F.col("vec_id") == 1), cents, k=5).collect()
    got = {r.n_id for r in res}
    # query 1 lands in the x-cell: {0, 5} (4 also x-cell? cos(4,x)=-1 < cos(4,y)=0 → y-cell)
    assert 0 in got and 2 not in got and 3 not in got
    # approximate-by-design: y-cell vectors are not scanned
    assert got <= {0, 5}


def test_token_jaccard_hot_block_guard_warns_not_caps(spark, capsys):
    """warn_block_size surfaces quadratic blocks WITHOUT changing results."""
    from newsfeeds_crawler_spark.operators.dedup import token_jaccard_pairs

    df = spark.createDataFrame(
        [(i, "en", "the same text here") for i in range(30)]
        + [(100, "fr", "autre texte")],
        ["doc_id", "lang", "text"],
    )
    base = token_jaccard_pairs(df, "doc_id", "text", ["lang"]).collect()
    guarded = token_jaccard_pairs(
        df, "doc_id", "text", ["lang"], warn_block_size=10
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, guarded))  # no cap
    out = capsys.readouterr().out
    assert "HOT BLOCK" in out and "lang='en'" in out and "30 rows" in out


def test_ivf_multiprobe_recall_dominates_single_probe(spark):
    """n_probe=2 must be a superset-quality approximation: per-query recall
    vs brute-force is >= single-probe, and candidates stay cell-bounded."""
    from newsfeeds_crawler_spark.operators.similarity import brute_topk, ivf_topk

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 6)
    cent = e.filter(F.col("vec_id") % 25 == 0)
    brute = {(r.q_id, r.n_id) for r in brute_topk(e, q, k=5).collect()}
    single = {(r.q_id, r.n_id) for r in ivf_topk(e, q, cent, k=5).collect()}
    multi = {
        (r.q_id, r.n_id) for r in ivf_topk(e, q, cent, k=5, n_probe=2).collect()
    }
    r1 = len(brute & single) / len(brute)
    r2 = len(brute & multi) / len(brute)
    assert r2 >= r1
    assert len(multi) <= 6 * 5  # still k-bounded per query


def test_simhash_hamming_pairs_full_recall_within_band_bound(spark):
    """Pigeonhole guarantee: with 3 bands, EVERY pair at hamming ≤ 2 shares
    a clean band — the banded join must find exactly the brute-force set."""
    from newsfeeds_crawler_spark.operators.dedup import (
        simhash_docs, simhash_hamming_pairs,
    )

    df = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 200)
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_hamming_pairs(df, "doc_id", "text", max_dist=2).collect()
    }
    sh = {r.id: r.simhash for r in simhash_docs(df, "doc_id", "text").collect()}
    want = set()
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin(sh[a] ^ sh[b]).count("1")
            if d <= 2:
                want.add((a, b, d))
    assert got == want


def test_pq_topk_exact_duplicate_ranks_first(spark):
    """PQ/ADC sanity: a vector's exact duplicate shares every code, so its
    ADC distance is 0 and it ranks 1; encode emits one code per subspace;
    codes reference real codebook ids."""
    import numpy as np

    from newsfeeds_crawler_spark.operators.similarity import (
        pq_encode, pq_topk,
    )

    rng = np.random.default_rng(11)
    DIM, NSUB = 16, 4
    base = [[float(x) for x in rng.normal(size=DIM)] for _ in range(30)]
    rows = [(i, v) for i, v in enumerate(base)]
    rows += [(100 + i, list(base[i])) for i in range(5)]  # planted exact dups
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    codebook = df.filter(F.col("vec_id") % 3 == 0)

    enc = {r["id"]: r["codes"] for r in pq_encode(df, codebook, DIM, NSUB).collect()}
    cw_ids = {r["vec_id"] for r in codebook.collect()}
    assert all(len(c) == NSUB and set(c) <= cw_ids for c in enc.values())
    for i in range(5):
        assert enc[i] == enc[100 + i]  # identical vectors -> identical codes

    # ADC(q, x) depends only on x's CODES: for a planted duplicate it equals
    # q's own quantization error — 0 exactly when q is itself a codeword
    cw_vecs = {r["vec_id"]: r["embedding"] for r in codebook.collect()}
    sub = DIM // NSUB

    def py_adc(qv, codes):
        tot = 0.0
        for j, cw in enumerate(codes):
            cv = cw_vecs[cw][j * sub : (j + 1) * sub]
            qs = qv[j * sub : (j + 1) * sub]
            tot += round(
                sum((float(a) - float(b)) * (float(a) - float(b))
                    for a, b in zip(qs, cv)), 8,
            )
        return round(tot, 8)

    top = pq_topk(df, df.filter(F.col("vec_id") < 5), codebook, DIM, NSUB, k=35)
    rows = {(r["q_id"], r["n_id"]): r for r in top.collect()}
    for i in range(5):
        r = rows[(i, 100 + i)]
        import numpy as np  # float32 storage: quantize qv like Spark does
        qv = np.asarray(base[i], dtype=np.float32)
        assert abs(r["adc"] - py_adc(qv, enc[i])) < 1e-6
    # codebook-member queries (0, 3) have zero quantization error: their
    # duplicate sits at ADC exactly 0.0 and the rank-1 row is at 0.0 too
    for i in (0, 3):
        assert rows[(i, 100 + i)]["adc"] == 0.0
        assert min(
            r["adc"] for (q, _), r in rows.items() if q == i
        ) == 0.0


def test_neardup_components_multi_hop_chain(spark):
    """Min-label propagation needs multiple rounds on a chain graph — pin
    convergence and exact components on chains, a triangle, and isolated
    pairs, vs a python union-find."""
    from newsfeeds_crawler_spark.operators.dedup import neardup_components

    edges = [
        (1, 2), (2, 3), (3, 4), (4, 5),      # 5-chain: diameter 4
        (10, 11), (11, 12), (10, 12),        # triangle
        (20, 21),                            # pair
        (31, 30),                            # pair given in reverse order
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["doc_id"]: (r["component"], r["is_canonical"])
        for r in neardup_components(df).collect()
    }

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    want = {v: (find(v), find(v) == v) for v in parent}
    assert got == want
    assert got[5] == (1, False) and got[12] == (10, False)
    assert sum(1 for c, canon in got.values() if canon) == 4


def test_pq_arrow_equals_expr_bitexact(spark):
    """The Arrow-batched PQ encode (vectorized numpy argmin) and the
    pure-Catalyst expression fold must agree BIT-EXACTLY — codes, ADC
    doubles, and ranks — on data with planted ties (duplicate codebook
    subvectors force the smallest-codeword tie-break on both paths)."""
    import numpy as np

    from newsfeeds_crawler_spark.operators.similarity import (
        pq_encode, pq_topk,
    )

    rng = np.random.default_rng(23)
    DIM, NSUB = 16, 4
    base = [[float(x) for x in rng.normal(size=DIM)] for _ in range(40)]
    # planted tie: vec 7 repeats vec 1's values, so two codebook rows
    # (both % 3 == 0 ids shifted below) can sit at the same distance
    base[7] = list(base[1])
    base[13] = list(base[4])
    rows = [(i, v) for i, v in enumerate(base)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    codebook = df.filter(F.col("vec_id").isin(1, 4, 7, 13, 20, 25, 31))

    enc_a = {
        r["id"]: list(r["codes"])
        for r in pq_encode(df, codebook, DIM, NSUB, impl="arrow").collect()
    }
    enc_e = {
        r["id"]: list(r["codes"])
        for r in pq_encode(df, codebook, DIM, NSUB, impl="expr").collect()
    }
    assert enc_a == enc_e
    # ties resolved to the SMALLEST codeword id: vec 1 == vec 7 in the
    # codebook, so every code that picks one of them must pick id 1
    assert all(c != 7 for c in enc_a[1]) and all(c != 13 for c in enc_a[4])

    qs = df.filter(F.col("vec_id") < 6)
    top_a = sorted(
        map(tuple, pq_topk(df, qs, codebook, DIM, NSUB, k=7,
                           impl="arrow").collect())
    )
    top_e = sorted(
        map(tuple, pq_topk(df, qs, codebook, DIM, NSUB, k=7,
                           impl="expr").collect())
    )
    assert top_a == top_e


def test_ivfpq_topk_cell_pruned_adc_matches_pq_on_candidates(spark):
    """IVF-PQ composition invariants: (1) every returned neighbor lives in
    one of the query's probed cells; (2) its ADC equals the UNPRUNED
    pq_topk's ADC for the same (q, n) pair — cell pruning changes the
    candidate set, never a distance; (3) an exact duplicate sharing the
    query's cell ranks first at distance 0 when the query is a codeword;
    (4) multi-probe candidates reached through two cells are not
    double-counted (ADC unchanged vs single-probe for shared pairs)."""
    import numpy as np

    from newsfeeds_crawler_spark.operators.similarity import (
        assign_cells, ivfpq_topk, pq_topk,
    )

    rng = np.random.default_rng(23)
    DIM, NSUB = 16, 4
    base = [[float(x) for x in rng.normal(size=DIM)] for _ in range(40)]
    rows = [(i, v) for i, v in enumerate(base)]
    rows += [(100 + i, list(base[i])) for i in range(4)]  # planted dups
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cent = df.filter(F.col("vec_id") % 10 == 0)
    cb = df.filter(F.col("vec_id") % 3 == 0)
    qs = df.filter(F.col("vec_id") < 4)

    got1 = ivfpq_topk(df, qs, cent, cb, DIM, NSUB, k=5, n_probe=1).collect()
    got2 = ivfpq_topk(df, qs, cent, cb, DIM, NSUB, k=5, n_probe=2).collect()
    full = {
        (r.q_id, r.n_id): r.adc
        for r in pq_topk(df, qs, cb, DIM, NSUB, k=1000).collect()
    }

    # (1) probed-cell containment
    asg = {r["id"]: r["cell"] for r in assign_cells(df, cent).collect()}
    q2 = {
        r["id"]: set()
        for r in assign_cells(qs, cent, top_n=2).collect()
    }
    for r in assign_cells(qs, cent, top_n=2).collect():
        q2[r["id"]].add(r["cell"])
    for r in got2:
        assert asg[r.n_id] in q2[r.q_id]

    # (2) + (4) pruning never changes a distance; no double count
    for r in got1 + got2:
        assert full[(r.q_id, r.n_id)] == r.adc

    # (3) vec 0 is a centroid (0 % 10 == 0) and a codeword (0 % 3 == 0);
    # its planted dup 100 shares codes and cell -> ADC 0, rank 1
    by_q = {}
    for r in got1:
        by_q.setdefault(r.q_id, []).append(r)
    top0 = min(by_q[0], key=lambda r: r.rank)
    assert top0.n_id == 100 and top0.adc == 0.0 and top0.rank == 1

    # multi-probe result set per query is a (quality-) superset path:
    # still k-bounded, and every single-probe neighbor set stays valid
    assert len(got2) <= 4 * 5


def test_incremental_lsh_probe_verdicts(spark):
    """Planted semantics: exact dup -> is_dup with the right match; near
    dup above threshold -> is_dup; unique doc -> 0 candidates; batch docs
    never pair with each other (the corpus-vs-corpus pass is NOT redone)."""
    from newsfeeds_crawler_spark.operators.dedup import incremental_lsh_probe

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [
            (10, boiler),
            (11, boiler + " extra tail words here"),
            (12, "completely different existing text about spark shuffles"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (100, boiler),  # exact dup of 10 (and near 11)
            (101, "unique new content nothing shares any shingle with it"),
            (102, boiler),  # identical to 100 — must NOT match 100
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in incremental_lsh_probe(
            corpus, batch, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert set(out) == {100, 101, 102}
    assert out[100].is_dup and out[100].match_id == 10
    assert out[100].match_jaccard == 1.0
    assert out[102].is_dup and out[102].match_id == 10  # not 100
    assert not out[101].is_dup and out[101].n_candidates == 0
    assert out[101].match_id is None and out[101].match_jaccard is None
    assert out[100].n_candidates >= 1


def test_incremental_probe_bucketed_band_index_zero_store_exchange(
    spark, tmp_path
):
    """The production index shape: the corpus' (id, band_key) frame
    persists as a band_key-bucketed store; probing an epoch batch reads
    the store with NO Exchange (only the batch side shuffles), and the
    candidate set equals the in-memory probe's."""
    from newsfeeds_crawler_spark.functions.text import shingles
    from newsfeeds_crawler_spark.operators.dedup import banded_ids
    from newsfeeds_crawler_spark.tablestore.bucketed import (
        probe_bucketed,
        write_bucketed_table,
    )

    texts = [
        (i, f"doc number {i} talks about topic {i % 7} in shared words "
             f"common tail phrase for group {i % 5}")
        for i in range(60)
    ]
    corpus = spark.createDataFrame(texts, "doc_id long, text string")
    batch = spark.createDataFrame(
        [(1000 + i, t) for i, t in [(0, texts[3][1]), (1, texts[8][1])]],
        "doc_id long, text string",
    )

    def grams(df):
        return df.select(
            F.col("doc_id").alias("id"),
            shingles(F.col("text"), 3).alias("grams"),
        )

    write_bucketed_table(
        banded_ids(grams(corpus)).withColumnRenamed("id", "old_id"),
        "band_index_test",
        key="band_key",
        num_buckets=8,
        path=str(tmp_path / "band_idx"),
    )
    nb = banded_ids(grams(batch)).withColumnRenamed("id", "new_id")
    # a tiny batch would broadcast (also store-shuffle-free — the small-
    # epoch shape); force the bucketed join path to pin the big-epoch one
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        probed = probe_bucketed(
            nb, "band_index_test", key="band_key", how="inner"
        )
        plan = probed._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan
        # exactly TWO Exchanges, both on the batch side: the signature
        # aggregate's shuffle and the alignment repartition. A shuffled
        # store would add a third (the bucketed scan satisfies the join's
        # distribution requirement, so none appears above it).
        assert plan.count("Exchange") == 2
        got = sorted(
            (r.new_id, r.old_id)
            for r in probed.select("new_id", "old_id").distinct().collect()
        )
        ob = banded_ids(grams(corpus)).withColumnRenamed("id", "old_id")
        want = sorted(
            (r.new_id, r.old_id)
            for r in nb.join(ob, "band_key")
            .select("new_id", "old_id")
            .distinct()
            .collect()
        )
        assert got == want and len(got) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE band_index_test")
