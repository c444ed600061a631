"""Document-level deduplication operators for the training-data pipeline.

DataFrame-in → DataFrame-out, all pure Catalyst expressions (no Python UDFs):

- exact_dups          — hash-groupBy exact dedup (md5 of raw text)
- token_jaccard_pairs — blocked self-join + word-set Jaccard verify
- minhash_lsh_pairs   — shingle → MinHash → LSH band bucketing → candidate
                        pairs → exact-Jaccard verification (the scale path:
                        only same-band pairs ever join)
- simhash_groups      — SimHash value per doc; equal values = near-dup group

Scale notes (100 TB): the LSH groupBy shuffles on band_key (uniform by
construction — keys are hashes); the verify self-join receives only
candidate pairs (|pairs| ≪ |docs|²). Exact dedup is one hash aggregate with
map-side partial aggregation. Nothing here ever collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from newsfeeds_crawler_spark.functions.dedup import SIMHASH_BITS
from newsfeeds_crawler_spark.functions.text import shingles


def exact_dups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact-duplicate groups: (text_md5, rep_id, dup_count), groups with >1 row.

    rep_id = min id — the canonical survivor, as in standard corpus dedup.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.min(F.col(id_col)).cast("bigint").alias("rep_id"),
            F.count(F.lit(1)).cast("bigint").alias("dup_count"),
        )
        .filter(F.col("dup_count") > 1)
    )


def token_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    threshold: float = 0.5,
    warn_block_size: int = 0,
) -> DataFrame:
    """Near-dup pairs by word-set Jaccard within blocking-key groups.

    Blocking bounds the self-join: only rows sharing ``block_cols`` are
    compared (at scale the join shuffles on the block key; pick keys with
    bounded group sizes). Output: (id_a, id_b, jaccard) with id_a < id_b.

    ``warn_block_size`` > 0 runs a cheap pre-aggregation and PRINTS any
    block whose cardinality exceeds it (n rows → n² comparisons) — a
    no-silent-degradation guard: results are never capped or sampled, the
    hot blocks are just surfaced so callers can refine the blocking key.
    """
    if warn_block_size > 0:
        hot = (
            df.groupBy(*block_cols)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > warn_block_size)
            .orderBy(F.col("__n").desc())
            .limit(20)
            .collect()
        )
        for r in hot:
            key = ", ".join(f"{c}={r[c]!r}" for c in block_cols)
            print(
                f"[token_jaccard_pairs] HOT BLOCK ({key}): {r['__n']} rows "
                f"-> {r['__n'] ** 2:,} comparisons; refine block_cols"
            )
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    side = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id"),
        toks.alias("toks"),
    )
    a = side.select(
        *[F.col(c).alias(f"__b_{c}") for c in block_cols],
        F.col("id").alias("id_a"),
        F.col("toks").alias("toks_a"),
    )
    b = side.select(
        *[F.col(c).alias(f"__b_{c}") for c in block_cols],
        F.col("id").alias("id_b"),
        F.col("toks").alias("toks_b"),
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
    union = F.size(F.array_union("toks_a", "toks_b")).cast("double")
    jac = inter / F.greatest(union, F.lit(1.0))
    return (
        a.join(b, [f"__b_{c}" for c in block_cols])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            F.col("id_a").cast("bigint"),
            F.col("id_b").cast("bigint"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def banded_ids(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """(id, band_key) rows for a (id, grams) frame — the MinHash signature
    + LSH banding stage shared by the batch pair finder
    (:func:`minhash_lsh_pairs`) and the incremental probe
    (:func:`incremental_lsh_probe`), and the exact frame a production
    index persists as its bucketed signature store."""
    from newsfeeds_crawler_spark.functions.dedup import (
        MERSENNE31,
        minhash_coeffs,
    )
    from newsfeeds_crawler_spark.functions.text import fingerprint64_arrow

    rows_per_band = num_hashes // bands
    # gram hashing is the hot loop (|docs|·|grams| rows × |gram| chars):
    # the Arrow twin computes the identical poly-hash vectorized instead
    # of ~20 interpreted fold steps per gram — measured 10.0 → ~2 s on the
    # sf0.1 gate, same values (fingerprint64_arrow's bit-equality pin)
    gram_rows = docs.select(
        "id", F.explode("grams").alias("gram")
    ).withColumn("h", fingerprint64_arrow(F.col("gram")))
    sig = gram_rows.groupBy("id").agg(
        *[
            F.min(
                (F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MERSENNE31)
            ).alias(f"mh{i}")
            for i, (a, b) in enumerate(minhash_coeffs(num_hashes, seed))
        ]
    )
    band_key_arr = F.array(
        *[
            F.concat_ws(
                "_",
                F.lit(str(b)),
                *[
                    F.col(f"mh{b * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ],
            )
            for b in range(bands)
        ]
    )
    return sig.select("id", F.explode(band_key_arr).alias("band_key"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 8,
    k_shingle: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs with exact-Jaccard verification.

    Pipeline: k-word shingles → ``num_hashes`` MinHash signature → ``bands``
    band keys → explode → groupBy band key pairs (candidates) → distinct
    (id_a,id_b) → verify with exact shingle Jaccard ≥ threshold.

    Candidates never leave the band buckets, so the pair space is
    |Σ bucket²| not |docs|² — the property that makes this the 100 TB path.
    """
    docs = df.select(
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), k_shingle).alias("grams"),
    )
    # Explode + aggregate shape: each shingle is hashed ONCE (not once per
    # permutation — Catalyst would inline a shared signature expression into
    # every min and band key otherwise), then the 16 permuted mins are plain
    # aggregates with map-side partial aggregation — the exchange moves only
    # ~|docs| partially-aggregated rows, never |docs|·|grams|, so it is not
    # a scale bottleneck. A zero-shuffle alternative (band keys from one
    # aggregate fold per doc, built on functions.dedup.minhash_signature's
    # fold) was measured and REJECTED for this operator: the interpreted
    # zip_with(least) fold costs
    # ~30% more wall per core (12.2 s vs 9.2 s median, interleaved A/B at
    # sf0.1), which dominates the tiny exchange it saves; the fold form
    # survives in functions.dedup.minhash_signature where it fixes a real
    # 16x hash re-inline. grams is never empty (functions.text.shingles
    # falls back to the whole-token join), so no doc drops out.
    banded = banded_ids(docs, num_hashes, bands, seed)
    a = banded.select("band_key", F.col("id").alias("id_a"))
    b = banded.select("band_key", F.col("id").alias("id_b"))
    cand_ids = (
        a.join(b, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # verification joins carry raw TEXT and shingle only after the join, so
    # shingle construction runs |candidates| times, not 2×|docs| times
    raw = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__txt"))
    cand = cand_ids.join(
        raw.select(F.col("id").alias("id_a"), F.col("__txt").alias("t_a")), "id_a"
    ).join(
        raw.select(F.col("id").alias("id_b"), F.col("__txt").alias("t_b")), "id_b"
    ).select(
        "id_a",
        "id_b",
        shingles(F.col("t_a"), k_shingle).alias("g_a"),
        shingles(F.col("t_b"), k_shingle).alias("g_b"),
    )
    inter = F.size(F.array_intersect("g_a", "g_b")).cast("double")
    union = F.size(F.array_union("g_a", "g_b")).cast("double")
    jac = inter / F.greatest(union, F.lit(1.0))
    return (
        cand.select(
            F.col("id_a").cast("bigint"),
            F.col("id_b").cast("bigint"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_docs(
    df: DataFrame, id_col: str, text_col: str, bits: int = SIMHASH_BITS
) -> DataFrame:
    """(id, simhash) per document — ONE map-only aggregate fold per doc.

    Each distinct token is hashed once (the fold iterates the transformed
    hash array, binding the hash value per element), the ``bits`` vote
    counters ride in a single array accumulator merged by zip_with(+),
    and the simhash assembles in the finish lambda where the final vote
    array is a bound variable. Zero shuffle: the previous explode +
    groupBy shape exchanged |docs|·bits partial-aggregate rows (and
    materialized |docs|·|tokens| exploded rows first); at 100 TB the
    signature stage now ships nothing. Vote sums are commutative integer
    adds, so values are bit-identical to the exploded form — including
    the drop of docs whose token array is null (matching explode).

    The column-expression form (functions.dedup.simhash) keeps one fold
    per bit so its oracle SQL stays a literal mirror; this operator is
    the engine path.
    """
    from newsfeeds_crawler_spark.functions.text import fingerprint64

    toks = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))

    def finish(acc: Column) -> Column:
        sim = F.lit(0).cast("bigint")
        for b in range(bits):
            sim = sim + (
                F.when(F.element_at(acc, b + 1) > 0, F.lit(2**b))
                .otherwise(F.lit(0))
                .cast("bigint")
            )
        return sim

    votes = F.aggregate(
        F.transform(toks, lambda t: fingerprint64(t)),
        F.array_repeat(F.lit(0).cast("bigint"), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    (
                        (F.floor(h / F.lit(2**b)).cast("bigint") % 2) * 2 - 1
                    ).cast("bigint")
                    for b in range(bits)
                ]
            ),
            lambda x, y: x + y,
        ),
        finish,
    )
    return (
        # explode dropped null-text docs (NULL token array → no rows);
        # filtering the raw column keeps parity without re-inlining the
        # fold into a Filter over the computed value
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).cast("bigint").alias("id"), votes.alias("simhash"))
    )


def simhash_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(simhash, rep_id, n_docs) for SimHash values shared by >1 document.

    Equal-value grouping is the degenerate hamming-distance-0 bucketing; a
    banded multi-probe (rotate + mask) extends it to distance ≤ r without
    pairwise scans — same groupBy shape, r+1 probes.
    """
    return (
        simhash_docs(df, id_col, text_col)
        .groupBy("simhash")
        .agg(
            F.min("id").cast("bigint").alias("rep_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        )
        .filter(F.col("n_docs") > 1)
    )


def simhash_hamming_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 2,
    bands: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ ``max_dist``, found via
    band-bucketing — never an all-pairs comparison.

    The ``bits``-bit simhash splits into ``bands`` equal bands; a pair
    within hamming distance d < ``bands`` leaves at least one band
    untouched (pigeonhole), so joining on shared band values has FULL
    recall for ``max_dist`` ≤ ``bands`` − 1. Candidates live only inside
    band buckets (Σ bucket² pairs, not |docs|²) and verification is one
    cheap ``bit_count(a ^ b)`` per candidate — the 100 TB shape.

    Output: (id_a, id_b, hamming) with id_a < id_b, hamming ≤ max_dist.
    """
    from newsfeeds_crawler_spark.functions.dedup import SIMHASH_BITS

    bits = SIMHASH_BITS
    assert bits % bands == 0 and max_dist <= bands - 1
    bw = bits // bands
    sh = simhash_docs(df, id_col, text_col, bits)
    band_arr = F.array(
        *[
            F.concat(
                F.lit(f"{b}_"),
                (
                    F.floor(F.col("simhash") / F.lit(2 ** (b * bw))).cast("bigint")
                    % F.lit(2**bw)
                ).cast("string"),
            )
            for b in range(bands)
        ]
    )
    banded = sh.select("id", "simhash", F.explode(band_arr).alias("bk"))
    a = banded.select(
        "bk", F.col("id").alias("id_a"), F.col("simhash").alias("s_a")
    )
    b = banded.select(
        "bk", F.col("id").alias("id_b"), F.col("simhash").alias("s_b")
    )
    return (
        a.join(b, "bk")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select(
            F.col("id_a").cast("bigint"),
            F.col("id_b").cast("bigint"),
            F.expr("bit_count(s_a ^ s_b)").cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_dist)
    )


def neardup_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over near-dup pair edges → duplicate CLUSTERS.

    Pair finders (MinHash/SimHash/phash) emit edges; the keep-one-per-
    cluster dedup a training pipeline actually applies needs the transitive
    closure: components. Labels start as each vertex's own id and
    iteratively take the min over neighbors — converges to the component
    minimum in O(graph diameter) rounds; near-dup clusters are shallow
    (quasi-cliques), so this terminates in a handful of one-shuffle-join
    rounds with lineage truncated per round. At web scale with adversarial
    diameters you would switch to the large-star/small-star algorithm
    (Kiveris et al., SoCC'14 — same primitive ops, fewer rounds); the
    output contract is identical.

    Output: (doc_id, component, is_canonical) for every id in ``pairs``;
    component = min id in the cluster, is_canonical = (doc_id == component)
    — filter on it to keep exactly one representative per cluster.
    """
    # materialize the pair finder ONCE: the symmetrization union below
    # references ``pairs`` twice, so an unmaterialized (possibly expensive —
    # the full MinHash/LSH pipeline) plan would execute twice
    pairs = pairs.select(
        F.col(id_a).alias("a"), F.col(id_b).alias("b")
    ).localCheckpoint(eager=True)
    e = pairs
    edges = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("a").alias("v"))
        .distinct()
        .withColumn("comp", F.col("v"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = edges.join(
            labels, edges["b"] == labels["v"]
        ).groupBy("a").agg(F.min("comp").alias("nc"))
        new = (
            labels.join(nbr_min, labels["v"] == nbr_min["a"], "left")
            .select(
                "v",
                F.least(F.col("comp"), F.coalesce("nc", "comp")).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "v")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    else:  # pragma: no cover - max_iter is far above any dup-cluster diameter
        raise RuntimeError(f"components did not converge in {max_iter} rounds")
    return labels.select(
        F.col("v").alias("doc_id"),
        F.col("comp").alias("component"),
        (F.col("v") == F.col("comp")).alias("is_canonical"),
    )


def incremental_lsh_probe(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 8,
    k_shingle: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Incremental near-dup dedup: probe a NEW batch of documents against
    an EXISTING corpus without re-pairing the corpus with itself — the
    per-epoch shape a production pipeline actually runs (each crawl epoch
    dedups its new documents against everything already ingested; the
    corpus-vs-corpus pass ran once, long ago).

    Per new document: every existing doc sharing ≥ 1 LSH band is a
    candidate; candidates are verified with exact shingle Jaccard; the
    verdict is ``is_dup`` (any verified match ≥ threshold) with the best
    match (highest Jaccard, ties to the lowest existing id). Every batch
    doc appears in the output, matched or not.

    100 TB shape — the corpus side is an INDEX, not an input: its
    (id, band_key) frame is exactly what a production run persists as a
    band_key-bucketed signature store (the same J2 storage-partitioned
    probe as the crawl's seen store — ``tablestore/bucketed.py``;
    ``tests/test_dedup_similarity.py`` pins that probing a bucketed store
    shuffles ONLY the batch side, zero Exchange over the index). Per
    epoch the work is ∝ |batch| signatures + candidate verification —
    never |corpus|; after the epoch commits, the batch's signature rows
    append-merge into the store, which is one bucketed write ∝ touched
    buckets. Candidate verification joins raw text by id, so text travels
    only for candidates.
    """
    new_docs = batch.select(
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), k_shingle).alias("grams"),
    )
    old_docs = corpus.select(
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), k_shingle).alias("grams"),
    )
    nb = banded_ids(new_docs, num_hashes, bands, seed).select(
        F.col("id").alias("new_id"), "band_key"
    )
    ob = banded_ids(old_docs, num_hashes, bands, seed).select(
        F.col("id").alias("old_id"), "band_key"
    )
    cand_ids = (
        nb.join(ob, "band_key")
        .select("new_id", "old_id")
        .dropDuplicates(["new_id", "old_id"])
    )
    raw_new = batch.select(
        F.col(id_col).alias("new_id"), F.col(text_col).alias("t_n")
    )
    raw_old = corpus.select(
        F.col(id_col).alias("old_id"), F.col(text_col).alias("t_o")
    )
    verified = (
        cand_ids.join(raw_new, "new_id")
        .join(raw_old, "old_id")
        .select(
            "new_id",
            "old_id",
            shingles(F.col("t_n"), k_shingle).alias("g_n"),
            shingles(F.col("t_o"), k_shingle).alias("g_o"),
        )
        .select(
            "new_id",
            "old_id",
            F.round(
                F.size(F.array_intersect("g_n", "g_o")).cast("double")
                / F.greatest(
                    F.size(F.array_union("g_n", "g_o")).cast("double"),
                    F.lit(1.0),
                ),
                6,
            ).alias("jaccard"),
        )
    )
    n_cand = cand_ids.groupBy("new_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    hits = verified.filter(F.col("jaccard") >= threshold)
    w = Window.partitionBy("new_id").orderBy(
        F.col("jaccard").desc(), F.col("old_id")
    )
    best = (
        hits.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "new_id",
            F.col("old_id").alias("match_id"),
            F.col("jaccard").alias("match_jaccard"),
        )
    )
    return (
        batch.select(F.col(id_col).cast("bigint").alias("doc_id"))
        .join(n_cand.withColumnRenamed("new_id", "doc_id"), "doc_id", "left")
        .join(best.withColumnRenamed("new_id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_candidates", F.lit(0)).cast("bigint").alias(
                "n_candidates"
            ),
            F.col("match_id").isNotNull().alias("is_dup"),
            F.col("match_id").cast("bigint").alias("match_id"),
            "match_jaccard",
        )
    )
