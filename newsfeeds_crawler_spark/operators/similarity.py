"""Similarity search over embedding columns (array<float>).

- cosine(a, b)       — deterministic left-fold dot/norms: bit-identical to
                       the DuckDB oracle's list_reduce mirror (both engines
                       fold doubles left-to-right).
- brute_topk         — exact top-k neighbors: broadcast the (small) query
                       set against the full corpus; one shuffle (the rank
                       window, partitioned by query id).
- ivf_topk           — IVF-style scale path: assign every vector to its
                       nearest coarse centroid (broadcast centroids), probe
                       only the query's cell → candidate set shrinks by ~the
                       number of cells; same rank window on the reduced set.

At 100 TB the corpus side stays partitioned; only centroids/queries are
broadcast. No per-row Python anywhere: dot products are Catalyst
`aggregate`/`zip_with` expressions inside whole-stage codegen, and the PQ
encode's hot loop is an Arrow-batched pandas UDF (vectorized numpy over
the batch, bit-identical to its pure-expression reference — see
``pq_encode(impl=)``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Left-fold Σ a_i·b_i in double (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def cosine_sql(a: str, b: str) -> str:
    """DuckDB mirror of :func:`cosine` — identical fold order, double math."""

    def dot(x: str, y: str) -> str:
        prods = f"list_transform({x}, (__v, __i) -> __v::DOUBLE * ({y})[__i]::DOUBLE)"
        return f"list_reduce(list_prepend(0.0::DOUBLE, {prods}), (__a, __p) -> __a + __p)"

    return f"({dot(a, b)} / (sqrt({dot(a, a)}) * sqrt({dot(b, b)})))"


def _norm(vec: Column) -> Column:
    """sqrt(Σ v²) — precomputed once per row so an N×M pair comparison does
    one fold per pair, not three. Same expression tree as the per-pair
    denominator, so values are bitwise identical to inline cosine()."""
    return F.sqrt(_dot(vec, vec))


def brute_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (q_id, n_id, sim, rank), self-matches excluded.

    ``queries`` must be broadcast-small; the corpus side never shuffles until
    the per-query rank window. Scale shape: Spark plans the
    ``row_number() <= k`` filter as a PARTIAL (pre-shuffle) + FINAL
    WindowGroupLimit pair, so each input partition ships only its local
    top-k per query and the post-shuffle per-query partition holds ≤ k×P
    rows, never ``|corpus|`` (pinned by
    tests/test_plan_shapes.py::test_brute_topk_has_partial_window_group_limit).
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            _norm(F.col(vec_col)).alias("q_nrm"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        _norm(F.col(vec_col)).alias("n_nrm"),
    )
    sims = (
        c.crossJoin(q)
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id",
            "n_id",
            F.round(
                _dot(F.col("q_vec"), F.col("n_vec"))
                / (F.col("q_nrm") * F.col("n_nrm")),
                8,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").cast("bigint"),
            F.col("n_id").cast("bigint"),
            "sim",
            F.col("rank").cast("int"),
        )
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    top_n: int = 1,
) -> DataFrame:
    """IVF assignment: nearest centroid(s) by cosine → (id, cell, vec).

    ``top_n`` > 1 returns the ``top_n`` nearest cells per vector (the
    multi-probe query-side assignment). Tie-break on centroid id keeps the
    assignment deterministic.
    """
    cent = F.broadcast(
        centroids.select(
            F.col(id_col).alias("cell"),
            F.col(vec_col).alias("c_vec"),
            _norm(F.col(vec_col)).alias("c_nrm"),
        )
    )
    scored = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("v_nrm"),
    ).crossJoin(cent).select(
        "id",
        "vec",
        "cell",
        F.round(
            _dot(F.col("vec"), F.col("c_vec"))
            / (F.col("v_nrm") * F.col("c_nrm")),
            8,
        ).alias("c_sim"),
    )
    w = Window.partitionBy("id").orderBy(F.col("c_sim").desc(), F.col("cell"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= top_n)
        .select("id", "cell", "vec", _norm(F.col("vec")).alias("nrm"))
    )


def embedding_cosine_pairs(
    corpus: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, sim), id_a < id_b.

    The all-pairs space is blocked by IVF cell (nearest-centroid assignment)
    — only same-cell vectors are compared, the embedding analog of LSH
    banding. Near-dup pairs have cosine ≈ 1, so they share a cell unless
    they straddle a cell boundary (multi-probe assignment closes that gap at
    the cost of k× candidates). At scale the self-join shuffles on ``cell``,
    bounded by the largest cell, not |corpus|².
    """
    assigned = assign_cells(corpus, centroids, id_col, vec_col)
    a = assigned.select(
        "cell", F.col("id").alias("id_a"), F.col("vec").alias("v_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = assigned.select(
        "cell", F.col("id").alias("id_b"), F.col("vec").alias("v_b"),
        F.col("nrm").alias("nrm_b"),
    )
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            F.col("id_a").cast("bigint"),
            F.col("id_b").cast("bigint"),
            F.round(
                _dot(F.col("v_a"), F.col("v_b"))
                / (F.col("nrm_a") * F.col("nrm_b")),
                8,
            ).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def _l2sq(a: Column, b: Column) -> Column:
    """Left-fold Σ (a_i−b_i)² in double (deterministic summation order;
    the subtraction is evaluated twice instead of bound to a temp so the
    DuckDB mirror — which has no lambda lets — is expression-identical)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    dim: int,
    n_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "arrow",
) -> DataFrame:
    """Product-quantization encode: (id, codes array<bigint>), one codeword
    id per subspace (Jégou et al., IEEE TPAMI 2011 — public algorithm).

    Each ``dim``-dim vector splits into ``n_sub`` contiguous subvectors;
    code[j] = the codebook row whose j-th subvector is L2-nearest
    (tie-break on codeword id; distances rounded to 8 dp so the DuckDB
    mirror compares identical values). The codebook here is a caller-chosen
    set of DATA rows — deterministic and SQL-mirrorable; at scale you would
    k-means-train it, which changes the codebook, not this encode plan.
    The encode is |corpus| × |codebook| × n_sub expression rows with the
    codebook broadcast — the corpus never shuffles until the per-(id,
    subspace) argmin aggregate, which is map-side partial.

    ``impl`` picks the physical encode; both are MAP-ONLY (zero shuffle,
    codebook ships in the task closure / one broadcast row) and
    bit-identical (``test_pq_encode_arrow_equals_expr``):

    - ``"arrow"`` (default) — one Arrow-batched pandas UDF computing the
      per-subspace argmin as vectorized numpy over the whole batch, with
      the (x−c)² accumulation looped in subspace-dimension order so every
      partial sum is the SAME IEEE-754 double the expression fold
      produces, then the same round-half-up at 8 dp before the strict-<
      argmin (ties → smallest codeword id, numpy's first-min). ~k×n_sub×
      batch fused multiply-adds per batch — the vectorized scale path the
      north rule prescribes for the decode/encode stages.
    - ``"expr"`` — the pure-Catalyst higher-order-function fold (kept as
      the no-Python equivalence reference and for engines without Arrow).
      Spark HOFs run interpreted, so this costs ~k×n_sub interpreted
      steps PER ROW — measured ~8× slower than arrow at sf0.1 (2 000
      rows × 80 codewords), same plan shape otherwise.
    """
    assert dim % n_sub == 0, (dim, n_sub)
    d_sub = dim // n_sub
    # PQ codebooks are MODEL STATE, small by construction (k codewords ×
    # dim floats — k ≤ a few hundred), so the whole codebook travels as ONE
    # broadcast row holding an array<struct<cw, v>> and the per-subspace
    # argmin is an F.aggregate fold over that array: the encode is a
    # MAP-ONLY projection — ZERO shuffle, O(1)-size expression tree. Two
    # rejected shapes, for the record: crossJoin + per-(id, subspace)
    # argmin aggregate shuffles |corpus| × k rows (the scale-killer at
    # 10^10 vectors); unrolling the codebook into per-codeword literal
    # expressions builds a k × n_sub-node tree that chokes codegen
    # (measured minutes at k=80 for what should be milliseconds). The
    # fold runs interpreted (Spark higher-order functions skip codegen),
    # so local cost is ~k × n_sub interpreted steps per row — the price
    # of the zero-shuffle shape; at scale it parallelizes embarrassingly
    # and ships no data, which is the trade that matters.
    cbs = sorted(
        (int(r["cw"]), [float(x) for x in r["c_vec"]])
        for r in codebook.select(
            F.col(id_col).alias("cw"), F.col(vec_col).alias("c_vec")
        ).collect()
    )
    if not cbs:
        raise ValueError("empty PQ codebook")
    if impl == "arrow":
        cw_ids = np.array([cw for cw, _ in cbs], dtype=np.int64)
        cmat = np.array([v for _, v in cbs], dtype=np.float64)  # (k, dim)

        @F.pandas_udf("array<bigint>")
        def _codes(vs: pd.Series) -> pd.Series:
            x = np.array(
                [np.asarray(v, dtype=np.float64) for v in vs],
                dtype=np.float64,
            ).reshape(len(vs), dim)
            out = np.empty((len(vs), n_sub), dtype=np.int64)
            for j in range(n_sub):
                lo = j * d_sub
                # accumulate (x_i − c_i)² one dimension at a time: the
                # partial-sum ORDER matches the expression fold exactly,
                # so the doubles (and hence the 8-dp rounding + argmin)
                # are bit-identical to impl="expr"
                acc = np.zeros((len(vs), len(cw_ids)), dtype=np.float64)
                for i in range(lo, lo + d_sub):
                    diff = x[:, i, None] - cmat[None, :, i]
                    acc = acc + diff * diff
                # round HALF_UP at 8 dp (distances are >= 0, so
                # floor(d·1e8 + 0.5) is Spark's ROUND semantics here)
                d8 = np.floor(acc * 1e8 + 0.5) / 1e8
                out[:, j] = cw_ids[np.argmin(d8, axis=1)]
            return pd.Series(list(out))

        return corpus.select(
            F.col(id_col).alias("id"), _codes(F.col(vec_col)).alias("codes")
        )
    if impl != "expr":
        raise ValueError(f"unknown pq_encode impl {impl!r}")
    cb_df = corpus.sparkSession.createDataFrame(
        [([{"cw": cw, "v": v} for cw, v in cbs],)],
        "__cb array<struct<cw: bigint, v: array<double>>>",
    )

    def code_for(j: int):
        # left fold over the cw-sorted codebook with strict < keeps the
        # smallest codeword id on rounded-distance ties — the same
        # (rounded d, cw) ordering the SQL mirror's row_number uses
        def step(acc, c):
            d = F.round(
                _l2sq(
                    F.slice(F.col("__vec"), j * d_sub + 1, d_sub),
                    F.slice(c["v"], j * d_sub + 1, d_sub),
                ),
                8,
            )
            return F.when(
                d < acc["d"], F.struct(d.alias("d"), c["cw"].alias("cw"))
            ).otherwise(acc)

        return F.aggregate(
            F.col("__cb"),
            F.struct(
                F.lit(float("inf")).alias("d"),
                F.lit(-1).cast("bigint").alias("cw"),
            ),
            step,
        )["cw"]

    return (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__vec"))
        .crossJoin(F.broadcast(cb_df))
        .select(
            "id", F.array(*[code_for(j) for j in range(n_sub)]).alias("codes")
        )
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebook: DataFrame,
    dim: int,
    n_sub: int = 8,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "arrow",
) -> DataFrame:
    """Approximate top-k by PQ asymmetric distance (ADC): the corpus is
    stored as ``n_sub`` one-byte-ish codes instead of ``dim`` floats
    (memory ÷ ~dim·4/n_sub — the billion-vector scale path), and a query
    compares against codes via a per-query lookup table of
    |codebook| × n_sub subspace distances, never touching corpus floats.

    Shapes at scale: the LUT is queries × codebook × n_sub rows —
    broadcastable for any sane query batch; the corpus side is |corpus| ×
    n_sub exploded code rows joined to the broadcast LUT, then a map-side
    partial sum per (query, vector). ADC sums fold in subspace order (and
    round at 8 dp) so results are bit-stable and DuckDB-mirrorable.
    Output: (q_id, n_id, adc, rank), rank 1..k by ascending distance,
    tie-break on n_id; the query row itself is excluded.
    """
    enc = pq_encode(corpus, codebook, dim, n_sub, id_col, vec_col, impl)
    d_sub = dim // n_sub
    cw = F.broadcast(
        codebook.select(
            F.col(id_col).alias("cw"), F.col(vec_col).alias("c_vec")
        )
    )
    subs_q = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.round(
                    _l2sq(
                        F.slice(F.col("q_vec"), j * d_sub + 1, d_sub),
                        F.slice(F.col("c_vec"), j * d_sub + 1, d_sub),
                    ),
                    8,
                ).alias("d"),
            )
            for j in range(n_sub)
        ]
    )
    lut = (
        queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
        )
        .crossJoin(cw)
        .select("q_id", F.col("cw"), F.explode(subs_q).alias("s"))
        .select("q_id", "cw", F.col("s.j").alias("j"), F.col("s.d").alias("d"))
    )
    code_rows = enc.select(
        "id", F.posexplode("codes").alias("j", "cw")
    )
    # ADC = Σ_j lut[q, code[j], j], summed in subspace order for bit
    # stability. One conditional-max column per subspace (each (q, id, j)
    # joins exactly one LUT row, so max() just picks that value) keeps the
    # whole aggregate + the fixed-order addition inside whole-stage
    # codegen — the previous collect_list + sort_array + interpreted
    # aggregate fold produced the identical doubles ~5× slower.
    per_j = [
        F.max(F.when(F.col("j") == j, F.col("d"))).alias(f"_d{j}")
        for j in range(n_sub)
    ]
    total = F.col("_d0")
    for j in range(1, n_sub):
        total = total + F.col(f"_d{j}")
    adc = (
        code_rows.join(F.broadcast(lut), ["j", "cw"])
        .filter(F.col("id") != F.col("q_id"))
        .groupBy("q_id", "id")
        .agg(*per_j)
        .select("q_id", "id", F.round(total, 8).alias("adc"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adc").asc(), F.col("id"))
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").cast("bigint"),
            F.col("id").cast("bigint").alias("n_id"),
            "adc",
            F.col("rank").cast("int"),
        )
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    codebook: DataFrame,
    dim: int,
    n_sub: int = 8,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
    impl: str = "arrow",
) -> DataFrame:
    """IVF-PQ: the composed billion-vector path (Jégou et al. 2011 §V —
    coarse inverted lists + PQ codes inside each list; the layout FAISS
    calls IVFPQ). The corpus is stored as (cell, codes) only — ``n_sub``
    small ints per vector, floats dropped after the build — and a query
    touches just its ``n_probe`` nearest cells, scoring candidates by PQ
    asymmetric distance against a broadcast per-query lookup table.

    Shapes at scale: assignment + encode are build-time, map-only
    (broadcast centroids/codebook); at query time the candidate set is
    |n_probe × cell| per query, never |corpus|, and the only corpus-side
    data touched are the code rows of the probed cells — at a real
    deployment the (cell, codes) table is bucketed by cell so the probe
    is a partition-pruned scan. ADC sums fold in subspace order and
    round at 8 dp (bit-stable, DuckDB-mirrorable). Output: (q_id, n_id,
    adc, rank), rank 1..k ascending distance, tie-break n_id; the query
    row itself is excluded. Multi-probe duplicates (a candidate reached
    through two probed cells) are collapsed BEFORE the code explode so
    the ADC never double-counts.
    """
    d_sub = dim // n_sub
    assigned = assign_cells(corpus, centroids, id_col, vec_col)
    enc = pq_encode(corpus, codebook, dim, n_sub, id_col, vec_col, impl)
    coded = enc.join(assigned.select("id", "cell"), "id")

    q_cells = assign_cells(
        queries, centroids, id_col, vec_col, top_n=n_probe
    ).select(F.col("id").alias("q_id"), "cell")

    cw = F.broadcast(
        codebook.select(
            F.col(id_col).alias("cw"), F.col(vec_col).alias("c_vec")
        )
    )
    subs_q = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.round(
                    _l2sq(
                        F.slice(F.col("q_vec"), j * d_sub + 1, d_sub),
                        F.slice(F.col("c_vec"), j * d_sub + 1, d_sub),
                    ),
                    8,
                ).alias("d"),
            )
            for j in range(n_sub)
        ]
    )
    lut = (
        queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
        )
        .crossJoin(cw)
        .select("q_id", F.col("cw"), F.explode(subs_q).alias("s"))
        .select("q_id", "cw", F.col("s.j").alias("j"), F.col("s.d").alias("d"))
    )

    cand = (
        coded.join(F.broadcast(q_cells), "cell")
        .filter(F.col("id") != F.col("q_id"))
        .select("q_id", "id", "codes")
    )
    if n_probe > 1:
        cand = cand.dropDuplicates(["q_id", "id"])
    code_rows = cand.select("q_id", "id", F.posexplode("codes").alias("j", "cw"))
    per_j = [
        F.max(F.when(F.col("j") == j, F.col("d"))).alias(f"_d{j}")
        for j in range(n_sub)
    ]
    total = F.col("_d0")
    for j in range(1, n_sub):
        total = total + F.col(f"_d{j}")
    adc = (
        code_rows.join(F.broadcast(lut), ["q_id", "j", "cw"])
        .groupBy("q_id", "id")
        .agg(*per_j)
        .select("q_id", "id", F.round(total, 8).alias("adc"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adc").asc(), F.col("id"))
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").cast("bigint"),
            F.col("id").cast("bigint").alias("n_id"),
            "adc",
            F.col("rank").cast("int"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """Approximate top-k probing the query's ``n_probe`` nearest IVF cells.

    Recall < 1 by construction; multi-probe (``n_probe`` > 1) recovers the
    cell-boundary misses of single-probe at ``n_probe``× the candidate
    cost — still |n_probe × cell| per query, never |corpus|. At scale the
    assignment is precomputed and the corpus is bucketed by cell, turning
    the probe into a partition-pruned scan.
    """
    assigned = assign_cells(corpus, centroids, id_col, vec_col)
    q = assign_cells(queries, centroids, id_col, vec_col, top_n=n_probe).select(
        F.col("id").alias("q_id"), F.col("cell"),
        F.col("vec").alias("q_vec"), F.col("nrm").alias("q_nrm"),
    )
    cand = assigned.select(
        F.col("id").alias("n_id"), "cell",
        F.col("vec").alias("n_vec"), F.col("nrm").alias("n_nrm"),
    )
    sims = (
        cand.join(F.broadcast(q), "cell")
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id",
            "n_id",
            F.round(
                _dot(F.col("q_vec"), F.col("n_vec"))
                / (F.col("q_nrm") * F.col("n_nrm")),
                8,
            ).alias("sim"),
        )
    )
    if n_probe > 1:
        # a neighbor in several probed cells scores identically each time
        sims = sims.dropDuplicates(["q_id", "n_id"])
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").cast("bigint"),
            F.col("n_id").cast("bigint"),
            "sim",
            F.col("rank").cast("int"),
        )
    )

