"""Distributed TF-IDF retrieval over a document table.

The classic sparse-retrieval operator for a training-data pipeline: build
document term weights (tf × idf), then score a (small) query set against
the corpus and keep the top-k matches per query. The reference crawler has
no retrieval operator — this extends the build brief's text stack
(`functions/text.py`) the same way the ANN operators extend embeddings.

Determinism contract (what makes the gate oracle-HASHABLE):

- Weights are INTEGER-quantized: ``iw = round((ln((N+1)/(df+1)) + 1) ×
  SCALE)`` as int64. Every dot product and squared norm is then an exact
  int64 sum — **order-independent**, so plain ``groupBy().sum()`` with
  map-side partials is safe where a float sum would hash-diverge run to
  run. (Scale bound: iw ≤ ~16·SCALE, per-term contribution tf_q·tf_d·iw²
  ≤ 10⁴·(16·10⁴)² ≈ 2.6·10¹⁴, summed over ≤10³ shared terms ≈ 2.6·10¹⁷ —
  inside int64 under Spark 4's ANSI overflow checks.)
- Only the FINAL score divides in double: dot / (sqrt(nq)·sqrt(nd)),
  rounded at 6 dp — sqrt is IEEE-correctly-rounded on both engines, and
  a quotient of exactly-representable int64s is deterministic.

Scale shape (the 100 TB question):

- tf: one hash aggregate over exploded tokens — map-side combine, shuffle
  ∝ distinct (doc, term), never corpus bytes.
- idf: one aggregate over distinct (doc, term) pairs, keyed by term.
  The idf join-back is an explicit knob (``idf_join``): broadcast while
  the vocabulary fits, shuffle-hash on ``term`` when it outgrows broadcast
  — still ∝ |vocab| + |(doc, term)|, never all-pairs; ``auto`` leaves the
  choice to AQE.
- scoring: the query side broadcasts only while it is small
  (``broadcast_queries`` / ``max_broadcast_queries``); past that it falls
  back to a shuffle-hash join on ``term``. Either way candidates are only
  (query, doc) pairs SHARING a term — an inverted-index join, never a
  cross join. Top-k uses the same partial-then-final rank-window pair as
  ``similarity.brute_topk`` (WindowGroupLimit pushes the per-partition
  partial limit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 10_000

# per-(doc, term) frequency clamp: keeps the int64 headroom analysis above
# unconditional. iw ≤ ~16·SCALE, so a per-term dot contribution is at most
# TF_CLAMP²·(16·SCALE)² ≈ 10⁸·2.6·10¹⁰ — the SUM over shared terms is what
# must stay under 2^63, and with tf unbounded a single degenerate document
# ("word " × 10⁶) would already overflow one term's product under Spark 4's
# ANSI checks. Clamping at 10⁴ (far past any natural-language tf) bounds
# every product; the DuckDB oracle applies the identical LEAST().
TF_CLAMP = 10_000


def doc_terms(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(id, term, tf) — whitespace tokens of the lowercased text, one hash
    aggregate. Blank strings produce no rows. tf is clamped at TF_CLAMP
    (int64-overflow headroom; see module docstring)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return (
        docs.select(F.col(id_col).alias("__id"), F.explode(toks).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("__id", "term")
        .agg(
            F.least(F.count(F.lit(1)), F.lit(TF_CLAMP))
            .cast("long")
            .alias("tf")
        )
    )


def idf_table(terms: DataFrame, n_docs: int, min_df: int = 1) -> DataFrame:
    """(term, iw): integer-quantized smooth idf over the (id, term) pairs.

    idf = ln((N+1)/(df+1)) + 1 (sklearn's smooth variant: never zero, so
    a term present in every document still contributes); quantized to
    ``SCALE`` so every downstream sum is exact int64 arithmetic."""
    return (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .filter(F.col("df") >= min_df)
        .select(
            "term",
            F.round(
                (F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0)
                * SCALE
            ).cast("long").alias("iw"),
        )
    )


def tfidf_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    broadcast_queries: bool | None = None,
    max_broadcast_queries: int = 100_000,
    idf_join: str = "auto",
) -> DataFrame:
    """Top-k corpus docs per query doc by TF-IDF cosine.

    Returns (query_id, rank, match_id, score) — score rounded at 6 dp.
    Self-matches (same id) are excluded so a query drawn from the corpus
    returns its neighbors, not itself. Ties break on match_id ascending
    (deterministic total order).

    ``broadcast_queries``: the scoring join ships the weighted QUERY side
    to every executor — right while queries ≪ corpus, an OOM when the
    query set is a fixed fraction of a 100 TB corpus. None (default)
    decides from one cheap ``queries.count()`` against
    ``max_broadcast_queries``; False pins the shuffle-hash-on-``term``
    fallback (inverted-index join with both sides repartitioned — still
    ∝ shared-term pairs, never all-pairs).

    ``idf_join``: how the (term, iw) vocabulary joins back onto the token
    tables — ``auto`` (let AQE pick; fine when stats are fresh),
    ``broadcast`` (pin it while |vocab| is broadcast-sized), ``shuffle``
    (pin shuffle-hash on ``term`` for vocabularies past broadcast size —
    cost ∝ |vocab| + |(doc, term)|)."""
    if idf_join not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"bad idf_join {idf_join!r}")
    dt = doc_terms(docs, id_col, text_col)
    n_docs = docs.select(id_col).distinct().count()
    idf = idf_table(dt, n_docs, min_df)
    if idf_join == "broadcast":
        idf = F.broadcast(idf)
    elif idf_join == "shuffle":
        idf = idf.hint("shuffle_hash")
    if broadcast_queries is None:
        broadcast_queries = queries.count() <= max_broadcast_queries

    def q_side(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if broadcast_queries else df.hint("shuffle_hash")

    # weighted corpus terms: w = tf·iw (int64). norm² = Σ w² per doc.
    dw = dt.join(idf, "term").select(
        "__id", "term", (F.col("tf") * F.col("iw")).alias("w")
    )
    dn = dw.groupBy("__id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))

    qt = doc_terms(queries, id_col, text_col)
    qw = qt.join(idf, "term").select(
        F.col("__id").alias("__qid"), "term",
        (F.col("tf") * F.col("iw")).alias("qwv"),
    )
    qn = qw.groupBy("__qid").agg(F.sum(F.col("qwv") * F.col("qwv")).alias("qn2"))

    # inverted-index join: only docs sharing a term with the query score.
    dot = (
        dw.join(q_side(qw), "term")
        .filter(F.col("__id") != F.col("__qid"))
        .groupBy("__qid", "__id")
        .agg(F.sum(F.col("w") * F.col("qwv")).alias("dot"))
    )
    scored = (
        dot.join(dn, "__id")
        .join(q_side(qn), "__qid")
        .select(
            "__qid", "__id",
            F.round(
                F.col("dot")
                / (F.sqrt(F.col("qn2").cast("double"))
                   * F.sqrt(F.col("n2").cast("double"))),
                6,
            ).alias("score"),
        )
    )
    # partial-then-final top-k (same shape as similarity.brute_topk): the
    # inner rank is evaluated per shuffle partition under WindowGroupLimit,
    # so only ≤k rows per (query, partition) reach the final window.
    wfin = Window.partitionBy("__qid").orderBy(
        F.col("score").desc(), F.col("__id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(wfin))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias("query_id"),
            F.col("rank").cast("int").alias("rank"),
            F.col("__id").alias("match_id"),
            "score",
        )
    )
