"""DSIR-style data selection via importance resampling (Xie et al.,
"Data Selection for Language Models via Importance Resampling", NeurIPS
2023): score every raw document by the log-likelihood ratio of a hashed
bag-of-bigrams model fitted on an in-domain target slice vs one fitted on
the raw corpus, then Gumbel-top-k resample — the standard recipe for
skewing a web-scale crawl toward a target domain without training a
classifier.

Pipeline (all Catalyst; no per-row Python):

1. **Hashed features** — every word bigram maps to one of ``n_buckets``
   buckets via the engine-portable polynomial fingerprint
   (functions/text.fingerprint64, mirrored in SQL by
   functions/dedup.fingerprint_sql), so the feature space is fixed-width
   regardless of vocabulary (the paper's hashed n-gram generative model).
2. **Bucket log-ratios** — add-one smoothed:
   w[b] = ln( (c_t[b]+1)(N_r+B) / ((c_r[b]+1)(N_t+B)) ), quantized to
   integer micro-nats BEFORE any summation (round·1e6 — the same
   discipline as operators/curation.bigram_lm_score), so each document's
   score is an exact order-independent int64 dot product
   Σ c_doc[b]·w_q[b]; floats only inside the single per-bucket ln.
3. **Gumbel-top-k resampling** — the paper samples k docs ∝ importance
   weights without replacement; the classic reduction (Vieira 2014) is
   top-k of log w_i + Gumbel noise. Noise here is *deterministic*:
   u_i = (fingerprint64('g#'+id) mod M + 1)/(M+2) ∈ (0,1),
   g_q = round(−ln(−ln u)·1e6) — reproducible, engine-portable, and
   seeded per id, which is exactly a salted-hash PRNG (the same
   hash-derived-uniform trick as operators/curation.sample_stratified).

100 TB shape: two hash aggregates ∝ distinct (doc, bucket) with map-side
combine; the bucket-weight table is ≤ n_buckets rows (broadcast); the
per-doc score is one aggregate; selection is the two-level top-k
(TakeOrderedAndProject) — never a global sort of the corpus. No stage
touches raw text twice.

No reference analog (the reference is a crawler); this is a
training-data-pipeline operator over the crawled corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from newsfeeds_crawler_spark.functions.text import (
    fingerprint64,
    fingerprint64_arrow,
)
from newsfeeds_crawler_spark.operators.textquality import word_ngrams

#: micro-nats — int64-exact per-doc dot products (same as curation.LOGP_QUANT)
LOGW_QUANT = 1_000_000
#: modulus of the portable fingerprint (2^31 − 1)
FP_MOD = 2_147_483_647
#: default hashed-feature space
N_BUCKETS = 4096
#: salt for the Gumbel uniform draw
GUMBEL_SALT = "g#"


def hashed_bigram_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Per-doc hashed-bigram bucket counts: (__id, feat:int, c_doc:bigint).
    feat = fingerprint64(bigram) mod n_buckets (fingerprint is
    non-negative, so % == pmod in both engines)."""
    return (
        docs.select(
            F.col(id_col).alias("__id"),
            F.explode(word_ngrams(F.col(text_col), 2)).alias("gram"),
        )
        .select(
            "__id",
            # Arrow-batched hash twin: bit-equal to the expression fold,
            # ~10× less CPU on gram-sized strings (functions/text.py)
            (fingerprint64_arrow(F.col("gram")) % F.lit(int(n_buckets)))
            .cast("int")
            .alias("feat"),
        )
        .groupBy("__id", "feat")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_doc"))
    )


def importance_weights(
    raw: DataFrame,
    target: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    target_ids: DataFrame | None = None,
) -> DataFrame:
    """Per-raw-doc importance scores under the hashed bigram ratio model:
    (id, n_feats, score_q, avg_logratio). score_q is micro-nats, exact
    int64; avg_logratio = score_q / n_feats / 1e6 rounded to 6 dp (0.0
    for docs with < 2 tokens).

    Pass EITHER ``target`` (a separate in-domain doc frame — tokenized
    independently) or ``target_ids`` (one id column naming the in-domain
    slice of ``raw`` — target counts then come from a semi-join on the
    already-hashed raw features, so the corpus is tokenized exactly
    once). The raw feature frame is locally checkpointed: it feeds both
    the bucket totals and the per-doc dot product, and re-deriving the
    explode+hash per consumer doubles the dominant cost (measured at
    sf0.1: ~7.2 → ~3.5 s warm for the gate)."""
    if (target is None) == (target_ids is None):
        raise ValueError("pass exactly one of target / target_ids")
    occ_raw = hashed_bigram_counts(
        raw, id_col, text_col, n_buckets
    ).localCheckpoint(eager=True)
    if target_ids is not None:
        occ_t = occ_raw.join(
            target_ids.select(F.col(id_col).alias("__id")), "__id", "left_semi"
        )
    else:
        occ_t = hashed_bigram_counts(target, id_col, text_col, n_buckets)

    c_r = occ_raw.groupBy("feat").agg(
        F.sum("c_doc").cast("bigint").alias("c_r")
    )
    c_t = occ_t.groupBy("feat").agg(
        F.sum("c_doc").cast("bigint").alias("c_t")
    )
    totals = (
        c_r.agg(F.sum("c_r").alias("__nr"))
        .crossJoin(c_t.agg(F.sum("c_t").alias("__nt")))
        .select(
            (F.coalesce(F.col("__nr"), F.lit(0)) + n_buckets)
            .cast("double")
            .alias("den_r"),
            (F.coalesce(F.col("__nt"), F.lit(0)) + n_buckets)
            .cast("double")
            .alias("den_t"),
        )
    )
    # weights only needed for features present in raw docs (c_doc joins
    # back on occ_raw); absent-in-target buckets smooth to c_t = 0
    w = (
        c_r.join(c_t, "feat", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "feat",
            F.round(
                F.log(
                    ((F.coalesce(F.col("c_t"), F.lit(0)) + 1).cast("double")
                     * F.col("den_r"))
                    / ((F.col("c_r") + 1).cast("double") * F.col("den_t"))
                )
                * LOGW_QUANT,
                0,
            )
            .cast("bigint")
            .alias("w_q"),
        )
    )
    per_doc = (
        occ_raw.join(w, "feat")
        .groupBy("__id")
        .agg(
            F.sum("c_doc").cast("bigint").alias("n_feats"),
            F.sum(F.col("c_doc") * F.col("w_q")).cast("bigint").alias(
                "score_q"
            ),
        )
    )
    nf = F.coalesce(F.col("n_feats"), F.lit(0).cast("bigint"))
    sq = F.coalesce(F.col("score_q"), F.lit(0).cast("bigint"))
    avg = F.when(
        nf > 0, F.round(sq.cast("double") / nf / LOGW_QUANT, 6)
    ).otherwise(F.lit(0.0))
    return (
        raw.select(F.col(id_col).alias("__id"))
        .join(per_doc, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            nf.alias("n_feats"),
            sq.alias("score_q"),
            avg.alias("avg_logratio"),
        )
    )


def gumbel_q(id_str: F.Column) -> F.Column:
    """Deterministic quantized Gumbel draw from a salted fingerprint:
    u = (fp mod M + 1)/(M + 2) ∈ (0,1), g_q = round(−ln(−ln u)·1e6)."""
    fp = fingerprint64_arrow(F.concat(F.lit(GUMBEL_SALT), id_str))
    u = (fp % FP_MOD + 1).cast("double") / F.lit(float(FP_MOD + 2))
    return F.round(-F.log(-F.log(u)) * LOGW_QUANT, 0).cast("bigint")


def importance_resample(
    scored: DataFrame,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Gumbel-top-k selection over importance scores: key_q = score_q +
    g_q, take the k largest (ties broken by id — deterministic). Returns
    the selected rows with (gumbel_q, key_q, rank).

    Scale shape: ``orderBy(...).limit(k)`` plans as the partial+final
    TakeOrderedAndProject pair (each partition ships ≤ k rows), and the
    rank window then runs over k rows only — never a global sort."""
    idc = F.col(id_col)
    keyed = scored.withColumn(
        "gumbel_q", gumbel_q(idc.cast("string"))
    ).withColumn("key_q", F.col("score_q") + F.col("gumbel_q"))
    top = keyed.orderBy(F.col("key_q").desc(), idc).limit(int(k))
    w = Window.orderBy(F.col("key_q").desc(), idc)
    return top.withColumn("rank", F.row_number().over(w).cast("int"))
