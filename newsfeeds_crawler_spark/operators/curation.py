"""Training-set curation operators beyond per-doc quality filtering:
benchmark decontamination, deterministic stratified sampling, corpus-trained
bigram-LM scoring, and source mixture weights — all Catalyst expressions +
the Arrow-batched portable fingerprint, no per-row Python, each with a
literal DuckDB mirror in ``__spark_entry__.oracle_sql``.

No reference analog (the reference is a crawler, not a curation pipeline);
these extend the engine toward the LLM-data use the task brief names.
Public sources for the rules themselves:

- Decontamination: Brown et al. 2020 (GPT-3, Appendix C) remove training
  docs sharing any 13-gram with an eval set; Dodge et al. 2021 measure the
  same overlap on C4. The corpus here is short-doc, so the unit is a
  5-token word n-gram; the "benchmark" split is the same deterministic
  ``doc_id % 37 == 0`` slice the TF-IDF gate uses as its query set, and a
  canary phrase is planted on both sides (arithmetic on doc_id only) so
  the gate exercises real hits, not just the empty-overlap shape.
- Hash-based sampling: standard deterministic Bernoulli-by-hash (e.g.
  Spark's own ``sampleBy`` semantics) made reproducible across engines by
  thresholding the portable fingerprint into integer buckets — no floats
  in the keep decision.
- Bigram LM scoring: CCNet (Wenzek et al. 2020) ranks documents by LM
  perplexity; here the LM is trained on the corpus itself as add-one-
  smoothed bigrams (Jurafsky & Martin ch. 3), and every per-gram log-prob
  is quantized to integer micro-nats BEFORE the per-doc sum, so the doc
  score is an order-independent exact int64 sum (the TF-IDF gate's trick).
- Mixture weights: temperature-scaled source weights w_s ∝ tokens_s^T
  (GPT-3 / The Pile style mixing, T = 0.7).

100 TB shape:
- ``decontaminate``: train grams are exploded → hashed map-side and
  immediately aggregated per (doc, gram-hash is already distinct per doc);
  the benchmark gram set is tiny next to the corpus (eval suites, ~10^6
  grams) and joins as a broadcast semi-join — the corpus side never
  shuffles. ``broadcast_bench=False`` degrades to a shuffle join on the
  gram hash for pathological benchmark sizes.
- ``sample_stratified``: pure map-only projection (quality expressions +
  one Arrow hash + integer compare); scales trivially and samples
  IDENTICALLY on any cluster size or partitioning.
- ``bigram_lm_score``: unigram/bigram counts are hash aggregates whose
  width is the number of *distinct* tokens/grams (map-side combine eats
  repetition); scoring joins doc-gram counts to the gram table on the
  gram key — an inverted-index join where hot grams are handled by the
  pre-aggregated (doc, gram) side + AQE skew split. V (vocab size) is a
  1-row aggregate cross-joined as a broadcast, never a driver collect.
- ``mixture_weights``: one hash aggregate keyed on source; normalization
  happens on the aggregated (|sources|-row) frame via a broadcast 1-row
  total — the full corpus is touched exactly once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from newsfeeds_crawler_spark.functions.text import (
    fingerprint64_arrow,
    quality_score,
    token_count_ws,
)
from newsfeeds_crawler_spark.operators.textquality import _tokens, word_ngrams

# ------------------------------------------------------- decontamination

DECONTAM_N = 5  # word n-gram size (13 in GPT-3; short docs here)
BENCH_MOD = 37  # doc_id % 37 == 0 is the "benchmark" slice (as tfidf)
CANARY_MOD = 11  # train docs with doc_id % 11 == 0 get the planted canary
# 9 tokens -> five 5-grams shared with every benchmark doc.
CANARY = " benchmark canary alpha bravo charlie delta echo foxtrot golf"


def decontam_salt(doc_id: Column, text: Column, is_bench: Column) -> Column:
    """Plant the canary phrase on every benchmark doc and on train docs
    with ``doc_id % CANARY_MOD == 0`` — arithmetic on doc_id only, so the
    DuckDB oracle rebuilds the identical salted string and the gate
    verifies real contamination hits."""
    planted = is_bench | (doc_id % CANARY_MOD == 0)
    return F.when(planted, F.concat(text, F.lit(CANARY))).otherwise(text)


def decontaminate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DECONTAM_N,
    bench_mod: int = BENCH_MOD,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Flag training documents sharing any word ``n``-gram with the
    benchmark slice (GPT-3-style decontamination).

    Output per TRAIN doc: ``n_grams`` (distinct n-grams in the doc),
    ``n_overlap`` (distinct n-grams also present anywhere in the benchmark
    slice), ``contaminated`` (n_overlap > 0). Docs with < n tokens emit no
    grams and are never contaminated.
    """
    did = F.col(id_col)
    is_bench = did % bench_mod == 0
    salted = decontam_salt(did, F.col(text_col), is_bench)
    grams = F.array_distinct(word_ngrams(salted, n))
    base = docs.select(did.alias("__id"), is_bench.alias("__b"), grams.alias("__g"))

    bench_g = (
        base.filter("__b")
        .select(F.explode("__g").alias("gram"))
        .select(fingerprint64_arrow(F.col("gram")).alias("gh"))
        .distinct()
    )
    if broadcast_bench:
        bench_g = F.broadcast(bench_g)
    train = base.filter(~F.col("__b"))
    train_g = train.select(
        "__id", F.explode("__g").alias("gram")
    ).select("__id", fingerprint64_arrow(F.col("gram")).alias("gh"))
    # __g is already distinct per doc, so count(*) == distinct overlap count
    overlap = train_g.join(bench_g, "gh").groupBy("__id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_overlap")
    )
    n_over = F.coalesce(F.col("n_overlap"), F.lit(0).cast("bigint"))
    return (
        train.select("__id", F.size("__g").cast("bigint").alias("n_grams"))
        .join(overlap, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "n_grams",
            n_over.alias("n_overlap"),
            (n_over > 0).alias("contaminated"),
        )
    )


# ------------------------------------------------- deterministic sampling

SAMPLE_BUCKETS = 4096
# integer keep-thresholds out of SAMPLE_BUCKETS, by quality band:
# high keeps 7/8, mid 1/2, low 1/8 — no floats in the decision.
SAMPLE_RATE_HIGH = 3584
SAMPLE_RATE_MID = 2048
SAMPLE_RATE_LOW = 512
BAND_HIGH_MIN = 0.5
BAND_MID_MIN = 0.3
SAMPLE_SALT = "sample#"


def sample_stratified(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic quality-stratified Bernoulli sampling.

    Each doc's quality score (``functions.text.quality_score``) places it
    in a band (high / mid / low); the keep decision thresholds the
    portable fingerprint of ``'sample#' || doc_id`` into one of
    ``SAMPLE_BUCKETS`` integer buckets — the same doc is kept or dropped
    on ANY cluster size, partitioning, or engine. Map-only projection.

    Output per doc: ``band``, ``bucket``, ``kept``.
    """
    did = F.col(id_col)
    q = quality_score(F.col(text_col))
    band = (
        F.when(q >= BAND_HIGH_MIN, F.lit("high"))
        .when(q >= BAND_MID_MIN, F.lit("mid"))
        .otherwise(F.lit("low"))
    )
    bucket = (
        fingerprint64_arrow(F.concat(F.lit(SAMPLE_SALT), did.cast("string")))
        % SAMPLE_BUCKETS
    )
    thr = (
        F.when(band == "high", F.lit(SAMPLE_RATE_HIGH))
        .when(band == "mid", F.lit(SAMPLE_RATE_MID))
        .otherwise(F.lit(SAMPLE_RATE_LOW))
    )
    return docs.select(
        did.alias(id_col),
        band.alias("band"),
        bucket.cast("bigint").alias("bucket"),
        (bucket < thr).alias("kept"),
    )


# --------------------------------------------------- bigram LM scoring

LOGP_QUANT = 1_000_000  # micro-nats: int64-exact per-doc sums
# avg log-prob floor (nats per bigram): splits the synthetic corpus
# ~25/75 at every sf, so the keep flag is exercised both ways.
BIGRAM_KEEP_MIN = -3.43


def bigram_lm_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Score each document under an add-one-smoothed bigram LM trained on
    the corpus itself (CCNet-style perplexity ranking, self-trained).

    logp(w2|w1) = ln((c(w1 w2) + 1) / (c(w1) + V)) with V = |vocab|; each
    gram's log-prob is quantized to integer micro-nats BEFORE summation so
    the per-doc total is an exact, order-independent int64 sum — only the
    final average divides. Docs with < 2 tokens score 0 bigrams and are
    dropped by the keep flag.

    Output per doc: ``n_bigrams``, ``sum_logp_q`` (micro-nats, exact),
    ``avg_logprob`` (nats/bigram, 6 dp), ``lm_keep``.
    """
    did = F.col(id_col)
    toks = docs.select(did.alias("__id"), _tokens(F.col(text_col)).alias("t"))

    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    )
    vocab = uni.agg(F.count(F.lit(1)).cast("bigint").alias("V"))

    occ = (
        docs.select(
            did.alias("__id"),
            F.explode(word_ngrams(F.col(text_col), 2)).alias("gram"),
        )
        .groupBy("__id", "gram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_doc"))
    )
    c2 = occ.groupBy("gram").agg(F.sum("c_doc").alias("c2"))
    gram_logp = (
        c2.withColumn("w1", F.substring_index(F.col("gram"), " ", 1))
        .join(uni, F.col("w1") == F.col("w"))
        .crossJoin(F.broadcast(vocab))
        .select(
            "gram",
            F.round(
                F.log(
                    (F.col("c2") + 1).cast("double")
                    / (F.col("c1") + F.col("V")).cast("double")
                )
                * LOGP_QUANT,
                0,
            )
            .cast("bigint")
            .alias("logp_q"),
        )
    )
    per_doc = (
        occ.join(gram_logp, "gram")
        .groupBy("__id")
        .agg(
            F.sum("c_doc").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("c_doc") * F.col("logp_q")).alias("sum_logp_q"),
        )
    )
    nb = F.coalesce(F.col("n_bigrams"), F.lit(0).cast("bigint"))
    sq = F.coalesce(F.col("sum_logp_q"), F.lit(0).cast("bigint"))
    avg = F.when(
        nb > 0,
        F.round(sq.cast("double") / nb / LOGP_QUANT, 6),
    ).otherwise(F.lit(0.0))
    return (
        docs.select(did.alias("__id"))
        .join(per_doc, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            nb.alias("n_bigrams"),
            sq.alias("sum_logp_q"),
            avg.alias("avg_logprob"),
            ((nb > 0) & (avg >= BIGRAM_KEEP_MIN)).alias("lm_keep"),
        )
    )


# ----------------------------------------------------- mixture weights

MIX_TEMPERATURE = 0.7
MIX_QUANT = 1_000_000  # micro-units: the normalizing sum is exact int64


def mixture_weights(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    temperature: float = MIX_TEMPERATURE,
) -> DataFrame:
    """Temperature-scaled source mixing weights: w_s ∝ (tokens_s)^T,
    normalized to sum 1 (GPT-3 / The Pile style corpus mixing).

    One hash aggregate keyed on source touches the corpus; each source's
    raw weight is quantized to integer micro-units so the normalizing sum
    is an exact, order-independent int64 total; the normalization runs on
    the |sources|-row aggregate via a broadcast 1-row total (never a
    single-partition window over the corpus).

    Output per source: ``n_docs``, ``n_tokens``, ``weight`` (6 dp).
    """
    per_src = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(token_count_ws(F.col(text_col))).cast("bigint").alias("n_tokens"),
    )
    w_q = (
        F.round(
            F.pow(F.col("n_tokens").cast("double"), F.lit(float(temperature)))
            * MIX_QUANT,
            0,
        )
        .cast("bigint")
        .alias("w_q")
    )
    scaled = per_src.select("source", "n_docs", "n_tokens", w_q)
    total = scaled.agg(F.sum("w_q").alias("w_tot"))
    return (
        scaled.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("w_q").cast("double") / F.col("w_tot"), 6).alias(
                "weight"
            ),
        )
    )
