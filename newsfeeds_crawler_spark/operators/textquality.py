"""Corpus-quality operators for the training-data pipeline: Gopher-style
repetition filters, CCNet-style cross-document segment dedup, and a PII
scrub — all Catalyst expressions + one Arrow-batched hash, no per-row
Python, each with a literal DuckDB mirror in ``__spark_entry__.oracle_sql``.

No reference analog (the reference is a crawler, not a curation pipeline);
these extend the engine toward the LLM-data use the task brief names.
Public sources for the rules themselves:

- Repetition filters: Rae et al. 2021 ("Scaling Language Models: ...
  Gopher"), Table A1 — fraction of tokens in the most frequent n-gram and
  fraction of characters inside duplicated n-grams. Thresholds here
  (top-bigram ≤ 0.20, dup-trigram chars ≤ 0.30) follow the same family.
- Segment dedup: Wenzek et al. 2020 (CCNet) deduplicates on hashes of
  normalized paragraphs; the corpus here has no newlines, so the segment
  unit is a non-overlapping window of ``window`` whitespace tokens.
- PII scrubbing: standard regex classes (email / NANP phone / IPv4) with
  deterministic placeholder substitution, the shape used by public
  curation pipelines (e.g. BigScience ROOTS); patterns are kept in the
  RE2 ∩ java.util.regex common subset so Spark and DuckDB agree byte-
  for-byte.

100 TB shape:
- ``repetition_stats``: explode n-grams → two hash aggregates whose width
  is the number of *distinct* (doc, n, gram) pairs (map-side partial
  combine does the heavy lifting on repetitive docs — exactly the docs
  the filter exists to catch); the final per-doc pivot is a hash
  aggregate on doc_id. No joins, no broadcast, no skew key (doc_id is
  unique).
- ``segment_dedup``: segments are hashed map-side (Arrow-vectorized
  fingerprint), the occurrence count is one aggregate ∝ distinct
  segments, and the count join-back shuffles on seg-hash — the same
  partitioning the aggregate just produced, so AQE/exchange-reuse keeps
  it one shuffle. Per-doc rollup is a hash aggregate on doc_id.
- ``pii_scrub``: pure map-only projection (regexp + concat + one Arrow
  hash); scales trivially.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from newsfeeds_crawler_spark.functions.text import (
    fingerprint64_arrow,
    quality_score,
    _TOKEN_SPLIT,
)

# ------------------------------------------------------------ repetition

# Gopher-family thresholds (Rae et al. 2021 Table A1 uses 0.20 for the top
# 2-gram token fraction; the duplicate-n-gram character bound is adapted to
# trigrams for this corpus' short docs).
TOP_BIGRAM_MAX = 0.20
DUP_TRIGRAM_CHAR_MAX = 0.30


def _tokens(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), _TOKEN_SPLIT)


def word_ngrams(text: Column, n: int) -> Column:
    """ALL word n-grams in order (not distinct — repetition counting needs
    multiplicity, unlike ``functions.text.shingles``). Empty array when the
    doc has fewer than ``n`` tokens."""
    toks = _tokens(text)
    size = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(size - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.when(size >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition-quality stats (Gopher-style):

    - ``top_bigram_frac``  — fraction of bigram occurrences taken by the
      single most frequent bigram (0.0 when the doc has < 2 tokens).
    - ``dup_trigram_char_frac`` — fraction of trigram characters (gram
      length × occurrences) inside trigrams occurring ≥ 2× in the doc.
    - ``rep_ok`` — both under the module thresholds.

    Shape: one explode of tagged 2-/3-grams, a (doc, n, gram) count
    aggregate, a (doc, n) rollup, then a conditional-aggregation pivot to
    one row per doc; a left join back to the doc list covers docs too
    short to emit any gram. All counting is map-side combinable.
    """
    did = F.col(id_col)
    tag2 = F.transform(
        word_ngrams(F.col(text_col), 2),
        lambda g: F.struct(F.lit(2).alias("n"), g.alias("gram")),
    )
    tag3 = F.transform(
        word_ngrams(F.col(text_col), 3),
        lambda g: F.struct(F.lit(3).alias("n"), g.alias("gram")),
    )
    exploded = docs.select(
        did.alias("__id"), F.explode(F.concat(tag2, tag3)).alias("t")
    ).select("__id", F.col("t.n").alias("n"), F.col("t.gram").alias("gram"))

    per_gram = exploded.groupBy("__id", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    chars = F.col("cnt") * F.length("gram")
    per_n = per_gram.groupBy("__id", "n").agg(
        F.max("cnt").alias("top_cnt"),
        F.sum("cnt").alias("tot"),
        F.sum(chars).alias("tot_chars"),
        F.sum(F.when(F.col("cnt") >= 2, chars).otherwise(F.lit(0))).alias(
            "dup_chars"
        ),
    )
    pivot = per_n.groupBy("__id").agg(
        F.max(
            F.when(
                F.col("n") == 2,
                F.round(F.col("top_cnt").cast("double") / F.col("tot"), 6),
            )
        ).alias("tb"),
        F.max(
            F.when(
                F.col("n") == 3,
                F.round(
                    F.col("dup_chars").cast("double")
                    / F.greatest(F.col("tot_chars"), F.lit(1)),
                    6,
                ),
            )
        ).alias("dt"),
    )
    tb = F.coalesce(F.col("tb"), F.lit(0.0))
    dt = F.coalesce(F.col("dt"), F.lit(0.0))
    return (
        docs.select(did.alias("__id"))
        .join(pivot, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            tb.alias("top_bigram_frac"),
            dt.alias("dup_trigram_char_frac"),
            (
                (tb <= F.lit(TOP_BIGRAM_MAX))
                & (dt <= F.lit(DUP_TRIGRAM_CHAR_MAX))
            ).alias("rep_ok"),
        )
    )


# ---------------------------------------------------------- segment dedup

SEGMENT_WINDOW = 16  # whitespace tokens per segment
SEGMENT_DUP_MAX = 0.5  # keep docs with < 50% duplicated segments


def segment_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = SEGMENT_WINDOW,
) -> DataFrame:
    """CCNet-style cross-document segment dedup over token windows.

    Each doc is cut into non-overlapping windows of ``window`` whitespace
    tokens (last window may be short); each segment is fingerprinted with
    the Arrow-vectorized 31-bit poly hash; a corpus-wide occurrence count
    marks every segment whose hash appears ≥ 2 times ANYWHERE (across docs
    or repeated within one doc — both are redundancy for a training set).

    Output per doc: ``n_segments``, ``n_dup_segments``,
    ``dup_ratio`` (rounded 6 dp) and ``keep`` (ratio < 0.5).
    """
    did = F.col(id_col)
    toks = _tokens(F.col(text_col))
    n_seg = F.ceil(F.size(toks) / F.lit(float(window))).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * window + 1, window)),
    )
    seg_hash = (
        docs.select(did.alias("__id"), F.explode(segs).alias("seg"))
        .select("__id", fingerprint64_arrow(F.col("seg")).alias("sh"))
    )
    occ = seg_hash.groupBy("sh").agg(F.count(F.lit(1)).alias("occ"))
    per_doc = (
        seg_hash.join(occ, "sh")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.sum(F.when(F.col("occ") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_segments"),
        )
    )
    ratio = F.round(
        F.col("n_dup_segments").cast("double") / F.col("n_segments"), 6
    )
    return per_doc.select(
        F.col("__id").alias(id_col),
        "n_segments",
        "n_dup_segments",
        ratio.alias("dup_ratio"),
        (ratio < F.lit(SEGMENT_DUP_MAX)).alias("keep"),
    )


# -------------------------------------------------------------- PII scrub

# RE2 ∩ java.util.regex common subset: no lookaround, no backrefs, ASCII
# classes only — Spark and DuckDB match byte-identically.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def pii_salt(doc_id: Column, text: Column) -> Column:
    """Deterministically inject synthetic PII (the test corpus has none):
    every doc_id ≡ 0 (mod 3) gains an email, (mod 5) a NANP phone,
    (mod 7) an IPv4 — arithmetic on doc_id only, so the DuckDB oracle
    rebuilds the identical salted string."""
    s = doc_id.cast("string")
    email = F.when(
        doc_id % 3 == 0,
        F.concat(F.lit(" contact user"), s, F.lit("@example.com ok")),
    ).otherwise(F.lit(""))
    phone = F.when(
        doc_id % 5 == 0,
        F.concat(
            F.lit(" call 555-"),
            (doc_id % 900 + 100).cast("string"),
            F.lit("-"),
            (doc_id % 9000 + 1000).cast("string"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        doc_id % 7 == 0,
        F.concat(
            F.lit(" at 10."),
            (doc_id % 256).cast("string"),
            F.lit(".0."),
            ((doc_id * 7) % 256).cast("string"),
            F.lit(" end"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(text, email, phone, ip)


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Count + redact PII classes (map-only projection).

    Replacement order is email → IPv4 → phone (fixed; mirrored literally
    in the oracle). Output: per-class match counts on the pre-scrub text,
    the poly-hash fingerprint of the scrubbed text (Arrow-vectorized;
    hash-compared against DuckDB so the redaction itself is verified
    byte-for-byte), and ``clean`` = no class matches after scrubbing.
    """
    did = F.col(id_col)
    salted = pii_salt(did, F.col(text_col))
    n_email = F.size(
        F.regexp_extract_all(salted, F.lit(PII_EMAIL_RE), F.lit(0))
    ).cast("bigint")
    n_phone = F.size(
        F.regexp_extract_all(salted, F.lit(PII_PHONE_RE), F.lit(0))
    ).cast("bigint")
    n_ipv4 = F.size(
        F.regexp_extract_all(salted, F.lit(PII_IPV4_RE), F.lit(0))
    ).cast("bigint")
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(salted, PII_EMAIL_RE, EMAIL_TOKEN),
            PII_IPV4_RE,
            IP_TOKEN,
        ),
        PII_PHONE_RE,
        PHONE_TOKEN,
    )
    clean = ~(
        scrubbed.rlike(PII_EMAIL_RE)
        | scrubbed.rlike(PII_PHONE_RE)
        | scrubbed.rlike(PII_IPV4_RE)
    )
    return docs.select(
        did.alias(id_col),
        n_email.alias("n_email"),
        n_phone.alias("n_phone"),
        n_ipv4.alias("n_ipv4"),
        fingerprint64_arrow(scrubbed).alias("fp_scrubbed"),
        clean.alias("clean"),
    )


# -------------------------------------------------------- pipeline verdict

MIN_QUALITY = 0.3


def curation_verdict(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = MIN_QUALITY,
) -> DataFrame:
    """One keep/drop verdict per document — the composed shape an actual
    curation run executes over a crawl snapshot: repetition filters,
    cross-document segment dedup, and the heuristic quality score, joined
    on doc_id with a deterministic reason code (first failing rule in a
    fixed precedence: repetition → dup_segments → low_quality → ok).

    Shape: both aggregate operators end in a hash aggregate keyed on
    doc_id, so the verdict joins align with partitioning the operators
    already produced; the quality column is a map-only projection on the
    doc side. ``keep`` = all three rules pass.
    """
    did = F.col(id_col)
    rep = repetition_stats(docs, id_col, text_col).select(id_col, "rep_ok")
    seg = segment_dedup(docs, id_col, text_col).select(
        id_col, F.col("keep").alias("seg_keep")
    )
    base = docs.select(did, quality_score(F.col(text_col)).alias("quality"))
    j = base.join(rep, id_col).join(seg, id_col)
    reason = (
        F.when(~F.col("rep_ok"), F.lit("repetition"))
        .when(~F.col("seg_keep"), F.lit("dup_segments"))
        .when(F.col("quality") < min_quality, F.lit("low_quality"))
        .otherwise(F.lit("ok"))
    )
    return j.select(
        id_col,
        "quality",
        "rep_ok",
        "seg_keep",
        reason.alias("reason"),
        (
            F.col("rep_ok")
            & F.col("seg_keep")
            & (F.col("quality") >= min_quality)
        ).alias("keep"),
    )
