"""Exact duplicated-substring SPAN removal — the "exact substring dedup"
pass of Lee et al. 2022 ("Deduplicating Training Data Makes Language
Models Better"), re-expressed over token windows so the whole pipeline is
Catalyst expressions + one Arrow-batched hash and the output is an exact,
hash-checkable set of integer spans.

Unlike document-level dedup (drop the whole doc) and CCNet segment dedup
(non-overlapping fixed blocks, per-doc ratio — ``textquality.segment_dedup``),
this operator finds the MAXIMAL token ranges inside each document whose
every ``window``-token rolling window occurs at least twice in the corpus,
i.e. the pieces a training pipeline would cut out while keeping the rest
of the document. Lee et al. do this with a corpus-wide suffix array and a
50-token threshold; the distributed re-expression is the standard one
(rolling fingerprints → global occurrence count → interval merge), which
finds exactly the duplicated regions of length ≥ ``window`` tokens.

Pipeline (all exact integer arithmetic → bit-identical across engines and
partitionings, DuckDB-mirrorable):

1. rolling windows — every start position i ∈ [0, n_tokens − window] gets
   the ``window``-token gram starting at i (map-only: sequence + slice +
   concat_ws, then one posexplode).
2. fingerprint — the portable 31-bit poly hash (Arrow-vectorized batch,
   bit-identical to the expression fold).
3. occurrence count — ONE hash aggregate keyed on the fingerprint; a
   window is duplicated iff its hash occurs ≥ 2 times anywhere (across
   documents or repeated inside one — both are redundancy in a training
   set, the same convention as ``segment_dedup``).
4. interval merge — duplicated windows cover [i, i+window−1]; because all
   intervals have equal width, two sorted intervals overlap-or-touch iff
   the start gap ≤ window, so one lag + cumulative-sum window pass per doc
   (the ``sessionize`` trick) yields maximal spans — no cummax needed.

100 TB shape: step 1–2 are map-only (work ∝ total tokens × 1, each token
enters ``window`` grams but the gram build is per-row array ops, no
shuffle); step 3 is one aggregate ∝ distinct window fingerprints with
map-side combine (repetitive corpora — the target — collapse hard). The
count join-back: below broadcast size the c ≥ 2 fingerprint set (only the
DUPLICATED hashes — the filter pushes into the aggregate side) broadcasts
and the window frame streams map-side (the plan local runs show); past
broadcast size AQE degrades to a shuffle on ``gh`` — the same key the
aggregate just produced, so exchange reuse applies. The window frame is
deliberately RECOMPUTED for the probe branch rather than checkpointed
(same trade as ``segment_dedup``): one extra tokenize+hash pass is CPU at
memory-bandwidth rates, while materializing |tokens| rows of state at
100 TB costs more I/O than it saves. The interval merge is one shuffle on
doc_id, over c ≥ 2 rows only. Nothing collects to the driver; skew is
bounded by the hottest fingerprint's partition. Reference analog: none
(the reference crawls; this extends the engine toward the LLM-curation
use the brief names).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from newsfeeds_crawler_spark.functions.text import (
    _TOKEN_SPLIT,
    fingerprint64_arrow,
)

SPAN_WINDOW = 8  # tokens per rolling window (= minimum duplicated span)

# Deterministic boilerplate the gate appends by doc_id arithmetic (the
# pii_salt pattern): the synthetic corpus has no natural long duplicates,
# so the gate plants the cross-document / within-document repeated spans a
# crawled corpus exhibits (footer boilerplate is exactly what Lee et al.'s
# pass removes). Lowercase, single-space, regex-free → the DuckDB oracle
# rebuilds the identical salted string.
BOILER_A = "subscribe to our newsletter and follow us on social media today"
BOILER_B = (
    "all rights reserved terms of service and privacy policy apply here"
)


def _tokens(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), _TOKEN_SPLIT)


def rolling_window_hashes(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = SPAN_WINDOW,
) -> DataFrame:
    """(doc_id, i, gh): the portable fingerprint of the ``window``-token
    gram starting at token position i (0-based), for every i in
    [0, n_tokens − window]. Docs shorter than ``window`` tokens emit
    nothing (they cannot contain a duplicated span of that length)."""
    did = F.col(id_col)
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    grams = F.when(
        n >= window,
        F.transform(
            F.sequence(F.lit(0), n - window),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, window)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(did.alias("doc_id"), F.posexplode(grams).alias("i", "gram"))
        .select(
            "doc_id",
            F.col("i").cast("bigint").alias("i"),
            fingerprint64_arrow(F.col("gram")).alias("gh"),
        )
    )


def duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = SPAN_WINDOW,
) -> DataFrame:
    """Maximal duplicated token spans per document.

    Output: one row per span — ``doc_id``, ``span_id`` (1-based within
    doc, in token order), ``start_tok`` / ``end_tok`` (0-based inclusive
    token positions), ``span_tokens``, ``n_windows`` (duplicated rolling
    windows merged into the span). All exact int64.
    """
    wh = rolling_window_hashes(docs, id_col, text_col, window)
    occ = wh.groupBy("gh").agg(F.count(F.lit(1)).alias("c"))
    dup = wh.join(occ, "gh").filter(F.col("c") >= 2).select("doc_id", "i")
    w = Window.partitionBy("doc_id").orderBy("i")
    prev = F.lag("i").over(w)
    flagged = dup.select(
        "doc_id",
        "i",
        # equal-width intervals [i, i+window-1]: same span iff the start
        # gap <= window (overlap or exact adjacency)
        F.when(prev.isNull() | (F.col("i") - prev > window), 1)
        .otherwise(0)
        .alias("ns"),
    )
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spans = flagged.select(
        "doc_id", "i", F.sum("ns").over(wc).cast("bigint").alias("span_id")
    )
    return spans.groupBy("doc_id", "span_id").agg(
        F.min("i").cast("bigint").alias("start_tok"),
        (F.max("i") + F.lit(window - 1)).cast("bigint").alias("end_tok"),
        (F.max("i") - F.min("i") + F.lit(window)).cast("bigint").alias(
            "span_tokens"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
    )


def span_removal_summary(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = SPAN_WINDOW,
) -> DataFrame:
    """Per-document rollup of :func:`duplicate_spans`: ``n_tokens``,
    ``removed_tokens`` (Σ span lengths — spans are disjoint by
    construction), ``kept_tokens`` and ``n_spans``. Every document appears
    (spans or not), so the frame is a drop-in curation column source."""
    spans = duplicate_spans(docs, id_col, text_col, window)
    per_doc = spans.groupBy("doc_id").agg(
        F.sum("span_tokens").cast("bigint").alias("removed_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(_tokens(F.col(text_col))).cast("bigint").alias("n_tokens"),
    )
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("removed_tokens"), F.lit(0)).cast("bigint").alias(
            "removed_tokens"
        ),
        (
            F.col("n_tokens")
            - F.coalesce(F.col("removed_tokens"), F.lit(0))
        ).cast("bigint").alias("kept_tokens"),
        F.coalesce(F.col("n_spans"), F.lit(0)).cast("bigint").alias("n_spans"),
    )
