"""Training-sequence packing: lay the corpus out as fixed-length training
sequences ("concat then chunk" — the standard GPT-style pretraining
packing, e.g. Brown et al. 2020 §2.3 pack documents into 2048-token
contexts separated by EOT) and report, per document, exactly where its
tokens land: global start offset within its shard, first/last sequence
index, and whether it straddles a sequence boundary.

The layout is a pure prefix-sum: within a shard (the ``source`` column —
corpora are ingested per-source, and per-source packing keeps mixture
weighting downstream trivial), documents concatenate in doc_id order;
token offsets are the exclusive running sum of per-doc token counts, and
sequence ids are integer floor-divisions of the offsets. Everything is
exact int64 window arithmetic — bit-identical across engines and
partitionings, so the gate hash-checks.

100 TB shape: one shuffle keyed on the shard column feeds a single
ordered window pass (the running sum) and every derived column is
map-side arithmetic on top of it — cost ∝ |docs|, bounded by the largest
shard. A DEGENERATE single-source corpus would serialize into one
partition; the scale fix is the textbook two-level prefix sum (block-local
running sums + one tiny block-offset frame joined back — the same shape
``plans/driver.py`` uses for touched-bucket merges), worth the extra join
only when a shard outgrows an executor; with per-source sharding it never
does. No driver state, no iteration, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from newsfeeds_crawler_spark.functions.text import _TOKEN_SPLIT

SEQ_LEN = 1024  # tokens per packed training sequence


def pack_sequences(
    docs: DataFrame,
    seq_len: int = SEQ_LEN,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
) -> DataFrame:
    """Per-document packed layout.

    Output: ``doc_id``, ``shard``, ``n_tokens``, ``start_offset``
    (exclusive prefix sum within shard, doc_id order), ``first_seq`` /
    ``last_seq`` (0-based fixed-length sequence indices), ``n_seqs``
    (sequences this doc touches) and ``spans_boundary``. Empty documents
    (0 tokens after the whitespace split — impossible with this
    tokenizer, which maps "" to one empty token, but guarded for other
    tokenizers) would occupy no sequence; here ``n_tokens >= 1`` always.
    """
    did = F.col(id_col)
    n_tok = F.size(
        F.split(F.lower(F.trim(F.col(text_col))), _TOKEN_SPLIT)
    ).cast("bigint")
    base = docs.select(
        did.cast("bigint").alias("doc_id"),
        F.col(shard_col).alias("shard"),
        n_tok.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    with_start = base.select(
        "doc_id", "shard", "n_tokens", start.alias("start_offset")
    )
    end = F.col("start_offset") + F.col("n_tokens") - 1
    first_seq = F.expr(f"start_offset div {seq_len}").cast("bigint")
    last_seq = (
        F.expr(f"(start_offset + n_tokens - 1) div {seq_len}")
    ).cast("bigint")
    return with_start.select(
        "doc_id",
        "shard",
        "n_tokens",
        "start_offset",
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
        (last_seq - first_seq + 1).cast("bigint").alias("n_seqs"),
        (last_seq > first_seq).alias("spans_boundary"),
        (end % seq_len == seq_len - 1).alias("ends_on_boundary"),
    )


def shard_pack_stats(
    docs: DataFrame,
    seq_len: int = SEQ_LEN,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
) -> DataFrame:
    """Per-shard packing rollup: total tokens, full sequences produced
    (``total div seq_len``), tail tokens (the final partial sequence),
    and how many documents straddle a boundary — the numbers a training
    run reports per mixture source."""
    per_doc = pack_sequences(docs, seq_len, id_col, text_col, shard_col)
    return per_doc.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.expr(f"sum(n_tokens) div {seq_len}").cast("bigint").alias(
            "full_seqs"
        ),
        (F.sum("n_tokens") % seq_len).cast("bigint").alias("tail_tokens"),
        F.sum(F.col("spans_boundary").cast("int")).cast("bigint").alias(
            "n_spanning_docs"
        ),
    )
