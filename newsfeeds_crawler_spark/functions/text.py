"""Text-analysis column functions for the training-data pipeline.

All built-in ``pyspark.sql.functions`` compositions (JVM-side, vectorized) —
no per-row Python UDFs. Each returns a Column over a string column and has a
matching ANSI-SQL form used by the DuckDB oracle in
``__spark_entry__.oracle_sql``. The one exception to "expressions only" is
:func:`fingerprint64_arrow`, an Arrow-batched physical twin of the
:func:`fingerprint64` fold (bit-identical values, pinned by test + fuzz):
Spark evaluates higher-order functions interpreted, so the per-character
expression fold costs ~|text| interpreted steps per row — the Arrow twin
replaces the hot-path uses (minhash gram hashing, whole-document
fingerprints) with vectorized numpy over the batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword lists for the n-gram-free language-ID heuristic.
STOPWORDS_EN = ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"]
STOPWORDS_DE = ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"]
STOPWORDS_FR = ["le", "la", "les", "et", "est", "un", "une", "des", "que"]

_TOKEN_SPLIT = r"\s+"
# BPE-ish pre-tokenizer: word pieces OR digit runs OR single punctuation.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_ws(text: Column) -> Column:
    """Whitespace token count; empty/blank string counts 0."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, _TOKEN_SPLIT))
    ).cast("bigint")


def token_count_bpe_ish(text: Column) -> Column:
    """Count of BPE-ish pieces: alpha runs, digit runs, single punct marks."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0))).cast(
        "bigint"
    )


def _word_ratio(text: Column, words: list[str]) -> Column:
    """Fraction of whitespace tokens that are in ``words`` (lowercased)."""
    toks = F.split(F.lower(F.trim(text)), _TOKEN_SPLIT)
    hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def stopword_ratio(text: Column, words: list[str] | None = None) -> Column:
    return _word_ratio(text, words or STOPWORDS_EN)


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of per-language stopword ratios, 'und'
    when all are zero. Deterministic tie-break by en > de > fr."""
    en = _word_ratio(text, STOPWORDS_EN)
    de = _word_ratio(text, STOPWORDS_DE)
    fr = _word_ratio(text, STOPWORDS_FR)
    best = F.greatest(en, de, fr)
    return (
        F.when(best == 0, F.lit("und"))
        .when(en == best, F.lit("en"))
        .when(de == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1]: length band + alpha ratio +
    stopword presence − punctuation excess. Rounded to 6dp for cross-engine
    float stability."""
    n = F.length(text).cast("double")
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", "")).cast("double")
    punct = F.length(F.regexp_replace(text, r"[^!?.,;:]", "")).cast("double")
    len_band = F.least(n / F.lit(500.0), F.lit(1.0))
    alpha_ratio = alpha / F.greatest(n, F.lit(1.0))
    punct_penalty = F.least(punct / F.greatest(n, F.lit(1.0)) * 5.0, F.lit(1.0))
    sw = stopword_ratio(text)
    raw = 0.35 * len_band + 0.35 * alpha_ratio + 0.3 * F.least(sw * 5.0, F.lit(1.0)) \
        - 0.2 * punct_penalty
    return F.round(F.greatest(F.least(raw, F.lit(1.0)), F.lit(0.0)), 6)


def fingerprint64(text: Column) -> Column:
    """Polynomial rolling-hash document fingerprint (deterministic,
    engine-portable: exact int arithmetic mod 2^31-1 keeps every intermediate
    under 2^39, overflow-safe in both Spark ANSI mode and DuckDB).

    h = fold(codepoints, h -> (h*131 + cp) mod (2^31-1))
    """
    m = F.lit(2147483647)  # 2^31 - 1 (Mersenne prime)
    cps = F.transform(F.split(text, ""), lambda ch: F.ascii(ch).cast("bigint"))
    return F.aggregate(
        cps,
        F.lit(0).cast("bigint"),
        lambda acc, cp: (acc * 131 + cp) % m,
    )


def _fp64_arrow_batch(vs: pd.Series) -> pd.Series:
    """Vectorized fingerprint64: h = fold(codepoints, h·131 + cp mod 2³¹−1).

    Bit-identical to the expression fold (test_fingerprint64_arrow_equals
    _expr + hypothesis fuzz): Spark's split('')+ascii walks full Unicode
    CODEPOINTS (verified incl. astral plane — no UTF-16 surrogate split),
    exactly what utf-32-le decoding yields; '' folds to 0 both ways (the
    expression path folds one ascii('')=0 step from seed 0). Every
    intermediate stays < 2³¹·131 + 2²¹ < 2³⁹ — int64-safe. Work is
    column-sweeps over length-chunked sub-batches (≤1024 rows), so memory
    is ≤ 1024 × maxlen(chunk) int64 even for whole-document inputs."""
    M = 2147483647
    n = len(vs)
    out = np.zeros(n, dtype=np.int64)
    isnull = vs.isna().to_numpy()
    for lo in range(0, n, 1024):
        hi = min(lo + 1024, n)
        cps = [
            None
            if isnull[i]
            else np.frombuffer(
                vs.iloc[i].encode("utf-32-le"), dtype="<u4"
            ).astype(np.int64)
            for i in range(lo, hi)
        ]
        lens = np.array(
            [0 if a is None else len(a) for a in cps], dtype=np.int64
        )
        maxlen = int(lens.max()) if len(lens) else 0
        if not maxlen:
            continue
        mat = np.zeros((hi - lo, maxlen), dtype=np.int64)
        for i, a in enumerate(cps):
            if a is not None and len(a):
                mat[i, : len(a)] = a
        h = np.zeros(hi - lo, dtype=np.int64)
        for j in range(maxlen):
            act = lens > j
            if not act.any():
                break
            h = np.where(act, (h * 131 + mat[:, j]) % M, h)
        out[lo:hi] = h
    res = pd.Series(out)
    if isnull.any():
        res = res.astype("object")
        res[isnull] = None
    return res


_FP64_UDF = None


def fingerprint64_arrow(text: Column) -> Column:
    """Arrow-batched twin of :func:`fingerprint64` — same values, ~10×
    less CPU on gram-sized strings. Use for top-level column hashing on
    hot paths; inside ``F.transform`` lambdas (array elements) only the
    expression form composes, so :func:`fingerprint64` stays. The UDF is
    built lazily (pandas_udf needs an active session to parse the return
    type, and this module imports before any session exists)."""
    global _FP64_UDF
    if _FP64_UDF is None:
        _FP64_UDF = F.pandas_udf(_fp64_arrow_batch, "bigint")
    return _FP64_UDF(text)


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-shingles (array<string>) for Jaccard/minhash dedup."""
    toks = F.split(F.lower(F.trim(text)), _TOKEN_SPLIT)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))
    )
    return F.when(n >= k, F.array_distinct(grams)).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def char_ngrams(text: Column, n: int = 4) -> Column:
    """Distinct character n-grams (array<string>)."""
    t = F.lower(text)
    ln = F.length(t)
    idx = F.sequence(F.lit(1), F.greatest(ln - n + 1, F.lit(1)))
    grams = F.transform(idx, lambda i: F.substring(t, i, n))
    return F.array_distinct(grams)
