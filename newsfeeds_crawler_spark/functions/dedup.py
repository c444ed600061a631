"""Deduplication primitives: MinHash, LSH banding, SimHash.

Everything is built from the engine-portable polynomial rolling hash
(``functions.text.fingerprint64``): exact 64-bit-safe integer arithmetic mod
2^31-1, so the *same* signature math can be written in Spark Column
expressions (JVM-side, whole-stage codegen) and in the DuckDB oracle SQL —
that is what lets the driver hash-match MinHash/SimHash results exactly.

At 100 TB these run as pure Catalyst expressions over the documents table:
no Python in the hot path, shuffles only at the band-key groupBy (LSH) or
the blocked self-join (verification), both keyed and salt-able.

Reference parity: the reference's only dedup is the URL UNIQUE probe
(MysqlFeedArticleDao.scala:46-56); content-level dedup is the training-data
extension required by the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from newsfeeds_crawler_spark.functions.text import fingerprint64

MERSENNE31 = 2147483647  # 2^31 - 1; keeps a*h+b < 2^62 → overflow-safe

# Deterministic affine-permutation coefficients for MinHash: the classic
# fixed-seed LCG expansion (no runtime RNG — the oracle SQL inlines the same
# numbers). a must be non-zero mod p.
_LCG_A, _LCG_C, _LCG_M = 1103515245, 12345, 2**31


def minhash_coeffs(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """(a_i, b_i) pairs, identical across engines (pure Python ints)."""
    x = seed
    out = []
    for _ in range(num_hashes):
        x = (_LCG_A * x + _LCG_C) % _LCG_M
        a = 1 + x % (MERSENNE31 - 1)
        x = (_LCG_A * x + _LCG_C) % _LCG_M
        b = x % MERSENNE31
        out.append((a, b))
    return out


def _minhash_fold(grams: Column, num_hashes: int, seed: int, finish) -> Column:
    """One-pass MinHash fold: hash each shingle ONCE (transform), then fold
    the ``num_hashes`` permuted minima in a single ``aggregate`` whose merge
    is a zip_with(least). Entirely map-side — no explode, no shuffle — and
    the shingle hash is computed exactly once per gram (the per-permutation
    array_min form re-inlines the hash ``num_hashes`` times after projection
    collapse; the exploded groupBy-min form shuffles |docs|·|grams| rows).
    ``finish`` maps the final signature array (bound ONCE as the aggregate's
    finish-lambda variable, so consumers can derive several values from it
    without re-evaluating the fold)."""
    coeffs = minhash_coeffs(num_hashes, seed)
    ab = F.array(
        *[F.struct(F.lit(a).alias("a"), F.lit(b).alias("b")) for a, b in coeffs]
    )
    init = F.array_repeat(F.lit(MERSENNE31).cast("bigint"), num_hashes)
    hs = F.transform(grams, lambda g: fingerprint64(g))
    return F.aggregate(
        hs,
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(ab, lambda c: (c["a"] * h + c["b"]) % F.lit(MERSENNE31)),
            lambda x, y: F.least(x, y),
        ),
        finish,
    )


def minhash_signature(grams: Column, num_hashes: int = 16, seed: int = 42) -> Column:
    """array<bigint> MinHash signature over an array<string> of shingles.

    sig[i] = min over shingles s of (a_i * H(s) + b_i) mod (2^31-1),
    H = fingerprint64 poly hash. Empty gram arrays hash to the max value
    (the fold's init), identical to the min-over-exploded-rows form.
    """
    return _minhash_fold(grams, num_hashes, seed, lambda acc: acc)


def lsh_band_keys(sig: Column, bands: int, rows_per_band: int) -> Column:
    """array<string> of band keys 'b:h1_h2_..' — group-by key for LSH buckets."""
    keys = []
    for b in range(bands):
        vals = F.slice(sig, b * rows_per_band + 1, rows_per_band)
        keys.append(
            F.concat_ws(
                "_",
                F.lit(str(b)),
                *[F.element_at(vals, i + 1).cast("string") for i in range(rows_per_band)],
            )
        )
    return F.array(*keys)


def minhash_sql(text_expr: str, num_hashes: int = 16, seed: int = 42,
                k_shingle: int = 3) -> str:
    """DuckDB scalar expression producing the identical signature list."""
    grams = shingles_sql(text_expr, k_shingle)
    hs = f"list_transform({grams}, __g -> {fingerprint_sql('__g')})"
    parts = []
    for a, b in minhash_coeffs(num_hashes, seed):
        parts.append(
            f"coalesce(list_min(list_transform({hs}, "
            f"__h -> ({a}::BIGINT * __h + {b}) % {MERSENNE31})), {MERSENNE31})"
        )
    return "[" + ", ".join(parts) + "]"


def fingerprint_sql(expr: str) -> str:
    """DuckDB mirror of functions.text.fingerprint64 (left fold from 0)."""
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split({expr}, ''), __c -> ascii(__c)::BIGINT)), "
        f"(__acc, __cp) -> (__acc * 131 + __cp) % {MERSENNE31})"
    )


def tokens_sql(text_expr: str) -> str:
    r"""DuckDB mirror of F.split(lower(trim(text)), '\s+')."""
    return rf"string_split_regex(lower(trim({text_expr})), '\s+')"


def shingles_sql(text_expr: str, k: int = 3) -> str:
    """DuckDB mirror of functions.text.shingles (distinct word k-grams)."""
    toks = tokens_sql(text_expr)
    grams = (
        f"list_transform(generate_series(0, greatest(len({toks}) - {k}, 0)), "
        f"__i -> array_to_string(({toks})[__i + 1 : __i + {k}], ' '))"
    )
    return (
        f"CASE WHEN len({toks}) >= {k} THEN list_distinct({grams}) "
        f"ELSE [array_to_string({toks}, ' ')] END"
    )


# --------------------------------------------------------------- SimHash

SIMHASH_BITS = 24  # bits taken from the 31-bit poly hash (bits 0..23)


def simhash(tokens: Column, bits: int = SIMHASH_BITS) -> Column:
    """Engine-portable SimHash over distinct tokens.

    bit_b(doc) = 1 iff sum over distinct tokens t of (2*bit_b(H(t)) - 1) > 0;
    value = Σ bit_b · 2^b. Pure Catalyst expression: one F.aggregate fold
    carrying a packed accumulator is *not* used — instead each bit's vote sum
    is an independent fold so the oracle SQL stays a literal mirror.
    """
    toks = F.array_distinct(tokens)
    hs = F.transform(toks, lambda t: fingerprint64(t))
    total = F.lit(0).cast("bigint")
    for b in range(bits):
        votes = F.aggregate(
            hs,
            F.lit(0).cast("bigint"),
            lambda acc, h, _b=b: acc
            + (F.floor(h / F.lit(2**_b)).cast("bigint") % 2) * 2 - 1,
        )
        total = total + F.when(votes > 0, F.lit(2**b)).otherwise(F.lit(0)).cast("bigint")
    return total


def simhash_sql(text_expr: str, bits: int = SIMHASH_BITS) -> str:
    """DuckDB mirror of :func:`simhash` over whitespace tokens of text."""
    toks = f"list_distinct({tokens_sql(text_expr)})"
    hs = f"list_transform({toks}, __t -> {fingerprint_sql('__t')})"
    terms = []
    for b in range(bits):
        votes = (
            f"list_reduce(list_prepend(0::BIGINT, {hs}), "
            f"(__acc, __h) -> __acc + ((__h // {2**b}) % 2) * 2 - 1)"
        )
        terms.append(f"(CASE WHEN {votes} > 0 THEN {2**b}::BIGINT ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def hamming64(a: Column, b: Column) -> Column:
    """Popcount of XOR — built-in bit_count keeps it JVM-side."""
    return F.bit_count(a.bitwiseXOR(b))
