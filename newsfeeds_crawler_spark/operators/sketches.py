"""Mergeable cardinality sketches for frontier/corpus accounting:
HyperLogLog registers + estimate in pure integer arithmetic, portable
across engines (DuckDB oracle computes the identical registers AND the
identical estimate and hash-matches).

Why it's here: a 10^10-URL crawl needs "how many DISTINCT canonical URLs
has each source / host-bucket / epoch produced?" continuously — exact
COUNT(DISTINCT) at that scale is a full shuffle of every key, while an HLL
register table is ~m int rows per group, mergeable across epochs with a
plain ``max`` (the same touched-bucket merge the hosts/feeds state tables
already use). Flajolet et al. 2007 (public algorithm).

Determinism / portability:
- base hash = ``fingerprint64`` (portable poly-hash mod 2^31−1, the
  repo-wide cross-engine hash). The poly-hash alone is NOT usable for HLL:
  its output clusters on structured key families (measured: raw registers
  collapsed to two rho values and the estimate came out 5× low) — HLL's
  leading-zero statistics need avalanche, which h·131+cp mod p lacks.
- mixer = ``mix62``, a splitmix64-style finalizer truncated to 62 bits:
  z = h + GOLD; z ^= z>>30; z *= K1; z ^= z>>27; z *= K2; z ^= z>>31 —
  all mod 2^62. The wraparound multiply is done in 31-bit limbs so every
  intermediate stays < 2^63 (Spark ANSI mode throws on int64 overflow):
  x·C mod 2^62 = (x0·c0 + ((x0·c1 + x1·c0) mod 2^31)·2^31) mod 2^62 with
  x = x1·2^31 + x0, C = c1·2^31 + c0. Every mod here is by a power of two,
  so the whole mixer is AND/XOR/shift/multiply on non-negative int64 —
  bit-identical in Spark and DuckDB. Constants are Steele/Lea/Burrows
  splitmix64's (public domain), masked to 62 bits; avalanche verified
  empirically (estimates within ±2σ across key families and sizes where
  the raw poly-hash was −80% off).
- bucket = z AND (m−1); payload = the TOP w bits of z >> log2(m)
  (uniform); rho = w + 1 − bitlen(payload), bitlen as Σ_b [payload ≥ 2^b]
  — a pure comparison sum both engines evaluate identically.
- registers: r_j = max(rho) per bucket (0 for never-hit buckets) — a plain
  aggregate, order-independent, MERGEABLE by max
  (test_hll_registers_mergeable_by_max).
- estimate: E = α_m · m² / Σ 2^(−r_j) evaluated as integers:
  S = Σ 2^(RMAX−r_j) (exact), t = (m²·2^RMAX) div S, est = (α_num·t) div
  α_den with α_256 ≈ 0.718274 as the rational 718274/10^6. Two integer
  floor-divisions replace the float divide; both engines produce the same
  est bit-for-bit. The small-range (linear counting) and large-range
  corrections need a float ln and are deliberately omitted — this is the
  raw HLL estimator, accurate for n ≳ 2.5·m, which the gate's input
  respects; at crawl scale n ≫ m always.

100 TB shape: one map-side-combinable max-aggregate keyed (group, bucket)
— shuffle volume ∝ groups·m regardless of input rows; the estimate is a
second tiny aggregate over m rows per group. int64 headroom (w=30,
RMAX=32, m=256): S ≤ m·2^RMAX = 2^40; m²·2^RMAX = 2^48; rho ≤ w+1 ⇒ every
S term ≥ 2 ⇒ S ≥ 2m ⇒ t ≤ 2^39 and α_num·t < 2^20·2^39 = 2^59 < 2^63.
w = 30 payload bits supports ~2^30 distinct per bucket ⇒ ~2.7·10^11 total
at m=256 — above the 10^10-URL target.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from newsfeeds_crawler_spark.functions.text import fingerprint64

HLL_M = 256  # registers (power of two; bucket = z AND m-1)
HLL_M_BITS = 8
HLL_W = 30  # payload bits read from the top of z >> m_bits
HLL_RMAX = HLL_W + 2  # > max rho (w+1); S terms are 2^(RMAX-rho)
HLL_ALPHA_NUM = 718274  # α_256 ≈ 0.7182725932... as 718274/10^6
HLL_ALPHA_DEN = 10**6

MASK62 = (1 << 62) - 1
MASK31 = (1 << 31) - 1
MIX_GOLD = 0x9E3779B97F4A7C15 & MASK62
MIX_K1 = 0xBF58476D1CE4E5B9 & MASK62
MIX_K2 = 0x94D049BB133111EB & MASK62


def _mul62(x: Column, c: int) -> Column:
    """x·c mod 2^62 via 31-bit limbs (module docstring identity); x must be
    a non-negative bigint < 2^62, c a Python constant < 2^62."""
    c1, c0 = c >> 31, c & MASK31
    x0 = x.bitwiseAND(F.lit(MASK31))
    x1 = F.shiftright(x, 31)
    lo = x0 * F.lit(c0)
    mid = F.shiftleft(
        (x0 * F.lit(c1) + x1 * F.lit(c0)).bitwiseAND(F.lit(MASK31)), 31
    )
    return (lo + mid).bitwiseAND(F.lit(MASK62))


def mix62(h: Column) -> Column:
    """splitmix64-style avalanche finalizer mod 2^62 over a non-negative
    bigint column — AND/XOR/shift/limb-multiply only, ANSI-safe."""
    z = (h + F.lit(MIX_GOLD)).bitwiseAND(F.lit(MASK62))
    z = z.bitwiseXOR(F.shiftright(z, 30))
    z = _mul62(z, MIX_K1)
    z = z.bitwiseXOR(F.shiftright(z, 27))
    z = _mul62(z, MIX_K2)
    return z.bitwiseXOR(F.shiftright(z, 31))


def mix62_sql(
    expr: str, carry: tuple[str, ...] = (), prefix: str = "m"
) -> list[tuple[str, str]]:
    """The same mixer as chained (name, select-expr) steps for a DuckDB CTE
    pipeline — each step reads the previous step's column ``z``. ``expr``
    names the input column of the first step; ``carry`` columns are
    forwarded unchanged through every step (e.g. the CMS row index);
    ``prefix`` disambiguates CTE names when one query mixes twice."""

    def mul(c: int) -> str:
        c1, c0 = c >> 31, c & MASK31
        return (
            f"(((z & {MASK31}) * {c0}) + "
            f"((((z & {MASK31}) * {c1} + (z >> 31) * {c0}) & {MASK31})"
            f" << 31)) & {MASK62}"
        )

    keep = "".join(f"{c}, " for c in carry)
    return [
        (f"{prefix}0", f"{keep}(({expr}) + {MIX_GOLD}) & {MASK62} AS z"),
        (f"{prefix}1", f"{keep}xor(z, z >> 30) AS z"),
        (f"{prefix}2", f"{keep}{mul(MIX_K1)} AS z"),
        (f"{prefix}3", f"{keep}xor(z, z >> 27) AS z"),
        (f"{prefix}4", f"{keep}{mul(MIX_K2)} AS z"),
        (f"{prefix}5", f"{keep}xor(z, z >> 31) AS z"),
    ]


def _bitlen(payload: Column, w: int) -> Column:
    """bitlen(payload) for 0 ≤ payload < 2^w as a comparison sum — no
    float log2 / engine-specific bit_length."""
    acc = F.lit(0).cast("bigint")
    for b in range(w):
        acc = acc + (payload >= F.lit(2**b)).cast("bigint")
    return acc


def hll_registers(
    df: DataFrame, key: Column, m_bits: int = HLL_M_BITS, w: int = HLL_W
) -> DataFrame:
    """HLL register table (bucket, rho) over the distinct values of ``key``
    — every one of the m = 2^m_bits buckets is present (rho = 0 when never
    hit), so register tables merge across shards/epochs with a plain max."""
    m = 1 << m_bits
    top_shift = 62 - m_bits - w  # keep the TOP w bits of z >> m_bits
    hit = (
        df.select(mix62(fingerprint64(key)).alias("z"))
        .select(
            F.col("z").bitwiseAND(F.lit(m - 1)).alias("bucket"),
            F.shiftright(F.col("z"), m_bits + top_shift).alias("payload"),
        )
        .select(
            "bucket",
            (F.lit(w + 1) - _bitlen(F.col("payload"), w))
            .cast("int")
            .alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    spark = df.sparkSession
    all_buckets = spark.range(m).select(
        F.col("id").cast("bigint").alias("bucket")
    )
    return all_buckets.join(hit, "bucket", "left").select(
        "bucket", F.coalesce("rho", F.lit(0)).cast("int").alias("rho")
    )


def hll_estimate(registers: DataFrame, m_bits: int = HLL_M_BITS) -> DataFrame:
    """Raw HLL estimate from a register table, as one int64 row — the two
    floor-divisions documented in the module docstring."""
    m = 1 << m_bits
    s = registers.agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RMAX} - rho)")
        )
        .cast("bigint")
        .alias("s")
    )
    big = m * m * (2**HLL_RMAX)
    return s.select(
        F.expr(
            f"({HLL_ALPHA_NUM} * ({big} div s)) div {HLL_ALPHA_DEN}"
        ).alias("n_est")
    )


def hll_cardinality(
    df: DataFrame, key: Column, m_bits: int = HLL_M_BITS, w: int = HLL_W
) -> DataFrame:
    """Registers + estimate + exact distinct in one frame (the gate shape):
    one row per register, with the constant columns n_est / n_exact /
    rel_err_pct (estimate quality, 2 dp) carried on every row so a single
    hash pins registers AND estimator."""
    regs = hll_registers(df, key, m_bits, w)
    est = hll_estimate(regs, m_bits)
    exact = df.select(key.alias("k")).agg(
        F.count_distinct(F.col("k")).cast("bigint").alias("n_exact")
    )
    return (
        regs.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(exact))
        .select(
            "bucket",
            "rho",
            "n_est",
            "n_exact",
            F.round(
                (F.col("n_est") - F.col("n_exact")).cast("double")
                * 100.0
                / F.col("n_exact").cast("double"),
                2,
            ).alias("rel_err_pct"),
        )
    )


# --------------------------------------------------------------------- CMS

CMS_D = 4  # hash rows
CMS_W_BITS = 11  # 2^11 = 2048 buckets per row

def _cms_salts(d: int) -> list[int]:
    """Per-row additive salts fed to mix62 — row i hashes
    mix62((h + i·GOLD) mod 2^62); avalanche makes the d streams
    effectively independent. Computed in Python (i·GOLD would overflow
    int64 in-engine before the mask)."""
    return [(i * MIX_GOLD) & MASK62 for i in range(d)]


def cms_counts(
    df: DataFrame,
    key: Column,
    d: int = CMS_D,
    w_bits: int = CMS_W_BITS,
) -> DataFrame:
    """Count-min sketch register table (row_id, bucket, cnt) — the
    frequency twin of :func:`hll_registers` (Cormode & Muthukrishnan 2005,
    public algorithm): cnt = how many input rows hashed to this cell.

    All d·2^w_bits cells are present (cnt = 0 when never hit), so sketches
    merge across shards/epochs with plain ADDITION — the update path a
    10^10-URL crawl needs for continuous hot-host accounting where exact
    per-host counts would shuffle every row by host.

    100 TB shape: one explode(d) + map-side-combinable sum keyed
    (row_id, bucket) — shuffle volume ∝ d·2^w_bits regardless of input
    rows. Counts are int64 sums of 1 — no overflow below 2^63 rows.
    """
    w = 1 << w_bits
    salts = _cms_salts(d)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).cast("int").alias("row_id"),
                    F.lit(s).cast("bigint").alias("salt"),
                )
                for i, s in enumerate(salts)
            ]
        )
    ).alias("r")
    hit = (
        df.select(fingerprint64(key).alias("h"))
        .select("h", rows)
        .select(
            F.col("r.row_id").alias("row_id"),
            mix62((F.col("h") + F.col("r.salt")).bitwiseAND(F.lit(MASK62)))
            .bitwiseAND(F.lit(w - 1))
            .alias("bucket"),
        )
        .groupBy("row_id", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    spark = df.sparkSession
    grid = (
        spark.range(d)
        .select(F.col("id").cast("int").alias("row_id"))
        .crossJoin(
            spark.range(w).select(F.col("id").cast("bigint").alias("bucket"))
        )
    )
    return grid.join(hit, ["row_id", "bucket"], "left").select(
        "row_id",
        "bucket",
        F.coalesce("cnt", F.lit(0).cast("bigint")).alias("cnt"),
    )


def cms_lookup(
    keys: DataFrame,
    counts: DataFrame,
    key: Column,
    d: int = CMS_D,
    w_bits: int = CMS_W_BITS,
) -> DataFrame:
    """Point-query the sketch for each distinct key: est = min over the d
    rows of that key's cell count. CMS guarantees est ≥ true count, and
    est ≤ true + N·e/2^w_bits with prob ≥ 1 − e^−d (one-sided error —
    the property the gate asserts). The sketch side is d·2^w_bits rows —
    always broadcastable; the keys side never shuffles."""
    w = 1 << w_bits
    salts = _cms_salts(d)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).cast("int").alias("row_id"),
                    F.lit(s).cast("bigint").alias("salt"),
                )
                for i, s in enumerate(salts)
            ]
        )
    ).alias("r")
    probes = (
        keys.select(key.alias("k"))
        .distinct()
        .select("k", fingerprint64(F.col("k")).alias("h"))
        .select("k", "h", rows)
        .select(
            "k",
            F.col("r.row_id").alias("row_id"),
            mix62((F.col("h") + F.col("r.salt")).bitwiseAND(F.lit(MASK62)))
            .bitwiseAND(F.lit(w - 1))
            .alias("bucket"),
        )
    )
    return (
        probes.join(F.broadcast(counts), ["row_id", "bucket"])
        .groupBy("k")
        .agg(F.min("cnt").alias("n_est"))
    )
