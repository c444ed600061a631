"""Partitioned Bloom filter over 64-bit keys — the 10^10-scale seen-set path.

north_star: "a partitioned cuckoo-filter/Bloom URL-seen set maintained as an
Iceberg state table keyed by canonicalized-URL xxhash64". The exact
``seen_urls`` store stays the source of truth (no false positives in
results); the filter is a *prefilter*: candidates whose key fails the
membership test are DEFINITELY new and skip the probe join entirely — at
10^10 keys that's the difference between shuffling every candidate and
shuffling only possible-hits.

Layout: ``num_buckets`` independent filters (bucket = pmod(key, B)); each
bucket's bit array is built distributively (applyInPandas over its own
partition — no driver-side key collection), and only the finished blobs
(m/8 bytes each) come back to the driver for broadcast. Incremental
maintenance is bitwise OR (``merge``), so per-epoch new keys fold into the
state table without a rebuild.

Bit positions: double hashing h_i = (h1 + i*h2) mod m from a splitmix64 mix
of the key — identical numpy code on build and probe sides.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_FILTER_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("filter", BinaryType(), False),
        StructField("n_items", LongType(), False),
    ]
)


def _mix(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """splitmix64 finalizer -> two independent 64-bit hash streams."""
    x = keys.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = x
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h1 = z ^ (z >> np.uint64(31))
        z2 = (x ^ np.uint64(0xC2B2AE3D27D4EB4F)) * np.uint64(0xFF51AFD7ED558CCD)
        z2 = (z2 ^ (z2 >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53)
        h2 = (z2 ^ (z2 >> np.uint64(33))) | np.uint64(1)  # odd => full cycle
    return h1, h2


def _set_bits(bits: np.ndarray, keys: np.ndarray, k: int, m: int) -> None:
    h1, h2 = _mix(keys)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
        # bitwise_or.at: fancy-indexed |= silently drops duplicate indices
        np.bitwise_or.at(
            bits,
            (pos >> np.uint64(3)).astype(np.int64),
            np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8),
        )


def _test_bits(bits: np.ndarray, keys: np.ndarray, k: int, m: int) -> np.ndarray:
    h1, h2 = _mix(keys)
    out = np.ones(len(keys), dtype=bool)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
        byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
        out &= (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1 == 1
    return out


def _params(n: int, fpp: float) -> tuple[int, int]:
    n = max(n, 1)
    m = int(np.ceil(-n * np.log(fpp) / (np.log(2) ** 2)))
    m = max(64, (m + 7) // 8 * 8)
    k = max(1, int(round(m / n * np.log(2))))
    return m, min(k, 16)


@dataclass
class PartitionedBloom:
    num_buckets: int
    m: int                       # bits per bucket
    k: int                       # hash count
    filters: dict[int, bytes]    # bucket -> bit blob (broadcast-sized)

    # ------------------------------------------------------------- build

    @staticmethod
    def build(
        df: DataFrame,
        key: str = "url_hash",
        num_buckets: int = 16,
        expected_per_bucket: int = 100_000,
        fpp: float = 0.01,
        m: int | None = None,
        k: int | None = None,
    ) -> "PartitionedBloom":
        """Distributed build: each bucket's blob is produced by its own
        applyInPandas group; the driver only collects B blobs of m/8 bytes.
        Explicit (m, k) build a delta filter mergeable into a persisted
        state filter with those exact parameters."""
        if m is None or k is None:
            m, k = _params(expected_per_bucket, fpp)

        def build_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
            bits = np.zeros(m // 8, dtype=np.uint8)
            keys = pdf["__key"].to_numpy(dtype=np.int64)
            _set_bits(bits, keys, k, m)
            return pd.DataFrame(
                {
                    "bucket": [int(pdf["__bucket"].iloc[0])],
                    "filter": [bits.tobytes()],
                    "n_items": [len(pdf)],
                }
            )

        blobs = (
            df.select(
                F.col(key).cast("long").alias("__key"),
                F.pmod(F.col(key).cast("long"), F.lit(num_buckets))
                .cast("int")
                .alias("__bucket"),
            )
            .groupBy("__bucket")
            .applyInPandas(build_bucket, _FILTER_SCHEMA)
            .collect()
        )
        filters = {r["bucket"]: bytes(r["filter"]) for r in blobs}
        return PartitionedBloom(num_buckets, m, k, filters)

    @staticmethod
    def empty(num_buckets: int = 16, expected_per_bucket: int = 100_000,
              fpp: float = 0.01) -> "PartitionedBloom":
        m, k = _params(expected_per_bucket, fpp)
        return PartitionedBloom(num_buckets, m, k, {})

    def add_keys(self, keys: np.ndarray) -> "PartitionedBloom":
        """Driver-side fold of a SMALL key batch into a new filter.

        Calls the same ``_set_bits`` as the distributed build, so the
        result is bit-identical to ``build(delta) + merge`` — without the
        delta's shuffle. Meant for per-epoch maintenance where the batch
        is bounded by the worker cap (≤ thousands of keys); use
        :meth:`build` for bulk key sets."""
        if keys.size == 0:
            return self
        filters = dict(self.filters)
        # same nonnegative residue as the build side's F.pmod(key, B)
        buckets = keys.astype(np.int64) % np.int64(self.num_buckets)
        for b in np.unique(buckets):
            blob = filters.get(int(b))
            bits = (
                np.frombuffer(blob, dtype=np.uint8).copy()
                if blob is not None
                else np.zeros(self.m // 8, dtype=np.uint8)
            )
            _set_bits(bits, keys[buckets == b], self.k, self.m)
            filters[int(b)] = bits.tobytes()
        return PartitionedBloom(self.num_buckets, self.m, self.k, filters)

    def merge(self, other: "PartitionedBloom") -> "PartitionedBloom":
        """Bitwise OR — incremental maintenance (epoch deltas fold in)."""
        if (self.m, self.k, self.num_buckets) != (other.m, other.k, other.num_buckets):
            raise ValueError("incompatible bloom parameters")
        filters = dict(self.filters)
        for b, blob in other.filters.items():
            if b in filters:
                a = np.frombuffer(filters[b], dtype=np.uint8)
                filters[b] = (a | np.frombuffer(blob, dtype=np.uint8)).tobytes()
            else:
                filters[b] = blob
        return PartitionedBloom(self.num_buckets, self.m, self.k, filters)

    # ------------------------------------------------------------- probe

    def contains_col(self, df: DataFrame, key: str) -> DataFrame:
        """Append boolean ``__maybe_seen`` via an Arrow-batched membership
        test against the broadcast blobs."""
        spark = df.sparkSession
        bc = spark.sparkContext.broadcast((self.num_buckets, self.m, self.k, self.filters))

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("boolean")
        def member(keys: pd.Series) -> pd.Series:
            nb, m, k, filters = bc.value
            kv = keys.to_numpy(dtype=np.int64)
            buckets = np.mod(kv, nb)  # pmod: numpy % already yields sign of divisor
            out = np.zeros(len(kv), dtype=bool)
            for b in np.unique(buckets):
                blob = filters.get(int(b))
                if blob is None:
                    continue
                mask = buckets == b
                bits = np.frombuffer(blob, dtype=np.uint8)
                out[mask] = _test_bits(bits, kv[mask], k, m)
            return pd.Series(out)

        return df.withColumn("__maybe_seen", member(F.col(key).cast("long")))

    def split(self, df: DataFrame, key: str) -> tuple[DataFrame, DataFrame]:
        """(maybe_seen, definitely_new) — no false negatives by construction."""
        tested = self.contains_col(df, key)
        return (
            tested.filter(F.col("__maybe_seen")).drop("__maybe_seen"),
            tested.filter(~F.col("__maybe_seen")).drop("__maybe_seen"),
        )

    # ------------------------------------------------------ state table io

    def to_df(self, spark) -> DataFrame:
        rows = [(b, bytearray(blob), 0) for b, blob in self.filters.items()]
        return spark.createDataFrame(rows, _FILTER_SCHEMA)

    @staticmethod
    def from_df(df: DataFrame, m: int, k: int, num_buckets: int) -> "PartitionedBloom":
        filters = {r["bucket"]: bytes(r["filter"]) for r in df.collect()}
        return PartitionedBloom(num_buckets, m, k, filters)
