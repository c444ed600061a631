"""Partitioned cuckoo filter — the deletable alternative to the Bloom
prefilter for the URL-seen set (north_star names both).

Why cuckoo: a crawl's seen-set is not strictly grow-only — recrawl policies
expire entries (P1 re-fetches newer pubDates; TTL-based recrawl drops them
entirely). A Bloom filter cannot delete; a cuckoo filter can, at comparable
space (~1 byte/key at 3% FPP with 8-bit fingerprints, ~2 bytes at 0.2% with
16-bit).

Design (Fan et al., "Cuckoo Filter: Practically Better Than Bloom",
CoNEXT'14 — public paper): buckets of 4 slots, each slot a 16-bit
fingerprint; two candidate buckets per key, i2 = i1 XOR hash(fp); eviction
random-walk bounded at 500 kicks. All vectorized numpy; the same
partitioned layout as operators.bloom.PartitionedBloom — one filter blob
per ``pmod(key, num_buckets)`` partition, built with applyInPandas and
probed with a broadcast pandas UDF.

Scale note: at 10^10 keys the blobs live in the catalog as a state table
(one row per partition), built once and mutated incrementally per epoch
(add admitted, delete expired) — the per-epoch delta is |admitted|, never
|seen|.
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

_SLOTS = 4
_MAX_KICKS = 500
_FP_BITS = 16

_BLOB_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("table", BinaryType(), False),
        StructField("n_buckets", LongType(), False),
        StructField("n_items", LongType(), False),
    ]
)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — deterministic, vectorized."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _fingerprint(keys: np.ndarray) -> np.ndarray:
    """16-bit fingerprints, never 0 (0 marks an empty slot)."""
    fp = (_mix64(keys) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1
    return fp


def _index1(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    return (_mix64(keys ^ np.uint64(0x9E3779B97F4A7C15)) % np.uint64(n_buckets)).astype(
        np.int64
    )


def _alt_index(i: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    # i2 = (i XOR mix(fp)) mod n_buckets — involutive when n_buckets is a
    # power of two, which the constructor enforces
    return (i.astype(np.uint64) ^ _mix64(fp.astype(np.uint64))) % np.uint64(n_buckets)


_STASH_MAGIC = 0x0C0C0C0C


@dataclass
class CuckooTable:
    """One partition's cuckoo table: (n_buckets, SLOTS) uint16, plus a
    lossless overflow STASH: when an insert still has a homeless
    fingerprint after MAX_KICKS, the evicted (index, fp) pair is stashed
    instead of silently dropped — silent drops would be false negatives,
    violating split()'s no-false-negatives contract (a seen URL would
    bypass the exact probe join and be re-fetched, diverging crawl order).
    The stash is checked linearly on probe; it stays tiny because capacity
    is sized for ~84% load."""

    table: np.ndarray  # shape (n_buckets, _SLOTS), dtype uint16
    n_items: int = 0
    stash: list | None = None  # list[(bucket_index, fp)]

    def __post_init__(self):
        if self.stash is None:
            self.stash = []

    @classmethod
    def with_capacity(cls, expected: int, load: float = 0.84) -> "CuckooTable":
        need = max(int(expected / load / _SLOTS), 1)
        n_buckets = 1 << max(int(np.ceil(np.log2(need))), 0)
        return cls(np.zeros((n_buckets, _SLOTS), dtype=np.uint16))

    # ------------------------------------------------------------ mutate

    def add_many(self, keys: np.ndarray) -> int:
        """Insert int64/uint64 keys; ALWAYS inserts every key (overflow
        lands in the stash — never a silent drop). Returns len(keys)."""
        rng = np.random.default_rng(self.table.shape[0])  # deterministic
        keys = keys.astype(np.uint64, copy=False)
        fps = _fingerprint(keys)
        i1s = _index1(keys, self.table.shape[0])
        for fp, i1 in zip(fps, i1s):
            self._insert_one(int(fp), int(i1), rng)
        self.n_items += len(keys)
        return len(keys)

    def _insert_one(self, fp: int, i1: int, rng) -> bool:
        nb = self.table.shape[0]
        i2 = int(_alt_index(np.array([i1]), np.array([fp], np.uint16), nb)[0])
        for i in (i1, i2):
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                return True
        i = i1 if rng.integers(2) else i2
        for _ in range(_MAX_KICKS):
            slot = int(rng.integers(_SLOTS))
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = int(_alt_index(np.array([i]), np.array([fp], np.uint16), nb)[0])
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                return True
        # table full: stash the homeless fingerprint (note: after kicking,
        # fp belongs to some PREVIOUSLY inserted key, and i is one of that
        # key's two candidate buckets — stashing (i, fp) keeps its
        # membership test positive)
        self.stash.append((int(i), int(fp)))
        return True

    def delete_many(self, keys: np.ndarray) -> int:
        """Remove one matching fingerprint per key; returns removals."""
        return int(self.delete_mask(keys).sum())

    def delete_mask(self, keys: np.ndarray) -> np.ndarray:
        """Remove one matching fingerprint per key; returns the boolean
        mask of keys actually removed (so a chained filter can forward
        the misses to the next table)."""
        keys = keys.astype(np.uint64, copy=False)
        fps = _fingerprint(keys)
        i1s = _index1(keys, self.table.shape[0])
        nb = self.table.shape[0]
        removed = np.zeros(len(keys), dtype=bool)
        for j, (fp, i1) in enumerate(zip(fps, i1s)):
            i2 = int(_alt_index(np.array([i1]), np.array([fp], np.uint16), nb)[0])
            hit = False
            for i in (int(i1), i2):
                hits = np.flatnonzero(self.table[i] == fp)
                if hits.size:
                    self.table[i, hits[0]] = 0
                    hit = True
                    break
            if not hit:
                for si, (bi, bfp) in enumerate(self.stash):
                    if bfp == int(fp) and bi in (int(i1), i2):
                        del self.stash[si]
                        hit = True
                        break
            removed[j] = hit
        n = int(removed.sum())
        self.n_items -= n
        return removed

    # ------------------------------------------------------------- probe

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership: no false negatives."""
        keys = keys.astype(np.uint64, copy=False)
        fps = _fingerprint(keys)
        i1 = _index1(keys, self.table.shape[0]).astype(np.int64)
        i2 = _alt_index(i1, fps, self.table.shape[0]).astype(np.int64)
        in1 = (self.table[i1] == fps[:, None]).any(axis=1)
        in2 = (self.table[i2] == fps[:, None]).any(axis=1)
        out = in1 | in2
        for bi, bfp in self.stash:
            out |= (fps == np.uint16(bfp)) & ((i1 == bi) | (i2 == bi))
        return out

    def to_bytes(self) -> bytes:
        """table bytes + stash trailer: [(i<<16|fp) u64 ...][n u32][magic u32]."""
        parts = [self.table.tobytes()]
        if self.stash:
            packed = np.array(
                [(i << 16) | fp for i, fp in self.stash], dtype=np.uint64
            )
            parts.append(packed.tobytes())
        parts.append(
            np.array([len(self.stash), _STASH_MAGIC], dtype=np.uint32).tobytes()
        )
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes, n_items: int = 0) -> "CuckooTable":
        stash: list = []
        table_blob = blob
        if len(blob) >= 8:
            trailer = np.frombuffer(blob[-8:], dtype=np.uint32)
            if trailer[1] == _STASH_MAGIC:
                n_stash = int(trailer[0])
                body = len(blob) - 8 - n_stash * 8
                # VALIDATED parse: the trailer is only trusted when the
                # stash fits and the remaining bytes form a whole
                # power-of-two bucket table — otherwise the last 8 bytes
                # are table data that happened to decode as [n, MAGIC]
                # (a raw pre-trailer blob) and we parse the blob as such.
                nb = body // (_SLOTS * 2)
                if (
                    body >= _SLOTS * 2
                    and body % (_SLOTS * 2) == 0
                    and (nb & (nb - 1)) == 0
                ):
                    packed = np.frombuffer(
                        blob[body : body + n_stash * 8], dtype=np.uint64
                    )
                    stash = [
                        (int(v >> np.uint64(16)), int(v & np.uint64(0xFFFF)))
                        for v in packed
                    ]
                    table_blob = blob[:body]
        arr = np.frombuffer(table_blob, dtype=np.uint16)
        return cls(arr.reshape(-1, _SLOTS).copy(), n_items, stash)


# ------------------------- chain (growable partition) serialization ------
#
# Partial-key cuckoo tables cannot rehash into a bigger table (only
# fingerprints are stored, the bucket index of a key in a differently-sized
# table is underivable). A partition therefore GROWS BY CHAINING: when its
# active table saturates, new keys go into a fresh table of larger capacity
# and membership is the OR across the chain. The chain serializes with a
# versioned leading header (magic + count + per-table sizes) — no trailing
# magic heuristics; pre-header blobs from older runs still parse via
# CuckooTable.from_bytes' validated legacy path.

_CHAIN_MAGIC = b"CKF1"
_STASH_GROW = 8     # chain a new table once the active stash passes this
_GROW_LOAD = 0.84   # ...or the active table's load factor passes this


def _pack_chain(chain: list[CuckooTable]) -> bytes:
    parts = [_CHAIN_MAGIC, np.array([len(chain)], dtype=np.uint32).tobytes()]
    for t in chain:
        parts.append(
            np.array([t.table.shape[0], len(t.stash)], dtype=np.uint64).tobytes()
        )
        parts.append(t.table.tobytes())
        if t.stash:
            parts.append(
                np.array(
                    [(i << 16) | fp for i, fp in t.stash], dtype=np.uint64
                ).tobytes()
            )
    return b"".join(parts)


def _unpack_chain(blob: bytes, n_items: int = 0) -> list[CuckooTable]:
    if blob[:4] != _CHAIN_MAGIC:
        return [CuckooTable.from_bytes(blob, n_items)]  # pre-header blob
    n_tables = int(np.frombuffer(blob[4:8], dtype=np.uint32)[0])
    off = 8
    chain: list[CuckooTable] = []
    for _ in range(n_tables):
        nb, ns = (
            int(x) for x in np.frombuffer(blob[off : off + 16], dtype=np.uint64)
        )
        off += 16
        tbytes = nb * _SLOTS * 2
        arr = (
            np.frombuffer(blob[off : off + tbytes], dtype=np.uint16)
            .reshape(nb, _SLOTS)
            .copy()
        )
        off += tbytes
        packed = np.frombuffer(blob[off : off + ns * 8], dtype=np.uint64)
        off += ns * 8
        stash = [
            (int(v >> np.uint64(16)), int(v & np.uint64(0xFFFF))) for v in packed
        ]
        chain.append(CuckooTable(arr, 0, stash))
    if chain:
        chain[0].n_items = n_items  # partition-level count
    return chain


def _chain_contains(chain: list[CuckooTable], keys: np.ndarray) -> np.ndarray:
    out = np.zeros(len(keys), dtype=bool)
    for t in chain:
        out |= t.contains_many(keys)
    return out


class PartitionedCuckoo:
    """Same partitioned API as operators.bloom.PartitionedBloom: one
    chain of CuckooTables per ``pmod(key, num_partitions)`` shard."""

    def __init__(self, chains: dict[int, list[CuckooTable]], num_partitions: int):
        self.chains = chains
        self.num_partitions = num_partitions

    # ------------------------------------------------------------- build

    @classmethod
    def build(
        cls,
        keys_df: DataFrame,
        key: str = "url_hash",
        num_partitions: int = 16,
        expected_per_partition: int = 100_000,
    ) -> "PartitionedCuckoo":
        np_ = num_partitions

        def build_part(pdf: pd.DataFrame) -> pd.DataFrame:
            part = int(pdf["__part"].iloc[0])
            t = CuckooTable.with_capacity(
                max(expected_per_partition, len(pdf))
            )
            t.add_many(pdf["__k"].to_numpy(np.int64))
            return pd.DataFrame(
                {
                    "bucket": [part],
                    "table": [_pack_chain([t])],
                    "n_buckets": [t.table.shape[0]],
                    "n_items": [t.n_items],
                }
            )

        rows = (
            keys_df.select(
                F.col(key).alias("__k"),
                F.pmod(F.col(key), F.lit(np_)).cast("int").alias("__part"),
            )
            .groupBy("__part")
            .applyInPandas(build_part, _BLOB_SCHEMA)
            .collect()
        )
        chains = {
            r["bucket"]: _unpack_chain(bytes(r["table"]), r["n_items"])
            for r in rows
        }
        return cls(chains, np_)

    # ------------------------------------------------- incremental deltas

    def add_keys(self, keys: np.ndarray) -> None:
        keys = np.asarray(keys, dtype=np.int64)
        parts = np.mod(keys, self.num_partitions)
        for p in np.unique(parts):
            part_keys = keys[parts == p]
            chain = self.chains.setdefault(
                int(p),
                [CuckooTable.with_capacity(max(1024, 2 * len(part_keys)))],
            )
            t = chain[-1]
            cap = t.table.shape[0] * _SLOTS
            # grow by chaining (see _pack_chain comment): past ~84% load or
            # a non-tiny stash, inserts into this table would degrade into
            # stash appends (probe = linear scan) — open a bigger table
            # instead so the stash invariant holds over long runs
            if (
                t.n_items + len(part_keys) > _GROW_LOAD * cap
                or len(t.stash) > _STASH_GROW
            ):
                t = CuckooTable.with_capacity(max(2 * cap, 2 * len(part_keys)))
                chain.append(t)
            t.add_many(part_keys)

    def delete_keys(self, keys: np.ndarray) -> int:
        keys = np.asarray(keys, dtype=np.int64)
        parts = np.mod(keys, self.num_partitions)
        removed = 0
        for p in np.unique(parts):
            chain = self.chains.get(int(p))
            if not chain:
                continue
            rem = keys[parts == p]
            for t in chain:
                if rem.size == 0:
                    break
                mask = t.delete_mask(rem)
                removed += int(mask.sum())
                rem = rem[~mask]
        return removed

    # ------------------------------------------------------------- probe

    # ------------------------------------------------------ state table io

    def to_df(self, spark) -> DataFrame:
        """Blob rows for the catalog's filter state table (one row per
        partition; the chain + stashes ride inside the versioned blob)."""
        rows = [
            (
                p,
                bytearray(_pack_chain(chain)),
                chain[0].table.shape[0],
                sum(t.n_items for t in chain),
            )
            for p, chain in self.chains.items()
        ]
        return spark.createDataFrame(rows, _BLOB_SCHEMA)

    @staticmethod
    def from_df(df: DataFrame, num_partitions: int) -> "PartitionedCuckoo":
        chains = {
            r["bucket"]: _unpack_chain(bytes(r["table"]), r["n_items"])
            for r in df.collect()
        }
        return PartitionedCuckoo(chains, num_partitions)

    def contains_col(self, df: DataFrame, key: str) -> DataFrame:
        blobs = {p: _pack_chain(chain) for p, chain in self.chains.items()}
        np_ = self.num_partitions
        bc = df.sparkSession.sparkContext.broadcast(blobs)

        @F.pandas_udf("boolean")
        def member(keys: pd.Series) -> pd.Series:
            local = {p: _unpack_chain(blob) for p, blob in bc.value.items()}
            k = keys.to_numpy(np.int64)
            parts = np.mod(k, np_)
            out = np.zeros(len(k), dtype=bool)
            for p in np.unique(parts):
                chain = local.get(int(p))
                if chain is not None:
                    mask = parts == p
                    out[mask] = _chain_contains(chain, k[mask])
            return pd.Series(out)

        return df.withColumn("__maybe_seen", member(F.col(key)))

    def split(self, df: DataFrame, key: str) -> tuple[DataFrame, DataFrame]:
        """(maybe-seen, definitely-new) — no false negatives."""
        probed = self.contains_col(df, key)
        return (
            probed.filter(F.col("__maybe_seen")).drop("__maybe_seen"),
            probed.filter(~F.col("__maybe_seen")).drop("__maybe_seen"),
        )
