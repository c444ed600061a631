"""Iceberg-semantics snapshot-pointer tables on plain Parquet.

The sandbox has no iceberg-spark-runtime jar, so this module provides the
minimal subset of Iceberg semantics the engine needs — atomic snapshot
commits, time-travel reads, append vs copy-on-write overwrite, MERGE — behind
an interface a real Iceberg catalog can replace 1:1 (``MERGE INTO`` etc.).

Layout per table::

    <root>/<table>/data/<commit-uuid>/part-*.parquet   (immutable)
    <root>/<table>/_snapshots/v{N}.json                (manifest: data dirs)
    <root>/<table>/_snapshots/LATEST                   (atomic pointer)

A crashed job leaves orphan data dirs but never a dangling pointer: the
pointer is flipped with ``os.replace`` (atomic on POSIX) only after the
manifest and data files are fully written. That is the checkpoint/resume
substrate demanded by BASELINE.json north_rule — resume simply reads the
last pointed-to snapshot set and ignores orphans.

Epoch-level atomicity across *multiple* tables (frontier+seen+hosts+feeds
must advance together) is provided by :meth:`Catalog.commit_epoch` /
:meth:`Catalog.last_epoch`, which write a root-level epoch manifest pinning
one snapshot version per table, again pointer-flipped last.

The reference analog of all this is MySQL transactional state
(/root/reference/src/main/db/mysql-create-db.sql; upserts in
dao/impl/MysqlFeedArticleDao.scala:58-74) — re-expressed as table snapshots
because a 10^10-row frontier does not fit a row-store.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class Catalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------ paths

    def _tdir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _snapdir(self, name: str) -> str:
        return os.path.join(self._tdir(name), "_snapshots")

    def _pointer(self, name: str) -> str:
        return os.path.join(self._snapdir(name), "LATEST")

    # --------------------------------------------------------- snapshots

    def current_version(self, name: str) -> int:
        """Latest committed snapshot version; 0 if the table doesn't exist."""
        try:
            with open(self._pointer(name)) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def _manifest(self, name: str, version: int) -> dict:
        with open(os.path.join(self._snapdir(name), f"v{version}.json")) as f:
            return json.load(f)

    def exists(self, name: str) -> bool:
        return self.current_version(name) > 0

    @staticmethod
    def _has_parquet(path: str) -> bool:
        """True iff ``path`` contains at least one parquet data file.

        A ``partitionBy`` write of a 0-row DataFrame emits only ``_SUCCESS``
        (no partition dirs, no files); referencing that dir in a manifest
        would make ``read`` raise UNABLE_TO_INFER_SCHEMA. Callers use this
        to commit an empty ``data_dirs`` list instead — ``read`` then
        reconstructs the empty table from the schema stored in the manifest
        meta. An empty table is a legal state (ref: a fresh ``article``
        table, mysql-create-db.sql:7-14)."""
        for root, _dirs, files in os.walk(path):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def _commit(self, name: str, data_dirs: list[str], meta: dict | None) -> int:
        snapdir = self._snapdir(name)
        os.makedirs(snapdir, exist_ok=True)
        version = self.current_version(name) + 1
        manifest = {"version": version, "data_dirs": data_dirs, "meta": meta or {}}
        mpath = os.path.join(snapdir, f"v{version}.json")
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, mpath)
        ptmp = self._pointer(name) + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(ptmp, "w") as f:
            f.write(str(version))
            f.flush()
            os.fsync(f.fileno())
        os.replace(ptmp, self._pointer(name))  # the atomic commit point
        return version

    # ------------------------------------------------------------- write

    def write(
        self,
        name: str,
        df: DataFrame,
        mode: str = "overwrite",
        meta: dict | None = None,
        partition_by: list[str] | None = None,
        base_version: int | None = None,
    ) -> int:
        """Write ``df`` as a new snapshot. ``mode``:

        - ``overwrite`` — snapshot references only the new files
          (copy-on-write, for mutable state tables like ``frontier``);
        - ``append`` — snapshot references prior files + new files
          (for grow-only tables like ``seen_urls``/``articles``/``metrics``
          — no rewrite of existing data, the scale-critical path).

        ``base_version`` (append mode): chain the new snapshot's file list
        from this explicit version instead of LATEST. Epoch-transactional
        writers MUST pass the epoch-pinned version: if a prior run died
        between an append and its ``commit_epoch``, LATEST points at an
        orphan snapshot already containing the tick's rows — chaining from
        it would double-append them on the re-run. Chaining from the pinned
        base makes the re-run write an equivalent snapshot and leaves the
        orphan unreachable (crash-safe idempotent replay).
        """
        if mode not in ("overwrite", "append"):
            raise ValueError(f"bad mode {mode!r}")
        commit_id = uuid.uuid4().hex
        data_rel = os.path.join("data", commit_id)
        out = os.path.join(self._tdir(name), data_rel)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out)
        # a partitioned write of 0 rows leaves no readable files — commit
        # an empty dir list and rely on the schema stored in meta
        dirs = [data_rel] if (not partition_by or self._has_parquet(out)) else []
        if mode == "append" and self.exists(name):
            base = self.current_version(name) if base_version is None else base_version
            if base > 0:
                dirs = self._manifest(name, base)["data_dirs"] + dirs
        m = dict(meta or {})
        m.setdefault("schema_json", df.schema.json())
        if partition_by:
            # hive-layout snapshot: read() must basePath each dir so the
            # partition columns are restored (and pruned) on scan
            m.setdefault("partition_by", list(partition_by))
        return self._commit(name, dirs, m)

    # -------------------------------------------------------------- read

    def read(
        self,
        name: str,
        version: int | None = None,
        buckets: set[int] | None = None,
    ) -> DataFrame:
        """Read a snapshot. ``buckets`` (bucketed tables only) prunes the
        scan to those bucket dirs — the probe-side partition pruning that
        keeps per-epoch seen-store I/O ∝ touched buckets, mirroring the
        fetch join's corpus pruning (operators/fetchparse.py:88-99)."""
        v = self.current_version(name) if version is None else version
        if v <= 0:
            raise FileNotFoundError(f"table {name!r} has no committed snapshot")
        man = self._manifest(name, v)
        dirs = man["data_dirs"]
        if buckets is not None:
            if not man["meta"].get("num_buckets"):
                raise ValueError(f"table {name!r} is not bucketed")
            dirs = [d for d in dirs if self._bucket_of(d) in buckets]
        if not dirs:
            # empty snapshot (e.g. a fresh bucketed seen store before the
            # first crawl tick): reconstruct the typed empty table from the
            # schema persisted at write time
            schema_json = man["meta"].get("schema_json")
            if schema_json is None:
                raise FileNotFoundError(
                    f"table {name!r} v{v} is empty and its manifest carries "
                    "no schema (written by a pre-schema version?)"
                )
            schema = StructType.fromJson(json.loads(schema_json))
            return self.spark.createDataFrame([], schema)
        paths = [os.path.join(self._tdir(name), d) for d in dirs]
        if man["meta"].get("partition_by"):
            # hive-partitioned snapshots (e.g. articles by host_bucket):
            # each commit dir is its own partitioned root, so discovery
            # needs a per-dir basePath; union keeps per-scan partition
            # pruning (PartitionFilters) intact. Append tables stay
            # bounded by compaction, so the union width is small.
            parts = [
                self.spark.read.option("basePath", p).parquet(p) for p in paths
            ]
            df = parts[0]
            for extra in parts[1:]:
                df = df.unionByName(extra)
            return df
        return self.spark.read.parquet(*paths)

    def read_committed(self, name: str) -> DataFrame:
        """Read ``name`` at the version pinned by the last committed epoch
        (fallback: LATEST when no epoch manifest pins it). Result readers
        use this so a snapshot written by a crashed tick — committed at the
        table level but never epoch-committed — stays invisible."""
        e = self.last_epoch()
        if e >= 0:
            v = self.epoch_tables(e).get(name)
            if v:
                return self.read(name, v)
        return self.read(name)

    def read_or_empty(self, name: str, schema) -> DataFrame:
        if self.exists(name):
            return self.read(name)
        return self.spark.createDataFrame([], schema)

    def meta(self, name: str, version: int | None = None) -> dict:
        v = self.current_version(name) if version is None else version
        return self._manifest(name, v)["meta"]

    # --------------------------------------------------- bucketed tables
    #
    # Hash-bucketed layout for the big mutable state tables (seen_urls at
    # 10^10 rows): each snapshot's manifest references BUCKET-level data
    # dirs (data/<commit>/__bucket=N), so a merge rewrites only the buckets
    # its source rows hash into and re-references every other bucket's
    # existing files. Per-epoch merge I/O is ∝ touched buckets, never
    # O(|table|) — the bulk analog of the reference's UNIQUE-index point
    # update (MysqlFeedArticleDao.scala:58-74). With a real Iceberg catalog
    # this is MERGE INTO over a bucket-partitioned table.

    @staticmethod
    def _bucket_of(rel_dir: str) -> int:
        return int(rel_dir.rsplit("__bucket=", 1)[1])

    def _write_bucket_dirs(self, name: str, df: DataFrame, key: str,
                           num_buckets: int,
                           npartitions: int | None = None) -> list[str]:
        """Write df partitioned by pmod(key, B); return bucket-level rel dirs.

        ``key`` is a SQL expression (a bare column name like ``url_hash``,
        or e.g. ``xxhash64(host)`` for tables bucketed on a derived key).

        ``npartitions`` caps the clustering shuffle's partition count: a
        touched-bucket merge that rewrites T of B dirs needs ~T write
        tasks, not B — hash-clustering T buckets into ≤T partitions still
        groups each bucket, and partitionBy splits the dirs at write time.
        (Measured: a 64-touched merge of a 256-bucket table spent most of
        its wall in the 256-task shuffle+write of near-empty partitions.)"""
        commit_id = uuid.uuid4().hex
        data_rel = os.path.join("data", commit_id)
        out = os.path.join(self._tdir(name), data_rel)
        (
            df.withColumn(
                "__bucket",
                F.pmod(F.expr(key), F.lit(num_buckets)).cast("int"),
            )
            .repartition(min(npartitions or num_buckets, num_buckets), "__bucket")
            .write.mode("overwrite")
            .partitionBy("__bucket")
            .parquet(out)
        )
        return sorted(
            (
                os.path.join(data_rel, d)
                for d in os.listdir(out)
                if d.startswith("__bucket=")
            ),
            key=self._bucket_of,
        )

    def write_bucketed(
        self,
        name: str,
        df: DataFrame,
        key: str = "url_hash",
        num_buckets: int = 64,
        meta: dict | None = None,
    ) -> int:
        """Full (copy-on-write) snapshot of a hash-bucketed table."""
        dirs = self._write_bucket_dirs(name, df, key, num_buckets)
        m = dict(meta or {})
        m.update({"bucketed_key": key, "num_buckets": num_buckets})
        # empty bucketed writes commit zero __bucket= dirs; the schema here
        # lets read() round-trip them (the __bucket partition column is not
        # part of the read-back schema, so the input schema is exact)
        m.setdefault("schema_json", df.schema.json())
        return self._commit(name, dirs, m)

    def append_bucketed(
        self,
        name: str,
        df: DataFrame,
        key: str = "url_hash",
        num_buckets: int = 64,
        base_version: int | None = None,
        meta: dict | None = None,
    ) -> int:
        """Append rows to a bucketed table: new bucket-level dirs for the
        incoming rows are committed ALONGSIDE the prior snapshot's dirs
        (several dirs per bucket accumulate; read concatenates them in one
        multi-path scan, and ``buckets=`` pruning still works dir-by-dir).
        The grow-only-log analog of append-mode :meth:`write` for tables
        that want an explicit bucket layout (e.g. articles partitioned on
        host bucket) without the union-of-partitioned-roots read shape.

        ``base_version``: chain from the epoch-pinned version (crash-safe
        idempotent replay, same contract as append-mode :meth:`write`).
        """
        new_dirs = self._write_bucket_dirs(name, df, key, num_buckets)
        dirs = list(new_dirs)
        if self.exists(name):
            base = self.current_version(name) if base_version is None else base_version
            if base > 0:
                man = self._manifest(name, base)
                if man["meta"].get("num_buckets") not in (None, num_buckets):
                    raise ValueError(
                        f"table {name!r} is bucketed {man['meta']['num_buckets']}, "
                        f"append used {num_buckets}"
                    )
                dirs = man["data_dirs"] + dirs
        m = dict(meta or {})
        m.update({"bucketed_key": key, "num_buckets": num_buckets})
        m.setdefault("schema_json", df.schema.json())
        return self._commit(name, sorted(dirs, key=self._bucket_of), m)

    def compact_buckets(
        self,
        name: str,
        max_dirs_per_bucket: int = 8,
        transform=None,
        base_version: int | None = None,
    ) -> int | None:
        """Compact ONLY the buckets whose snapshot references more than
        ``max_dirs_per_bucket`` dirs (long-appended buckets), concatenating
        their rows — optionally through ``transform`` (e.g.
        latest-row-per-key) — into one dir each. I/O ∝ data in oversized
        buckets, never O(|table|): the scale answer to append_bucketed's
        dir growth, where a full-table rewrite would dominate at 10^10
        rows. ``transform`` MUST be bucket-local: correct only when its
        grouping key determines the bucket key (articles: url_canon →
        host → host_bucket, so latest-per-url_canon qualifies).

        Returns the new version, or None when no bucket is oversized (no
        snapshot is committed in that case).
        """
        from collections import Counter

        base = self.current_version(name) if base_version is None else base_version
        man = self._manifest(name, base)
        key, B = man["meta"]["bucketed_key"], man["meta"]["num_buckets"]
        counts = Counter(self._bucket_of(d) for d in man["data_dirs"])
        fat = {b for b, n in counts.items() if n > max_dirs_per_bucket}
        if not fat:
            return None
        fat_dirs = [d for d in man["data_dirs"] if self._bucket_of(d) in fat]
        keep = [d for d in man["data_dirs"] if self._bucket_of(d) not in fat]
        df = self.spark.read.parquet(
            *[os.path.join(self._tdir(name), d) for d in fat_dirs]
        )
        if transform is not None:
            df = transform(df)
        new_dirs = self._write_bucket_dirs(name, df, key, B)
        return self._commit(
            name, sorted(keep + new_dirs, key=self._bucket_of), dict(man["meta"])
        )

    def merge_bucketed(
        self,
        name: str,
        source: DataFrame,
        on: str | list[str],
        base_version: int | None = None,
        deletes: DataFrame | None = None,
        touched: set[int] | None = None,
    ) -> int:
        """Upsert ``source`` into a bucketed table, rewriting ONLY the
        buckets the source keys hash into (source wins on ``on`` collision).

        ``on`` may be a composite key (list of columns). ``deletes``, if
        given, removes its ``on``-key rows from the table in the same
        commit (it must carry the columns of the table's bucket-key
        expression so its touched buckets can be computed) — this is the
        frontier's per-epoch state transition: processed rows leave, new
        tasks arrive, and only the buckets either set hashes into are
        rewritten. Per-epoch I/O ∝ touched buckets, never O(|table|).

        ``base_version``: chain from the epoch-pinned version (crash-safe
        idempotent replay, same contract as append-mode :meth:`write`).

        ``touched``: precomputed SUPERSET of the source/delete keys' bucket
        ids — callers that already know it (e.g. from a stats aggregate run
        for other reasons) pass it to skip this method's touch-collect job.
        Extra buckets only add target rows the anti-join keeps verbatim.
        """
        on_cols = [on] if isinstance(on, str) else list(on)
        base = self.current_version(name) if base_version is None else base_version
        man = self._manifest(name, base)
        key = man["meta"]["bucketed_key"]
        B = man["meta"]["num_buckets"]

        def bucket_col(df: DataFrame) -> DataFrame:
            return df.select(
                F.pmod(F.expr(key), F.lit(B)).cast("int").alias("__bucket")
            )

        if touched is None:
            touch_src = bucket_col(source)
            if deletes is not None:
                touch_src = touch_src.unionByName(bucket_col(deletes))
            touched = {r["__bucket"] for r in touch_src.distinct().collect()}
        old_dirs = man["data_dirs"]
        touched_old = [d for d in old_dirs if self._bucket_of(d) in touched]
        untouched = [d for d in old_dirs if self._bucket_of(d) not in touched]
        if touched_old:
            target = self.spark.read.parquet(
                *[os.path.join(self._tdir(name), d) for d in touched_old]
            )
            merged = target.join(
                F.broadcast(source.select(*on_cols)), on=on_cols, how="left_anti"
            )
            if deletes is not None:
                merged = merged.join(
                    F.broadcast(deletes.select(*on_cols)), on=on_cols,
                    how="left_anti",
                )
            merged = merged.unionByName(source.select(*target.columns))
        else:
            merged = source
        new_dirs = self._write_bucket_dirs(
            name, merged, key, B, npartitions=max(1, len(touched))
        )
        m = dict(man["meta"])
        m.setdefault("schema_json", merged.schema.json())
        return self._commit(name, sorted(
            untouched + new_dirs, key=self._bucket_of
        ), m)

    # ------------------------------------------------------------- merge

    def merge(
        self,
        name: str,
        source: DataFrame,
        key: str,
        update_cols: list[str] | None = None,
    ) -> int:
        """``MERGE INTO <name> USING source ON key WHEN MATCHED THEN UPDATE
        WHEN NOT MATCHED THEN INSERT`` — upsert semantics of the reference's
        DaoManager.scala:53-59 / MysqlFeedArticleDao.scala:58-74, expressed
        as target-anti-join ∪ source (source wins on key collision).

        Copy-on-write: fine for dimension-sized state (feeds/hosts); the
        grow-only big tables use ``write(mode='append')`` instead. With a
        real Iceberg catalog this becomes a genuine MERGE INTO with
        positional deletes.
        """
        if not self.exists(name):
            return self.write(name, source)
        target = self.read(name)
        if update_cols is None:
            merged = target.join(source.select(key), on=key, how="left_anti").unionByName(
                source.select(*target.columns)
            )
        else:
            src = source.select(
                F.col(key).alias(f"__k"),
                *[F.col(c).alias(f"__u_{c}") for c in update_cols],
            )
            joined = target.join(src, target[key] == F.col("__k"), "left")
            merged = joined.select(
                *[
                    (
                        F.when(F.col("__k").isNotNull(), F.col(f"__u_{c}"))
                        .otherwise(F.col(c))
                        .alias(c)
                        if c in update_cols
                        else F.col(c)
                    )
                    for c in target.columns
                ]
            )
            inserts = source.join(target.select(key), on=key, how="left_anti")
            merged = merged.unionByName(inserts.select(*target.columns))
        # materialize before overwriting the files we read from
        merged = merged.localCheckpoint(eager=True)
        return self.write(name, merged)

    # ------------------------------------------------------ epoch commits

    def _epochdir(self) -> str:
        return os.path.join(self.root, "_epochs")

    def commit_epoch(self, epoch: int, table_versions: dict[str, int],
                     meta: dict | None = None) -> None:
        """Atomically pin one snapshot version per table for ``epoch``."""
        edir = self._epochdir()
        os.makedirs(edir, exist_ok=True)
        path = os.path.join(edir, f"e{epoch}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"epoch": epoch, "tables": table_versions, "meta": meta or {}}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        ptmp = os.path.join(edir, f"LATEST.tmp-{uuid.uuid4().hex[:8]}")
        with open(ptmp, "w") as f:
            f.write(str(epoch))
            f.flush()
            os.fsync(f.fileno())
        os.replace(ptmp, os.path.join(edir, "LATEST"))

    def last_epoch(self) -> int:
        """Last fully-committed epoch, -1 if none."""
        try:
            with open(os.path.join(self._epochdir(), "LATEST")) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return -1

    def epoch_tables(self, epoch: int) -> dict[str, int]:
        with open(os.path.join(self._epochdir(), f"e{epoch}.json")) as f:
            return json.load(f)["tables"]

    def epoch_meta(self, epoch: int) -> dict:
        with open(os.path.join(self._epochdir(), f"e{epoch}.json")) as f:
            return json.load(f).get("meta", {})

    def read_at_epoch(self, name: str, epoch: int) -> DataFrame:
        return self.read(name, self.epoch_tables(epoch)[name])

    # ----------------------------------------------------------- cleanup

    def vacuum(self, name: str, keep_last: int = 2) -> int:
        """Drop data dirs unreachable from the last ``keep_last`` snapshots.
        Returns the number of directories removed."""
        cur = self.current_version(name)
        keep: set[str] = set()
        for v in range(max(1, cur - keep_last + 1), cur + 1):
            for d in self._manifest(name, v)["data_dirs"]:
                # bucketed manifests reference bucket-level dirs
                # (data/<commit>/__bucket=N); keep the whole commit dir
                parts = d.split(os.sep)
                keep.add(os.path.join(*parts[:2]))
        ddir = os.path.join(self._tdir(name), "data")
        removed = 0
        if os.path.isdir(ddir):
            for d in os.listdir(ddir):
                rel = os.path.join("data", d)
                if rel not in keep:
                    shutil.rmtree(os.path.join(ddir, d), ignore_errors=True)
                    removed += 1
        return removed
