from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from newsfeeds_crawler_spark.tablestore import Catalog


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "warehouse"))


def _df(spark, rows, cols=("k", "v")):
    return spark.createDataFrame(rows, list(cols))


def test_write_read_roundtrip(spark, cat):
    v = cat.write("t", _df(spark, [(1, "a"), (2, "b")]))
    assert v == 1
    got = {(r["k"], r["v"]) for r in cat.read("t").collect()}
    assert got == {(1, "a"), (2, "b")}


def test_overwrite_creates_new_snapshot_and_time_travel(spark, cat):
    cat.write("t", _df(spark, [(1, "a")]))
    cat.write("t", _df(spark, [(9, "z")]))
    assert cat.current_version("t") == 2
    assert [r["k"] for r in cat.read("t").collect()] == [9]
    assert [r["k"] for r in cat.read("t", version=1).collect()] == [1]


def test_append_mode_accumulates_without_rewrite(spark, cat):
    cat.write("log", _df(spark, [(1, "a")]), mode="append")
    cat.write("log", _df(spark, [(2, "b")]), mode="append")
    assert cat.read("log").count() == 2
    # snapshot 2 references snapshot 1's files (no rewrite)
    m1 = cat._manifest("log", 1)["data_dirs"]
    m2 = cat._manifest("log", 2)["data_dirs"]
    assert set(m1) < set(m2)


def test_merge_upsert_semantics(spark, cat):
    # reference: MysqlFeedArticleDao insert/update dispatch (DaoManager.scala:53-59)
    cat.write("t", _df(spark, [(1, "old"), (2, "keep")]))
    cat.merge("t", _df(spark, [(1, "new"), (3, "ins")]), key="k")
    got = dict((r["k"], r["v"]) for r in cat.read("t").collect())
    assert got == {1: "new", 2: "keep", 3: "ins"}


def test_merge_update_subset_of_columns(spark, cat):
    cat.write("f", _df(spark, [(1, "u1", "h1"), (2, "u2", "h2")], ("k", "v", "w")))
    cat.merge("f", _df(spark, [(1, "V1"), (5, "V5")], ("k", "v")).withColumn(
        "w", F.lit("H")
    ), key="k", update_cols=["v"])
    got = {(r["k"], r["v"], r["w"]) for r in cat.read("f").collect()}
    assert got == {(1, "V1", "h1"), (2, "u2", "h2"), (5, "V5", "H")}


def test_crash_leaves_no_dangling_pointer(spark, cat, tmp_path):
    cat.write("t", _df(spark, [(1, "a")]))
    # simulate a crash: data files written but pointer never flipped
    orphan = os.path.join(cat._tdir("t"), "data", "orphan")
    _df(spark, [(99, "crash")]).write.parquet(orphan)
    assert cat.current_version("t") == 1
    assert [r["k"] for r in cat.read("t").collect()] == [1]


def test_epoch_commit_and_resume_point(spark, cat):
    v_f = cat.write("frontier", _df(spark, [(1, "pending")]))
    v_s = cat.write("seen", _df(spark, [(10, "u")]))
    cat.commit_epoch(0, {"frontier": v_f, "seen": v_s})
    # epoch 1 advances frontier but "crashes" before commit_epoch
    cat.write("frontier", _df(spark, [(1, "done")]))
    assert cat.last_epoch() == 0
    got = [r["v"] for r in cat.read_at_epoch("frontier", 0).collect()]
    assert got == ["pending"]  # resume sees the epoch-0 state, not the orphan


def test_vacuum_keeps_reachable(spark, cat):
    cat.write("t", _df(spark, [(1, "a")]))
    cat.write("t", _df(spark, [(2, "b")]))
    cat.write("t", _df(spark, [(3, "c")]))
    removed = cat.vacuum("t", keep_last=2)
    assert removed == 1
    assert [r["k"] for r in cat.read("t").collect()] == [3]
    assert [r["k"] for r in cat.read("t", version=2).collect()] == [2]


def test_bucketed_merge_rewrites_only_touched_buckets(spark, tmp_path):
    """Catalog.merge_bucketed: upsert semantics + per-epoch I/O ∝ touched
    buckets (untouched bucket dirs re-referenced, not rewritten)."""
    from pyspark.sql import functions as F

    cat = Catalog(spark, str(tmp_path / "cat"))
    base = spark.range(0, 1000).select(
        F.concat(F.lit("u"), F.col("id")).alias("url_canon"),
        F.col("id").alias("url_hash"),
        F.lit(None).cast("long").alias("article_id"),
        F.lit(None).cast("timestamp").alias("pub_ts"),
    )
    v1 = cat.write_bucketed("seen", base, key="url_hash", num_buckets=16)
    d1 = set(cat._manifest("seen", v1)["data_dirs"])
    assert len(d1) == 16

    # upsert rows landing in exactly 2 buckets (hash 3 and 7)
    ups = spark.createDataFrame(
        [("u3", 3, 99, None), ("u7", 7, 98, None), ("uNEW", 16 + 7, 97, None)],
        "url_canon string, url_hash long, article_id long, pub_ts timestamp",
    )
    v2 = cat.merge_bucketed("seen", ups, on="url_canon")
    d2 = set(cat._manifest("seen", v2)["data_dirs"])
    # only buckets 3 and 7 rewritten: 14 dirs carried over verbatim
    assert len(d1 & d2) == 14
    assert len(d2) == 16

    got = cat.read("seen")
    assert got.count() == 1001  # 1000 base + 1 new key
    ids = {
        r["url_canon"]: r["article_id"]
        for r in got.filter(F.col("article_id").isNotNull()).collect()
    }
    assert ids == {"u3": 99, "u7": 98, "uNEW": 97}


def test_bucketed_merge_replay_is_idempotent(spark, tmp_path):
    """Re-running a merge from the same base version (crash replay) must
    leave the same logical table."""
    from pyspark.sql import functions as F

    cat = Catalog(spark, str(tmp_path / "cat2"))
    base = spark.range(0, 100).select(
        F.concat(F.lit("u"), F.col("id")).alias("url_canon"),
        F.col("id").alias("url_hash"),
        F.lit(None).cast("long").alias("article_id"),
        F.lit(None).cast("timestamp").alias("pub_ts"),
    )
    v1 = cat.write_bucketed("seen", base, key="url_hash", num_buckets=4)
    ups = spark.createDataFrame(
        [("u5", 5, 42, None)],
        "url_canon string, url_hash long, article_id long, pub_ts timestamp",
    )
    cat.merge_bucketed("seen", ups, on="url_canon", base_version=v1)  # orphan
    v3 = cat.merge_bucketed("seen", ups, on="url_canon", base_version=v1)
    got = cat.read("seen", v3)
    assert got.count() == 100
    assert got.filter("url_canon = 'u5'").first()["article_id"] == 42


def test_empty_bucketed_table_roundtrips(spark, tmp_path):
    """An empty bucketed snapshot must be readable and mergeable — it is the
    tick-0 state of every crawl with a fresh preseen store (ref analog: an
    empty `article` table is a valid MySQL state, mysql-create-db.sql:7-14).
    Regression test for the round-2 UNABLE_TO_INFER_SCHEMA crash."""
    from pyspark.sql import functions as F

    cat = Catalog(spark, str(tmp_path / "cat3"))
    schema = "url_canon string, url_hash long, article_id long, pub_ts timestamp"
    empty = spark.createDataFrame([], schema)
    v1 = cat.write_bucketed("seen", empty, key="url_hash", num_buckets=16)
    assert cat._manifest("seen", v1)["data_dirs"] == []

    got = cat.read("seen")
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == [
        "url_canon", "url_hash", "article_id", "pub_ts",
    ]

    # merge into the empty table, then read back
    ups = spark.createDataFrame([("u5", 5, 42, None)], schema)
    v2 = cat.merge_bucketed("seen", ups, on="url_canon")
    got2 = cat.read("seen", v2)
    assert got2.count() == 1
    assert got2.first()["article_id"] == 42

    # merging an EMPTY source into the (still mostly empty) table also works
    v3 = cat.merge_bucketed("seen", spark.createDataFrame([], schema), on="url_canon")
    assert cat.read("seen", v3).count() == 1


def test_empty_partitioned_write_roundtrips(spark, tmp_path):
    """write(partition_by=...) of a 0-row frame commits an empty snapshot
    that read() reconstructs from the stored schema."""
    cat = Catalog(spark, str(tmp_path / "cat4"))
    empty = spark.createDataFrame([], "k int, part string")
    v = cat.write("t", empty, partition_by=["part"])
    assert cat._manifest("t", v)["data_dirs"] == []
    got = cat.read("t")
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["k", "part"]


def test_bucketed_merge_composite_key_deletes_and_expr_bucket(spark, tmp_path):
    """merge_bucketed with a composite ON key, a deletes frame, and a
    derived bucket-key expression (xxhash64(host)) — the frontier's
    per-epoch state transition shape."""
    from pyspark.sql import functions as F

    cat = Catalog(spark, str(tmp_path / "cat5"))
    schema = "url_canon string, e_epoch int, host string, state string"
    base = spark.createDataFrame(
        [(f"u{i}", 0, f"h{i % 5}", "pending") for i in range(100)], schema
    )
    v1 = cat.write_bucketed(
        "frontier", base, key="xxhash64(host)", num_buckets=8
    )
    d1 = set(cat._manifest("frontier", v1)["data_dirs"])

    processed = spark.createDataFrame(
        [("u0", 0, "h0", "x"), ("u5", 0, "h0", "x")], schema
    ).select("url_canon", "e_epoch", "host")
    new_tasks = spark.createDataFrame(
        [("uNEW", 1, "h0", "pending")], schema
    )
    v2 = cat.merge_bucketed(
        "frontier", new_tasks, on=["url_canon", "e_epoch"], deletes=processed
    )
    got = {r["url_canon"] for r in cat.read("frontier", v2).collect()}
    assert "u0" not in got and "u5" not in got and "uNEW" in got
    assert len(got) == 99  # 100 - 2 deleted + 1 new
    # only h0's bucket was rewritten: the other dirs carried over
    d2 = set(cat._manifest("frontier", v2)["data_dirs"])
    assert len(d1 & d2) >= 1


def test_append_bucketed_accumulates_dirs_and_prunes(spark, tmp_path):
    """append_bucketed adds bucket dirs NEXT TO the prior snapshot's (no
    rewrite, no union-of-roots read), keeps the bucket-key column in the
    data, and buckets= pruning reads only the asked-for dirs across all
    appended commits."""
    cat = Catalog(spark, str(tmp_path / "w"))
    df1 = _df(spark, [(0, "a"), (1, "b"), (5, "c")], ("hb", "v"))
    v1 = cat.write_bucketed("t", df1, key="hb", num_buckets=4)
    df2 = _df(spark, [(0, "d"), (2, "e")], ("hb", "v"))
    v2 = cat.append_bucketed("t", df2, key="hb", num_buckets=4, base_version=v1)

    # snapshot 2 references snapshot 1's dirs verbatim plus the new ones
    d1 = set(cat._manifest("t", v1)["data_dirs"])
    d2 = set(cat._manifest("t", v2)["data_dirs"])
    assert d1 < d2 and all("__bucket=" in d for d in d2)

    got = {(r["hb"], r["v"]) for r in cat.read("t").collect()}
    assert got == {(0, "a"), (1, "b"), (5, "c"), (0, "d"), (2, "e")}

    # bucket pruning spans both commits: hb pmod 4 — bucket 0 holds 0,0; 1
    # holds 1 and 5
    p0 = cat.read("t", buckets={0})
    assert {(r["hb"], r["v"]) for r in p0.collect()} == {(0, "a"), (0, "d")}
    assert all("__bucket=0/" in f for f in p0.inputFiles())
    p1 = cat.read("t", buckets={1})
    assert {r["v"] for r in p1.collect()} == {"b", "c"}


def test_append_bucketed_replay_from_pinned_base_is_idempotent(spark, tmp_path):
    """Re-running a torn tick's append from the epoch-pinned base must not
    double the rows (same contract as append-mode write)."""
    cat = Catalog(spark, str(tmp_path / "w"))
    v1 = cat.write_bucketed("t", _df(spark, [(0, "a")], ("hb", "v")),
                            key="hb", num_buckets=2)
    rows = _df(spark, [(1, "x")], ("hb", "v"))
    cat.append_bucketed("t", rows, key="hb", num_buckets=2, base_version=v1)
    # crash before commit_epoch; replay appends the same rows from v1 again
    v3 = cat.append_bucketed("t", rows, key="hb", num_buckets=2, base_version=v1)
    assert cat.read("t", v3).count() == 2  # not 3
    # empty append is a no-op data-wise but still commits a snapshot
    v4 = cat.append_bucketed(
        "t", rows.limit(0), key="hb", num_buckets=2, base_version=v3
    )
    assert cat.read("t", v4).count() == 2
    # bucket-count mismatch is rejected
    with pytest.raises(ValueError):
        cat.append_bucketed("t", rows, key="hb", num_buckets=8, base_version=v4)


def test_compact_buckets_rewrites_only_fat_buckets(spark, tmp_path):
    """compact_buckets folds ONLY buckets with more than max_dirs appends:
    the fat bucket collapses to one dir (through the transform), thin
    buckets keep their dirs verbatim, rows and pruning survive."""
    cat = Catalog(spark, str(tmp_path / "w"))
    # bucket key is the column itself (B=4): bucket 1 gets 4 appends,
    # bucket 2 gets one
    v = cat.write_bucketed("t", _df(spark, [(1, "a0"), (2, "z")], ("hb", "v")),
                           key="hb", num_buckets=4)
    for i in range(1, 4):
        v = cat.append_bucketed("t", _df(spark, [(1, f"a{i}")], ("hb", "v")),
                                key="hb", num_buckets=4, base_version=v)
    dirs = cat._manifest("t", v)["data_dirs"]
    assert sum(1 for d in dirs if cat._bucket_of(d) == 1) == 4

    assert cat.compact_buckets("t", max_dirs_per_bucket=4, base_version=v) is None

    v2 = cat.compact_buckets("t", max_dirs_per_bucket=3, base_version=v)
    d2 = cat._manifest("t", v2)["data_dirs"]
    assert sum(1 for d in d2 if cat._bucket_of(d) == 1) == 1
    thin = [d for d in dirs if cat._bucket_of(d) == 2]
    assert [d for d in d2 if cat._bucket_of(d) == 2] == thin  # untouched
    got = {(r["hb"], r["v"]) for r in cat.read("t", v2).collect()}
    assert got == {(1, "a0"), (1, "a1"), (1, "a2"), (1, "a3"), (2, "z")}

    # with a (bucket-local) transform: keep max v per hb
    from pyspark.sql import Window

    def latest(df):
        w = Window.partitionBy("hb").orderBy(F.col("v").desc())
        return (df.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") == 1).drop("__rn"))

    v3 = cat.append_bucketed("t", _df(spark, [(1, "a4")], ("hb", "v")),
                             key="hb", num_buckets=4, base_version=v2)
    v4 = cat.compact_buckets("t", max_dirs_per_bucket=1, transform=latest,
                             base_version=v3)
    got = {(r["hb"], r["v"]) for r in cat.read("t", v4).collect()}
    assert got == {(1, "a4"), (2, "z")}
    p = cat.read("t", v4, buckets={1})
    assert {r["v"] for r in p.collect()} == {"a4"}
