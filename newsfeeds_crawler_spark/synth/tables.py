"""Materialize a SynthCorpus into Spark DataFrames / Iceberg-layout tables.

The corpus table is the ``input_hint`` shape
(image_id, bytes, w, h, fmt, caption, phash) plus the crawl wrapper columns
(url, url_canon, url_hash, host, kind, status, body, feed/item timestamps).
Bucketed by ``pmod(xxhash64(url_canon), B)`` so the fetch join
(frontier ⋈ corpus ON url_hash) is a co-partitioned storage join at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from newsfeeds_crawler_spark.synth.corpus import SynthCorpus

CORPUS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_canon", StringType(), False),
        StructField("host", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("status", IntegerType(), False),
        StructField("body", StringType(), True),
        StructField("feed_pub_ts", TimestampType(), True),
        StructField("pub_ts", TimestampType(), True),
        # input_hint columns
        StructField("image_id", StringType(), True),
        StructField("bytes", BinaryType(), True),
        StructField("w", IntegerType(), True),
        StructField("h", IntegerType(), True),
        StructField("fmt", StringType(), True),
        StructField("caption", StringType(), True),
        StructField("phash", LongType(), True),
    ]
)

HOSTS_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("crawl_delay_ms", LongType(), False),
        StructField("robots_disallow", StringType(), True),  # \n-joined prefixes
    ]
)

# mid-crawl robots refresh schedule (CrawlEngine(robots_updates=) /
# simulate(robots_updates=)): null fields keep the host's prior value,
# '' clears the disallow list
ROBOTS_UPDATES_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("effective_epoch", IntegerType(), False),  # >= 1
        StructField("robots_disallow", StringType(), True),  # \n-joined prefixes
        StructField("crawl_delay_ms", LongType(), True),
    ]
)

PRESEEN_SCHEMA = StructType(
    [
        StructField("url_canon", StringType(), False),
        StructField("article_id", LongType(), True),
        StructField("pub_ts", TimestampType(), True),
        StructField("caption", StringType(), True),
    ]
)


def corpus_df(spark: SparkSession, corpus: SynthCorpus, num_buckets: int = 16) -> DataFrame:
    rows = [
        (
            p.url, p.url_canon, p.host, p.kind, p.status, p.body,
            p.feed_pub_ts, p.pub_ts,
            p.url_canon if p.kind == "article" and p.image is not None else None,
            bytearray(p.image) if p.image is not None else None,
            p.w or None, p.h or None, p.fmt,
            p.caption, p.phash if p.image is not None else None,
        )
        for p in corpus.pages.values()
    ]
    df = spark.createDataFrame(rows, CORPUS_SCHEMA)
    return df.withColumn("url_hash", F.xxhash64("url_canon")).withColumn(
        "url_bucket", F.pmod(F.xxhash64("url_canon"), F.lit(num_buckets)).cast("int")
    )


def hosts_df(spark: SparkSession, corpus: SynthCorpus) -> DataFrame:
    rows = [
        (h, int(info["crawl_delay_ms"]), "\n".join(info["disallow"]))
        for h, info in corpus.hosts.items()
    ]
    return spark.createDataFrame(rows, HOSTS_SCHEMA)


def robots_updates_df(spark: SparkSession, updates: list[dict]) -> DataFrame:
    """Schedule rows for CrawlEngine(robots_updates=): each dict is
    {host, effective_epoch, disallow (list[str] | None), crawl_delay_ms
    (int | None)} — the same shape simulate(robots_updates=) consumes, so
    a test builds ONE list and feeds both sides."""
    rows = [
        (
            u["host"],
            int(u["effective_epoch"]),
            None if u.get("disallow") is None else "\n".join(u["disallow"]),
            None if u.get("crawl_delay_ms") is None else int(u["crawl_delay_ms"]),
        )
        for u in updates
    ]
    return spark.createDataFrame(rows, ROBOTS_UPDATES_SCHEMA)


def preseen_df(spark: SparkSession, corpus: SynthCorpus) -> DataFrame:
    rows = [
        (u, int(r["article_id"]), r["pub_ts"], r["caption"])
        for u, r in corpus.preseen.items()
    ]
    return spark.createDataFrame(rows, PRESEEN_SCHEMA)


def seeds_df(spark: SparkSession, corpus: SynthCorpus) -> DataFrame:
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(corpus.seeds)], ["seed_idx", "url"]
    )


def corpus_df_compressed(
    spark: SparkSession, corpus: SynthCorpus, num_buckets: int = 16
) -> DataFrame:
    """Compressed-body corpus variant (ref DefaultHttpFacade.scala:44-57):
    every 200 body is stored gzip- or deflate-compressed in ``body_gz``
    (+ content_encoding/charset columns) with ``body`` null — exercising
    the engine's vectorized inflate+decode stage. Encoding choice is a
    deterministic function of the canonical URL (crc32, not the
    per-process-salted ``hash``)."""
    import gzip as _gzip
    import zlib as _zlib

    rows = []
    for p in corpus.pages.values():
        if p.body is not None:
            enc = "gzip" if (_zlib.crc32(p.url_canon.encode()) & 1) == 0 else "deflate"
            data = p.body.encode("utf-8")
            blob = _gzip.compress(data, 5) if enc == "gzip" else _zlib.compress(data, 5)
            body, body_gz, charset = None, bytearray(blob), "utf-8"
        else:
            enc, body, body_gz, charset = None, None, None, None
        rows.append((
            p.url, p.url_canon, p.host, p.kind, p.status, body,
            p.feed_pub_ts, p.pub_ts,
            p.url_canon if p.kind == "article" and p.image is not None else None,
            bytearray(p.image) if p.image is not None else None,
            p.w or None, p.h or None, p.fmt,
            p.caption, p.phash if p.image is not None else None,
            body_gz, enc, charset,
        ))
    schema = StructType(
        CORPUS_SCHEMA.fields
        + [
            StructField("body_gz", BinaryType(), True),
            StructField("content_encoding", StringType(), True),
            StructField("charset", StringType(), True),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    return df.withColumn("url_hash", F.xxhash64("url_canon")).withColumn(
        "url_bucket", F.pmod(F.xxhash64("url_canon"), F.lit(num_buckets)).cast("int")
    )
