"""Sitemap discovery operators: vectorized parse UDTF + bounded index
expansion.

``sitemap_entries`` is the Arrow-batched wrapper over the pure-Python
kernel (functions/sitemap.py) — one ``pandas_udf`` struct column per
document, then ``posexplode(arrays_zip(...))`` to entry rows, the same
1-row-in/N-rows-out columnar UDTF shape as the feed parse
(operators/fetchparse.py, RomeFeedParser.scala:20-34 analog).

``expand_sitemaps`` follows ``<sitemapindex>`` chains: a driver loop of at
most ``max_depth`` rounds (the sitemaps.org protocol caps real nesting at
one index level; Googlebot follows a bounded few), each round one bulk
fetch-join against the corpus + one parse + one seen anti-join — the same
per-round shape as linkgraph.bfs_depth, never a per-URL driver call.

100 TB shape: parse is map-only Arrow batches ∝ |sitemap docs| (a tiny
fraction of the corpus); expansion rounds are bounded by ``max_depth``
with each round's frontier ∝ newly discovered sitemap files; the output
URL set flows into the frontier through the same canonicalize → seen
anti-join path as feed items. Nothing driver-side except the loop
counter and an empty-round check on a count that is itself bounded by
the discovered-sitemap cardinality.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from newsfeeds_crawler_spark.functions.sitemap import parse_sitemap_py

SITEMAP_RESULT = StructType(
    [
        StructField("kind", StringType()),
        StructField("parse_ok", BooleanType()),
        StructField("locs", ArrayType(StringType())),
        StructField("lastmods", ArrayType(TimestampType())),
    ]
)


@pandas_udf(SITEMAP_RESULT)
def parse_sitemap_udf(body: pd.Series) -> pd.DataFrame:
    """Vectorized sitemap parse: one Arrow batch in, one struct column out."""
    out = {"kind": [], "parse_ok": [], "locs": [], "lastmods": []}
    for b in body:
        parsed = parse_sitemap_py(b if isinstance(b, str) else None)
        if parsed is None:
            out["kind"].append(None)
            out["parse_ok"].append(False)
            out["locs"].append(None)
            out["lastmods"].append(None)
        else:
            kind, entries = parsed
            out["kind"].append(kind)
            out["parse_ok"].append(True)
            out["locs"].append([l for l, _ in entries])
            out["lastmods"].append([t for _, t in entries])
    return pd.DataFrame(out)


def sitemap_entries(
    docs: DataFrame,
    body_col: str = "body",
    id_cols: tuple[str, ...] = ("url",),
) -> DataFrame:
    """Parse sitemap documents to entry rows: (*id_cols, kind, entry_idx,
    loc, lastmod_ts). Documents that fail to parse emit zero rows (route
    them to the errors sink via ``parse_ok`` upstream if quarantining)."""
    parsed = docs.withColumn("__p", parse_sitemap_udf(F.col(body_col)))
    zipped = parsed.filter(F.col("__p.parse_ok")).withColumn(
        "__e", F.arrays_zip(F.col("__p.locs"), F.col("__p.lastmods"))
    )
    return (
        zipped.select(
            *[F.col(c) for c in id_cols],
            F.col("__p.kind").alias("kind"),
            F.posexplode(F.col("__e")).alias("entry_idx", "__it"),
        )
        .withColumn("loc", F.col("__it.locs"))
        .withColumn("lastmod_ts", F.col("__it.lastmods"))
        .drop("__it")
    )


def expand_sitemaps(
    seeds: DataFrame,
    corpus: DataFrame,
    url_col: str = "url",
    body_col: str = "body",
    max_depth: int = 3,
) -> DataFrame:
    """Expand sitemap files breadth-first from ``seeds`` (one ``url``
    column) against a corpus of (url, body): follow ``sitemapindex``
    entries up to ``max_depth`` rounds, return discovered page URLs —
    (loc, lastmod_ts, src_url, depth) — with sitemap files visited at
    most once (seen anti-join per round).

    The corpus join is the engine's simulated-fetch shape (S5); on a real
    crawl the join is replaced by the politeness-gated fetch stage and
    each round is one micro-epoch.
    """
    pages = None
    visited = seeds.select(F.col(url_col).alias("url")).distinct()
    frontier = visited
    for depth in range(int(max_depth)):
        if frontier.isEmpty():
            break
        fetched = frontier.join(
            corpus.select(
                F.col(url_col).alias("url"), F.col(body_col).alias("body")
            ),
            "url",
            "left",
        )
        entries = sitemap_entries(fetched, "body", ("url",)).select(
            F.col("loc"),
            F.col("lastmod_ts"),
            F.col("url").alias("src_url"),
            F.lit(depth).cast("int").alias("depth"),
            F.col("kind"),
        )
        page_rows = entries.filter(F.col("kind") == "urlset").drop("kind")
        pages = page_rows if pages is None else pages.unionByName(page_rows)
        next_files = (
            entries.filter(F.col("kind") == "sitemapindex")
            .select(F.col("loc").alias("url"))
            .distinct()
            .join(visited, "url", "left_anti")
        )
        # bounded materialization: the sitemap-file frontier is tiny
        # (∝ index fan-out), and checkpointing it keeps each round's plan
        # flat instead of stacking |rounds| joins into one tree
        next_files = next_files.localCheckpoint(eager=True)
        visited = visited.unionByName(next_files)
        frontier = next_files
    if pages is None:
        pages = seeds.sparkSession.createDataFrame(
            [], "loc string, lastmod_ts timestamp, src_url string, depth int"
        )
    return pages
