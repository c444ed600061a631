"""Fetch (corpus join) + feed parse (Arrow-vectorized UDTF) stages.

S5: the sandbox has no network, so the HTTP GET source
(/root/reference/.../http/impl/DefaultHttpFacade.scala:59-82) becomes a bulk
equi-join ``admitted ⋈ corpus ON url_canon`` — the corpus table IS the web.
Non-200/missing rows yield a null body (P5), preserving the reference's
error semantics. At 10^10 scale both sides are bucketed by
``pmod(xxhash64(url_canon), B)`` so this is a storage-partitioned join.

U1: RSS parse is one ``pandas_udf`` over the body column (Arrow batches, no
per-row Python registration) returning (feed_pub_ts, parse_ok, links[],
tss[]) — exploded to item rows with ``posexplode(arrays_zip(...))`` so the
1-row-in/N-rows-out UDTF shape (RomeFeedParser.scala:20-34) stays columnar.
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

from newsfeeds_crawler_spark.functions.feedparse import parse_feed_py

PARSE_RESULT = StructType(
    [
        StructField("feed_pub_ts", TimestampType()),
        StructField("parse_ok", BooleanType()),
        StructField("links", ArrayType(StringType())),
        StructField("tss", ArrayType(TimestampType())),
    ]
)


@pandas_udf(PARSE_RESULT)
def parse_feed_udf(body: pd.Series) -> pd.DataFrame:
    """Vectorized RSS parse: one Arrow batch in, one struct column out."""
    out = {"feed_pub_ts": [], "parse_ok": [], "links": [], "tss": []}
    for b in body:
        parsed = parse_feed_py(b if isinstance(b, str) else None)
        if parsed is None:
            out["feed_pub_ts"].append(None)
            out["parse_ok"].append(False)
            out["links"].append(None)
            out["tss"].append(None)
        else:
            feed_ts, items = parsed
            out["feed_pub_ts"].append(feed_ts)
            out["parse_ok"].append(True)
            out["links"].append([l for l, _ in items])
            out["tss"].append([t for _, t in items])
    return pd.DataFrame(out)


PAYLOAD_COLS = ["status", "body", "bytes", "w", "h", "fmt", "caption", "phash"]


def fetch(
    admitted: DataFrame,
    corpus: DataFrame,
    num_buckets: int = 0,
    materialize: bool = True,
    touched: list[int] | None = None,
    enrich=None,
    null_cols: tuple = (),
    socket_timeout_ms: int = 0,
) -> DataFrame:
    """Simulated-fetch join. Adds body (null unless status 200) and the
    corpus payload columns; URLs absent from the corpus behave like
    connection failures (null body).

    Scale shape: ``admitted`` is ≤ ``workers`` rows per epoch while the
    corpus is the 100 TB side, so a plain ``admitted LEFT JOIN corpus``
    (stream side left ⇒ Spark cannot broadcast admitted) would shuffle the
    whole corpus. Instead: **inner join with broadcast(admitted) pushed
    into the corpus scan** (zero corpus shuffle) ∪ anti-join null rows for
    connection failures. ``materialize=True`` localCheckpoints the inner
    hits so the corpus is scanned exactly once.

    ``num_buckets`` > 0 and a ``bucket`` partition column on ``corpus``
    additionally prune the scan to the admitted keys' buckets
    (partition pruning — only touched buckets are read at all).
    ``touched`` skips the internal bucket collect when the caller already
    knows the admitted keys' buckets (the driver folds it into the gate
    stats job so a tick launches one job fewer).

    ``enrich(hits)`` is applied to the corpus-hit rows AFTER the body
    decode but BEFORE the checkpoint, so per-body stages (feed parse,
    caption extract) materialize in the SAME job as the fetch join —
    callers then need no second checkpoint over the union. ``null_cols``
    ((name, type), ...) declares the enrich outputs' null-typed columns
    for the miss rows (a missed URL has a null body, so every body-derived
    column is null by construction — the literal skips re-running UDFs on
    rows whose input is known-null).

    ``socket_timeout_ms`` > 0 consumes the reference's
    ``httpClient.http.socket.timeout`` param: a fetch whose deterministic
    simulated latency (functions/httpsim.py) reaches the timeout yields a
    null body — the reference maps the timeout exception to null content
    (HttpManager.scala:112-121), identical routing to a non-200.
    """
    if num_buckets > 0 and "bucket" in corpus.columns:
        if touched is None:
            touched = [
                r["b"]
                for r in admitted.select(
                    F.pmod(F.xxhash64("url_canon"), F.lit(num_buckets))
                    .cast("int")
                    .alias("b")
                )
                .distinct()
                .collect()
            ]
        corpus = corpus.where(F.col("bucket").isin(touched))
    # compressed-corpus variant (ref DefaultHttpFacade.scala:44-57,116):
    # bodies stored as gzip/deflate bytes + charset are inflated by an
    # Arrow-vectorized decode stage right after the join
    gz = "body_gz" in corpus.columns
    gz_cols = ["body_gz", "content_encoding", "charset"] if gz else []
    payload = corpus.select(
        F.col("url_canon").alias("__cu"),
        F.col("status"),
        F.col("body").alias("__raw_body"),
        "bytes", "w", "h", "fmt", "caption", "phash", *gz_cols,
    )
    adm = F.broadcast(admitted)
    hits = payload.join(adm, F.col("__cu") == adm["url_canon"], "inner").drop("__cu")
    raw = F.col("__raw_body")
    if gz:
        from newsfeeds_crawler_spark.operators.httpbody import decode_body

        raw = F.coalesce(
            raw,
            decode_body(
                F.col("body_gz"), F.col("content_encoding"), F.col("charset")
            ),
        )
    ok = F.col("status") == 200
    if socket_timeout_ms > 0:
        from newsfeeds_crawler_spark.functions.httpsim import sim_latency_ms

        ok = ok & (sim_latency_ms(F.col("url_canon")) < F.lit(socket_timeout_ms))
    hits = hits.withColumn(
        "body",
        F.when(ok, raw).otherwise(F.lit(None).cast("string")),
    ).drop("__raw_body", *gz_cols)
    if enrich is not None:
        hits = enrich(hits)
    if materialize:
        hits = hits.localCheckpoint(eager=True)
    misses = admitted.join(
        F.broadcast(hits.select("url_canon")), "url_canon", "left_anti"
    )
    for c, t in (
        ("status", "int"), ("body", "string"), ("bytes", "binary"),
        ("w", "int"), ("h", "int"), ("fmt", "string"),
        ("caption", "string"), ("phash", "long"),
        *null_cols,
    ):
        misses = misses.withColumn(c, F.lit(None).cast(t))
    return hits.unionByName(misses.select(*hits.columns))


def explode_items(parsed_feeds: DataFrame) -> DataFrame:
    """UDTF explode: one row per feed item, in document order (item_idx)."""
    zipped = parsed_feeds.withColumn(
        "__items", F.arrays_zip(F.col("parsed.links"), F.col("parsed.tss"))
    )
    return (
        zipped.select(
            F.col("feed_canon"),
            F.col("admit_rank"),
            F.posexplode(F.col("__items")).alias("item_idx", "__it"),
        )
        .withColumn("item_url", F.col("__it.links"))
        .withColumn("item_ts", F.col("__it.tss"))
        .drop("__it")
    )
