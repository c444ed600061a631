"""Seen-set maintenance + probe (J2/S4) — bulk joins, never per-row.

Reference: per-item single-row SELECT against the ``article.url UNIQUE``
index (MysqlFeedArticleDao.scala:46-56, issued per item from
FeedManager.scala:93-95). Re-expressed as:

- the articles log (append-only) with a latest-per-key view — the store;
- ``probe``: one bulk left join candidates ⟕ store ON url_canon, optionally
  prefiltered by a partitioned Bloom filter so that at 10^10 keys only
  possible-hits shuffle into the join (definitely-new rows skip it via the
  broadcast filter test — the left_anti fast path).

The Bloom build/probe lives in operators/bloom.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_articles(articles_log: DataFrame) -> DataFrame:
    """Latest row per url_canon from the append log (the seen store).

    Window per key, ties impossible (one action per URL per epoch — host
    politeness serializes same-URL fetches into distinct epochs).
    """
    w = Window.partitionBy("url_canon").orderBy(F.col("epoch").desc())
    return (
        articles_log.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def probe(
    candidates: DataFrame,
    store_latest: DataFrame,
    key: str = "url_canon",
    hash_key: str = "url_hash",
    bloom=None,
) -> DataFrame:
    """Append __seen / stored_id / stored_pub_ts to ``candidates``.

    ``bloom``: optional operators.bloom.PartitionedBloom over the 64-bit
    ``hash_key`` — candidates that fail the membership test bypass the join
    (they are definitely new; no false negatives).
    """
    store = store_latest.select(
        F.col(key).alias("__sk"),
        F.col("article_id").alias("stored_id"),
        F.col("pub_ts").alias("stored_pub_ts"),
    )
    if bloom is not None:
        maybe, new = bloom.split(candidates, hash_key)
        probed = maybe.join(store, maybe[key] == F.col("__sk"), "left")
        probed = probed.withColumn("__seen", F.col("__sk").isNotNull()).drop("__sk")
        new = (
            new.withColumn("__seen", F.lit(False))
            .withColumn("stored_id", F.lit(None).cast("long"))
            .withColumn("stored_pub_ts", F.lit(None).cast("timestamp"))
        )
        return probed.unionByName(new)
    probed = candidates.join(store, candidates[key] == F.col("__sk"), "left")
    return probed.withColumn("__seen", F.col("__sk").isNotNull()).drop("__sk")
