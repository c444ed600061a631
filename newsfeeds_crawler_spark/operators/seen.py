"""Seen-set maintenance + probe (J2/S4) — bulk joins, never per-row.

Reference: per-item single-row SELECT against the ``article.url UNIQUE``
index (MysqlFeedArticleDao.scala:46-56, issued per item from
FeedManager.scala:93-95). Re-expressed as:

- the articles log (append-only) with a latest-per-key view — the store;
- ``probe``: the scale shape is **inner join with broadcast(candidates)
  pushed into the store scan ∪ broadcast-hits left join** — the store (the
  10^10-key side) is scanned once and NEVER shuffled or broadcast:

      hits   = store ⋈ broadcast(distinct candidate keys)   (≤ |candidates|)
      probed = candidates ⟕ broadcast(hits)

  A naive ``candidates ⟕ store`` cannot broadcast the left (stream) side of
  a left join, so Spark either broadcasts the store (impossible at scale)
  or sort-merges it — O(|seen|) shuffle per epoch. Same rewrite as the
  fetch join (operators/fetchparse.py:66-126).
- optional partitioned Bloom prefilter: candidates that fail the
  membership test bypass the store entirely (definitely new, no false
  negatives) — at steady state most candidates take this path.

The Bloom build/probe lives in operators/bloom.py; the driver additionally
prunes the bucketed store scan to the candidates' touched buckets
(Catalog.read(buckets=...)), mirroring the fetch join's corpus pruning.
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
    else:
        maybe, new = candidates, None
    # store side: inner join with the (small) candidate key set broadcast —
    # the store streams through a BroadcastHashJoin probe, no Exchange.
    # distinct() so duplicate candidate keys (same URL in two feeds) cannot
    # fan hits out; the store itself is one row per key by construction.
    cand_keys = maybe.select(F.col(key).alias("__sk")).distinct()
    hits = store.join(F.broadcast(cand_keys), on="__sk", how="inner")
    # candidate side: hits ≤ |candidates|, so the left join broadcasts it
    probed = maybe.join(F.broadcast(hits), maybe[key] == F.col("__sk"), "left")
    probed = probed.withColumn("__seen", F.col("__sk").isNotNull()).drop("__sk")
    if new is not None:
        new = (
            new.withColumn("__seen", F.lit(False))
            .withColumn("stored_id", F.lit(None).cast("long"))
            .withColumn("stored_pub_ts", F.lit(None).cast("timestamp"))
        )
        probed = probed.unionByName(new)
    return probed
