"""Caption consolidation across near-duplicate image clusters.

An image-caption training corpus crawled from the web carries the same
image (or a near-duplicate) many times with different captions — alt
text, figure captions, social-card blurbs. Dataset curation keeps ONE
canonical (image, caption) pair per near-dup cluster and records how
contested the cluster was (LAION/DataComp-style consolidation; the
reference crawler stores every article verbatim —
``ArticlesDao.scala``-style upsert — and leaves consolidation to a
downstream pass, which is exactly this operator).

Cluster key: a caller-supplied integer expression over the image hash —
exact ``phash`` for byte-dup consolidation, ``phash div 2^k`` to pool
near-dups that differ only in the k low bits (the same banding idea as
:func:`newsfeeds_crawler_spark.operators.multimodal.phash_hamming_pairs`,
collapsed to a single prefix band so the pass stays one aggregate).

Canonical-pair rule (deterministic, engine-portable): the pair with the
GREATEST ``(caption_length, caption, image_id)`` triple — longest caption
first (web alt-text is short and low-signal; figure captions are long),
ties broken by caption then image_id so any engine, partitioning, or
run order picks the identical row. Real pipelines rank by a learned
score; the triple is the deterministic stand-in and the Spark shape is
identical (swap the struct's first field for the score column).

100 TB shape: ONE hash aggregate keyed on the cluster expression —
``max(struct(...))`` and ``count`` are map-side combinable, and the
distinct-caption count is the standard two-phase expand — so the pass
costs one shuffle ∝ distinct clusters, never a self-join or a window
over the full corpus. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def caption_consolidate(
    pairs: DataFrame,
    cluster: Column,
    image_id_col: str = "image_id",
    caption_col: str = "caption",
) -> DataFrame:
    """One row per image cluster: the canonical (image_id, caption) pair
    plus contest stats.

    Returns columns:
      cluster        bigint  — the cluster key value
      n_pairs        bigint  — (image, caption) rows pooled
      n_captions     bigint  — distinct captions in the cluster
      contested      boolean — n_captions > 1
      canon_image_id string  — image id of the winning pair
      canon_caption  string  — the canonical caption
    """
    win = F.max(
        F.struct(
            F.length(F.col(caption_col)).alias("l"),
            F.col(caption_col).alias("c"),
            F.col(image_id_col).alias("i"),
        )
    ).alias("w")
    return (
        pairs.groupBy(cluster.cast("bigint").alias("cluster"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.countDistinct(caption_col).cast("bigint").alias("n_captions"),
            win,
        )
        .select(
            "cluster",
            "n_pairs",
            "n_captions",
            (F.col("n_captions") > 1).alias("contested"),
            F.col("w.i").alias("canon_image_id"),
            F.col("w.c").alias("canon_caption"),
        )
    )
