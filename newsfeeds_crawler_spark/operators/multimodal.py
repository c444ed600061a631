"""Multimodal (image) stages — Arrow-batched decode/derive over binary columns.

U4 (no reference analog; required by BASELINE.json input_hint): decode
``bytes+fmt`` into pixels entirely inside ``mapInPandas`` batches — the
Spark-side plumbing (schema, batch shape, partition independence) is real;
the codecs are the numpy/zlib ones in ``functions.codecs``. Decoded pixels
are written back as a raw RGB binary column + (w, h), with a recomputed
perceptual hash for the integrity check.

``resize_images`` / ``sample_frames`` show the same plumbing for the
transforms a training-data pipeline needs; frame sampling over video is
STUBBED (no video codec in the sandbox) behind a deterministic fake that
treats the payload as concatenated frames.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from newsfeeds_crawler_spark.functions import codecs

DECODED_FIELDS = [
    StructField("pixels", BinaryType()),
    StructField("dec_w", IntegerType()),
    StructField("dec_h", IntegerType()),
    StructField("dec_phash", LongType()),
    StructField("decode_error", StringType()),
]


def decode_images(df: DataFrame, bytes_col: str = "bytes", fmt_col: str = "fmt") -> DataFrame:
    """Append pixels/dec_w/dec_h/dec_phash/decode_error columns.

    mapInPandas keeps Arrow batches end-to-end; per-image decode is numpy.
    Decode failures land in ``decode_error`` instead of failing the stage
    (errors quarantine, reference's ErrorDumping analog).
    """
    schema = StructType(df.schema.fields + DECODED_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels, ws, hs, phs, errs = [], [], [], [], []
            for data, fmt in zip(pdf[bytes_col], pdf[fmt_col]):
                if data is None or fmt is None:
                    pixels.append(None); ws.append(None); hs.append(None)
                    phs.append(None); errs.append(None)
                    continue
                try:
                    img = codecs.decode_image(bytes(data), fmt)
                    pixels.append(img.tobytes())
                    hs.append(img.shape[0]); ws.append(img.shape[1])
                    phs.append(codecs.phash64(img)); errs.append(None)
                except Exception as e:  # quarantine, don't kill the epoch
                    pixels.append(None); ws.append(None); hs.append(None)
                    phs.append(None); errs.append(f"{type(e).__name__}: {e}")
            out = pdf.copy()
            out["pixels"] = pixels
            out["dec_w"] = pd.array(ws, dtype="Int32")
            out["dec_h"] = pd.array(hs, dtype="Int32")
            out["dec_phash"] = pd.array(phs, dtype="Int64")
            out["decode_error"] = errs
            yield out

    return df.mapInPandas(run, schema)


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    pixels_col: str = "pixels",
    w_col: str = "dec_w",
    h_col: str = "dec_h",
) -> DataFrame:
    """Nearest-neighbor resize of raw RGB pixel buffers (numpy gather)."""
    schema = StructType(
        df.schema.fields
        + [StructField("resized", BinaryType()), StructField("res_w", IntegerType()),
           StructField("res_h", IntegerType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_px = []
            for buf, w, h in zip(pdf[pixels_col], pdf[w_col], pdf[h_col]):
                if buf is None or pd.isna(w) or pd.isna(h):
                    out_px.append(None)
                    continue
                img = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(int(h), int(w), 3)
                yi = (np.arange(out_h) * int(h)) // out_h
                xi = (np.arange(out_w) * int(w)) // out_w
                out_px.append(img[yi][:, xi].tobytes())
            out = pdf.copy()
            out["resized"] = out_px
            out["res_w"] = out_w
            out["res_h"] = out_h
            yield out

    return df.mapInPandas(run, schema)


def phash_hamming_pairs(
    df: DataFrame,
    id_col: str,
    phash_col: str = "dec_phash",
    max_dist: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Image near-dup pairs by 64-bit perceptual-hash hamming distance.

    Same banded-bucket shape as ``operators.dedup.simhash_hamming_pairs``
    (pigeonhole: a pair within hamming distance ≤ bands − 1 shares at least
    one untouched 64/bands-bit band ⇒ full recall, never an all-pairs join;
    candidates are Σ bucket², verification one ``bit_count(a ^ b)`` each),
    but over a SIGNED int64 hash: banding uses ``shiftrightunsigned`` + mask
    instead of floor division, which is wrong for negative two's-complement
    values. The id column keeps its input type (image_id is a string in the
    input_hint corpus); output is (id_a, id_b, hamming) with id_a < id_b.
    """
    assert 2 <= bands <= 64 and 64 % bands == 0 and max_dist <= bands - 1
    bw = 64 // bands
    band_arr = F.array(
        *[
            F.concat(
                F.lit(f"{b}_"),
                F.shiftrightunsigned(F.col("ph"), b * bw)
                .bitwiseAND(F.lit((1 << bw) - 1))
                .cast("string"),
            )
            for b in range(bands)
        ]
    )
    banded = (
        df.filter(F.col(phash_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.col(phash_col).alias("ph"))
        .select("id", "ph", F.explode(band_arr).alias("bk"))
    )
    a = banded.select("bk", F.col("id").alias("id_a"), F.col("ph").alias("p_a"))
    b = banded.select("bk", F.col("id").alias("id_b"), F.col("ph").alias("p_b"))
    return (
        a.join(b, "bk")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            F.expr("bit_count(p_a ^ p_b)").cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_dist)
    )


def sample_frames(df: DataFrame, every_n: int, frame_bytes: int,
                  video_col: str = "video") -> DataFrame:
    """STUB video frame sampler: the sandbox has no video codec, so the
    payload is treated as concatenated fixed-size frames and every ``n``-th
    is taken — the distributed plumbing (explode to one row per frame,
    deterministic frame_idx) is the real part."""
    schema = StructType(
        df.schema.fields
        + [StructField("frame_idx", IntegerType()), StructField("frame", BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                buf = row[video_col]
                if buf is None:
                    continue
                buf = bytes(buf)
                for i in range(0, len(buf) // frame_bytes, every_n):
                    r = row.to_dict()
                    r["frame_idx"] = i
                    r["frame"] = buf[i * frame_bytes : (i + 1) * frame_bytes]
                    rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.mapInPandas(run, schema)


def caption_image_consistency(
    df: DataFrame,
    caption_col: str = "caption",
    phash_col: str = "dec_phash",
    bands: int = 4,
    tag_prefix: str = "img",
    out_col: str = "consistency",
) -> DataFrame:
    """Caption ↔ image agreement score in [0, 1]: the fraction of the
    image's 16-bit phash bands whose tag token (``img<band-value>``)
    appears among the caption's whitespace tokens.

    A training-data pipeline gates (image, caption) pairs on a learned
    agreement model (CLIP-style); no vision model exists in this sandbox,
    so the score is the deterministic stand-in — upstream taggers stamp
    band tokens into the caption, and mislabeled captions (tags from a
    different image) score < 1. The Spark shape is the real one: pure
    Catalyst expressions (split + array_contains + band extraction via
    ``shiftrightunsigned`` — signed-int64-correct, same banding as
    :func:`phash_hamming_pairs`), no Python in the hot path, so the score
    column costs one map-only projection at any corpus size.
    """
    assert 2 <= bands <= 4  # 16-bit bands of a 64-bit hash
    toks = F.split(F.col(caption_col), " ")
    hits = None
    for k in range(bands):
        band = (
            F.shiftrightunsigned(F.col(phash_col), 16 * k)
            .bitwiseAND(F.lit(0xFFFF))
            .cast("string")
        )
        hit = F.array_contains(toks, F.concat(F.lit(tag_prefix), band)).cast(
            "int"
        )
        hits = hit if hits is None else hits + hit
    return df.withColumn(out_col, hits / F.lit(float(bands)))


def image_metadata_verdict(
    df: DataFrame,
    id_col: str = "image_id",
    w_col: str = "w",
    h_col: str = "h",
    fmt_col: str = "fmt",
    caption_col: str = "caption",
    phash_col: str = "phash",
    min_side: int = 64,
    max_aspect_x10: int = 35,
    min_caption_tokens: int = 3,
    max_caption_tokens: int = 256,
    allowed_fmts: tuple[str, ...] = ("png", "jpeg"),
) -> DataFrame:
    """DataComp/LAION-style metadata curation pass over an (image, caption)
    corpus — the filter stage a multimodal pipeline runs BEFORE paying for
    any decode: resolution floor, aspect-ratio bound (integer arithmetic:
    10·max(w,h) ≤ max_aspect_x10·min(w,h)), allowed container format,
    caption token-count window, and keep-lowest-id exact-phash dedup.
    One deterministic reason code per row in fixed precedence
    (too_small → bad_aspect → bad_format → caption_length → phash_dup →
    ok), the ``curation_verdict`` convention.

    Public sources for the rule family: Gadre et al. 2023 (DataComp)
    filters on original width/height and caption length; Schuhmann et al.
    2021/2022 (LAION) drop short captions and undersized images and
    URL+text-dedup the pairs. The content-aware twin of the dedup rule —
    banded phash hamming — is :func:`phash_hamming_pairs`; here equality
    of the stored 64-bit phash is the metadata-only stand-in.

    100 TB shape: everything except the dedup window is a map-only
    projection; the dedup is one shuffle keyed on ``phash`` (dup groups
    are tiny by construction — a hot phash IS a mass-duplicated image,
    exactly what the rule exists to drop). No decode, no Python, no
    broadcast.
    """
    iid, w, h = F.col(id_col), F.col(w_col), F.col(h_col)
    n_tok = F.size(F.split(F.lower(F.trim(F.col(caption_col))), r"\s+"))
    aspect_ok = (
        F.greatest(w, h) * F.lit(10) <= F.least(w, h) * F.lit(max_aspect_x10)
    )
    fmt_ok = F.col(fmt_col).isin(*allowed_fmts)
    dup = iid > F.min(iid).over(Window.partitionBy(phash_col))
    flagged = df.select(
        iid.cast("bigint").alias("image_id"),
        w.cast("int").alias("w"),
        h.cast("int").alias("h"),
        F.col(fmt_col).alias("fmt"),
        n_tok.cast("int").alias("n_caption_tokens"),
        dup.alias("phash_dup"),
        aspect_ok.alias("__aspect_ok"),
        fmt_ok.alias("__fmt_ok"),
    )
    size_ok = (F.col("w") >= min_side) & (F.col("h") >= min_side)
    cap_ok = (F.col("n_caption_tokens") >= min_caption_tokens) & (
        F.col("n_caption_tokens") <= max_caption_tokens
    )
    reason = (
        F.when(~size_ok, F.lit("too_small"))
        .when(~F.col("__aspect_ok"), F.lit("bad_aspect"))
        .when(~F.col("__fmt_ok"), F.lit("bad_format"))
        .when(~cap_ok, F.lit("caption_length"))
        .when(F.col("phash_dup"), F.lit("phash_dup"))
        .otherwise(F.lit("ok"))
    )
    return flagged.select(
        "image_id",
        "w",
        "h",
        "fmt",
        "n_caption_tokens",
        "phash_dup",
        reason.alias("reason"),
        (reason == F.lit("ok")).alias("keep"),
    )


def aspect_bucket_shards(
    df: DataFrame,
    id_col: str = "image_id",
    w_col: str = "w",
    h_col: str = "h",
    batch_size: int = 32,
    batches_per_shard: int = 8,
    quarters_min: int = 1,
    quarters_max: int = 8,
) -> DataFrame:
    """Aspect-bucketed batch/shard manifest for image training — the
    NovelAI/SDXL aspect-bucketing practice (Podell et al. 2023 §2.3 cite
    bucketed aspect-ratio training; WebDataset-style shards group the
    batches): images are classed by quantized aspect ratio so a batch
    never mixes shapes, then laid out into fixed-size batches and shards
    in deterministic id order.

    ``bucket`` = clamp((w·4) div h, quarters_min, quarters_max) — the
    aspect ratio in quarter units, integer floor division. Within a
    bucket, images order by id; ``batch`` = pos div batch_size,
    ``shard`` = batch div batches_per_shard, and ``batch_is_full`` marks
    batches that reached ``batch_size`` (the tail batch of each bucket is
    the one a loader drops or pads). All exact integer window arithmetic
    — bit-identical on any engine/partitioning.

    100 TB shape: one shuffle keyed ``bucket`` (a handful of partitions —
    salt by (bucket, id range) blocks with a two-level prefix sum if a
    single bucket outgrows an executor, the same scale note as
    ``packing.pack_sequences``), then map-only arithmetic. No Python, no
    decode — this runs on metadata before any pixel is touched.
    """
    iid = F.col(id_col)
    bucket = F.least(
        F.greatest(
            F.expr(f"({w_col} * 4) div {h_col}"),
            F.lit(quarters_min),
        ),
        F.lit(quarters_max),
    ).cast("int")
    base = df.select(
        iid.cast("bigint").alias("image_id"), bucket.alias("bucket")
    )
    w = Window.partitionBy("bucket").orderBy("image_id")
    wn = Window.partitionBy("bucket")
    pos = (F.row_number().over(w) - 1).cast("bigint")
    n_bucket = F.count(F.lit(1)).over(wn).cast("bigint")
    with_pos = base.select(
        "image_id",
        "bucket",
        pos.alias("pos_in_bucket"),
        n_bucket.alias("n_in_bucket"),
    )
    batch = F.expr(f"pos_in_bucket div {batch_size}").cast("bigint")
    full_batches = F.expr(f"n_in_bucket div {batch_size}").cast("bigint")
    return with_pos.select(
        "image_id",
        "bucket",
        "pos_in_bucket",
        batch.alias("batch"),
        F.expr(
            f"(pos_in_bucket div {batch_size}) div {batches_per_shard}"
        ).cast("bigint").alias("shard"),
        (batch < full_batches).alias("batch_is_full"),
    )
