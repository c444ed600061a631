"""Image-metadata curation verdict (operators/multimodal.py):
rule-by-rule semantics, precedence order, keep-lowest-id phash dedup,
and gate-input rule coverage."""

from __future__ import annotations

from newsfeeds_crawler_spark.operators.multimodal import (
    image_metadata_verdict,
)


def _img(spark, rows):
    return spark.createDataFrame(
        rows,
        "image_id long, w int, h int, fmt string, caption string, "
        "phash long",
    )


CAP = "a clear photo of a red bicycle near the wall"


def test_each_rule_and_precedence(spark):
    rows = [
        (1, 640, 480, "png", CAP, 11),          # ok
        (2, 32, 480, "png", CAP, 12),           # too_small (w)
        (3, 640, 32, "gif", CAP, 13),           # too_small wins over format
        (4, 1024, 128, "png", CAP, 14),         # 8:1 aspect -> bad_aspect
        (5, 640, 480, "bmp", CAP, 15),          # bad_format
        (6, 640, 480, "jpeg", "x y", 16),       # caption_length (2 < 3)
        (7, 640, 480, "jpeg", " ".join(["t"] * 300), 17),  # caption_length
        (8, 640, 480, "png", CAP, 11),          # phash dup of id 1
    ]
    out = {r.image_id: r for r in image_metadata_verdict(_img(spark, rows)).collect()}
    assert out[1].reason == "ok" and out[1].keep
    assert out[2].reason == "too_small"
    assert out[3].reason == "too_small"  # precedence over bad_format
    assert out[4].reason == "bad_aspect"
    assert out[5].reason == "bad_format"
    assert out[6].reason == "caption_length"
    assert out[7].reason == "caption_length"
    assert out[8].reason == "phash_dup" and out[8].phash_dup
    assert not out[1].phash_dup  # lowest id of the group survives
    assert [out[i].keep for i in range(2, 9)] == [False] * 7


def test_aspect_boundary_is_inclusive(spark):
    # 3.5 exactly (700x200) passes; one pixel more fails
    rows = [
        (1, 700, 200, "png", CAP, 1),
        (2, 701, 200, "png", CAP, 2),
    ]
    out = {r.image_id: r for r in image_metadata_verdict(_img(spark, rows)).collect()}
    assert out[1].keep
    assert out[2].reason == "bad_aspect"


def test_gate_input_fires_every_rule(spark):
    """The driver gate's synthetic corpus must exercise all six reason
    codes, or the oracle check proves less than it claims."""
    import __spark_entry__ as E

    out = E.queries()["image_metadata_verdict"](spark, "/root/testdata/sf0.01")
    reasons = {r["reason"] for r in out.select("reason").distinct().collect()}
    assert reasons == {
        "too_small",
        "bad_aspect",
        "bad_format",
        "caption_length",
        "phash_dup",
        "ok",
    }
