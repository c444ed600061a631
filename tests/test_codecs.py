from __future__ import annotations

import numpy as np
import pytest

from newsfeeds_crawler_spark.functions import codecs


def _img(h=13, w=17, seed=42):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("fmt", ["ppm", "bmp", "png"])
@pytest.mark.parametrize("hw", [(1, 1), (8, 8), (13, 17), (32, 9)])
def test_roundtrip_lossless(fmt, hw):
    img = _img(*hw)
    data = codecs.encode_image(img, fmt)
    out = codecs.decode_image(data, fmt)
    np.testing.assert_array_equal(out, img)
    assert codecs.psnr(img, out) == float("inf")


def test_png_decoder_handles_all_filters():
    # Hand-build PNGs using each filter type and check we invert them.
    import struct
    import zlib

    img = _img(6, 5, seed=7)
    h, w = img.shape[:2]
    flat = img.reshape(h, w * 3).astype(np.int16)
    for f in range(5):
        rows = []
        for y in range(h):
            cur = flat[y]
            prev = flat[y - 1] if y else np.zeros(w * 3, dtype=np.int16)
            enc = np.zeros(w * 3, dtype=np.int16)
            for x in range(w * 3):
                left = cur[x - 3] if x >= 3 else 0
                up = prev[x]
                ul = prev[x - 3] if x >= 3 else 0
                pred = {
                    0: 0,
                    1: left,
                    2: up,
                    3: (left + up) >> 1,
                    4: int(codecs._paeth(np.uint8(left), np.uint8(up), np.uint8(ul))),
                }[f]
                enc[x] = (cur[x] - pred) & 0xFF
            rows.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        data = (
            codecs._PNG_SIG
            + codecs._chunk(b"IHDR", ihdr)
            + codecs._chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + codecs._chunk(b"IEND", b"")
        )
        np.testing.assert_array_equal(codecs.decode_png(data), img)


def test_psnr_lossy_bound():
    img = _img(16, 16)
    noisy = np.clip(img.astype(np.int16) + 2, 0, 255).astype(np.uint8)
    assert codecs.psnr(img, noisy) > 40.0
    very_noisy = np.clip(img.astype(np.int16) + 64, 0, 255).astype(np.uint8)
    assert codecs.psnr(img, very_noisy) < 40.0


def test_phash_properties():
    img = _img(32, 32)
    h1 = codecs.phash64(img)
    assert h1 == codecs.phash64(img.copy())  # deterministic
    assert -(1 << 63) <= h1 < (1 << 63)
    # near-duplicate -> small hamming distance; unrelated -> large
    near = np.clip(img.astype(np.int16) + 3, 0, 255).astype(np.uint8)
    other = _img(32, 32, seed=1234)
    ham_near = bin((h1 ^ codecs.phash64(near)) & ((1 << 64) - 1)).count("1")
    ham_far = bin((h1 ^ codecs.phash64(other)) & ((1 << 64) - 1)).count("1")
    assert ham_near <= 8 < ham_far


def test_decode_body_gzip_deflate_charsets(spark):
    """Arrow-vectorized HTTP entity decode == python mirror; bad streams
    yield null (P3 routes them like a non-200)."""
    import gzip, zlib

    from newsfeeds_crawler_spark.operators.httpbody import (
        decode_body, decode_body_py,
    )
    from pyspark.sql import functions as F

    text = "caption – ünïcode ✓"
    cases = [
        (bytearray(gzip.compress(text.encode("utf-8"))), "gzip", "utf-8"),
        (bytearray(zlib.compress(text.encode("utf-8"))), "deflate", "utf-8"),
        (bytearray("plainlatin".encode("latin-1")), None, "latin-1"),
        (bytearray(b"\x1f\x8b broken"), "gzip", "utf-8"),  # -> null
        (None, "gzip", "utf-8"),                            # -> null
    ]
    df = spark.createDataFrame(
        [(i, b, e, c) for i, (b, e, c) in enumerate(cases)],
        "i int, raw binary, enc string, cs string",
    )
    got = {
        r["i"]: r["body"]
        for r in df.select(
            "i", decode_body(F.col("raw"), F.col("enc"), F.col("cs")).alias("body")
        ).collect()
    }
    for i, (b, e, c) in enumerate(cases):
        assert got[i] == decode_body_py(bytes(b) if b else None, e, c), i
    assert got[0] == text and got[1] == text and got[2] == "plainlatin"
    assert got[3] is None and got[4] is None
