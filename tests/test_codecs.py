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


@pytest.mark.parametrize("hw", [(1, 1), (8, 8), (13, 17), (64, 96), (7, 33)])
def test_dct_lossy_roundtrip_psnr(hw):
    """input_hint lossy gate: decode(encode(x)) within PSNR >= 40dB at the
    default quality — including uniform noise, DCT quantization's worst
    case — with exact shape preservation for non-multiple-of-8 sizes."""
    img = _img(*hw)
    data = codecs.encode_image(img, "dct")
    out = codecs.decode_image(data, "dct")
    assert out.shape == img.shape and out.dtype == np.uint8
    assert codecs.psnr(img, out) >= 40.0
    # deterministic: same input -> same bytes -> same pixels
    assert data == codecs.encode_image(img, "dct")
    np.testing.assert_array_equal(out, codecs.decode_image(data, "dct"))


def test_dct_smooth_content_high_fidelity_and_compresses():
    yy, xx = np.mgrid[0:64, 0:64]
    img = np.stack([(yy * 4) % 256, (xx * 4) % 256, (yy + xx) % 256], -1).astype(
        np.uint8
    )
    data = codecs.encode_dct(img)
    out = codecs.decode_dct(data)
    assert codecs.psnr(img, out) >= 50.0
    assert len(data) < img.nbytes / 2  # smooth content actually compresses


def test_dct_quality_monotone_and_validated():
    img = _img(32, 48, seed=9)
    p = [codecs.psnr(img, codecs.decode_dct(codecs.encode_dct(img, q)))
         for q in (50, 75, 90, 97)]
    assert p == sorted(p)  # higher quality -> higher fidelity
    with pytest.raises(ValueError):
        codecs.encode_dct(img, 0)
    with pytest.raises(ValueError):
        codecs.decode_dct(b"DCT1" + b"\x00" * 8)  # truncated payload
    with pytest.raises(ValueError):
        codecs.decode_dct(codecs.encode_ppm(img))  # wrong magic


def test_dct_registry_and_lossy_marker():
    assert "dct" in codecs.ENCODERS and "dct" in codecs.DECODERS
    assert codecs.LOSSY == {"dct"}
    assert not (codecs.LOSSY - set(codecs.ENCODERS))


def test_phash_hamming_pairs_matches_bruteforce(spark):
    """Banded 64-bit hamming join (signed phash) == brute-force all-pairs,
    including negative two's-complement hashes that floor-division banding
    would misbucket. Full recall for max_dist <= bands-1 (pigeonhole)."""
    from pyspark.sql import functions as F

    from newsfeeds_crawler_spark.operators.multimodal import phash_hamming_pairs

    def s64(v: int) -> int:  # wrap a python int into signed int64
        v &= (1 << 64) - 1
        return v - (1 << 64) if v >= 1 << 63 else v

    rng = np.random.default_rng(5)
    vals = [int(v) for v in rng.integers(-(2**63), 2**63, size=40, dtype=np.int64)]
    # plant near-dups at known distances, incl. around the sign bit
    vals[1] = s64(vals[0] ^ 0b101)      # dist 2
    vals[3] = s64(vals[2] ^ (1 << 63))  # dist 1, sign flip
    vals[5] = s64(vals[4] ^ 0b111)      # dist 3
    vals[7] = -1
    vals[8] = -2                        # dist(-1,-2) = 1
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id int, ph long"
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_hamming_pairs(df, "id", "ph", max_dist=3, bands=4).collect()
    }
    want = set()
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            d = bin((vals[i] ^ vals[j]) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                want.add((i, j, d))
    assert got == want
    assert {(0, 1, 2), (2, 3, 1), (4, 5, 3), (7, 8, 1)} <= want
