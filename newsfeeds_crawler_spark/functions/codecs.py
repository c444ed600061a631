"""Pure numpy/zlib image codecs (PPM / BMP / PNG), PSNR, perceptual hash.

The reference has no image stage; BASELINE.json ``input_hint`` requires the
corpus to be (image, caption) pairs with a decode stage verified by
decoded-pixel allclose (PSNR>=40dB for lossy formats). The sandbox has no
PIL/cv2/imageio, so the codecs are real but minimal:

- PPM  : binary P6, 8-bit RGB.
- BMP  : BITMAPINFOHEADER, 24-bit BGR, bottom-up rows padded to 4 bytes.
- PNG  : real spec-compliant PNG — 8-bit RGB color type 2, zlib IDAT,
  encoder emits filter 0; decoder implements all five filter types
  (None/Sub/Up/Average/Paeth) so any conforming single-IDAT RGB PNG decodes.

- DCT  : a real LOSSY codec ("dct") — JPEG-style 8x8 block DCT-II over
  full-range YCbCr (4:4:4, no subsampling), quality-scaled quantization,
  zlib-compressed int16 coefficients. No entropy coding beyond zlib (this is
  a codec kernel, not a JPEG implementation), but the loss profile is the
  real thing: quantized transform coefficients. The default quality keeps
  PSNR >= 40dB even on uniform-noise images (JPEG's worst case), satisfying
  the input_hint's lossy-format invariant non-vacuously.

PPM/BMP/PNG are lossless (PSNR = inf); ``LOSSY`` names the formats where the
>=40dB allclose gate is the binding check. These functions are the *kernel*;
the distributed plumbing (mapInArrow batching, schema, partitioning) lives in
``operators/multimodal.py``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# --------------------------------------------------------------------- PPM


def encode_ppm(img: np.ndarray) -> bytes:
    """HxWx3 uint8 -> binary PPM (P6)."""
    _check_rgb(img)
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6)")
    # header: magic, width, height, maxval — whitespace/comment separated
    fields: list[bytes] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            pos = data.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(data[start:pos])
    pos += 1  # single whitespace after maxval
    w, h, maxval = (int(f) for f in fields)
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    arr = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return arr.reshape(h, w, 3).copy()


# --------------------------------------------------------------------- BMP


def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> 24-bit uncompressed BMP."""
    _check_rgb(img)
    h, w = img.shape[:2]
    row_size = (w * 3 + 3) & ~3
    pixel_bytes = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + pixel_bytes, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return header + info + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER unsupported")
    w, h_signed = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP bpp={bpp} compression={compression}")
    h = abs(h_signed)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=row_size * h, offset=offset)
    rows = rows.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# --------------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode_png(img: np.ndarray, *, level: int = 6) -> bytes:
    """HxWx3 uint8 RGB -> PNG (color type 2, bit depth 8, filter 0)."""
    _check_rgb(img)
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), img.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, level))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos, ihdr, idat = len(_PNG_SIG), None, b""
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ValueError(f"unsupported PNG variant {ihdr}")
    stride = w * 3
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, stride + 1)
    filters, lines = raw[:, 0], raw[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = 3
    for y in range(h):
        f, cur = int(filters[y]), lines[y].astype(np.uint16)
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = cur
        elif f == 2:  # Up
            out[y] = (cur + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need left-to-right scan
            row = out[y]
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                up = prev[x]
                ul = prev[x - bpp] if x >= bpp else 0
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (int(left) + int(up)) >> 1
                else:
                    pred = int(
                        _paeth(
                            np.uint8(left), np.uint8(up), np.uint8(ul)
                        )
                    )
                row[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
    return out.reshape(h, w, 3).copy()


# --------------------------------------------------------------- DCT (lossy)

_DCT_MAGIC = b"DCT1"

#: standard JPEG Annex K luminance quantization table (public spec constants)
_QTBL_BASE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)

#: keeps PSNR >= 40dB (~42dB measured) on uniform-noise images — DCT
#: quantization's worst case; smooth content lands 50dB+
_DCT_DEFAULT_QUALITY = 97

_DCT8: np.ndarray | None = None


def _dct_mat() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: X = M @ x @ M.T, x = M.T @ X @ M."""
    global _DCT8
    if _DCT8 is None:
        k = np.arange(8)[:, None]
        n = np.arange(8)[None, :]
        m = 0.5 * np.cos((2 * n + 1) * k * np.pi / 16)
        m[0] *= 1 / np.sqrt(2)
        _DCT8 = m
    return _DCT8


def _qtbl(quality: int) -> np.ndarray:
    """JPEG-style quality scaling (libjpeg convention), used for all planes
    (no separate chroma table: 4:4:4 and a single table keep PSNR high)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((_QTBL_BASE * scale + 50) / 100), 1, 255)


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    return np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ],
        axis=-1,
    )


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H,W) -> (H/8, W/8, 8, 8) view-reshape (H,W multiples of 8)."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _unblocks(blk: np.ndarray) -> np.ndarray:
    nh, nw = blk.shape[:2]
    return blk.transpose(0, 2, 1, 3).reshape(nh * 8, nw * 8)


def encode_dct(img: np.ndarray, quality: int = _DCT_DEFAULT_QUALITY) -> bytes:
    """HxWx3 uint8 RGB -> lossy DCT-quantized payload.

    Layout: magic, <HHB (w, h, quality), zlib(int16-LE coefficients for the
    3 YCbCr planes of the edge-padded image, plane-major, block raster order).
    """
    _check_rgb(img)
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    ycc = _rgb_to_ycbcr(img)
    ycc = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    m, q = _dct_mat(), _qtbl(quality)
    planes = []
    for c in range(3):
        blk = _blocks(ycc[..., c] - 128.0)
        coeff = np.einsum("ij,abjk,lk->abil", m, blk, m)
        planes.append(np.round(coeff / q).astype(np.int16))
    payload = np.concatenate([p.ravel() for p in planes]).astype("<i2").tobytes()
    return (
        _DCT_MAGIC
        + struct.pack("<HHB", w, h, quality)
        + zlib.compress(payload, 6)
    )


def decode_dct(data: bytes) -> np.ndarray:
    if data[:4] != _DCT_MAGIC:
        raise ValueError("not a DCT payload")
    w, h, quality = struct.unpack_from("<HHB", data, 4)
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    n = (ph // 8) * (pw // 8) * 64
    try:
        raw = zlib.decompress(data[9:])
    except zlib.error as e:
        raise ValueError(f"corrupt DCT payload: {e}") from e
    coeffs = np.frombuffer(raw, dtype="<i2")
    if coeffs.size != 3 * n:
        raise ValueError(f"truncated DCT payload: {coeffs.size} != {3 * n}")
    m, q = _dct_mat(), _qtbl(quality)
    out = np.empty((ph, pw, 3), dtype=np.float64)
    for c in range(3):
        blk = coeffs[c * n : (c + 1) * n].reshape(ph // 8, pw // 8, 8, 8) * q
        out[..., c] = _unblocks(np.einsum("ji,abjk,kl->abil", m, blk, m)) + 128.0
    return _ycbcr_to_rgb(out[:h, :w])


# ------------------------------------------------------------------ registry

ENCODERS = {"ppm": encode_ppm, "bmp": encode_bmp, "png": encode_png,
            "dct": encode_dct}
DECODERS = {"ppm": decode_ppm, "bmp": decode_bmp, "png": decode_png,
            "dct": decode_dct}

#: formats where decode(encode(x)) != x — the PSNR>=40dB gate binds here
LOSSY = frozenset({"dct"})


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    return ENCODERS[fmt](img)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    return DECODERS[fmt](bytes(data))


# ------------------------------------------------------------------- metrics


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf when identical)."""
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def phash64(img: np.ndarray) -> int:
    """Block-mean perceptual hash -> signed int64.

    Grayscale -> 8x8 block means -> bit i set iff block > median. Deterministic
    and numpy-only (the DCT-based variant needs no external lib either, but
    block-mean is enough for a corpus-integrity column).
    """
    gray = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blocks[i, j] = gray[ys[i] : max(ys[i + 1], ys[i] + 1),
                                xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
    bits = (blocks > np.median(blocks)).flatten()
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    if val >= 1 << 63:  # two's-complement into int64 range
        val -= 1 << 64
    return val


def _check_rgb(img: np.ndarray) -> None:
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError(f"expected HxWx3 uint8, got {img.shape} {img.dtype}")
