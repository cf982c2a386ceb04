"""Image payload codec — pure numpy + zlib, no external image libraries.

The mandated corpus shape carries an encoded image per page
(``BASELINE.json.input_hint``: ``bytes binary, w, h, fmt, caption,
phash``) and a per-row invariant: decoded-pixel allclose / PSNR >= 40 dB
for lossy formats, plus caption equality.

This container has no PIL/opencv, so:

* ``png`` is a REAL minimal PNG codec (8-bit RGB, filter 0, zlib) —
  lossless round-trip, verifiable with any external PNG reader.
* ``qjpg`` is a DETERMINISTIC LOSSY STAND-IN for JPEG (uniform 2-bit
  quantization per channel, then PNG-container encode). Quantization
  step 4 gives MSE ~1.25 → PSNR ~47 dB, comfortably above the 40 dB
  gate. It exercises the same plumbing (binary column, lossy verify
  path) without a DCT implementation; swap in a real JPEG codec where
  one is available. Clearly marked per the multimodal-stub guidance.

All functions are deterministic (seeded from ``image_id`` via
splitmix64) and batch-friendly: the Spark-side entry points in
:mod:`sitemapper_spark.operators.multimodal` call these from
Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "splitmix64",
    "synth_pixels",
    "png_encode",
    "png_decode",
    "lossy_encode",
    "encode_image",
    "decode_image",
    "psnr",
    "dhash64",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_QJPG_STEP = 4  # quantization step of the lossy stand-in


def splitmix64(x: int) -> int:
    """Deterministic 64-bit mixer (public splitmix64 constants)."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def _seed_of(image_id: str) -> int:
    h = 0xCBF29CE484222325  # FNV-1a 64
    for b in image_id.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return splitmix64(h)


def synth_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 pixels seeded from ``image_id``."""
    rng = np.random.Generator(np.random.PCG64(_seed_of(image_id)))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray) -> bytes:
    """Minimal 8-bit RGB PNG (filter type 0 on every scanline)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """Decode PNGs produced by :func:`png_encode` (filter 0, RGB8)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = 0
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
            if bit_depth != 8 or color_type != 2:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w * 3 + 1)
    if not (raw[:, 0] == 0).all():
        raise ValueError("unsupported PNG filter")
    return raw[:, 1:].reshape(h, w, 3).copy()


def lossy_encode(pixels: np.ndarray) -> bytes:
    """Deterministic lossy stand-in: quantize then PNG-encode."""
    q = ((pixels.astype(np.int16) // _QJPG_STEP) * _QJPG_STEP + _QJPG_STEP // 2).clip(
        0, 255
    ).astype(np.uint8)
    return b"QJPG" + png_encode(q)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(pixels)
    if fmt in ("jpeg", "qjpg"):
        return lossy_encode(pixels)
    raise NotImplementedError(f"image format {fmt!r} (no image libs in container)")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return png_decode(data)
    if fmt in ("jpeg", "qjpg"):
        if data[:4] != b"QJPG":
            raise NotImplementedError(
                "real JPEG decode requires an image library not in this container"
            )
        return png_decode(data[4:])
    raise NotImplementedError(f"image format {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf when identical)."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def dhash64(pixels: np.ndarray) -> int:
    """Perceptual difference-hash (8x9 block-mean grayscale → 64 bits).

    Stand-in for the reference corpus's ``phash`` column; deterministic
    and shift-tolerant enough for near-dup grouping tests.
    """
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = np.linspace(0, h, 9, dtype=np.int64)
    xs = np.linspace(0, w, 10, dtype=np.int64)
    block = np.empty((8, 9), dtype=np.float64)
    for i in range(8):
        for j in range(9):
            block[i, j] = gray[ys[i] : max(ys[i + 1], ys[i] + 1),
                               xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
    bits = (block[:, 1:] > block[:, :-1]).flatten()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    # two's-complement into signed int64 range for a Spark LongType column
    return v - (1 << 64) if v >= (1 << 63) else v
