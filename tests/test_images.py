"""Image payload invariants (BASELINE.json input_hint): lossless PNG
round-trip exact, lossy stand-in PSNR ≥ 40 dB, deterministic synthesis,
phash stability."""

import numpy as np
import pytest

from sitemapper_spark.functions.images import (
    decode_image,
    dhash64,
    encode_image,
    png_decode,
    png_encode,
    psnr,
    splitmix64,
    synth_pixels,
)


def test_png_roundtrip_exact():
    px = synth_pixels("roundtrip", 33, 17)
    assert np.array_equal(png_decode(png_encode(px)), px)


def test_lossy_psnr_above_40db():
    px = synth_pixels("lossy", 64, 48)
    dec = decode_image(encode_image(px, "qjpg"), "qjpg")
    assert psnr(px, dec) >= 40.0
    assert dec.shape == px.shape


def test_synthesis_deterministic():
    a = synth_pixels("same-id", 16, 12)
    b = synth_pixels("same-id", 16, 12)
    c = synth_pixels("other-id", 16, 12)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_splitmix_deterministic():
    assert splitmix64(42) == splitmix64(42)
    assert splitmix64(42) != splitmix64(43)
    assert 0 <= splitmix64(123) < (1 << 64)


def test_dhash_stable_and_signed():
    px = synth_pixels("hash-me", 32, 24)
    h1, h2 = dhash64(px), dhash64(px)
    assert h1 == h2
    assert -(1 << 63) <= h1 < (1 << 63)
    # near-identical image (mild quantization) → small hamming distance
    near = decode_image(encode_image(px, "qjpg"), "qjpg")
    ham = bin((h1 & (2**64 - 1)) ^ (dhash64(near) & (2**64 - 1))).count("1")
    assert ham <= 8


def test_unknown_format_raises():
    px = synth_pixels("x", 8, 8)
    with pytest.raises(NotImplementedError):
        encode_image(px, "webp")
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0realjpeg", "jpeg")
