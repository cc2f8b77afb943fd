"""Codec unit tests: roundtrips, every PNG filter type, PSNR, error paths."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from data_quality_analyzer_spark.sources import codecs as C


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("shape", [(8, 8), (16, 24), (33, 17), (1, 1)])
def test_roundtrips(rng, shape):
    gray = rng.integers(0, 256, size=shape, dtype=np.uint8)
    rgb = rng.integers(0, 256, size=shape + (3,), dtype=np.uint8)
    assert np.array_equal(C.decode_png(C.encode_png(gray)), gray)
    assert np.array_equal(C.decode_png(C.encode_png(rgb)), rgb)
    assert np.array_equal(C.decode_ppm(C.encode_ppm(rgb)), rgb)
    assert np.array_equal(C.decode_bmp(C.encode_bmp(rgb)), rgb)


def test_png_all_filters(rng):
    """Decode a PNG whose rows cycle through filters 0..4."""
    img = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    h, w = img.shape[:2]
    stride = w * 3
    rows = img.reshape(h, stride).astype(np.int16)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        f = y % 5
        cur = rows[y]
        enc = np.zeros(stride, dtype=np.int16)
        for x in range(stride):
            left = cur[x - 3] if x >= 3 else 0
            up = prev[x]
            ul = prev[x - 3] if x >= 3 else 0
            base = [cur[x], cur[x] - left, cur[x] - up,
                    cur[x] - ((left + up) >> 1), cur[x] - paeth(left, up, ul)][f]
            enc[x] = base & 0xFF
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        C.PNG_MAGIC
        + C._png_chunk(b"IHDR", ihdr)
        + C._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + C._png_chunk(b"IEND", b"")
    )
    assert np.array_equal(C.decode_png(data), img)


def test_sniff_and_errors(rng):
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    for fmt in ("png", "ppm", "bmp"):
        assert C.sniff_format(C.ENCODERS[fmt](img)) == fmt
    assert C.sniff_format(b"junk") is None
    assert C.sniff_format(None) is None
    for bad in [b"", b"nonsense", C.encode_png(img)[:20], b"XX" + C.encode_bmp(img)[2:]]:
        with pytest.raises(C.CodecError):
            C.decode(bad)
    with pytest.raises(NotImplementedError):
        C.decode_jpeg_stub(b"\xff\xd8\xff")


def test_psnr(rng):
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    assert C.psnr(img, img) == float("inf")
    noisy = np.clip(img.astype(int) + rng.integers(-2, 3, img.shape), 0, 255).astype(np.uint8)
    assert C.psnr(img, noisy) > 40.0
    flat = np.zeros_like(img)
    assert C.psnr(img, flat) < 15.0
