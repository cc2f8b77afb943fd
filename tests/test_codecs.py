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


def test_dqj_lossy_codec_psnr_and_magic():
    """The DQJ lossy codec meets the north-rule gate at default quality
    (PSNR ≥ 40 dB even on pure noise — the DCT's worst case), sniffs by
    magic, and degrades measurably at low quality (it IS lossy)."""
    rng = np.random.default_rng(7)
    for shape in [(24, 31), (16, 16, 3), (7, 9, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        blob = C.encode_dqj(img)
        assert C.sniff_format(blob) == "dqj"
        dec = C.decode_dqj(blob)
        assert dec.shape == img.shape and dec.dtype == np.uint8
        assert C.psnr(img, dec) >= 40.0
        # a second generation at the same quality stays comfortably high
        assert C.psnr(dec, C.decode_dqj(C.encode_dqj(dec))) >= 40.0
    img = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    assert C.psnr(img, C.decode_dqj(C.encode_dqj(img, quality=50))) < 30.0
    # corrupt payloads raise CodecError, never garbage pixels
    blob = C.encode_dqj(img)
    import pytest

    with pytest.raises(C.CodecError):
        C.decode_dqj(blob[:-9])
    with pytest.raises(C.CodecError):
        C.decode_dqj(b"DQJ1" + blob[4:8])


def test_dqj_decode_matches_independent_dct_reference():
    """Decoder fidelity — the actual north-rule invariant ('decoded-pixel
    allclose vs the reference'): the vectorized einsum decode must equal a
    brute-force per-block double-loop DCT reference exactly."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    blob = C.encode_dqj(img, quality=80)
    got = C.decode_dqj(blob)

    import struct as st
    import zlib as zl

    h, w, nch, quality = st.unpack(">HHBB", blob[4:10])
    q = C._dqj_qtable(quality)
    nbh, nbw = (h + 7) // 8, (w + 7) // 8
    coefs = np.frombuffer(zl.decompress(blob[10:]), dtype="<i2").astype(
        np.float64
    ).reshape(nch, nbh, nbw, 8, 8)
    D = C._DCT8
    full = np.zeros((nbh * 8, nbw * 8))
    for bi in range(nbh):
        for bj in range(nbw):
            block = coefs[0, bi, bj] * q
            # brute-force inverse DCT-II: B[x,y] = Σ_u Σ_v D[u,x] D[v,y] C[u,v]
            out = np.zeros((8, 8))
            for x in range(8):
                for y in range(8):
                    out[x, y] = sum(
                        D[u, x] * D[v, y] * block[u, v]
                        for u in range(8)
                        for v in range(8)
                    )
            full[bi * 8 : bi * 8 + 8, bj * 8 : bj * 8 + 8] = out
    want = np.clip(np.round(full + 128.0), 0, 255).astype(np.uint8)[:h, :w]
    assert np.array_equal(got, want)


def test_dqj_psnr_floor_tracks_measured_worst_case():
    """The header-only analytic floor (quantization-noise estimate, the
    actual gate) tracks measured PSNR on uint8 noise — the DCT worst case —
    within ~1 dB, is monotone in quality, and puts the 40 dB boundary
    between q=94 (fail) and q=95 (pass)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    floors = []
    for q in (99, 97, 95, 94, 80, 60):
        blob = C.encode_dqj(img, quality=q)
        floor = C.dqj_psnr_floor(blob)
        measured = C.psnr(img, C.decode_dqj(blob))
        assert abs(floor - measured) < 1.0, (q, floor, measured)
        floors.append(floor)
    assert floors == sorted(floors, reverse=True)
    assert C.dqj_psnr_floor(C.encode_dqj(img, quality=95)) >= 40.0
    assert C.dqj_psnr_floor(C.encode_dqj(img, quality=94)) < 40.0
    assert C.dqj_psnr_floor(C.encode_dqj(img)) >= 40.0  # default quality
    # structured content does strictly better than the floor (it IS a floor)
    grad = (np.linspace(0, 255, 64)[None, :] * np.ones((64, 1))).astype(np.uint8)
    blob = C.encode_dqj(grad, quality=80)
    assert C.psnr(grad, C.decode_dqj(blob)) > C.dqj_psnr_floor(blob)
    import pytest

    with pytest.raises(C.CodecError):
        C.dqj_psnr_floor(b"PNG whatever")


def test_validator_psnr_gate_on_lossy_rows(spark):
    """End-to-end through the Spark image validator: a default-quality DQJ
    (lossy) row passes the PSNR≥40 gate and all other flags; a low-quality
    DQJ row decodes fine but FAILS psnr_ok; lossless rows keep their
    vacuously-true psnr_ok; a corrupt DQJ payload is not decodable."""
    import pandas as pd

    from data_quality_analyzer_spark.operators.images import image_validator_udf

    grad = (
        (np.linspace(0, 255, 48)[None, :] * np.ones((32, 1)))
        .astype(np.uint8)
    )
    rgb = np.stack([grad, grad[::-1], grad], axis=-1)
    dqj = C.encode_dqj(rgb)
    lowq = C.encode_dqj(rgb, quality=60)
    png = C.encode_png(rgb)
    rows = [
        ("lossy", bytearray(dqj), 48, 32, "dqj"),
        ("lowq", bytearray(lowq), 48, 32, "dqj"),
        ("lossless", bytearray(png), 48, 32, "png"),
        ("corrupt", bytearray(dqj[:-7]), 48, 32, "dqj"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    from pyspark.sql import functions as F

    out = {
        r["image_id"]: r
        for r in df.select(
            "image_id",
            image_validator_udf()(
                F.col("bytes"), F.col("w"), F.col("h"), F.col("fmt")
            ).alias("v"),
        ).select("image_id", "v.*").collect()
    }
    lossy = out["lossy"]
    assert lossy["magic_ok"] and lossy["decodable"] and lossy["dims_match"]
    assert lossy["psnr_ok"], "DQJ default quality must clear the 40 dB floor"
    assert out["lowq"]["decodable"] and out["lowq"]["dims_match"]
    assert not out["lowq"]["psnr_ok"], "q=60 DQJ must fail the 40 dB floor"
    assert out["lossless"]["decodable"] and out["lossless"]["psnr_ok"]
    assert not out["corrupt"]["decodable"]


def test_ppm_negative_dims_raise_codec_error():
    """Round-5 review: crafted negative dims whose product is positive
    must raise CodecError, not a plain numpy ValueError that escapes the
    per-row handlers."""
    import numpy as np
    import pytest as _pt

    from data_quality_analyzer_spark.sources import codecs as C

    blob = b"P6 -1 -3 255 " + b"\x00" * 9
    with _pt.raises(C.CodecError, match="dimensions"):
        C.decode_ppm(blob)
    with _pt.raises(C.CodecError, match="65535"):
        C.encode_dqj(np.zeros((70000, 1), dtype=np.uint8))
