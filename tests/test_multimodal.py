"""Multimodal operator plumbing: real image features/resize, stubbed
audio/video with deterministic fakes (schema + batch shape are the test)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_quality_analyzer_spark.operators import multimodal as MM
from data_quality_analyzer_spark.sources import codecs as C


@pytest.fixture(scope="module")
def image_df(spark):
    rng = np.random.default_rng(5)
    rows = []
    for i in range(20):
        img = rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
        rows.append((f"im{i}", C.encode_png(img)))
    rows.append(("bad", b"corrupt"))
    rows.append(("null", None))
    pdf = pd.DataFrame(rows, columns=["image_id", "bytes"])
    return spark.createDataFrame(pdf)


def test_image_features(spark, image_df):
    feats = MM.extract_image_features(image_df).toPandas().set_index("image_id")
    assert feats.loc["im0", "decode_ok"]
    assert feats.loc["im0", "width"] == 12 and feats.loc["im0", "height"] == 16
    assert 0 <= feats.loc["im0", "mean_r"] <= 255
    assert not feats.loc["bad", "decode_ok"]
    assert not feats.loc["null", "decode_ok"]
    assert feats["decode_ok"].sum() == 20


def test_resize(spark, image_df):
    out = MM.resize_images(image_df, 8, 8).toPandas()
    assert len(out) == 20  # corrupt + null dropped
    assert (out["w"] == 8).all() and (out["h"] == 8).all()
    img = C.decode(bytes(out["bytes"].iloc[0]))
    assert img.shape == (8, 8, 3)


def test_audio_stub_and_fake(spark):
    pdf = pd.DataFrame(
        {
            "clip_id": ["a", "b", "c"],
            "bytes": [
                np.arange(100, dtype=np.int16).tobytes(),
                b"\x00\x01",
                None,
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    # stub: plumbing runs, decode_ok all false
    stub = MM.extract_audio_features(df).toPandas()
    assert (~stub["decode_ok"]).all()
    # fake decoder: features computed
    fake = MM.extract_audio_features(df, use_fake_decoder=True).toPandas().set_index("clip_id")
    assert fake.loc["a", "decode_ok"] and fake.loc["a", "n_samples"] == 100
    assert fake.loc["a", "sample_rate"] == 16000
    assert not fake.loc["c", "decode_ok"]


def test_video_frame_sampling(spark):
    rng = np.random.default_rng(6)
    frames = [C.encode_png(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)) for _ in range(25)]
    blob = b"".join(len(f).to_bytes(4, "big") + f for f in frames)
    df = spark.createDataFrame(pd.DataFrame({"video_id": ["v1"], "bytes": [blob]}))
    out = MM.sample_video_frames(df, every_n=10, use_fake_decoder=True).toPandas()
    assert list(out["frame_index"]) == [0, 10, 20]  # 25 frames sampled every 10
    decoded = C.decode(bytes(out["frame_bytes"].iloc[0]))
    assert decoded.shape == (8, 8, 3)
    # stub path: one decode_ok=False row per video
    stub = MM.sample_video_frames(df, every_n=10).toPandas()
    assert len(stub) == 1 and not stub["decode_ok"].iloc[0]


def test_wav_pcm_decodes_for_real(spark):
    """Uncompressed WAV decodes via stdlib wave+numpy (no fake decoder):
    a synthesized sine clip yields the exact sample count, rate, and RMS;
    non-WAV bytes still fall through to decode_ok = false."""
    import io
    import wave

    import numpy as np

    from data_quality_analyzer_spark.operators import multimodal as MM

    sr, n = 8000, 4000
    t = np.arange(n) / sr
    mono = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(mono.tobytes())
    wav_bytes = buf.getvalue()

    # stereo variant: mean-to-mono must preserve the sample count
    buf2 = io.BytesIO()
    stereo = np.repeat(mono, 2)
    with wave.open(buf2, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(stereo.tobytes())

    df = spark.createDataFrame(
        [("a", bytearray(wav_bytes)), ("b", bytearray(buf2.getvalue())),
         ("c", bytearray(b"\x00\x01not audio")), ("d", None)],
        "clip_id string, bytes binary",
    )
    out = {r["clip_id"]: r for r in MM.extract_audio_features(df).collect()}
    exp_rms = float(np.sqrt(np.mean((mono.astype(np.float64) / 32768.0) ** 2)))
    assert out["a"]["decode_ok"] and out["a"]["n_samples"] == n
    assert out["a"]["sample_rate"] == sr
    assert abs(out["a"]["rms"] - exp_rms) < 1e-9
    assert out["b"]["decode_ok"] and out["b"]["n_samples"] == n
    assert not out["c"]["decode_ok"] and not out["d"]["decode_ok"]


def test_corrupt_wav_reads_decode_failed(spark):
    """Round-5 review: a blob with valid RIFF/WAVE magic but a corrupt
    body must read decode_ok=False, not kill the Arrow batch."""
    from data_quality_analyzer_spark.operators import multimodal as MM

    corrupt = b"RIFF" + b"\x00\x00\x00\x00" + b"WAVE" + b"\x01\x02"
    df = spark.createDataFrame(
        [(1, bytearray(corrupt)), (2, None)], "clip_id long, bytes binary"
    )
    got = {
        r["clip_id"]: r["decode_ok"]
        for r in MM.extract_audio_features(df).collect()
    }
    assert got == {"1": False, "2": False}


def test_video_garbage_blob_emits_marker_row(spark):
    """Round-5 review: a fake-decoder blob that yields zero frames (and a
    NULL blob) must emit an explicit decode_ok=False row instead of
    silently vanishing."""
    from data_quality_analyzer_spark.operators import multimodal as MM

    garbage = (99999).to_bytes(4, "big") + b"xx"  # length overruns data
    df = spark.createDataFrame(
        [(1, bytearray(garbage)), (2, None)], "video_id long, bytes binary"
    )
    rows = MM.sample_video_frames(df, use_fake_decoder=True).collect()
    got = {(r["video_id"], r["decode_ok"]) for r in rows}
    assert got == {("1", False), ("2", False)}


# ---------------------------------------------------------------------------
# Metadata gate (round 5): catalog-column reject before any decode
# ---------------------------------------------------------------------------


def test_metadata_gate_reasons(spark):
    from data_quality_analyzer_spark.operators import images as IM

    rows = [
        # (id, w, h, nbytes-proxy, expected reason)
        (0, 512, 512, b"x" * 40_000, "keep"),
        (1, None, 512, b"x" * 40_000, "bad_metadata"),
        (2, 0, 512, b"x" * 40_000, "bad_metadata"),
        (3, 32, 512, b"x" * 40_000, "too_small"),
        (4, 32768, 512, b"x" * 40_000, "too_large"),
        (5, 2048, 512, b"x" * 200_000, "extreme_aspect"),
        (6, 512, 512, b"x" * 100, "implausible_bytes"),  # bpp ~0.0004
        (7, 128, 128, b"x" * 1_000_000, "implausible_bytes"),  # bpp ~61
        (8, 512, 512, b"", "bad_metadata"),
    ]
    df = spark.createDataFrame(
        [(i, w, h, b) for i, w, h, b, _ in rows],
        "image_id long, w int, h int, bytes binary",
    )
    got = {
        r["image_id"]: r["why"]
        for r in IM.metadata_gate(df, reason_col="why").collect()
    }
    for i, _w, _h, _b, want in rows:
        assert got[i] == want, (i, got[i], want)
    kept = IM.metadata_gate(df).select("image_id").collect()
    assert [r["image_id"] for r in kept] == [0]
    # map-only: the gate adds no exchange
    plan = (
        IM.metadata_gate(df.coalesce(1))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_metadata_gate_in_prep_corpus(spark, tmp_path):
    """prep_corpus(metadata_gate=True) drops the implausible row before
    the decode UDF and keeps the valid corpus flowing."""
    from data_quality_analyzer_spark.plans.prep import prep_corpus
    from data_quality_analyzer_spark.sources.fixtures import generate_corpus

    pdf = generate_corpus(60, seed=7)
    # plant one row whose metadata alone disqualifies it (1x5000 banner)
    bad = pdf.iloc[[0]].copy()
    bad["image_id"] = "planted-banner"
    bad["w"], bad["h"] = 5000, 1
    pdf = pd.concat([pdf, bad], ignore_index=True)
    sdf = spark.createDataFrame(pdf)
    out = prep_corpus(spark, sdf, metadata_gate=True).select("image_id")
    ids = {r["image_id"] for r in out.collect()}
    assert "planted-banner" not in ids
    assert len(ids) > 0


def test_ar_buckets_assignment_and_crop_math(spark):
    from data_quality_analyzer_spark.operators import images as IM

    rows = [
        # (id, w, h, expected (bucket_w, bucket_h))
        (0, 1024, 1024, (1024, 1024)),   # exact square
        (1, 512, 2048, (512, 2048)),     # exact tallest bucket
        (2, 3000, 1000, (1792, 576)),    # 3:1 → widest-but-one ~3.11 beats 2048/512=4
        (3, 100, 401, (512, 2048)),      # beyond tallest → clamps to extreme
        (4, 1025, 1024, (1024, 1024)),   # epsilon off square stays square
        (5, None, 1024, None),
        (6, 0, 1024, None),
    ]
    df = spark.createDataFrame(
        [(i, w, h) for i, w, h, _ in rows], "image_id long, w int, h int"
    )
    out = {r["image_id"]: r for r in IM.assign_ar_buckets(df).collect()}
    for i, _w, _h, want in rows:
        r = out[i]
        if want is None:
            assert r["bucket_idx"] is None and r["bucket_w"] is None
            continue
        assert (r["bucket_w"], r["bucket_h"]) == want, (i, r)
        # cover invariant: resized image fully covers the bucket
        assert r["resize_w"] >= r["bucket_w"] and r["resize_h"] >= r["bucket_h"]
        # one axis matches the bucket exactly (scale-to-cover)
        assert r["resize_w"] == r["bucket_w"] or r["resize_h"] == r["bucket_h"]
        assert r["crop_x"] == (r["resize_w"] - r["bucket_w"]) // 2
        assert r["crop_y"] == (r["resize_h"] - r["bucket_h"]) // 2

    # map-only: assignment adds no exchange
    plan = (
        IM.assign_ar_buckets(df.coalesce(1))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_ar_bucket_duck_twin_agrees(spark):
    """The DuckDB bucket-index twin matches Spark on a dense grid of
    aspect ratios (including ties and extremes)."""
    import duckdb

    from data_quality_analyzer_spark.operators import images as IM

    dims = [(w, h) for w in range(50, 1600, 97) for h in range(50, 1600, 131)]
    df = spark.createDataFrame(dims, "w int, h int")
    got = {
        (r["w"], r["h"]): r["bucket_idx"]
        for r in df.selectExpr(
            "w", "h", IM.ar_bucket_idx_spark_sql("w", "h") + " AS bucket_idx"
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT * FROM (VALUES " +
                ", ".join(f"({w}, {h})" for w, h in dims) + ") t(w, h)")
    want = {
        (w, h): idx
        for w, h, idx in con.execute(
            f"SELECT w, h, {IM.ar_bucket_idx_duck_sql('w', 'h')} FROM d"
        ).fetchall()
    }
    assert got == want
