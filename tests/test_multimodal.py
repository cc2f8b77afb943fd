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
