"""Dedup + similarity operator tests with planted duplicates/near-dups."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_quality_analyzer_spark.operators import dedup as DD
from data_quality_analyzer_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog near the river bank today"
    )
    near = base.replace("today", "tonight")  # high jaccard
    other = "completely different content about spark aggregation pipelines and shuffles"
    rows = [
        (1, base),
        (2, base),          # exact dup of 1
        (3, near),          # near dup of 1
        (4, other),
        (5, other + " with a small suffix appended"),
        (6, None),
        (7, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_exact_duplicates(docs):
    groups = DD.exact_duplicates(docs, "text", "doc_id").collect()
    assert len(groups) == 1
    assert groups[0]["cnt"] == 2
    assert groups[0]["ids"] == [1, 2]


def test_dedup_exact_action(docs):
    kept = DD.dedup_exact(docs, "text", "doc_id")
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [1, 3, 4, 5, 6, 7]  # doc 2 removed, null row retained


def test_minhash_lsh_finds_near_dups(docs):
    pairs = DD.near_duplicates(docs, "text", "doc_id", jaccard_threshold=0.5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert (1, 2) in got and got[(1, 2)] == 1.0  # exact dup
    assert (1, 3) in got and got[(1, 3)] >= 0.5  # near dup
    assert (1, 4) not in got and (2, 4) not in got


def test_simhash_property(docs):
    out = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", DD.simhash("text").alias("sh")
    ).collect()
    by_id = {r["doc_id"]: r["sh"] for r in out}
    assert by_id[1] == by_id[2]  # identical text -> identical simhash
    # near-dup -> small hamming distance
    ham = bin(by_id[1] ^ by_id[3]).count("1")
    ham_far = bin(by_id[1] ^ by_id[4]).count("1")
    assert ham < ham_far


def test_knn_and_lsh(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(50, 16)).astype("float32")
    vecs[7] = vecs[0] + rng.normal(scale=0.01, size=16)  # planted neighbor
    pdf = pd.DataFrame(
        {"vec_id": range(50), "embedding": [v.tolist() for v in vecs]}
    )
    df = spark.createDataFrame(pdf)
    q = df.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    top = SIM.knn_bruteforce(df.filter("vec_id <> 0"), q, k=3).collect()
    assert top[0]["vec_id"] == 7 and top[0]["cos_sim"] > 0.99
    # LSH bucket contains the planted neighbor (same signs region)
    ann = SIM.knn_lsh(df.filter("vec_id <> 0"), q, k=3, bits=4).collect()
    assert any(r["vec_id"] == 7 for r in ann)
    pairs = SIM.pairwise_topk_within_buckets(df, k=5, bits=4).collect()
    assert (pairs[0]["id_a"], pairs[0]["id_b"]) == (0, 7)
