"""Trained quality classifier: holdout accuracy, determinism, batch/
per-row/DuckDB-twin parity, pipeline-rule wiring, and the documented
division of labor with the heuristic repetition rule."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from data_quality_analyzer_spark.functions import quality_clf as Q
from data_quality_analyzer_spark.sources import seed_corpus as SCorp


def _holdout():
    good = []
    for lang in SCorp.LANGS:
        good += SCorp.sentences(lang, 60, seed=999)  # unseen seed
    bad = Q.bad_corpus(80, seed=777)                 # unseen seed
    return good, bad


def test_holdout_accuracy():
    m = Q.get_model()
    good, bad = _holdout()
    gs = Q.score_batch(pd.Series(good), m)
    bs = Q.score_batch(pd.Series(bad), m)
    acc = ((gs >= 0.5).sum() + (bs < 0.5).sum()) / (len(gs) + len(bs))
    assert acc >= 0.95
    # the pipeline gate separates with margin on BOTH sides
    assert gs.min() > Q.MIN_QUALITY_SCORE
    assert bs.max() < Q.MIN_QUALITY_SCORE


def test_training_deterministic():
    a = Q.train_quality()
    b = Q.train_quality()
    assert np.array_equal(a.weights, b.weights)


def test_batch_matches_per_row_reference():
    m = Q.get_model()
    good, bad = _holdout()
    texts = good[:15] + bad[:15] + ["ab", "abc", "日本語テキストです"]
    got = Q.score_batch(pd.Series(texts + [None]), m)
    for i, t in enumerate(texts):
        assert got.iloc[i] == pytest.approx(m.score_text(t), abs=1e-9), t
    assert got.iloc[-1] == 0.0          # null -> 0.0
    # trailing short row must not truncate the previous row's segment
    # (the reduceat regression class)
    two = Q.score_batch(pd.Series([texts[0], "ab"]), m)
    assert two.iloc[0] == pytest.approx(m.score_text(texts[0]), abs=1e-9)
    assert two.iloc[1] == 0.0


def test_duckdb_twin_parity():
    m = Q.get_model()
    good, bad = _holdout()
    df = pd.DataFrame({"t": good[:25] + bad[:25] + ["ab", "abc"]})
    con = duckdb.connect()
    con.register("x", df)
    duck = con.sql(f"SELECT {Q.score_duck_sql('t')} AS s FROM x").df()["s"]
    ours = Q.score_batch(df["t"], m)
    assert np.abs(duck.to_numpy() - ours.to_numpy()).max() < 1e-12


def test_repetition_owned_by_heuristic_rule():
    """Documented division of labor: single-token repetition is built from
    natural trigrams, so the classifier may score it HIGH — the heuristic
    distinct-token-ratio rule is what drops it."""
    from data_quality_analyzer_spark.functions import text as TX

    rep = " ".join(["table"] * 30)
    # heuristic rule catches it regardless of the classifier
    assert (1 / 30) < TX.MIN_DISTINCT_RATIO


def test_pipeline_rule_wired(spark, corpus_path):
    """quality_score column + pass_quality_clf flag exist in the pipeline
    output; gated rows (no caption) score 0.0 and fail the rule."""
    from data_quality_analyzer_spark.plans.pipeline import run_pipeline

    images = spark.read.parquet(corpus_path)
    out = run_pipeline(spark, images).select(
        "image_id", "caption", "quality_score", "pass_quality_clf", "keep"
    )
    rows = out.collect()
    assert any(r["pass_quality_clf"] for r in rows)
    for r in rows:
        if r["caption"] is None or (r["caption"] or "").strip() == "":
            assert r["quality_score"] == 0.0
            assert not r["pass_quality_clf"]
