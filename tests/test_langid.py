"""Model tests: langid holdout accuracy, perplexity separation,
deterministic (re)training."""

from __future__ import annotations

import numpy as np
import pandas as pd

from data_quality_analyzer_spark.functions import langid as L
from data_quality_analyzer_spark.functions import perplexity as P
from data_quality_analyzer_spark.sources import seed_corpus as SCorp


def test_langid_holdout_accuracy():
    m = L.get_model()
    rows, langs = [], []
    for lang in SCorp.LANGS:
        s = SCorp.sentences(lang, 100, seed=999)  # unseen seed
        rows += s
        langs += [lang] * 100
    pred = L.predict_batch(pd.Series(rows), m)
    acc = (pred["lang_pred"] == pd.Series(langs)).mean()
    assert acc >= 0.99
    assert (pred["lang_conf"] > 0).all()


def test_langid_nulls_and_blank():
    m = L.get_model()
    pred = L.predict_batch(pd.Series([None, "", "   "]), m)
    assert pred["lang_pred"].isna().all()
    assert (pred["lang_conf"] == 0.0).all()


def test_perplexity_separation():
    lm = P.get_model()
    nat = pd.Series(SCorp.sentences("en", 50, seed=777) + SCorp.sentences("de", 50, seed=778))
    gib = pd.Series(SCorp.gibberish(50, seed=779))
    pn = P.score_batch(nat, lm)
    pg = P.score_batch(gib, lm)
    assert pn.max() < P.MAX_PERPLEXITY < pg.min()


def test_training_deterministic():
    a = L.train_langid()
    b = L.train_langid()
    assert np.array_equal(a.log_likelihood, b.log_likelihood)
    la = P.train_charlm()
    lb = P.train_charlm()
    assert np.array_equal(la.tri_counts, lb.tri_counts)


def test_langid_batch_matches_per_row_reference():
    """The chunk-vectorized predict_batch must agree with the per-row
    score_text form: identical labels, confidence within the float32
    summation-order drift band (<2e-3 absolute, measured 1.6e-3 max)."""
    m = L.get_model()
    texts = (
        SCorp.sentences("en", 30, seed=31)
        + SCorp.sentences("fr", 30, seed=32)
        + ["a", "ab", "abc", "x" * 2000, "日本語のテスト", "\tpadded\n", "éàü"]
    )
    pred = L.predict_batch(pd.Series(texts), m)
    langs = np.array(m.langs)
    for i, t in enumerate(texts):
        sc = m.score_text(t.lower())
        order = np.argsort(sc)
        assert pred["lang_pred"].iloc[i] == str(langs[order[-1]]), t
        ref_conf = float(sc[order[-1]] - sc[order[-2]])
        assert abs(pred["lang_conf"].iloc[i] - ref_conf) < 2e-3, t


def test_langid_chunk_boundary_invariance():
    """Row results must not depend on where the scoring chunk boundary
    falls (shrink the chunk so a batch spans several)."""
    m = L.get_model()
    texts = pd.Series(SCorp.sentences("de", 25, seed=41) + [None, "", "ok then"])
    whole = L.predict_batch(texts, m)
    old = L._SCORE_CHUNK
    try:
        L._SCORE_CHUNK = 7
        split = L.predict_batch(texts, m)
    finally:
        L._SCORE_CHUNK = old
    assert whole["lang_pred"].equals(split["lang_pred"])
    assert np.allclose(whole["lang_conf"], split["lang_conf"])


def test_perplexity_batch_matches_per_row_reference():
    lm = P.get_model()
    texts = (
        SCorp.sentences("en", 30, seed=51)
        + ["a", "ab", "abc", "x" * 2000, "éàü", "mixed 日本語 text"]
    )
    got = P.score_batch(pd.Series(texts), lm)
    for i, t in enumerate(texts):
        ref = lm.perplexity(t)
        if np.isinf(ref):
            assert np.isinf(got.iloc[i]), t
        else:
            assert abs(got.iloc[i] - ref) / ref < 1e-3, t


def test_trailing_short_text_does_not_truncate_previous_row():
    """Regression: a chunk ending in a row with zero n-grams of some size
    (1-2 byte text) must not truncate the PREVIOUS row's gram sum.  The old
    clamped-reduceat form lost the last element of the preceding segment
    (score_batch(['hello world this is text','ab']) = 7.13 vs 9.17)."""
    lm = P.get_model()
    long_txt = "hello world this is text"
    ref = lm.perplexity(long_txt)
    for tail in ["ab", "a", ""]:
        got = P.score_batch(pd.Series([long_txt, tail]), lm)
        assert abs(got.iloc[0] - ref) / ref < 1e-6, tail
        assert np.isinf(got.iloc[1])
    m = L.get_model()
    ref_sc = m.score_text("hello world")
    ref_order = np.argsort(ref_sc)
    ref_conf = float(ref_sc[ref_order[-1]] - ref_sc[ref_order[-2]])
    for tail in ["a", "ab"]:  # 1 byte: no bi/tri-grams; 2 bytes: no trigrams
        pred = L.predict_batch(pd.Series(["hello world", tail]), m)
        assert abs(pred["lang_conf"].iloc[0] - ref_conf) < 2e-3, tail


def test_perplexity_short_and_null_rows():
    lm = P.get_model()
    got = P.score_batch(pd.Series([None, "", "a", "ab", 3.5]), lm)
    assert np.isinf(got).all()


def test_perplexity_chunk_boundary_invariance():
    lm = P.get_model()
    texts = pd.Series(SCorp.sentences("es", 25, seed=61) + ["", None, "tail row"])
    whole = P.score_batch(texts, lm)
    old = P._SCORE_CHUNK
    try:
        P._SCORE_CHUNK = 5
        split = P.score_batch(texts, lm)
    finally:
        P._SCORE_CHUNK = old
    assert np.allclose(whole.fillna(np.inf), split.fillna(np.inf))
