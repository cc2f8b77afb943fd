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
