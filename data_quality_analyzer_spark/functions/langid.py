"""fastText-style language identification: hashed char-n-gram features +
linear (multinomial naive Bayes) classifier, trained deterministically from
the embedded seed corpus (no external models exist in the sandbox;
SURVEY §7.0).

Engine side: an Arrow-batched ``pandas_udf`` whose weights travel via
``SparkContext.broadcast`` — one deserialization per executor, zero per-row
Python beyond the string walk (inner loops are numpy).  Oracle side: the
same :func:`predict_batch` run in plain pandas — engine-vs-oracle parity is
exact because the model object is byte-identical (seeded training).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from ..sources import seed_corpus

N_BUCKETS = 1 << 15
_MULT = 2654435761  # Knuth multiplicative hash
TRAIN_SENTENCES_PER_LANG = 400
TRAIN_SEED = 1234
ALPHA = 0.5
MIN_CONFIDENCE = 0.05  # per-char top1-top2 log-margin for "confident"


def _ngram_buckets(text: str) -> np.ndarray:
    """Hashed 1/2/3-gram bucket ids of the UTF-8 bytes of ``text``."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.int64)
    feats = [b]
    if len(b) >= 2:
        feats.append((b[:-1] << 8) | b[1:])
    if len(b) >= 3:
        feats.append((b[:-2] << 16) | (b[1:-1] << 8) | b[2:])
    ids = np.concatenate(feats) if feats else np.empty(0, dtype=np.int64)
    return (ids * _MULT) & (N_BUCKETS - 1)


@dataclass(frozen=True)
class LangIdModel:
    langs: tuple[str, ...]
    log_likelihood: np.ndarray  # (n_langs, N_BUCKETS) float32

    def score_text(self, text: str) -> np.ndarray:
        buckets = _ngram_buckets(text)
        if buckets.size == 0:
            return np.zeros(len(self.langs), dtype=np.float64)
        return self.log_likelihood[:, buckets].sum(axis=1) / buckets.size


def train_langid(
    sentences_per_lang: int = TRAIN_SENTENCES_PER_LANG, seed: int = TRAIN_SEED
) -> LangIdModel:
    """Deterministic NB training over the embedded seed corpus."""
    langs = seed_corpus.LANGS
    counts = np.zeros((len(langs), N_BUCKETS), dtype=np.float64)
    for li, lang in enumerate(langs):
        for s in seed_corpus.sentences(lang, sentences_per_lang, seed):
            buckets = _ngram_buckets(s.lower())
            np.add.at(counts[li], buckets, 1.0)
    totals = counts.sum(axis=1, keepdims=True)
    loglik = np.log((counts + ALPHA) / (totals + ALPHA * N_BUCKETS))
    return LangIdModel(langs=langs, log_likelihood=loglik.astype(np.float32))


_MODEL: LangIdModel | None = None


def get_model() -> LangIdModel:
    global _MODEL
    if _MODEL is None:
        _MODEL = train_langid()
    return _MODEL


def predict_batch(texts: pd.Series, model: LangIdModel) -> pd.DataFrame:
    """(lang, confidence) per text — shared by the UDF and the oracle."""
    langs = np.array(model.langs)
    out_lang = np.empty(len(texts), dtype=object)
    out_conf = np.zeros(len(texts), dtype=np.float64)
    for i, t in enumerate(texts):
        if t is None or not isinstance(t, str) or not t.strip():
            out_lang[i] = None
            out_conf[i] = 0.0
            continue
        scores = model.score_text(t.lower())
        order = np.argsort(scores)
        best, second = order[-1], order[-2]
        out_lang[i] = str(langs[best])
        out_conf[i] = float(scores[best] - scores[second])
    return pd.DataFrame({"lang_pred": out_lang, "lang_conf": out_conf})


def langid_udf(spark):
    """Arrow-vectorized langid scorer; weights broadcast once per executor.

    Returns a pandas_udf producing ``struct<lang_pred:string, lang_conf:double>``.
    """
    from pyspark.sql import functions as F

    bc = spark.sparkContext.broadcast(get_model())

    @F.pandas_udf("lang_pred string, lang_conf double")
    def _langid(s: pd.Series) -> pd.DataFrame:
        return predict_batch(s, bc.value)

    return _langid
