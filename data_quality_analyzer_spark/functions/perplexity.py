"""KenLM-style char-trigram language model for gibberish detection.

Hash-bucketed trigram/bigram counts with add-k smoothing, trained
deterministically from the embedded seed corpus (all languages pooled).
Perplexity here = 2^(mean neg log2 P(c3 | c1 c2)) over the byte stream.

Same train-once / broadcast / numpy-inner-loop design as ``langid``; the
pandas oracle calls the identical :func:`score_batch`.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from ..sources import seed_corpus

TRI_BUCKETS = 1 << 18
BI_BUCKETS = 1 << 16
_MULT = 2654435761
ADD_K = 0.05
VOCAB_SIZE = 256
TRAIN_SENTENCES_PER_LANG = 400
TRAIN_SEED = 1234
# keep/drop threshold for the gibberish rule: in-domain text scores ≤ ~4,
# uniform-letter gibberish ≥ ~29 — 12 sits far from both tails.
MAX_PERPLEXITY = 12.0


def _tri_bi_ids(text: str) -> tuple[np.ndarray, np.ndarray]:
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.int64)
    if len(b) < 3:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    tri = (b[:-2] << 16) | (b[1:-1] << 8) | b[2:]
    bi = (b[:-2] << 8) | b[1:-1]
    return (tri * _MULT) & (TRI_BUCKETS - 1), (bi * _MULT) & (BI_BUCKETS - 1)


@dataclass(frozen=True)
class CharLM:
    tri_counts: np.ndarray  # float32 [TRI_BUCKETS]
    bi_counts: np.ndarray  # float32 [BI_BUCKETS]

    def perplexity(self, text: str) -> float:
        tri, bi = _tri_bi_ids(text.lower())
        if tri.size == 0:
            return float("inf")
        p = (self.tri_counts[tri] + ADD_K) / (
            self.bi_counts[bi] + ADD_K * VOCAB_SIZE
        )
        return float(2.0 ** (-np.mean(np.log2(p))))


def train_charlm(
    sentences_per_lang: int = TRAIN_SENTENCES_PER_LANG, seed: int = TRAIN_SEED
) -> CharLM:
    tri_counts = np.zeros(TRI_BUCKETS, dtype=np.float64)
    bi_counts = np.zeros(BI_BUCKETS, dtype=np.float64)
    for lang in seed_corpus.LANGS:
        for s in seed_corpus.sentences(lang, sentences_per_lang, seed):
            tri, bi = _tri_bi_ids(s.lower())
            np.add.at(tri_counts, tri, 1.0)
            np.add.at(bi_counts, bi, 1.0)
    return CharLM(tri_counts.astype(np.float32), bi_counts.astype(np.float32))


_MODEL: CharLM | None = None


def get_model() -> CharLM:
    global _MODEL
    if _MODEL is None:
        _MODEL = train_charlm()
    return _MODEL


def score_batch(texts: pd.Series, model: CharLM) -> pd.Series:
    out = np.full(len(texts), np.inf, dtype=np.float64)
    for i, t in enumerate(texts):
        if isinstance(t, str) and t:
            out[i] = model.perplexity(t)
    return pd.Series(out)


def perplexity_udf(spark):
    """Arrow-vectorized perplexity scorer (double), weights broadcast."""
    from pyspark.sql import functions as F

    bc = spark.sparkContext.broadcast(get_model())

    @F.pandas_udf("double")
    def _ppl(s: pd.Series) -> pd.Series:
        return score_batch(s, bc.value)

    return _ppl
