"""Gopher-style n-gram repetition metrics — the published repetition
rules of large-scale corpus filtering (Rae et al. 2021, "Scaling Language
Models: ... Gopher", Table A1: drop documents whose most frequent
2/3/4-gram covers too large a character fraction, or whose duplicated
5..10-grams cover too large a fraction).  The engine's heuristic
``repetition`` rule (``TX.distinct_token_ratio``) catches single-token
loops; these metrics catch PHRASE-level loops (repeated sentences,
navigation blocks, template spam) that keep distinct-token ratio high.

Metric definitions (pinned, identical in Spark / numpy / DuckDB):

* tokens = whitespace split of ``lower(trim(text))``;
* an n-gram's text is ``concat_ws(' ', window)`` — its char length is
  the token lengths plus the n-1 joining spaces;
* ``L`` = char length of ``concat_ws(' ', tokens)`` (the normalized doc);
* ``top_frac(n)``  = min(1, max over distinct n-grams of
  count·len(gram) / L) — the character fraction the single most
  repeated phrase covers;
* ``dup_frac(n)``  = min(1, Σ over n-grams with count ≥ 2 of
  count·len(gram) / L) — the character fraction covered by ALL repeated
  phrases.  Both capped: overlapping windows ("spam spam spam spam")
  can nominally exceed the doc length.

Docs with fewer than n tokens emit no row for that n.

Two physical forms, equal by test:

* :func:`token_ngram_metrics` — the NATIVE analytics form: one explode
  of (n, gram) pairs → two hash aggregates.  Shuffle = total n-gram
  rows (corpus × ~tokens-per-doc × |ns|), the same explode-shape as the
  q49/q50 paths; right for audits and for the q56 oracle-checked query.
* :func:`repetition_metrics_udf` — the MAP-ONLY Arrow kernel for
  filter-stage use at 10^12 rows (no shuffle): chunk-global numpy —
  one utf-32-free token hash pass (``hashing.poly60_token_np``),
  windowed gram hashes combined with the Mersenne mix, per-(doc, gram)
  counts via one lexsort + run-length encoding, per-doc max/sum via
  ``reduceat``.  Gram identity is the 60-bit hash (collision odds
  ~1e-18 per pair — distinct grams colliding would merge two counts).

Reference ancestor: the reference's duplicate-detection quirk-5 path
(A12 re-aggregation, ``additional_charge_checks.py``) — upgraded from
exact-row duplicates to phrase-level repetition statistics.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as HH

# (n, Gopher Table A1 threshold) — top-n-gram char fraction for small n,
# duplicated-n-gram char fraction for n ≥ 5.
GOPHER_TOP_THRESHOLDS = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_THRESHOLDS = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}
DEFAULT_NS = (2, 3, 5)

_TOKS = "filter(split(lower(trim({c})), '\\\\s+'), t -> t != '')"


def _grams_expr(text_col: str, ns: tuple[int, ...]) -> Column:
    """(n, gram) struct array of every n-gram for every n in ``ns``."""
    toks = _TOKS.format(c=text_col)
    # sequence(1, 0) DESCENDS in Spark, so short docs can't use it as an
    # empty range: generate ≥1 window index, then slice to the true count
    # (slice(x, 1, 0) = empty array)
    per_n = ", ".join(
        f"slice(transform(sequence(1, greatest(size({toks}) - {n - 1}, 1)), "
        f"i -> named_struct('n', {n}, 'gram', "
        f"concat_ws(' ', slice({toks}, i, {n})))), "
        f"1, greatest(size({toks}) - {n - 1}, 0))"
        for n in ns
    )
    return F.expr(f"flatten(array({per_n}))")


def token_ngram_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: tuple[int, ...] = DEFAULT_NS,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, [carry_cols...], n, top_frac, dup_frac) per document — the
    native explode form (module docstring).  NULL/blank texts and docs
    with < n tokens emit no row for that n.  ``carry_cols`` ride through
    the aggregations as extra group keys (constant per doc), so callers
    that aggregate by them afterwards (q56: per-language) never join the
    corpus back to itself."""
    toks = _TOKS.format(c=text_col)
    base = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            *[F.col(c) for c in carry_cols],
            F.expr(f"length(concat_ws(' ', {toks}))").alias("_L"),
            F.explode(_grams_expr(text_col, ns)).alias("_g"),
        )
        .select(
            id_col, *carry_cols, "_L",
            F.col("_g.n").alias("n"), F.col("_g.gram").alias("_gram"),
        )
    )
    counts = base.groupBy(id_col, *carry_cols, "_L", "n", "_gram").agg(
        F.count("*").alias("_cnt")
    )
    cover = F.col("_cnt") * F.length("_gram")
    return (
        counts.groupBy(id_col, *carry_cols, "n")
        .agg(
            F.round(
                F.least(F.lit(1.0), F.max(cover) / F.first("_L")), 6
            ).alias("top_frac"),
            F.round(
                F.least(
                    F.lit(1.0),
                    F.sum(F.when(F.col("_cnt") >= 2, cover).otherwise(0))
                    / F.first("_L"),
                ),
                6,
            ).alias("dup_frac"),
        )
    )


def token_ngram_metrics_duck_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: tuple[int, ...] = DEFAULT_NS,
) -> str:
    """DuckDB twin of :func:`token_ngram_metrics` (same pinned
    definitions; used by the q56 oracle)."""
    toks = (
        f"list_filter(string_split_regex(lower(trim({text_col})), '\\s+'), "
        f"t -> t != '')"
    )
    per_n = " UNION ALL ".join(
        f"SELECT {id_col}, length(array_to_string(toks, ' ')) AS L, {n} AS n, "
        f"unnest(list_transform(range(1, greatest(len(toks) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(toks[CAST(i AS INT):CAST(i + {n - 1} AS INT)], ' '))) AS gram "
        f"FROM (SELECT {id_col}, {toks} AS toks FROM {table} "
        f"WHERE {text_col} IS NOT NULL)"
        for n in ns
    )
    return f"""
    WITH grams AS ({per_n}),
    counts AS (
      SELECT {id_col}, L, n, gram, COUNT(*) AS cnt
      FROM grams GROUP BY {id_col}, L, n, gram
    )
    SELECT {id_col}, n,
           ROUND(LEAST(1.0, MAX(cnt * length(gram)) / ANY_VALUE(L)), 6)
             AS top_frac,
           ROUND(LEAST(1.0, SUM(CASE WHEN cnt >= 2
                                THEN cnt * length(gram) ELSE 0 END)
                 / ANY_VALUE(L)), 6) AS dup_frac
    FROM counts GROUP BY {id_col}, n
    """


# ---------------------------------------------------------------------------
# Map-only Arrow kernel (the filter-stage form).
# ---------------------------------------------------------------------------

_SCORE_CHUNK = 2048
# per-position mix weights for combining consecutive token hashes into a
# window hash: h_g = (Σ_j mix_j(h_tok)) mod P with the library's Mersenne
# affine mixes — windows differing in any position get independent hashes.


# Java-regex \s = [ \t\n\x0B\f\r] (ASCII only) — Python str.split()
# splits on UNICODE whitespace (U+00A0 etc.), which would silently
# diverge from the explode form on crawled HTML; pin the Java set.
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _metrics_chunk(
    texts: list[str], ns: tuple[int, ...]
) -> dict[int, np.ndarray]:
    """(top_frac, dup_frac) arrays per n for one chunk of non-null texts.
    Fully vectorized: one token-hash pass, per-n window combine, one
    lexsort per n, run-length counts, per-doc reduceat."""
    toks_per_doc = [
        [w for w in _JAVA_WS.split(t.lower()) if w] for t in texts
    ]
    n_docs = len(texts)
    doc_ntok = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
    flat = [tok for toks in toks_per_doc for tok in toks]
    tok_len = np.array([len(t) for t in flat], dtype=np.int64)
    tok_doc = np.repeat(np.arange(n_docs), doc_ntok)
    th = HH.poly60_token_np(flat) if flat else np.empty(0, dtype=np.int64)
    # normalized doc char length L = Σ token lens + (ntok - 1) spaces
    L = np.zeros(n_docs, dtype=np.int64)
    if flat:
        np.add.at(L, tok_doc, tok_len)
    L += np.maximum(doc_ntok - 1, 0)
    starts = np.cumsum(doc_ntok) - doc_ntok
    out: dict[int, np.ndarray] = {}
    # prefix char sums for O(1) windowed gram lengths
    pref = np.concatenate(([0], np.cumsum(tok_len)))
    for n in ns:
        cnt = np.maximum(doc_ntok - (n - 1), 0)  # windows per doc
        total = int(cnt.sum())
        res = np.zeros((2, n_docs), dtype=np.float64)
        if total:
            # window start indices into the flat arrays
            wdoc = np.repeat(np.arange(n_docs), cnt)
            woff = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
            wstart = starts[wdoc] + woff
            # combine the n token hashes with n distinct affine mixes
            # (one mix pass over all token hashes, then windowed gather;
            # running mod keeps every partial sum < 2·P < 2^63)
            mixes = HH.mix_np(th, n)
            gh = np.zeros(total, dtype=np.int64)
            for j in range(n):
                gh = (gh + mixes[j, wstart + j]) % HH.MERSENNE_P
            glen = pref[wstart + n] - pref[wstart] + (n - 1)
            # per-(doc, gram-hash) runs
            order = np.lexsort((gh, wdoc))
            sd, sh, sl = wdoc[order], gh[order], glen[order]
            runs = np.concatenate(
                ([True], (sd[1:] != sd[:-1]) | (sh[1:] != sh[:-1]))
            )
            run_idx = np.flatnonzero(runs)
            run_cnt = np.diff(np.concatenate((run_idx, [total])))
            run_doc = sd[run_idx]
            cover = run_cnt * sl[run_idx]
            # per-doc segments over the run arrays (runs are doc-sorted)
            seg = np.concatenate(
                ([True], run_doc[1:] != run_doc[:-1])
            )
            seg_idx = np.flatnonzero(seg)
            seg_doc = run_doc[seg_idx]
            top = np.maximum.reduceat(cover, seg_idx)
            dup = np.add.reduceat(np.where(run_cnt >= 2, cover, 0), seg_idx)
            res[0, seg_doc] = np.minimum(1.0, top / L[seg_doc])
            res[1, seg_doc] = np.minimum(1.0, dup / L[seg_doc])
        out[n] = res
    return out


def repetition_metrics_udf(ns: tuple[int, ...] = DEFAULT_NS):
    """Arrow-vectorized map-only twin of :func:`token_ngram_metrics`:
    struct<top_frac_<n> double, dup_frac_<n> double, ...> per row (0.0
    where the doc has < n tokens or is NULL — the explode form emits no
    row there; the flat 0.0 is the filter-stage convention, matching
    'nothing repeated')."""
    fields = ", ".join(
        f"top_frac_{n} double, dup_frac_{n} double" for n in ns
    )

    @F.pandas_udf(fields)
    def _rep(s: pd.Series) -> pd.DataFrame:
        m = len(s)
        cols = {}
        for n in ns:
            cols[f"top_frac_{n}"] = np.zeros(m, dtype=np.float64)
            cols[f"dup_frac_{n}"] = np.zeros(m, dtype=np.float64)
        vals = s.to_numpy(dtype=object)
        for lo in range(0, m, _SCORE_CHUNK):
            chunk = vals[lo : lo + _SCORE_CHUNK]
            idx = [j for j, t in enumerate(chunk) if isinstance(t, str)]
            if not idx:
                continue
            res = _metrics_chunk([chunk[j] for j in idx], ns)
            rows = lo + np.asarray(idx)
            for n in ns:
                cols[f"top_frac_{n}"][rows] = np.round(res[n][0], 6)
                cols[f"dup_frac_{n}"][rows] = np.round(res[n][1], 6)
        return pd.DataFrame(cols)

    return _rep
