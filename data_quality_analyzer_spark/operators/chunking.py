"""Context-window document chunking — the stage between a cleaned
corpus and a fixed-context trainer: split each document into
``chunk_chars``-sized windows advancing by ``chunk_chars - overlap``
(the standard overlapping-window rule, e.g. RAG indexers and
fixed-context LM prep).

Pinned chunk rule (identical integer arithmetic in both engines):

* ``stride = chunk_chars - overlap`` (must be > 0);
* ``n_chunks = 1`` if ``len <= chunk_chars`` else
  ``1 + ceil((len - chunk_chars) / stride)`` — i.e. the last window is
  the first one whose end reaches the document end (it may be shorter
  than ``chunk_chars``);
* chunk ``i`` = ``substring(text, 1 + i*stride, chunk_chars)``;
* NULL / empty documents produce no chunks.

Scale shape: MAP-ONLY — one ``sequence``/``transform`` per row followed
by ``posexplode``; no shuffle, no UDF; output rows ≈ input chars /
stride, the same explode cost model as the gram stages.  The
``sequence(0, n-1)`` is safe because ``n ≥ 1`` by construction (the
repo's descending-sequence gotcha).

Reference ancestor: P15 unnest (claim_analysis.py) applied to derived
windows instead of stored arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _n_chunks(length, chunk_chars: int, stride: int):
    extra = length - F.lit(chunk_chars)
    return F.when(extra <= 0, F.lit(1)).otherwise(
        F.lit(1) + F.floor((extra + stride - 1) / F.lit(stride)).cast("int")
    )


def chunk_documents(
    df: DataFrame,
    chunk_chars: int = 2048,
    overlap: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per chunk: ``(id_col, chunk_idx, n_chunks, chunk_text)``
    plus every other input column carried through."""
    if chunk_chars <= 0:
        raise ValueError(f"chunk_chars must be positive, got {chunk_chars}")
    if not (0 <= overlap < chunk_chars):
        raise ValueError(
            f"overlap must be in [0, chunk_chars), got {overlap}"
        )
    stride = chunk_chars - overlap
    ln = F.length(text_col)
    n = _n_chunks(ln, chunk_chars, stride)
    chunks = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.substring(
            F.col(text_col), F.lit(1) + i * stride, chunk_chars
        ),
    )
    carried = [c for c in df.columns if c != text_col]
    return (
        df.filter(F.col(text_col).isNotNull() & (ln > 0))
        .select(
            *carried,
            n.alias("n_chunks"),
            F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
        )
    )


def chunk_documents_sql(
    rel: str,
    chunk_chars: int,
    overlap: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: str = "",
) -> str:
    """DuckDB twin: chunk relation over ``rel`` with the same rule."""
    stride = chunk_chars - overlap
    n = (
        f"CASE WHEN length({text_col}) <= {chunk_chars} THEN 1 "
        f"ELSE 1 + (length({text_col}) - {chunk_chars} + {stride} - 1) "
        f"// {stride} END"
    )
    cols = f"{id_col}, " + (f"{extra_cols}, " if extra_cols else "")
    return f"""
    SELECT {cols}
           CAST(n_chunks AS INT) AS n_chunks,
           CAST(i AS INT) AS chunk_idx,
           substring({text_col}, 1 + i * {stride}, {chunk_chars})
             AS chunk_text
    FROM (
      SELECT *, {n} AS n_chunks FROM {rel}
      WHERE {text_col} IS NOT NULL AND length({text_col}) > 0
    ), unnest(range(0, n_chunks)) AS t(i)
    """
