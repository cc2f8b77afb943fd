"""Context-window chunking: pinned boundary rule, overlap invariant,
reconstruction, and edge cases."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_quality_analyzer_spark.operators import chunking as CH

ROWS = [
    (1, "a" * 10),          # len <= chunk -> 1 chunk
    (2, "x" * 100),         # exact multiple cases below
    (3, "abcdefghij" * 7),  # 70 chars
    (4, None),              # no chunks
    (5, ""),                # no chunks
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_chunk_rule_and_overlap(docs):
    out = CH.chunk_documents(docs, chunk_chars=40, overlap=10)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_text"], r["n_chunks"])
        )
    assert set(got) == {1, 2, 3}
    assert got[1] == [(0, "a" * 10, 1)]
    # doc 2: len 100, stride 30 -> n = 1 + ceil(60/30) = 3
    c2 = sorted(got[2])
    assert [i for i, _, _ in c2] == [0, 1, 2] and c2[0][2] == 3
    assert c2[0][1] == "x" * 40
    assert len(c2[2][1]) == 40  # 100 - 60 = 40: last window full here
    # doc 3: len 70 -> n = 1 + ceil(30/30) = 2; last chunk short (30)
    c3 = sorted(got[3])
    assert len(c3) == 2 and len(c3[1][1]) == 40
    # overlap invariant: consecutive full chunks share `overlap` chars
    text2 = dict(ROWS)[2]
    for i, chunk, _ in c2:
        assert chunk == text2[i * 30 : i * 30 + 40]
        if i > 0:
            assert c2[i - 1][1][-10:] == chunk[:10]
    # reconstruction: stride-prefixes + last chunk == original
    rebuilt = "".join(ch[:30] for _, ch, _ in c2[:-1]) + c2[-1][1]
    assert rebuilt == text2


def test_duckdb_twin_agrees(docs, spark):
    out = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_chunks"])
        for r in CH.chunk_documents(docs, 40, 10).collect()
    )
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(ROWS, columns=["doc_id", "text"])
    )
    duck = sorted(
        (r[0], r[2], r[3], r[1])
        for r in con.execute(
            CH.chunk_documents_sql("documents", 40, 10)
        ).fetchall()
    )
    assert out == duck


def test_validation(docs):
    with pytest.raises(ValueError, match="chunk_chars"):
        CH.chunk_documents(docs, 0, 0)
    with pytest.raises(ValueError, match="overlap"):
        CH.chunk_documents(docs, 40, 40)
    with pytest.raises(ValueError, match="overlap"):
        CH.chunk_documents(docs, 40, -1)
