"""Stats drift (operators/drift.py): every severity band hit exactly at
and beside its integer boundary, vanished/appeared groups, and DuckDB
twin agreement."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from data_quality_analyzer_spark.operators import drift as DR

# (lang, (n_base, kept_base), (n_cur, kept_cur), expected severity)
CASES = [
    ("a", (10, 5), (10, 6), "ok"),         # Δrate = 0.1 exactly → strict >
    ("b", (100, 50), (100, 61), "warning"),  # Δrate = 0.11
    ("c", (100, 50), (100, 72), "critical"),  # Δrate = 0.22
    ("d", (10, 10), (8, 8), "ok"),         # volume = 0.8× exactly → strict <
    ("e", (10, 10), (7, 7), "warning"),    # volume = 0.7×
    ("f", (10, 10), (4, 4), "critical"),   # volume = 0.4×
    ("g", (5, 3), (0, 0), "critical"),     # vanished
    ("h", (0, 0), (5, 3), "critical"),     # appeared
]


def _rows(side: int):
    out = []
    for lang, base, cur, _want in CASES:
        n, kept = (base, cur)[side]
        for i in range(n):
            out.append((lang, i < kept))
    return out


def test_drift_bands_exact_boundaries(spark):
    base = spark.createDataFrame(_rows(0), "lang string, k boolean")
    cur = spark.createDataFrame(_rows(1), "lang string, k boolean")
    got = {
        r["lang"]: r["severity"]
        for r in DR.stats_drift(cur, base, F.col("k"), F.col("k")).collect()
    }
    assert got == {lang: want for lang, _b, _c, want in CASES}


def test_drift_duck_twin_agrees(spark):
    base = spark.createDataFrame(_rows(0), "lang string, k boolean")
    cur = spark.createDataFrame(_rows(1), "lang string, k boolean")
    spark_rows = sorted(
        (
            (r["lang"], r["n_base"], r["n_cur"], r["rate_base"],
             r["rate_cur"], r["severity"])
            for r in DR.stats_drift(
                cur, base, F.col("k"), F.col("k")
            ).collect()
        )
    )
    con = duckdb.connect()
    for name, side in (("curt", 1), ("baset", 0)):
        vals = ", ".join(f"('{l}', {str(k).upper()})" for l, k in _rows(side))
        con.execute(f"CREATE TABLE {name} AS SELECT * FROM (VALUES {vals}) t(lang, k)")
    duck_rows = sorted(
        tuple(r)
        for r in con.execute(
            DR.stats_drift_duck_sql("curt", "baset", "k", "k", "lang")
        ).fetchall()
    )
    assert spark_rows == duck_rows


def test_drift_vs_committed_ledger(spark, tmp_path):
    """commit_corpus_stats + drift_vs_committed: drift against the last
    committed crawl matches the direct two-frame form; replay is a
    no-op; group pin and unknown baseline raise."""
    import pytest as _pytest

    from data_quality_analyzer_spark.plans import lineage as LN

    store = str(tmp_path / "stats_store")
    base = spark.createDataFrame(_rows(0), "lang string, k boolean")
    cur = spark.createDataFrame(_rows(1), "lang string, k boolean")
    LN.commit_corpus_stats(spark, base, store, "crawl-001", F.col("k"))
    LN.commit_corpus_stats(spark, base, store, "crawl-001", F.col("k"))  # replay
    got = sorted(
        tuple(r)
        for r in LN.drift_vs_committed(
            spark, cur, store, F.col("k")
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in DR.stats_drift(cur, base, F.col("k"), F.col("k")).collect()
    )
    assert got == want
    with _pytest.raises(ValueError, match="pinned"):
        LN.commit_corpus_stats(
            spark, base, store, "crawl-002", F.col("k"), group_col="other"
        )
    with _pytest.raises(ValueError, match="not committed"):
        LN.drift_vs_committed(
            spark, cur, store, F.col("k"), baseline_batch="nope"
        )
