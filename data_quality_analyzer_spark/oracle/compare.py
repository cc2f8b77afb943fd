"""Spark-vs-DuckDB result comparison, mirroring the driver's gate:
row count + column names + order-insensitive value comparison.

Used by ``tests/test_entry_queries.py`` and the ``scripts``-style self-check
so every ``queries()``/``oracle_sql()`` pair is proven equivalent *before*
the driver grades it.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from ..sources.catalog import TABLES


@dataclass
class CompareResult:
    name: str
    ok: bool
    row_count_spark: int
    row_count_duck: int
    issues: list[str] = field(default_factory=list)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register the test tables as views, as the driver does."""
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, rows sorted by all columns,
    everything stringified with float normalization."""
    df = df[sorted(df.columns)].copy()

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return f"{v:.6f}"
            return f"{v:.6f}"
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return str(v)

    for c in df.columns:
        df[c] = df[c].map(norm)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare_frames(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> CompareResult:
    res = CompareResult(name, True, len(spark_pdf), len(duck_pdf))
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        res.ok = False
        res.issues.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return res
    if len(spark_pdf) != len(duck_pdf):
        res.ok = False
        res.issues.append(f"row counts differ: {len(spark_pdf)} vs {len(duck_pdf)}")
        return res
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    if not a.equals(b):
        res.ok = False
        neq = (a != b).any(axis=1)
        diff_rows = a[neq].head(3)
        diff_rows_b = b[neq].head(3)
        res.issues.append(
            f"values differ in {int(neq.sum())} rows; spark sample:\n"
            f"{diff_rows}\nduck sample:\n{diff_rows_b}"
        )
    return res


def run_compare(spark, sf_dir: str, names: list[str] | None = None) -> list[CompareResult]:
    from ..plans import entry_queries as EQ

    qs, oracles = EQ.queries(), EQ.oracle_sql()
    con = duck_connection(sf_dir)
    results = []
    for name in names or sorted(qs):
        try:
            spark_pdf = qs[name](spark, sf_dir).toPandas()
            duck_pdf = con.sql(oracles[name]).df()
            results.append(compare_frames(name, spark_pdf, duck_pdf))
        except Exception as exc:  # surface, don't abort the sweep
            results.append(CompareResult(name, False, -1, -1, [f"EXCEPTION: {exc}"]))
    return results
