"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual registry lives in
``data_quality_analyzer_spark/plans/entry_queries.py`` — every entry maps a
SURVEY.md §2 operator (cited in its docstring) to an idiomatic-Spark plan
plus a semantically identical DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_quality_analyzer_spark.plans import entry_queries as _EQ  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the caption-side quality-filter verdict summary (keep/drop counts
    per language) — the one-pass fused rule evaluation that is the heart of
    the engine (SURVEY §7.1 minimum slice).
    """
    return _EQ.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _EQ.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query."""
    return _EQ.oracle_sql()
