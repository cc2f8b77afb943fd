"""Every queries()/oracle_sql() pair must agree with DuckDB — the same
comparison the driver's correctness gate runs (here at sf0.001 for speed;
the driver re-runs at sf0.01)."""

from __future__ import annotations

import pytest

from data_quality_analyzer_spark.oracle.compare import run_compare
from data_quality_analyzer_spark.plans import entry_queries as EQ

SF_DIR = "/root/testdata/sf0.001"


def test_registry_complete():
    qs, oracles = EQ.queries(), EQ.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) == set(qs)


@pytest.mark.parametrize("name", sorted(EQ.queries()))
def test_query_matches_oracle(spark, name):
    results = run_compare(spark, SF_DIR, [name])
    r = results[0]
    assert r.ok, f"{name}: {r.issues}"


def test_flagship_entry(spark):
    df = EQ.flagship(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0
    assert {"lang", "n_docs", "n_keep", "n_drop"} == set(df.columns)
