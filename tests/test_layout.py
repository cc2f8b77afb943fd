"""Scan-efficiency plan pins: predicate pushdown, column pruning, and
partition pruning over a phash-bucket layout — the 'push down and
prune' mechanics PLANS.md documents, here pinned so they cannot rot.
A scan that reads all columns for a 2-column projection, or all
partitions for a one-bucket probe, is wrong at any scale and fatal at
100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


SF_DIR = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_parquet_scan(spark):
    d = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("n_chars") > 200)
        .select("doc_id", "lang")
    )
    plan = _physical_plan(d)
    assert "PushedFilters:" in plan
    assert "GreaterThan(n_chars,200)" in plan, plan


def test_column_pruning_reaches_parquet_scan(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang"
    )
    schema = _physical_plan(d).split("ReadSchema:", 1)[1]
    assert "doc_id" in schema and "lang" in schema
    # the wide payload column must NOT be read for this projection
    assert "text" not in schema.split("\n")[0]


def test_partition_pruning_on_phash_bucket_layout(spark, tmp_path):
    """Write the q93 phash-bucket layout hive-partitioned, probe one
    bucket, and pin that the scan's PartitionFilters carry the bucket
    predicate (bucket directories outside it are never listed into the
    scan)."""
    out = str(tmp_path / "by_bucket")
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
        "phash_bucket",
        F.expr("CASE WHEN doc_id % 3 = 0 THEN 7 ELSE (doc_id * 31) % 64 END"),
    )
    d.write.partitionBy("phash_bucket").parquet(out)

    probe = spark.read.parquet(out).filter(F.col("phash_bucket") == 7)
    plan = _physical_plan(probe)
    part = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert "phash_bucket" in part and "7" in part, plan
    # and the probe still returns exactly the planted hot bucket
    want = d.filter(F.col("phash_bucket") == 7).count()
    assert probe.count() == want > 0
