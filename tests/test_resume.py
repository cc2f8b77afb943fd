"""Checkpoint/resume: a crashed run resumes from the manifest and converges
to the same output as an uninterrupted run (SURVEY §7.4 hard part 4)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from data_quality_analyzer_spark.plans import lineage as LN

OUT = os.path.join(os.path.dirname(__file__), "..", ".fixtures", "resume_out")


@pytest.fixture()
def clean_out():
    for sub in ("a", "b"):
        shutil.rmtree(os.path.join(OUT, sub), ignore_errors=True)
    yield


def _summary(spark, path):
    return (
        LN.read_committed(spark, path)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("rows"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("keep"),
        )
        .orderBy("bucket")
        .toPandas()
    )


def test_crash_resume_converges(spark, corpus_path, clean_out):
    images = spark.read.parquet(corpus_path).limit(400)

    # uninterrupted run
    full_dir = os.path.join(OUT, "a")
    m1 = LN.run_with_checkpoints(spark, images, full_dir, "run1", num_buckets=8, chunk_size=2)
    assert len(m1["committed"]) == 8

    # crashed-then-resumed run
    crash_dir = os.path.join(OUT, "b")
    with pytest.raises(RuntimeError, match="injected failure"):
        LN.run_with_checkpoints(
            spark, images, crash_dir, "run2", num_buckets=8, chunk_size=2,
            fail_after_chunks=2,
        )
    partial = LN.read_manifest(crash_dir)
    assert 0 < len(partial["committed"]) < 8  # torn state is bounded...
    m2 = LN.run_with_checkpoints(spark, images, crash_dir, "run2", num_buckets=8, chunk_size=2)
    assert len(m2["committed"]) == 8

    # ...and the final data is identical
    a = _summary(spark, full_dir)
    b = _summary(spark, crash_dir)
    assert a.equals(b)


def test_manifest_guards_foreign_run(spark, corpus_path, clean_out):
    images = spark.read.parquet(corpus_path).limit(50)
    d = os.path.join(OUT, "a")
    LN.run_with_checkpoints(spark, images, d, "run1", num_buckets=2, chunk_size=2)
    with pytest.raises(ValueError, match="holds run"):
        LN.run_with_checkpoints(spark, images, d, "other", num_buckets=2)
