"""Execution helpers shared across operators and plans."""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame) -> DataFrame:
    """Materialize a relation that is consumed multiple times (both sides
    of a self-join) or iteratively (connected-components rounds): cut the
    lineage and keep the computed rows.

    Seam semantics: with **no checkpoint directory configured** this is
    ``localCheckpoint(eager=True)`` — blocks stored on executors, perfect
    for the single-JVM sandbox but LOST if an executor dies.  When the job
    has called ``spark.sparkContext.setCheckpointDir(...)`` (the cluster
    deployment), it upgrades to reliable ``checkpoint(eager=True)`` —
    blocks written to the shared dir, recomputation-free across executor
    loss.  One switch, no operator-code change — the same swappable-writer
    pattern the manifest layer uses (tests/test_resume.py).
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
