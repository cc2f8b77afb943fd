"""SparkSession factory.

One place that encodes the execution-model decisions the whole engine relies
on (reference: the rebuild of data_quality_analyzer's single-threaded asyncio
driver, ``main.py:17-54`` — here parallelism, spill, and planning are
delegated to Spark instead of mongod):

* Arrow on — every pandas UDF crosses the JVM/Python boundary in columnar
  batches, never row-at-a-time.
* AQE on — runtime coalescing of shuffle partitions + skew-join splitting,
  so the same plan survives sf0.001 fixtures and 100 TB tables.
* UTC session timezone — required for bit-parity with the DuckDB oracle.
* shuffle partitions default to ~cores locally; on a real cluster the caller
  passes ``shuffle_partitions`` sized to executors*cores*2-3.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "data_quality_analyzer_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``cpus`` controls local parallelism (``local[cpus]``); the benchmark's
    two-cluster-size protocol runs the same job at cpus=8 and cpus=32.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
