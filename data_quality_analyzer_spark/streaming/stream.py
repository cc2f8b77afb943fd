"""Structured Streaming variants of the metric layer.

The reference is batch-only (SURVEY §2.9) — its closest analogues are the
staleness/freshness gate (F11) and the clear-then-reload idempotence
pattern, which the batch engine upgrades to checkpoint/resume
(plans/lineage.py).  This module adds the *streaming* recast for
continuously-arriving data: the same declarative rule expressions evaluated
over event-time windows with watermarked late-data handling, and a
``foreachBatch`` verdict sink that reuses the batch pipeline unchanged
(exactly-once per micro-batch when paired with idempotent writes).

Micro-batch quality monitoring (rule pass/fail counts per window) is the
streaming twin of ``operators.rules.rule_metrics``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream over the events table layout (one file per
    micro-batch in tests; kafka/socket in production — same downstream
    plan)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )


def windowed_quality_metrics(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    low_value_threshold: float = 10.0,
) -> DataFrame:
    """Per-(window, event_type) conditional-aggregate rule counts — the
    one-pass A2-fusion applied to event-time windows.  The watermark bounds
    state: late rows beyond it are dropped deterministically."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("value") < low_value_threshold, 1).otherwise(0))
            .cast("long")
            .alias("low_value_fails"),
            F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("null_value_fails"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "low_value_fails",
            "null_value_fails",
            "avg_value",
        )
    )


def run_metrics_stream_once(
    spark: SparkSession, input_dir: str, query_name: str = "quality_metrics"
) -> DataFrame:
    """Drive the stream to completion over the files currently in
    ``input_dir`` (memory sink; test/demo harness) and return the result."""
    events = read_events_stream(spark, input_dir)
    agg = windowed_quality_metrics(events)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def stream_verdicts_foreach_batch(
    spark: SparkSession,
    images_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """Streaming filter+scrub: each micro-batch goes through the SAME batch
    pipeline (plans/pipeline.run_pipeline) inside foreachBatch; the sink
    partitions by epoch for idempotent replay (exactly-once effect)."""
    from ..plans.pipeline import run_pipeline

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        verdicts = run_pipeline(spark, batch_df)
        (
            verdicts.drop("bytes")
            .withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .parquet(f"{out_dir}/epoch={epoch_id}")
        )

    return (
        images_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
