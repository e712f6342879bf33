"""Structured Streaming variants of the engine's operators.

The reference is batch-only (SURVEY §2.11) — its "streaming" is a daily cron
re-reading a fact table (main.py:207-215). These wrap the same operator
logic for continuous ingest:

- ``streaming_billing_ingest``: files land in a fact directory; each
  micro-batch runs the SAME ``billing_pipeline`` via foreachBatch and
  partition-overwrites only the partitions present in the batch —
  exactly-once per partition on top of checkpointing, and zero duplicated
  business logic between batch and streaming.
- ``streaming_window_counts``: event-time tumbling windows with a watermark
  for late data — the streaming twin of operators.events.tumbling_window_agg.

Tested with Trigger.AvailableNow against the parquet fixtures
(tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from billing_etl_v1_spark.plans.pipeline import billing_pipeline
from billing_etl_v1_spark.sources.writers import write_calculated


def streaming_billing_ingest(
    spark: SparkSession,
    fact_dir: str,
    fact_schema,
    dim: DataFrame,
    target_path: str,
    checkpoint_dir: str,
    extra_discounts: dict[str, float] | None = None,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Continuous fact ingest -> calculated invoice partitions."""
    reader = spark.readStream.schema(fact_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(fact_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = billing_pipeline(batch_df, dim, extra_discounts=extra_discounts)
        write_calculated(out, target_path)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_window_counts(
    events_stream: DataFrame,
    width: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time tumbling window aggregation with late-data watermark."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
