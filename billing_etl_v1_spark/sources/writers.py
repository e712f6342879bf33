"""Idempotent partitioned sink — the Spark-native replacement for the
reference's delete-then-insert + tmp-table swap (SURVEY §2.7, D1-D3).

The reference makes re-runs idempotent with:
  ALTER TABLE ... DELETE WHERE invoice_month=... (main.py:177-183,186-192)
  INSERT INTO target SELECT FROM tmp WHERE window  (main.py:195-201)

With dynamic partition overwrite (set in session.get_spark), one
``mode("overwrite")`` write replaces exactly the partitions present in the
incoming frame and leaves every other partition untouched — the tmp-table
dance disappears and re-runs are naturally idempotent per partition.

At 100 TB: partition by (invoice_month, usage_day) so daily increments touch
only their own day partitions and month backfills replace one month
atomically per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_PARTITIONING = ("invoice_month", "usage_day")


def write_calculated(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = DEFAULT_PARTITIONING,
    mode: str = "overwrite",
) -> None:
    """D1+D2+D3 as one operation (dynamic overwrite replaces only the
    partitions present in ``df``)."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def append_calculated(df: DataFrame, path: str, partition_by=DEFAULT_PARTITIONING) -> None:
    """D3: plain append (reference billing_calculation_service.py:427-431)."""
    write_calculated(df, path, partition_by, mode="append")


def read_calculated(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
