"""Parquet readers for the driver-provided test tables (TESTDATA.md).

Replaces the reference's ClickHouse scan operators S1-S3
(reference client/clickhouse_client.py:43-82): a partitioned parquet scan is
Spark-native, so the 10k-row batch iterator disappears entirely —
Catalyst pushes filters/projections into the scan and partitions replace
manual batching.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read via nanosAsLong -> truncate to micros,
        # matching DuckDB's ns->us coercion of the same file
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TPCH_TABLES}


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register the test tables as temp views so shared SQL can run on them."""
    for t in tables or TPCH_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
