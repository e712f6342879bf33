"""PySpark-native analytics engine with the query and data-processing
capabilities of the ``zjx-zhuang/billing-etl-v1`` reference.

The reference (studied read-only at /root/reference) is a ClickHouse + pandas
billing ETL; this package re-expresses its entire surface as one lazy
DataFrame/Catalyst DAG — no per-day / per-account / per-batch driver loops
(reference main.py:53-57, billing_calculation_service.py:450-462), no
row-at-a-time UDFs (reference calculate/service.py:79-81,147), broadcast joins
for the contract dimension, AQE for skew.

Modules
-------
- ``session``    — SparkSession builder tuned for the target workload
- ``schemas``    — explicit StructTypes for the three billing tables
- ``sources``    — parquet readers, synthetic billing derivation, writers
- ``operators``  — aggregation, rule matching, pricing, credits, conformance,
                   plus large-scale data-pipeline extensions (dedup,
                   similarity, text analysis, multimodal)
- ``plans``      — composed end-to-end pipelines and thin drivers
- ``streaming``  — Structured Streaming variants
"""

__version__ = "0.1.0"
