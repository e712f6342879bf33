"""Scaling evidence for the flagship pipeline (optional tool, not part of
the driver contract): run the full billing DAG at each testdata scale
factor plus an N-fold replicated sf0.1 (~2.2M-row fact at x4), and print
rows/sec so scaling behavior is measurable rather than asserted.

The replicated run unions the synthetic fact with itself with shifted
account ids, which preserves group cardinality growth (keys replicate per
copy, so the aggregate output scales too — the honest case, not a
degenerate all-duplicate merge).

Usage: python scale_probe.py [replication]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    import __spark_entry__ as em
    from billing_etl_v1_spark import oracle
    from billing_etl_v1_spark.plans.pipeline import billing_pipeline
    from billing_etl_v1_spark.session import get_spark

    replication = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for label, sf_dir in [
        ("sf0.001", "/root/testdata/sf0.001"),
        ("sf0.01", "/root/testdata/sf0.01"),
        ("sf0.1", "/root/testdata/sf0.1"),
    ]:
        fact, dim = em._billing_ctx(spark, sf_dir)
        n = fact.count()  # also materializes the cached input
        df = billing_pipeline(
            fact, dim, extra_discounts=oracle.TEST_EXTRA_DISCOUNTS, include_etl_time=False
        )
        df.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        results[label] = {"rows": n, "sec": round(dt, 3), "rows_per_sec": int(n / dt)}
        print(f"# {label}: {n} rows in {dt:.2f}s ({int(n/dt)} rows/s)", file=sys.stderr)

    # replicated sf0.1: shift account ids per copy so keys (and the result)
    # genuinely grow with the data
    fact, dim = em._billing_ctx(spark, "/root/testdata/sf0.1")
    big = None
    for i in range(replication):
        shifted = fact.withColumn(
            "billing_account_id", F.concat(F.col("billing_account_id"), F.lit(f"#{i}"))
        )
        big = shifted if big is None else big.unionByName(shifted)
    big_dim = None
    for i in range(replication):
        shifted = dim.withColumn(
            "billing_account_id", F.concat(F.col("billing_account_id"), F.lit(f"#{i}"))
        )
        big_dim = shifted if big_dim is None else big_dim.unionByName(shifted)
    n = big.count()
    df = billing_pipeline(
        big, big_dim, extra_discounts=oracle.TEST_EXTRA_DISCOUNTS, include_etl_time=False
    )
    df.write.format("noop").mode("overwrite").save()
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    label = f"sf0.1 x{replication}"
    results[label] = {"rows": n, "sec": round(dt, 3), "rows_per_sec": int(n / dt)}
    print(f"# {label}: {n} rows in {dt:.2f}s ({int(n/dt)} rows/s)", file=sys.stderr)

    print(json.dumps({"metric": "flagship_scaling", "runs": results}))
    spark.stop()


if __name__ == "__main__":
    main()
