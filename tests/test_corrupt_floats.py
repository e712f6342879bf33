"""Corrupt-float posture: NaN/Inf rows must neither kill jobs nor poison
aggregates, and cross-engine parity must survive them.

At 100 TB a poisoned double WILL appear (failed sensor, bad backfill,
overflowed upstream computation). Before round 5's guards, one NaN in
events.value crashed six queries outright (CAST_OVERFLOW on exact-cents
casts) and silently broke Spark-vs-DuckDB parity in nine more (engines
disagree on NaN ordering and NaN is absorbing under sum). The policy now:

- scalar measurements: non-finite -> NULL at operator ingestion
  (functions.finite_or_null; twins use CASE WHEN isfinite(value)).
- vectors: any non-finite (or NULL) component excludes the vector from
  every index (functions.finite_vectors; twins filter on _FINITE_VEC).

This suite poisons ~1% of events.value with NaN/Inf and one embedding
component per ~1% of vectors, then requires the driver-grade exact match
for every affected query twin.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import TESTDATA_TABLES, assert_frames_match

AFFECTED = [
    "events_window_agg",
    "events_sessionize",
    "events_top_types",
    "events_asof_purchase",
    "events_type_pivot",
    "events_value_deciles",
    "events_attribution",
    "events_rfm",
    "events_value_percentiles",
    "events_approx_stats",
    "events_user_trend",
    "events_anomaly",
    "events_salted_user_join",
    "sim_topk_bruteforce",
    "sim_topk_ivf",
    "sim_topk_quantized",
    "sim_hard_negatives",
    "embeddings_kmeans",
    "embeddings_quantize",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_semantic",
]


@pytest.fixture(scope="module")
def poisoned_sf_dir(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    d = tmp_path_factory.mktemp("testdata_poisoned")
    for t in TESTDATA_TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        if t == "events":
            # 1e300 is FINITE, so it slips past every NaN/Inf guard — but it
            # is outside exact_sum's 1e-10 grid, where unguarded Spark
            # saturates the BIGINT cast (silent poison) and DuckDB raises
            # (dead job); both engines must exclude it identically
            df = df.withColumn(
                "value",
                F.when(F.col("event_id") % 97 == 0, F.lit(float("nan")))
                .when(F.col("event_id") % 89 == 0, F.lit(float("inf")))
                .when(F.col("event_id") % 83 == 0, F.lit(float("-inf")))
                .when(F.col("event_id") % 79 == 0, F.lit(1e300))
                .otherwise(F.col("value")),
            )
        if t == "embeddings":
            # poison ONE component, preserving the vector's dimension
            df = df.withColumn(
                "embedding",
                F.when(
                    F.col("vec_id") % 113 == 0,
                    F.transform(
                        "embedding",
                        lambda x, i: F.when(i == 0, F.lit(float("nan")).cast("float")).otherwise(x),
                    ),
                ).otherwise(F.col("embedding")),
            )
            # and ZERO whole vectors elsewhere: a failed encoder emits
            # all-zeros, which is finite but has norm 0 — under ANSI mode
            # cosine's divide-by-norm kills the job unless the index
            # excludes them (similarity._prep / oracle nrm > 0)
            df = df.withColumn(
                "embedding",
                F.when(
                    F.col("vec_id") % 109 == 0,
                    F.transform("embedding", lambda x: F.lit(0.0).cast("float")),
                ).otherwise(F.col("embedding")),
            )
        df.coalesce(1).write.mode("overwrite").parquet(str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def duck_poisoned(poisoned_sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{poisoned_sf_dir}/{t}.parquet/*.parquet'"
        )
    return con


@pytest.mark.parametrize("name", AFFECTED)
def test_twin_parity_survives_poisoned_floats(spark, poisoned_sf_dir, duck_poisoned, name):
    q = entrymod.queries()[name]
    sdf = q(spark, poisoned_sf_dir).toPandas()
    o = entrymod.oracle_sql().get(name)
    if o is None:
        return  # weak-checked op: executing without raising is the contract
    assert_frames_match(sdf, duck_poisoned.execute(o).df(), name)


def test_user_value_trend_corrupt_rows_leave_all_sums(spark):
    """A corrupt-value row must vanish from the fit entirely: keeping it
    would count it in n/Σx/Σx² while F.sum skips its NULL y in Σy/Σxy —
    a 'least-squares' of mismatched sums (review finding). Three points,
    one NaN: the fit must be the exact line through the two valid ones."""
    import datetime as dt

    from billing_etl_v1_spark.operators.timeseries import user_value_trend

    day = lambda d: dt.datetime(2024, 1, 1 + d, 0, 0, 0)  # noqa: E731
    df = spark.createDataFrame(
        [
            (7, day(0), 1.0),
            (7, day(1), 2.0),
            (7, day(2), float("nan")),
            (8, day(0), 5.0),
            (8, day(1), None),  # NULL value: same exclusion lane
            (8, day(2), 9.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = {r.user_id: r for r in user_value_trend(df).collect()}
    assert out[7].n_events == 2 and abs(out[7].slope_per_day - 1.0) < 1e-9
    assert out[7].mean_value == 1.5
    assert out[8].n_events == 2 and abs(out[8].slope_per_day - 2.0) < 1e-9
    assert out[8].mean_value == 7.0
