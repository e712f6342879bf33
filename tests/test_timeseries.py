"""Invariants for operators.timeseries and the range-band join beyond the
oracle hash check: spine completeness, gap semantics, sketch error bounds,
band partition totality."""

from __future__ import annotations

from pyspark.sql import functions as F

from billing_etl_v1_spark.operators import timeseries as ts
from billing_etl_v1_spark.plans import examples
from billing_etl_v1_spark.sources.readers import load_table
from tests.conftest import SF_SMALL

MONTH = "199506"


def _fact(spark):
    import __spark_entry__ as em

    fact, _ = em._billing_ctx(spark, SF_SMALL)
    return fact


def test_gap_fill_spine_is_complete_rectangle(spark):
    out = ts.gap_fill_daily(_fact(spark), MONTH).cache()
    n_accounts = out.select("billing_account_id").distinct().count()
    n_days = out.select("usage_day").distinct().count()
    # every (account, day) cell exactly once
    assert out.count() == n_accounts * n_days
    assert (
        out.groupBy("billing_account_id", "usage_day").count().filter("count > 1").count()
        == 0
    )
    # span matches the month's observed bounds
    lo, hi = out.agg(F.min("usage_day"), F.max("usage_day")).first()
    assert (hi - lo).days + 1 == n_days


def test_gap_fill_gap_rows_are_zero_and_real_rows_match_agg(spark):
    fact = _fact(spark)
    out = ts.gap_fill_daily(fact, MONTH).cache()
    assert out.filter((F.col("is_gap") == 1) & (F.col("day_cost") != 0.0)).count() == 0
    real = fact.filter(F.col("invoice_month") == MONTH).select(
        "billing_account_id", "usage_day"
    ).distinct()
    # non-gap rows are exactly the observed (account, day) pairs
    non_gap = out.filter(F.col("is_gap") == 0).select("billing_account_id", "usage_day")
    assert non_gap.exceptAll(real).count() == 0
    assert real.exceptAll(non_gap).count() == 0


def test_approx_stats_within_bounds_of_exact(spark):
    events = load_table(spark, SF_SMALL, "events")
    approx = ts.approx_group_stats(events).toPandas().set_index("event_type")
    exact = (
        ts.value_percentiles(events).toPandas().set_index("event_type")
    )
    for et, row in approx.iterrows():
        # HLL++ with rsd=0.01 on small exact counts: allow generous 5%
        assert abs(row.approx_users - row.exact_users) <= max(2, 0.05 * row.exact_users)
        ex = exact.loc[et]
        spread = ex.max_value - ex.min_value
        for q in (25, 50, 75, 90):
            assert abs(row[f"approx_p{q}"] - ex[f"p{q}"]) <= 0.05 * spread + 1e-9


def test_price_bands_partition_every_part(spark):
    part = load_table(spark, SF_SMALL, "part")
    out = examples.price_band_summary(part).toPandas()
    assert out.n_parts.sum() == part.count()
    assert out.band.is_unique
