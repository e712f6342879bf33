"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash).

The testdata has no billing tables, so the billing queries derive the
fact/dim deterministically from ``lineitem`` with SQL text shared verbatim
between Spark and DuckDB (billing_etl_v1_spark/sources/synthetic.py); the
oracle then re-implements the chosen reference semantics (SURVEY §2.10)
independently in DuckDB SQL (billing_etl_v1_spark/oracle.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from billing_etl_v1_spark import oracle
from billing_etl_v1_spark.functions import round_doubles
from billing_etl_v1_spark.operators import aggregate as agg_ops
from billing_etl_v1_spark.operators.credits import credits_pivot
from billing_etl_v1_spark.operators.pricing import (
    apply_extra_discount,
    with_internal_measures,
    with_pricing_modes,
)
from billing_etl_v1_spark.operators.rules import (
    RULE_COLUMNS,
    dedupe_dim,
    match_rules,
)
from billing_etl_v1_spark.plans.pipeline import billing_pipeline, with_contract_month
from billing_etl_v1_spark.sources import synthetic
from billing_etl_v1_spark.sources.readers import register_views


def _billing_ctx(spark: SparkSession, sf_dir: str, with_arrays: bool = False):
    register_views(spark, sf_dir, ["lineitem"])
    return synthetic.fact_df(spark, with_arrays=with_arrays), synthetic.dim_df(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fact, dim = _billing_ctx(spark, "/root/testdata/sf0.001")
    return billing_pipeline(
        fact,
        dim,
        extra_discounts=oracle.TEST_EXTRA_DISCOUNTS,
        include_etl_time=False,
    )


# --- billing queries -------------------------------------------------------


def _q_source_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    fact, _ = _billing_ctx(spark, sf_dir)
    return round_doubles(agg_ops.source_aggregate(fact, keys=agg_ops.PIPELINE_KEYS))


def _q_source_agg_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    fact, _ = _billing_ctx(spark, sf_dir)
    return round_doubles(agg_ops.source_aggregate(fact, keys=agg_ops.DETAIL_KEYS))


def _q_minmax_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    fact, _ = _billing_ctx(spark, sf_dir)
    return agg_ops.min_max_usage_day(fact, oracle.FLAGSHIP_MONTH)


def _q_distinct_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    fact, _ = _billing_ctx(spark, sf_dir)
    return agg_ops.distinct_accounts(fact)


def _q_dim_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, dim = _billing_ctx(spark, sf_dir)
    p, s, k = (F.col(c).isNotNull() for c in ("project_id", "service_description", "sku_id"))
    rule = (
        F.when(~p & ~s & ~k, 1)
        .when(p & ~s & ~k, 2)
        .when(~p & s & ~k, 3)
        .when(p & s & ~k, 4)
        .when(~p & ~s & k, 5)
        .when(p & ~s & k, 6)
        .when(~p & s & k, 7)
        .otherwise(8)
    )
    return dedupe_dim(dim).withColumn("rule", rule)


def _matched_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    fact, dim = _billing_ctx(spark, sf_dir)
    fact = fact.filter(F.col("invoice_month") == oracle.FLAGSHIP_MONTH)
    agg = agg_ops.source_aggregate(
        with_contract_month(fact), keys=agg_ops.DETAIL_KEYS, extra_keys=["contract_month"]
    )
    return match_rules(agg, dim, month_col="contract_month")


def _q_rule_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _matched_detail(spark, sf_dir).select(*agg_ops.DETAIL_KEYS, *RULE_COLUMNS)


def _q_credits_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    fact, _ = _billing_ctx(spark, sf_dir, with_arrays=True)
    # drop the scalar buckets so the pivot must reconstruct them from the
    # nested arrays (reference raw-rows path, calculate/service.py:140-162)
    out = credits_pivot(fact)
    return round_doubles(
        out.select(
            "usage_day",
            "billing_account_id",
            "project_id",
            "sku_id",
            "cost_type",
            "cost_at_list",
            *[c for c in out.columns if c.startswith("c_") and c != "c_unknown"],
            "internal_credits_cost",
            "internal_credits_consumption",
        )
    )


def _q_pricing_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    priced = with_pricing_modes(
        apply_extra_discount(
            with_internal_measures(_matched_detail(spark, sf_dir)),
            oracle.TEST_EXTRA_DISCOUNTS,
        )
    )
    return round_doubles(
        priced.select(
            *agg_ops.DETAIL_KEYS,
            F.coalesce(F.col("mode").cast("int"), F.lit(0)).alias("mode"),
            F.coalesce("internal_cost", F.lit(0.0)).alias("internal_cost"),
            F.coalesce("internal_consumption", F.lit(0.0)).alias("internal_consumption"),
            F.coalesce("external_consumption", F.lit(0.0)).alias("external_consumption"),
            F.coalesce("discount_amount", F.lit(0.0)).alias("discount_amount"),
        )
    )


def _flagship(month: str | None, grain: str) -> Callable[[SparkSession, str], DataFrame]:
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        fact, dim = _billing_ctx(spark, sf_dir)
        return round_doubles(
            billing_pipeline(
                fact,
                dim,
                invoice_month=month,
                grain=grain,
                extra_discounts=oracle.TEST_EXTRA_DISCOUNTS,
                include_etl_time=False,
            )
        )

    return q


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {
        "billing_source_agg": _q_source_agg,
        "billing_source_agg_detail": _q_source_agg_detail,
        "billing_minmax_day": _q_minmax_day,
        "billing_distinct_accounts": _q_distinct_accounts,
        "billing_dim_rules": _q_dim_rules,
        "billing_rule_match": _q_rule_match,
        "billing_credits_pivot": _q_credits_pivot,
        "billing_pricing_modes": _q_pricing_modes,
        "billing_flagship_month": _flagship(oracle.FLAGSHIP_MONTH, "detail"),
        "billing_flagship": _flagship(None, "detail"),
        "billing_flagship_production": _flagship(None, "pipeline"),
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every query above."""
    return {
        "billing_source_agg": oracle.source_agg_sql(oracle.PIPELINE_KEYS),
        "billing_source_agg_detail": oracle.source_agg_sql(oracle.DETAIL_KEYS),
        "billing_minmax_day": oracle.minmax_day_sql(),
        "billing_distinct_accounts": oracle.distinct_accounts_sql(),
        "billing_dim_rules": oracle.dim_rules_sql(),
        "billing_rule_match": oracle.rule_match_sql(),
        "billing_credits_pivot": oracle.credits_pivot_sql(),
        "billing_pricing_modes": oracle.pricing_modes_sql(),
        "billing_flagship_month": oracle.flagship_sql(month=oracle.FLAGSHIP_MONTH),
        "billing_flagship": oracle.flagship_sql(),
        "billing_flagship_production": oracle.flagship_sql(grain="pipeline"),
    }
