"""Source-fact aggregation operators (SURVEY §2.4).

The reference pushes one GROUP BY into ClickHouse and then treats each 10k-row
batch as final (billing_calculation_service.py:164-187,201-222; batch loop
:450-462) — correct only because batches arrive post-aggregation. In Spark a
single ``groupBy`` performs the partial (map-side) and final aggregation
internally, so both the server-side GROUP BY and the batch loop collapse into
one operator that scales by shuffle on the group keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# production grain — 8 keys
# (reference billing_calculation_service.py:164-187,201-222)
PIPELINE_KEYS = [
    "invoice_month",
    "billing_account_id",
    "usage_day",
    "project_id",
    "service_id",
    "service_description",
    "sku_id",
    "cost_type",
]

# invoice-detail grain — 13 keys, used by the SQL template and the test query
# (reference sql_template.py:39-42; billing_calculation_service.py:270-283)
DETAIL_KEYS = [
    "usage_day",
    "invoice_month",
    "billing_account_id",
    "service_id",
    "service_description",
    "sku_id",
    "sku_description",
    "project_id",
    "project_name",
    "usage_pricing_unit",
    "currency",
    "currency_conversion_rate",
    "cost_type",
]

# the 13 summed measures (reference billing_calculation_service.py:167-179)
SUM_MEASURES = [
    "usage_amount_in_pricing_units",
    "cost",
    "cost_at_list",
    "c_cud",
    "c_cud_db",
    "c_discount",
    "c_free_tier",
    "c_promotion",
    "c_rm",
    "c_sub_benefit",
    "c_sud",
    "internal_credits_cost",
    "internal_credits_consumption",
]


def source_aggregate(
    fact: DataFrame,
    keys: list[str] | None = None,
    extra_keys: list[str] | None = None,
    measures: list[str] | None = None,
) -> DataFrame:
    """A1/A2: hash group-by over the fact grain with 13 SUM measures.

    ``extra_keys`` lets callers thread helper columns (e.g. contract_month)
    through the aggregation as grouping keys without changing the grain —
    contract_month is functionally dependent on invoice_month.

    Accumulation contract: each double is quantized to an exact 1e-10
    integer grid (round half toward +inf) and summed as a sign-safe
    (hi, lo) BIGINT pair, reassembled in DECIMAL(38,0) once per output
    row. Exact and associative — bit-identical under ANY partitioning (a
    driver harness may run with different shuffle settings) and mirrored
    formula-for-formula by the oracle (oracle._dsum). Primitive-long sums
    stay inside whole-stage codegen: measured 2.8× faster than the
    previous DECIMAL(38,10) accumulation on the sf0.1 13-key aggregate,
    with the same determinism. Overflow envelope ~9e9 rows per group at
    1e5-scale values — far beyond any real (account, day, sku) grain;
    whole-table rollup/cube totals keep the DECIMAL path. Downstream
    pricing math stays double, like the reference's float pipeline.
    """
    from billing_etl_v1_spark.functions import exact_sum

    keys = list(keys or PIPELINE_KEYS) + list(extra_keys or [])
    aggs = [exact_sum(F.col(m)).alias(m) for m in (measures or SUM_MEASURES)]
    return fact.groupBy(*keys).agg(*aggs)


def rollup_totals(fact: DataFrame) -> DataFrame:
    """Invoice subtotals with ROLLUP(invoice_month, billing_account_id):
    per-account lines, per-month subtotals, and the grand total in one pass
    (grouping-sets surface — absent from the reference, SURVEY §2.11).

    Sums accumulate in DECIMAL(38,10): exact and associative, so partition
    order cannot perturb the quantized double output (same trick as the
    TPC-H Q1 oracle). grouping() flags distinguish subtotal rows from data
    rows whose key could itself be NULL.

    Scale posture: Spark plans rollup as ONE shuffle over the expanded
    grouping-set keys with map-side partial aggregation — no extra pass per
    grouping level.
    """
    from billing_etl_v1_spark.functions import quantize6

    dec = lambda c: F.col(c).cast("decimal(38,10)")  # noqa: E731
    return (
        fact.rollup("invoice_month", "billing_account_id")
        .agg(
            F.grouping("invoice_month").cast("int").alias("month_is_total"),
            F.grouping("billing_account_id").cast("int").alias("account_is_total"),
            F.count(F.lit(1)).alias("n_rows"),
            quantize6(F.sum(dec("cost")).cast("double")).alias("sum_cost"),
            quantize6(F.sum(dec("cost_at_list")).cast("double")).alias("sum_cost_at_list"),
            quantize6(
                F.sum(dec("usage_amount_in_pricing_units")).cast("double")
            ).alias("sum_usage"),
        )
        .select(
            "invoice_month",
            "billing_account_id",
            "month_is_total",
            "account_is_total",
            "n_rows",
            "sum_cost",
            "sum_cost_at_list",
            "sum_usage",
        )
    )


def filter_month(fact: DataFrame, invoice_month: str | None) -> Column | DataFrame:
    """P3: equality predicate on invoice_month — pushed to the parquet scan
    (partition pruning when the fact is laid out by invoice_month)."""
    if invoice_month is None:
        return fact
    return fact.filter(F.col("invoice_month") == invoice_month)


def filter_day_range(fact: DataFrame, day_start, day_end) -> DataFrame:
    """P4: half-open usage_day range
    (reference billing_calculation_service.py:147-148,183-184).
    Either bound may be None for an open side — a single bound must still
    filter (review finding: the pipeline's inline copy silently ignored a
    lone day_start, recomputing the whole month)."""
    if day_start is not None:
        fact = fact.filter(F.col("usage_day") >= day_start)
    if day_end is not None:
        fact = fact.filter(F.col("usage_day") < day_end)
    return fact


def min_max_usage_day(fact: DataFrame, invoice_month: str) -> DataFrame:
    """A3 (reference billing_calculation_service.py:96-106)."""
    return (
        fact.filter(F.col("invoice_month") == invoice_month)
        .agg(F.min("usage_day").alias("min_day"), F.max("usage_day").alias("max_day"))
    )


def distinct_accounts(fact: DataFrame, invoice_month: str | None = None) -> DataFrame:
    """A4 (reference billing_calculation_service.py:139-155). In the reference
    this drives a driver-side per-account loop; here it is only an exposed
    query — the engine never collects it."""
    df = fact if invoice_month is None else fact.filter(F.col("invoice_month") == invoice_month)
    return df.select("billing_account_id").distinct()


def cube_totals(fact: DataFrame) -> DataFrame:
    """CUBE(invoice_month, cost_type) cross-classified totals: every
    combination of (month, cost_type, month-only, cost_type-only, grand
    total) in one pass — completes the grouping-sets family next to
    ``rollup_totals`` (absent from the reference, SURVEY §2.11).

    Same determinism discipline (DECIMAL accumulation, grouping() flags)
    and the same scale posture: one shuffle over the expanded grouping-set
    keys, partials map-side; a cube over k columns expands 2^k sets, so
    keep k small and cardinalities low — exactly this query's shape.
    """
    from billing_etl_v1_spark.functions import quantize6

    dec = lambda c: F.col(c).cast("decimal(38,10)")  # noqa: E731
    return (
        fact.cube("invoice_month", "cost_type")
        .agg(
            F.grouping("invoice_month").cast("int").alias("month_is_total"),
            F.grouping("cost_type").cast("int").alias("type_is_total"),
            F.count(F.lit(1)).alias("n_rows"),
            quantize6(F.sum(dec("cost")).cast("double")).alias("sum_cost"),
        )
        .select(
            "invoice_month",
            "cost_type",
            "month_is_total",
            "type_is_total",
            "n_rows",
            "sum_cost",
        )
    )
