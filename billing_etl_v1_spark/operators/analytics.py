"""Window/analytic and set-operator surface over the billing fact.

The reference has NO window functions, sorts, or set operators
(SURVEY §2.11) — these are extension operators a switching user gains for
free from the Spark engine: running invoice totals, month-over-month
movement, and new-account detection.

Determinism discipline (same as operators.aggregate): every sum that feeds
a hashed output accumulates in DECIMAL(38,10) — exact and associative — so
partition order cannot perturb the quantized double results, and the running
window sums equal DuckDB's bit-for-bit.

Scale posture: each operator is two keyed shuffles — the grain aggregation,
then a repartition onto the window keys (hash on (month, account, day) does
NOT satisfy a (month, account) window, so Spark must re-exchange; the
re-exchanged relation is the already-aggregated day grain, orders of
magnitude smaller than the fact). All windows over the same keys share one
sort. No driver-side collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from billing_etl_v1_spark.functions import quantize6


def _dec(col: str):
    return F.col(col).cast("decimal(38,10)")


def daily_running_totals(fact: DataFrame) -> DataFrame:
    """Per (invoice_month, billing_account_id): day-grain cost, cumulative
    month-to-date cost, day rank, and each day's share of the month total.

    Shuffle 1 aggregates to the (month, account, day) grain; shuffle 2
    re-exchanges that small grain onto (month, account) where the ordered
    and unordered windows share one sort. The cumulative frame is ROWS
    UNBOUNDED PRECEDING over the unique day grain, so the running sum is
    well-defined.
    """
    day = (
        fact.groupBy("invoice_month", "billing_account_id", "usage_day")
        .agg(F.sum(_dec("cost")).alias("__day_cost"))
    )
    w_cum = (
        Window.partitionBy("invoice_month", "billing_account_id")
        .orderBy("usage_day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_ord = Window.partitionBy("invoice_month", "billing_account_id").orderBy("usage_day")
    w_all = Window.partitionBy("invoice_month", "billing_account_id")
    total = F.sum(F.col("__day_cost")).over(w_all)
    return (
        day.withColumn("running_cost", F.sum("__day_cost").over(w_cum))
        .withColumn("day_rank", F.row_number().over(w_ord).cast("int"))
        .withColumn(
            "month_share",
            F.when(
                total.cast("double") != 0.0,
                F.col("__day_cost").cast("double") / total.cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .select(
            "invoice_month",
            "billing_account_id",
            "usage_day",
            quantize6(F.col("__day_cost").cast("double")).alias("day_cost"),
            quantize6(F.col("running_cost").cast("double")).alias("running_cost"),
            "day_rank",
            quantize6(F.col("month_share")).alias("month_share"),
        )
    )


def month_over_month(fact: DataFrame) -> DataFrame:
    """Per-account monthly cost with the previous month's cost and delta
    (LAG over months; 'YYYYMM' strings order lexicographically)."""
    month = (
        fact.groupBy("billing_account_id", "invoice_month")
        .agg(F.sum(_dec("cost")).alias("__cost"))
    )
    w = Window.partitionBy("billing_account_id").orderBy("invoice_month")
    prev = F.lag("__cost").over(w)
    return month.select(
        "billing_account_id",
        "invoice_month",
        quantize6(F.col("__cost").cast("double")).alias("month_cost"),
        quantize6(F.coalesce(prev, F.lit(0)).cast("double")).alias("prev_month_cost"),
        (prev.isNotNull()).cast("int").alias("has_prev"),
        quantize6((F.col("__cost") - F.coalesce(prev, F.lit(0))).cast("double")).alias(
            "mom_delta"
        ),
    )


def new_usage_lines(fact: DataFrame, invoice_month: str, prior_month: str) -> DataFrame:
    """Usage lines — (account, project, sku) combos — billed in
    ``invoice_month`` but absent from ``prior_month``: the month's distinct
    combos EXCEPT the prior month's (set-op surface; implemented as a
    left-anti join so the big fact never collects).

    At scale both sides reduce to distinct projections of three narrow
    columns — a map-side-combined shuffle each — and the anti join is a
    plain hash join AQE converts to broadcast when the prior set is small.
    """
    keys = ["billing_account_id", "project_id", "sku_id"]
    cur = fact.filter(F.col("invoice_month") == invoice_month).select(*keys).distinct()
    prior = fact.filter(F.col("invoice_month") == prior_month).select(*keys).distinct()
    return cur.join(prior, on=keys, how="left_anti")


def repeat_usage_lines(
    fact: DataFrame, invoice_month: str, prior_month: str
) -> DataFrame:
    """INTERSECT twin of :func:`new_usage_lines`: the (account, project, sku)
    combos billed in BOTH months — a left-semi join over the two distinct
    projections, the retention-analysis counterpart to new-line detection.
    Same scale shape: two narrow map-side-combined distincts and one hash
    join AQE broadcasts when a side is small."""
    keys = ["billing_account_id", "project_id", "sku_id"]
    cur = fact.filter(F.col("invoice_month") == invoice_month).select(*keys).distinct()
    prior = fact.filter(F.col("invoice_month") == prior_month).select(*keys).distinct()
    return cur.join(prior, on=keys, how="left_semi")


def rolling_daily_cost(fact: DataFrame, window_days: int = 7) -> DataFrame:
    """RANGE-frame moving window: per-account daily cost with the
    ``window_days``-day trailing sum and average — the range frame covers
    VALUE distance (calendar days, including absent ones), not row count,
    which is the frame shape a gap-filled rows-frame cannot express.

    The frame orders by integer epoch-day (datediff from 1970-01-01), so
    both engines resolve identical frame bounds — interval-typed RANGE
    frames differ subtly across engines around DST/timezones; integers
    don't. Scale shape: one aggregation shuffle to day grain, one window
    exchange on account — the window input is the tiny day-grain relation.
    """
    daily = fact.groupBy("billing_account_id", "usage_day").agg(
        F.sum(_dec("cost")).alias("__c")
    )
    epoch_day = F.datediff(F.col("usage_day"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("billing_account_id")
        .orderBy(epoch_day)
        .rangeBetween(-(window_days - 1), 0)
    )
    return daily.select(
        "billing_account_id",
        "usage_day",
        quantize6(F.col("__c").cast("double")).alias("day_cost"),
        quantize6(F.sum("__c").over(w).cast("double")).alias("trailing_sum"),
        quantize6(
            (F.sum("__c").over(w).cast("double") / F.count(F.lit(1)).over(w))
        ).alias("trailing_avg"),
        F.count(F.lit(1)).over(w).alias("days_present"),
    )


def month_reconciliation(
    fact: DataFrame, month_a: str = "199506", month_b: str = "199507"
) -> DataFrame:
    """FULL OUTER reconciliation of two invoice months at account grain:
    every account present in either month, with both totals, the delta, and
    a status (added / removed / changed / unchanged) — the billing-close
    sanity report a finance team runs after each cycle (full-outer shape;
    the reference has no set/outer operators, SURVEY §2.11).

    Scale shape: two month-pruned aggregates shuffle on account; the outer
    join co-partitions with them (same key), so no extra exchange. DECIMAL
    sums make the delta and the unchanged-test exact — a double sum could
    flip 'unchanged' to 'changed' across partitionings.
    """
    def month_totals(month: str, alias: str) -> DataFrame:
        return (
            fact.filter(F.col("invoice_month") == month)
            .groupBy("billing_account_id")
            .agg(F.sum(_dec("cost")).alias(alias))
        )

    a = month_totals(month_a, "__ca")
    b = month_totals(month_b, "__cb")
    joined = a.join(b, "billing_account_id", "full_outer")
    ca, cb = F.col("__ca"), F.col("__cb")
    status = (
        F.when(ca.isNull(), F.lit("added"))
        .when(cb.isNull(), F.lit("removed"))
        .when(ca == cb, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        "billing_account_id",
        quantize6(F.coalesce(ca, F.lit(0)).cast("double")).alias("cost_a"),
        quantize6(F.coalesce(cb, F.lit(0)).cast("double")).alias("cost_b"),
        quantize6((F.coalesce(cb, F.lit(0)) - F.coalesce(ca, F.lit(0))).cast("double")).alias(
            "delta"
        ),
        status.alias("status"),
    )


def monthly_cost_forecast(fact: DataFrame, min_months: int = 2) -> DataFrame:
    """Per-account next-month cost projection: least-squares trend over the
    account's monthly cost totals, evaluated one month past its latest —
    the naive-but-honest baseline a billing close puts next to actuals
    (and the shape any fancier model slots into).

    Cross-engine exactness (the user_value_trend playbook): monthly totals
    accumulate in DECIMAL(38,10) (exact), quantize to 1e-6 integer units
    via exact decimal floor, and all regression sums are BIGINT — so the
    closed-form doubles are bit-identical in DuckDB. One month-grain
    aggregate, one account-grain aggregate; no windows at all.
    """
    month = fact.groupBy("billing_account_id", "invoice_month").agg(
        F.sum(_dec("cost")).alias("__c")
    )
    midx = (
        F.substring("invoice_month", 1, 4).cast("int") * 12
        + F.substring("invoice_month", 5, 2).cast("int")
    ).cast("bigint")
    yk = F.floor(F.col("__c") * F.lit(1_000_000)).cast("bigint")
    staged = month.select(
        "billing_account_id", midx.alias("__x"), yk.alias("__yk")
    )
    x, y = F.col("__x"), F.col("__yk")
    agg = staged.groupBy("billing_account_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.max("__x").alias("__maxx"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__syk"),
        F.sum(x * y).alias("__sxyk"),
        F.sum(x * x).alias("__sxx"),
    )
    n = F.col("n_months").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__syk").cast("double") / F.lit(1_000_000.0)
    sxy = F.col("__sxyk").cast("double") / F.lit(1_000_000.0)
    sxx = F.col("__sxx").cast("double")
    denom = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / denom
    intercept = (sy - slope * sx) / n
    nxt = (F.col("__maxx") + 1).cast("double")
    return (
        agg.filter((F.col("n_months") >= min_months) & (denom != 0))
        .select(
            "billing_account_id",
            "n_months",
            quantize6(slope).alias("slope_per_month"),
            quantize6(intercept + slope * nxt).alias("forecast_next_cost"),
        )
    )


def effective_unit_price(fact: DataFrame) -> DataFrame:
    """Per (sku, month) effective unit price: exact cost and usage sums,
    one division — the pricing-drift report a billing analyst reads next
    to the contract dim (a moving effective price on a fixed-price SKU
    means mix shift or misconfigured rules). Rows with zero usage are
    excluded (no price is defined there)."""
    agg = fact.groupBy("sku_id", "invoice_month").agg(
        F.sum(_dec("cost")).alias("__c"),
        F.sum(_dec("usage_amount_in_pricing_units")).alias("__u"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )
    return agg.filter(F.col("__u") != 0).select(
        "sku_id",
        "invoice_month",
        "n_lines",
        quantize6(F.col("__c").cast("double")).alias("total_cost"),
        quantize6(F.col("__u").cast("double")).alias("total_usage"),
        # divide as DOUBLES of the exact decimal sums: decimal division
        # derives engine-specific result scales (rounding), double division
        # of identical inputs is IEEE-identical everywhere
        quantize6(
            F.col("__c").cast("double") / F.col("__u").cast("double")
        ).alias("effective_unit_price"),
    )


def account_statement(fact: DataFrame) -> DataFrame:
    """Per-(account, month) statement rollup — the numbers at the top of
    an invoice: line count, exact cost/credit/consumption totals, and the
    account's top service by cost that month (struct-max argmax with a
    service_id tiebreak — no window). Exact DECIMAL accumulation; one
    two-level aggregate."""
    svc = fact.groupBy("billing_account_id", "invoice_month", "service_id").agg(
        F.sum(_dec("cost")).alias("__svc_cost")
    )
    top_svc = svc.groupBy("billing_account_id", "invoice_month").agg(
        F.max(
            F.struct(
                F.col("__svc_cost").alias("c"),
                F.col("service_id").alias("s"),
            )
        )["s"].alias("top_service_id")
    )
    totals = fact.groupBy("billing_account_id", "invoice_month").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        quantize6(F.sum(_dec("cost")).cast("double")).alias("total_cost"),
        quantize6(F.sum(_dec("internal_credits_cost")).cast("double")).alias(
            "total_credits"
        ),
        quantize6(
            F.sum(_dec("internal_credits_consumption")).cast("double")
        ).alias("total_consumption"),
    )
    return totals.join(top_svc, ["billing_account_id", "invoice_month"])


def weekday_profile(fact: DataFrame) -> DataFrame:
    """Cost by day-of-week — the weekly seasonality fingerprint. Weekday
    comes from epoch-day arithmetic against a known Monday
    (``datediff(day, 1970-01-05) % 7``), NOT the engines' dayofweek()
    functions, whose 0/1-based and Sunday/Monday-first conventions
    differ; integer math is convention-free. 0 = Monday."""
    wd = (
        F.pmod(
            F.datediff(F.col("usage_day"), F.lit("1970-01-05").cast("date")), F.lit(7)
        )
    ).cast("int")
    return (
        fact.groupBy(wd.alias("weekday"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            quantize6(F.sum(_dec("cost")).cast("double")).alias("total_cost"),
        )
    )
