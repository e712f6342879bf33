"""General relational queries on the TPC-H-ish tables.

These showcase the engine surface beyond the billing pipeline — multi-way
broadcast joins, sorted aggregates, window top-k — all shapes the reference
lacks (SURVEY §2.11) but a switching user would expect from an analytics
engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from billing_etl_v1_spark.functions import quantize6


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: grouped sums/averages with
    map-side partial aggregation.

    Sums use the exact (hi, lo) BIGINT-pair accumulation (functions.
    exact_sum): associative, so the result is independent of partition
    order — double sums over 10k+-row groups differ across engines beyond
    the 1e-6 quantization and would break the oracle hash (and, at 100 TB,
    reproducibility across runs) — at primitive-long speed."""
    from billing_etl_v1_spark.functions import exact_sum

    cnt = F.count(F.lit(1))
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            quantize6(exact_sum(F.col("l_quantity"))).alias("sum_qty"),
            quantize6(exact_sum(F.col("l_extendedprice"))).alias("sum_base_price"),
            quantize6(exact_sum(disc_price)).alias("sum_disc_price"),
            quantize6(exact_sum(F.col("l_quantity")) / cnt).alias("avg_qty"),
            quantize6(exact_sum(F.col("l_discount")) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1996-07-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3-shaped shipping-priority query: 3-way join with filters on
    both fact sides, revenue aggregation, deterministic top-k.

    Scale shape: customer is broadcast (small dim after the segment
    filter); orders⋈lineitem is the one real shuffle, on l_orderkey — at
    100 TB that is a sort-merge join AQE can skew-split. Revenue
    accumulates in DECIMAL(38,10) so the top-k cutoff is exact and the
    selected row SET (not just the values) is identical across engines and
    partitionings; ties break by orderkey.
    """
    revenue = (
        lineitem.filter(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp"))
        .join(
            orders.filter(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == segment)),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
                    "decimal(38,10)"
                )
            ).alias("__rev")
        )
    )
    return (
        revenue.orderBy(F.col("__rev").desc(), F.col("l_orderkey").asc())
        .limit(k)
        .select(
            "l_orderkey",
            "o_orderdate",
            "o_orderpriority",
            quantize6(F.col("__rev").cast("double")).alias("revenue"),
        )
    )


PRICE_BANDS = [
    ("budget", 0.0, 905.0),
    ("mid", 905.0, 915.0),
    ("premium", 915.0, 950.0),
    ("luxury", 950.0, float("inf")),
]


def price_band_summary(part: DataFrame) -> DataFrame:
    """Range (non-equi) join surface: classify parts into half-open retail
    price bands [lo, hi) held in a tiny banding dimension, then aggregate
    per band.

    The band table is broadcast, so the non-equi condition executes as a
    broadcast nested-loop join — each part row scans 4 in-memory band rows,
    no shuffle of the big side and no cartesian blow-up. This is the
    idiomatic Spark shape for interval/banding joins whenever one side is
    small; two LARGE interval sides take the bucketed interval-overlap
    decomposition instead — implemented as operators.intervals.interval_join
    (r8; same banding idea as operators.dedup's LSH pair join).
    """
    spark = part.sparkSession
    bands = spark.createDataFrame(
        [(n, lo, hi) for n, lo, hi in PRICE_BANDS],
        "band string, lo double, hi double",
    )
    joined = part.join(
        F.broadcast(bands),
        (F.col("p_retailprice") >= F.col("lo")) & (F.col("p_retailprice") < F.col("hi")),
    )
    return joined.groupBy("band", "lo").agg(
        F.count(F.lit(1)).alias("n_parts"),
        quantize6(
            F.sum(F.col("p_retailprice").cast("decimal(38,10)")).cast("double")
        ).alias("total_retail"),
        quantize6(F.min("p_retailprice")).alias("min_price"),
        quantize6(F.max("p_retailprice")).alias("max_price"),
    )


def local_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5-shaped local-supplier volume: 6-table join where the
    customer and supplier nations must MATCH (c_nationkey = s_nationkey),
    revenue per nation within one region and order-date year.

    Scale shape: region/nation/supplier are broadcast; customer⋈orders and
    ⋈lineitem are the two real shuffles (custkey, then orderkey) — at
    100 TB both are sort-merge joins AQE can size. The date filter sits on
    orders BEFORE any join so partition/row-group pruning cuts the scan;
    the nation-match predicate rides the broadcast supplier join instead
    of a post-join filter, so mismatched rows never materialize.
    """
    asian_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    revenue = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(asian_nations), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return revenue.groupBy("n_name").agg(
        quantize6(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
                    "decimal(38,10)"
                )
            ).cast("double")
        ).alias("revenue")
    )


def forecast_revenue_change(
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H Q6-shaped forecast query: pure scan → filter → global aggregate.

    Every predicate is a plain column comparison, so ALL of them push down
    to the parquet scan (row-group min/max skipping); the scan reads only
    the 4 referenced columns. At 100 TB this is the best case for Spark —
    no shuffle at all except the single-row final aggregate.
    """
    filtered = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        & (F.col("l_discount") >= disc_lo)
        & (F.col("l_discount") <= disc_hi)
        & (F.col("l_quantity") < max_qty)
    )
    return filtered.agg(
        quantize6(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(38,10)"))
            .cast("double")
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def late_shipment_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-07-01",
    grace_days: int = 90,
) -> DataFrame:
    """TPC-H Q4-shaped existence check: orders in a window that had at least
    one lineitem shipped more than `grace_days` after the order date,
    counted per order priority.

    The EXISTS becomes a LEFT SEMI join — Spark dedupes the probe side
    during the join, so there is no distinct-aggregation of lineitem keys
    and each qualifying order is counted exactly once. The join condition
    carries the non-equi lateness predicate, so non-late lineitems are
    discarded inside the join instead of materializing a joined row first
    (reference has no such operator class; SURVEY §2.11 extension).
    """
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    )
    late = o.join(
        lineitem,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {grace_days} DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


def returned_item_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10-shaped returned-item report: revenue lost to returns per
    customer in one quarter, top-k customers.

    Scale shape: orders is filtered to the quarter BEFORE joining (partition
    pruning on the date), lineitem filters to returnflag='R' at the scan;
    the orders⋈lineitem shuffle on orderkey is the only large exchange —
    customer and nation broadcast. DECIMAL revenue keeps the top-k row set
    exact; ties break by custkey.
    """
    rev = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
                    "decimal(38,10)"
                )
            ).alias("__rev")
        )
    )
    return (
        rev.orderBy(F.col("__rev").desc(), F.col("c_custkey").asc())
        .limit(k)
        .select(
            "c_custkey",
            "c_name",
            quantize6(F.col("c_acctbal")).alias("c_acctbal"),
            "n_name",
            quantize6(F.col("__rev").cast("double")).alias("revenue"),
        )
    )


HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")


def priority_shipping_mix(
    orders: DataFrame, lineitem: DataFrame, grace_days: int = 60
) -> DataFrame:
    """TPC-H Q12-shaped conditional aggregation: among lineitems shipped
    more than `grace_days` after their order date, count high- vs
    low-priority order lines per ship year.

    The CASE sums are map-side partial aggregates over the single
    orderkey-join shuffle; the high/low split never widens the row.
    """
    late = orders.join(
        lineitem,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {grace_days} DAYS")),
    )
    is_high = F.col("o_orderpriority").isin(*HIGH_PRIORITIES)
    return late.groupBy(F.year("l_shipdate").cast("int").alias("ship_year")).agg(
        F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
    )


def promo_revenue_share(
    lineitem: DataFrame,
    part: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    promo_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q14-shaped promotion-effect query: per ship month, the share of
    revenue from promo-typed parts.

    part broadcasts; the conditional numerator and total denominator
    accumulate in DECIMAL in one aggregate pass, so the percentage is a
    single deterministic double division at the end.
    """
    joined = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(38,10)"
    )
    agg = joined.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month")).agg(
        F.sum(F.when(F.col("p_type") == promo_type, rev).otherwise(F.lit(0).cast("decimal(38,10)"))).alias("__promo"),
        F.sum(rev).alias("__total"),
    )
    return agg.select(
        "ship_month",
        quantize6(F.lit(100.0) * F.col("__promo").cast("double") / F.col("__total").cast("double")).alias(
            "promo_revenue_pct"
        ),
        quantize6(F.col("__total").cast("double")).alias("total_revenue"),
    )


def supplier_part_diversity(
    part: DataFrame, lineitem: DataFrame, supplier: DataFrame
) -> DataFrame:
    """TPC-H Q16-shaped supplier diversity: how many distinct suppliers in
    good standing shipped each (p_type, p_size bucket), using lineitem as
    the part↔supplier association (this schema has no partsupp table).

    Suppliers with negative account balance are excluded via LEFT ANTI
    join (Q16's complaints-suppliers exclusion). The distinct count runs as
    partial distinct aggregation on the orderkey-free (partkey, suppkey)
    projection — lineitem is never widened by the join.
    """
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    assoc = (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    return assoc.groupBy("p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


def large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: float = 200.0,
) -> DataFrame:
    """TPC-H Q18-shaped large-volume-order report: orders whose total
    quantity exceeds `min_qty`, with their customer.

    The HAVING subquery is a grouped aggregate on lineitem joined back to
    orders — the aggregate output is tiny (only qualifying orderkeys), so
    AQE converts the orders join to broadcast at runtime. Quantity sums
    accumulate in DECIMAL so the threshold cut is exact across engines.
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,10)")).alias("__qty"))
        .filter(F.col("__qty") > F.lit(min_qty).cast("decimal(38,10)"))
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            quantize6(F.col("o_totalprice")).alias("o_totalprice"),
            quantize6(F.col("__qty").cast("double")).alias("total_qty"),
        )
    )


BRAND_QTY_BANDS = [
    ("Brand#1", 1, 20, 1.0, 20.0),
    ("Brand#2", 1, 35, 10.0, 35.0),
    ("Brand#3", 1, 50, 20.0, 50.0),
]


def brand_quantity_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19-shaped disjunctive-predicate join: revenue from three
    (brand, size range, quantity range) bands OR-ed together.

    The disjunction lives in the broadcast-hash-join condition (equi on
    partkey + residual OR filter), so Catalyst still picks a hash join on
    the equi part — the OR never forces a nested-loop over the big side.
    One output row per band keeps the result auditable.
    """
    conds = [
        (
            (F.col("p_brand") == b)
            & (F.col("p_size") >= szlo)
            & (F.col("p_size") <= szhi)
            & (F.col("l_quantity") >= qlo)
            & (F.col("l_quantity") <= qhi)
        )
        for b, szlo, szhi, qlo, qhi in BRAND_QTY_BANDS
    ]
    disjunction = conds[0]
    for c in conds[1:]:
        disjunction = disjunction | c
    joined = lineitem.join(
        F.broadcast(part), (F.col("l_partkey") == F.col("p_partkey")) & disjunction
    )
    return joined.groupBy("p_brand").agg(
        quantize6(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
                    "decimal(38,10)"
                )
            ).cast("double")
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def idle_rich_customers(
    customer: DataFrame, orders: DataFrame, cutoff: str = "2000-01-01"
) -> DataFrame:
    """TPC-H Q22-shaped opportunity report: customers with above-average
    account balance and NO orders since `cutoff`, summarized per market
    segment.

    The global average is computed as exact DECIMAL (sum, count) and the
    comparison is cross-multiplied (bal × n > total) so no engine-specific
    decimal-division rounding can flip a boundary row. The "no recent
    orders" test is a LEFT ANTI join against date-filtered orders — the
    filter prunes orders partitions before the join at scale.
    """
    pos = customer.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(38,10)")).alias("__total"),
        F.count(F.lit(1)).alias("__n"),
    )
    recent = orders.filter(F.col("o_orderdate") >= F.lit(cutoff).cast("timestamp")).select(
        "o_custkey"
    )
    rich = (
        customer.crossJoin(F.broadcast(pos))
        .filter(
            F.col("c_acctbal").cast("decimal(38,10)") * F.col("__n") > F.col("__total")
        )
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return rich.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        quantize6(
            F.sum(F.col("c_acctbal").cast("decimal(38,10)")).cast("double")
        ).alias("total_acctbal"),
    )


def nation_trade_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q7-shaped bilateral trade volume: revenue shipped between two
    nations (both directions), per ship year.

    The two-nation filter lands on the broadcast customer/supplier sides
    BEFORE the fact joins, so lineitem rows for any other nation pair are
    dropped at the first probe. The direction disjunction is a residual on
    the (custkey, suppkey) equi-joins — never a nested loop.
    """
    n2 = F.broadcast(
        nation.filter(F.col("n_name").isin(nation_a, nation_b)).select(
            "n_nationkey", "n_name"
        )
    )
    cust = customer.join(n2, F.col("c_nationkey") == F.col("n_nationkey")).select(
        "c_custkey", F.col("n_name").alias("cust_nation")
    )
    supp = supplier.join(n2, F.col("s_nationkey") == F.col("n_nationkey")).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    joined = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("ship_year")
    ).agg(
        quantize6(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
                    "decimal(38,10)"
                )
            ).cast("double")
        ).alias("revenue")
    )


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame, excluded_priority: str = "1-URGENT"
) -> DataFrame:
    """TPC-H Q13-shaped distribution: how many customers placed exactly N
    qualifying orders (N = 0 included via the left join).

    Two-level aggregate: per-customer count, then histogram over counts —
    both key-partitioned shuffles; the second input is one row per
    customer, so the histogram stage is trivially small.
    """
    per_cust = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != excluded_priority),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def top_revenue_suppliers(
    supplier: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15-shaped top supplier: supplier(s) with the maximum quarterly
    revenue — the spec's view + scalar-max-subquery formulation: a 1-row
    max aggregate broadcast-joined back on revenue equality (ties all
    surface, like Q15's =max). DECIMAL revenue makes the equality exact.

    Deliberately NOT a global rank window: an unpartitioned Window funnels
    the whole relation through one task, which is the kind of plan that
    breaks at 100× scale even when today's input is small
    (tests/test_scale_posture.py asserts no unpartitioned window here).
    """
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
                    "decimal(38,10)"
                )
            ).alias("__rev")
        )
    )
    max_rev = rev.agg(F.max("__rev").alias("__max_rev"))
    return (
        rev.join(F.broadcast(max_rev), F.col("__rev") == F.col("__max_rev"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey"),
            "s_name",
            quantize6(F.col("__rev").cast("double")).alias("total_revenue"),
        )
    )


def small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#1", frac: float = 0.2
) -> DataFrame:
    """TPC-H Q17-shaped small-order revenue: average yearly revenue lost if
    small orders (below ``frac`` of the part's average quantity) were not
    filled, for one brand.

    The correlated AVG subquery becomes a grouped aggregate re-joined to
    lineitem. The below-average test is cross-multiplied
    (qty * n < frac_num/frac_den * sum_qty with exact DECIMAL sums and the
    fraction as a ratio of integers) so no engine-division rounding can
    flip a boundary row.
    """
    # frac as an integer ratio keeps the comparison exact (0.2 = 1/5)
    num, den = (1, 5) if frac == 0.2 else (int(frac * 100), 100)
    brand_parts = part.filter(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"))
    avg_q = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.sum(F.col("l_quantity").cast("decimal(38,10)")).alias("__sq"),
        F.count(F.lit(1)).alias("__n"),
    )
    below = li.join(F.broadcast(avg_q), F.col("l_partkey") == F.col("__pk")).filter(
        F.col("l_quantity").cast("decimal(38,10)") * F.col("__n") * F.lit(den)
        < F.col("__sq") * F.lit(num)
    )
    return below.agg(
        quantize6(
            F.sum(F.col("l_extendedprice").cast("decimal(38,10)")).cast("double")
            / F.lit(7.0)
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def waiting_suppliers(
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    grace_days: int = 90,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q21-shaped blame report: suppliers whose lineitem was late on a
    multi-supplier order where NO other supplier was late — one semi-join
    (another supplier exists) and one anti-join (no other LATE supplier)
    against the same order, exactly Q21's EXISTS/NOT EXISTS pair.

    Both existence checks join on orderkey with a supplier-inequality
    residual; the fact side is pre-filtered to late lines only, so the
    semi/anti probes carry a fraction of lineitem.
    """
    late = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {grace_days} DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .dropDuplicates()
    )
    all_lines = lineitem.select("l_orderkey", "l_suppkey").dropDuplicates()
    l2 = all_lines.withColumnsRenamed({"l_orderkey": "o2", "l_suppkey": "s2"})
    l3 = late.withColumnsRenamed({"l_orderkey": "o3", "l_suppkey": "s3"})
    blamed = (
        late.join(
            l2, (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")), "left_semi"
        ).join(
            l3, (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")), "left_anti"
        )
    )
    counts = (
        blamed.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        counts.orderBy(F.col("numwait").desc(), F.col("s_suppkey").asc())
        .limit(k)
        .select("s_suppkey", "s_name", "numwait")
    )


def top_customers_by_nation(
    customer: DataFrame, orders: DataFrame, nation: DataFrame, k: int = 5
) -> DataFrame:
    """3-way join (dims broadcast) + window top-k: top customers per nation
    by total order value."""
    revenue = (
        orders.join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name", "c_custkey", "c_name")
        .agg(quantize6(F.sum("o_totalprice")).alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
    return (
        revenue.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("int"))
    )


def cheapest_supplier_per_part(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    lineitem: DataFrame,
    region_name: str = "EUROPE",
    type_name: str = "STANDARD",
    size: int = 15,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q2-shaped sourcing query, adapted: this schema has no partsupp
    table, so the per-(part, supplier) supply cost is DERIVED from observed
    lineitems — min unit price (l_extendedprice / l_quantity) a supplier
    ever charged for the part. The correlated MIN subquery ("cheapest offer
    for this part within the region") becomes a rank-1 window over the
    derived offer table, ties surfacing like Q2's = min(ps_supplycost).

    Scale shape: part is filtered before the join and broadcast; the
    supplier⋈nation⋈region chain collapses to one broadcast dim. The only
    real shuffle is the (partkey, suppkey) aggregate over lineitem; the
    window input is one row per offer, partitioned by part — no global
    sort. Unit price is a single IEEE double division, bit-identical in
    any engine, so the min cut is exact.
    """
    wanted_parts = part.filter(
        (F.col("p_type") == type_name) & (F.col("p_size") == size)
    ).select("p_partkey", "p_name")
    regional_sups = (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        lineitem.join(F.broadcast(wanted_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(regional_sups), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = Window.partitionBy("p_partkey").orderBy(F.col("unit_cost").asc())
    return (
        offers.withColumn("__rnk", F.rank().over(w))
        .filter(F.col("__rnk") == 1)
        .orderBy(
            F.col("s_acctbal").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(k)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            quantize6(F.col("unit_cost")).alias("unit_cost"),
        )
    )


def nation_market_share(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    target_nation: str = "NATION_3",
    region_name: str = "EUROPE",
    type_name: str = "ECONOMY",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q8-shaped market share: of all revenue for one part type sold
    to customers in a region over two years, the fraction supplied by one
    nation, per order year — the classic conditional-aggregate ratio
    sum(CASE WHEN supp_nation = X THEN rev END) / sum(rev).

    Scale shape: part (type-filtered), supplier, and both nation legs are
    broadcast; orders carries the date filter down to its scan. The two
    real shuffles are lineitem⋈orders (orderkey) and ⋈customer (custkey).
    Numerator and denominator accumulate in DECIMAL(38,10); only the final
    ratio is a double divide, so the share survives hash comparison.
    """
    cust_in_region = (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nations = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    base = (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_type") == type_name).select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust_in_region, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp_nations), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            rev.cast("decimal(38,10)").alias("__rev"),
            F.col("supp_nation"),
        )
    )
    return (
        base.groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("supp_nation") == target_nation, F.col("__rev"))).alias("__num"),
            F.sum("__rev").alias("__den"),
        )
        .select(
            "o_year",
            quantize6(
                F.coalesce(F.col("__num"), F.lit(0)).cast("double")
                / F.col("__den").cast("double")
            ).alias("mkt_share"),
        )
    )


def product_type_profit(
    nation: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    name_word: str = "widget",
    cost_frac_num: int = 1,
    cost_frac_den: int = 10,
) -> DataFrame:
    """TPC-H Q9-shaped profit report, adapted: no partsupp table, so supply
    cost is proxied as a fixed fraction (num/den) of p_retailprice — profit
    = l_extendedprice*(1-l_discount) − p_retailprice*(num/den)*l_quantity,
    grouped by supplier nation and order year, for parts whose name
    contains one word.

    Scale shape: part (name-filtered), supplier, nation are all broadcast;
    lineitem⋈orders on orderkey is the single real shuffle. The cost
    fraction is applied as (retail*qty*num)/den inside DECIMAL so the
    profit sum is exact and partition-order independent.
    """
    prof = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * F.lit(cost_frac_num) / F.lit(cost_frac_den)
    )
    base = (
        lineitem.join(
            F.broadcast(
                part.filter(F.col("p_name").contains(name_word)).select(
                    "p_partkey", "p_retailprice"
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        base.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(quantize6(F.sum(prof.cast("decimal(38,10)")).cast("double")).alias("sum_profit"))
    )


def important_part_values(
    supplier: DataFrame,
    nation: DataFrame,
    lineitem: DataFrame,
    nation_name: str = "NATION_3",
    frac_num: int = 1,
    frac_den: int = 1000,
) -> DataFrame:
    """TPC-H Q11-shaped concentration query, adapted: partsupp inventory
    value becomes SHIPPED value — per part, the discounted revenue moved by
    one nation's suppliers — keeping parts above a fraction of that
    nation's total (Q11's scalar GROUP-BY-HAVING subquery).

    Scale shape: the supplier⋈nation filter broadcasts; one shuffle
    aggregates lineitem per part. The nation-total threshold is a 1-row
    aggregate broadcast back over the per-part rows; the cut is
    cross-multiplied over exact DECIMAL sums (value*den > total*num) so no
    division decides a boundary part.
    """
    nation_sups = (
        supplier.join(
            F.broadcast(nation.filter(F.col("n_name") == nation_name)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    per_part = (
        lineitem.join(F.broadcast(nation_sups), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(rev.cast("decimal(38,10)")).alias("__val"))
    )
    total = per_part.agg(F.sum("__val").alias("__total"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("__val") * F.lit(frac_den) > F.col("__total") * F.lit(frac_num))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            quantize6(F.col("__val").cast("double")).alias("value"),
        )
    )


def bulk_part_suppliers(
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
    lineitem: DataFrame,
    nation_name: str = "NATION_1",
    name_word: str = "widget",
    min_qty: float = 50.0,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q20-shaped nested-existence query, adapted: suppliers from one
    nation who, in one year, shipped more than ``min_qty`` units of at
    least one part whose name contains a word (Q20's availqty > 0.5×moved
    test becomes a shipped-quantity threshold — no partsupp here). Reports
    each such supplier with how many distinct parts qualified.

    Scale shape: the part name filter broadcasts into the lineitem probe;
    the (suppkey, partkey) aggregate is the one shuffle; supplier⋈nation
    is broadcast onto the tiny qualifying set. Quantity accumulates in
    DECIMAL so the threshold cut is exact.
    """
    wanted = part.filter(F.col("p_name").contains(name_word)).select("p_partkey")
    moved = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(F.broadcast(wanted), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,10)")).alias("__qty"))
        .filter(F.col("__qty") > F.lit(min_qty).cast("decimal(38,10)"))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_bulk_parts"))
    )
    nation_sups = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == nation_name)),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    return moved.join(nation_sups, F.col("l_suppkey") == F.col("s_suppkey")).select(
        "s_suppkey", "s_name", "n_bulk_parts"
    )
