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

    Sums accumulate in DECIMAL(38,10): exact and associative, so the result
    is independent of partition order — double sums over 10k+-row groups
    differ across engines beyond the 1e-6 quantization and would break the
    oracle hash (and, at 100 TB, reproducibility across runs)."""

    def dsum(col):
        return F.sum(col.cast("decimal(38,10)"))

    cnt = F.count(F.lit(1))
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            quantize6(dsum(F.col("l_quantity")).cast("double")).alias("sum_qty"),
            quantize6(dsum(F.col("l_extendedprice")).cast("double")).alias("sum_base_price"),
            quantize6(dsum(disc_price).cast("double")).alias("sum_disc_price"),
            quantize6(dsum(F.col("l_quantity")).cast("double") / cnt).alias("avg_qty"),
            quantize6(dsum(F.col("l_discount")).cast("double") / cnt).alias("avg_disc"),
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
    small; only two LARGE interval sides would need the bucketed
    interval-overlap decomposition (as in operators.dedup's LSH band join).
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
