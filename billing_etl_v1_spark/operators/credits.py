"""Credits array pivot A6/A7/A8 — the raw-rows path of the reference.

``_calculate_credits_all_type`` (reference calculate/service.py:10-43) is a
row-wise pandas apply that zips ``credits_type``/``credits_amount``, bucket-
sums known types into the 8 ``c_*`` columns, totals ALL amounts (unknown
types included) into ``internal_credits_cost``, and derives
``internal_credits_consumption = total - c_rm``.

Here it is a pure columnar expression — ``arrays_zip`` + ``aggregate`` stay
inside whole-stage codegen, no UDF, no shuffle (SURVEY §2.8: zero UDFs are
required for parity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from billing_etl_v1_spark.schemas import CREDIT_TYPE_TO_COLUMN


def _bucket_sum(pairs: Column, credit_type: str) -> Column:
    return F.aggregate(
        pairs,
        F.lit(0.0),
        lambda acc, x: acc
        + F.when(x["credits_type"] == credit_type, x["credits_amount"]).otherwise(F.lit(0.0)),
    )


def credits_pivot(
    df: DataFrame,
    type_col: str = "credits_type",
    amount_col: str = "credits_amount",
) -> DataFrame:
    """A7+A6+A8: explode the nested credits into the 8 buckets + totals.

    Accumulation order matches the reference: repeated types sum
    (calculate/service.py:35-37), unknown types are skipped by the buckets
    but counted in the total (calculate/service.py:39-40), empty/NULL arrays
    yield all-zero results (the ``if row['credits_amount']`` guard, :39).
    """
    pairs = F.arrays_zip(
        F.col(type_col).alias("credits_type"), F.col(amount_col).alias("credits_amount")
    )
    cols: dict[str, Column] = {
        bucket: _bucket_sum(pairs, credit_type)
        for credit_type, bucket in CREDIT_TYPE_TO_COLUMN.items()
    }
    total = F.coalesce(
        F.aggregate(F.col(amount_col), F.lit(0.0), lambda acc, x: acc + x), F.lit(0.0)
    )
    cols["internal_credits_cost"] = total
    df = df.withColumns(cols)
    return df.withColumn(
        "internal_credits_consumption", F.col("internal_credits_cost") - F.col("c_rm")
    )
