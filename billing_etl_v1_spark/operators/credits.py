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


_TOTAL = "internal_credits_cost"


def _fold_all_buckets(pairs: Column) -> Column:
    """ONE left fold over the zipped credits producing a struct of all 8
    bucket sums + the total — a single array traversal instead of nine.

    Adding 0.0 for non-matching elements is an exact double identity (no
    -0.0 survives the upstream zero-filter), so this is bit-identical to
    per-bucket folds, just ~9x less array work per row.
    """
    buckets = list(CREDIT_TYPE_TO_COLUMN.items())  # (credit_type, c_* column)
    fields = [c for _, c in buckets] + [_TOTAL]
    zero = F.struct(*[F.lit(0.0).alias(f) for f in fields])

    def step(acc: Column, x: Column) -> Column:
        # NULL amounts (corrupt elements, or arrays_zip padding when the
        # type/amount arrays have mismatched lengths) contribute ZERO to
        # every bucket AND the total: an unguarded acc + NULL would null
        # the chain, so the total (and the matching bucket) silently
        # coalesced to 0 while OTHER buckets kept their sums — breaking
        # internal_credits_cost >= Σ buckets and the consumption identity
        # on exactly the rows a 100 TB corpus produces (review finding).
        # NULL types still count in the total only, like any unknown type.
        amt = F.coalesce(x["credits_amount"], F.lit(0.0))
        out = [
            (
                acc[col]
                + F.when(x["credits_type"] == ct, amt).otherwise(F.lit(0.0))
            ).alias(col)
            for ct, col in buckets
        ]
        out.append((acc[_TOTAL] + amt).alias(_TOTAL))
        return F.struct(*out)

    return F.aggregate(pairs, zero, step)


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
    df = df.withColumn("_credit_acc", _fold_all_buckets(pairs))
    cols: dict[str, Column] = {
        bucket: F.coalesce(F.col("_credit_acc")[bucket], F.lit(0.0))
        for bucket in CREDIT_TYPE_TO_COLUMN.values()
    }
    cols[_TOTAL] = F.coalesce(F.col("_credit_acc")[_TOTAL], F.lit(0.0))
    df = df.withColumns(cols).drop("_credit_acc")
    return df.withColumn(
        "internal_credits_consumption", F.col(_TOTAL) - F.col("c_rm")
    )
