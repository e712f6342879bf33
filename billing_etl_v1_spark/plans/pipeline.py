"""The flagship end-to-end billing pipeline.

Composes the operators into the single lazy DAG that replaces the reference's
entire orchestration (SURVEY §3.1): per-day loop (main.py:53-57), per-account
loop (main.py:85-133), 10k-row batch loop
(billing_calculation_service.py:450-462) and the ClickHouse SQL template
(calculate/sql_template.py:3-209) all collapse into

    scan -> filter(month/day) -> groupBy.agg -> 8 broadcast joins + coalesce
         -> pricing expressions -> conform

Catalyst plans it; AQE handles skew (replacing the hardcoded heavy-account
chunking, main.py:86-104). At 100 TB the only shuffle is the grain
aggregation; the dim joins are broadcast and everything downstream is
map-side expression work.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from billing_etl_v1_spark.operators.aggregate import (
    DETAIL_KEYS,
    PIPELINE_KEYS,
    source_aggregate,
)
from billing_etl_v1_spark.operators.conform import conform_to_target
from billing_etl_v1_spark.operators.pricing import (
    apply_extra_discount,
    with_internal_measures,
    with_pricing_modes,
)
from billing_etl_v1_spark.operators.rules import match_rules


def with_contract_month(df: DataFrame) -> DataFrame:
    """F6: 'YYYYMM' -> 'YYYY-MM' (reference main.py:34-36,
    billing_calculation_service.py:129)."""
    return df.withColumn(
        "contract_month",
        F.concat(
            F.substring("invoice_month", 1, 4), F.lit("-"), F.substring("invoice_month", 5, 2)
        ),
    )


def billing_pipeline(
    fact: DataFrame,
    dim: DataFrame,
    invoice_month: str | None = None,
    day_start=None,
    day_end=None,
    grain: str = "detail",
    extra_discounts: dict[str, float] | None = None,
    etl_time: _dt.datetime | None = None,
    include_etl_time: bool = True,
) -> DataFrame:
    """Full calculation: fact + dim -> 37-column calculated invoice lines.

    ``grain='pipeline'`` is the production 8-key grain (the sink then fills
    the missing descriptive strings with '' and numerics with 0 exactly like
    the reference, billing_calculation_service.py:354-371); ``grain='detail'``
    is the 13-key invoice-detail grain of the SQL template.
    """
    from billing_etl_v1_spark.operators.aggregate import (
        filter_day_range,
        filter_month,
    )

    # the shared P3/P4 operators, not inline copies (review finding: the
    # inline day filter required BOTH bounds, silently recomputing the
    # whole month when an incremental caller passed only day_start)
    fact = filter_month(fact, invoice_month)
    fact = filter_day_range(fact, day_start, day_end)

    if grain not in ("detail", "pipeline"):
        raise ValueError(
            f"grain must be 'detail' or 'pipeline', got {grain!r} — a typo "
            f"here would otherwise silently aggregate at the wrong grain"
        )
    keys = DETAIL_KEYS if grain == "detail" else PIPELINE_KEYS
    agg = source_aggregate(with_contract_month(fact), keys=keys, extra_keys=["contract_month"])

    matched = match_rules(agg, dim, month_col="contract_month")
    priced = with_pricing_modes(
        apply_extra_discount(with_internal_measures(matched), extra_discounts)
    )
    return conform_to_target(priced, etl_time=etl_time, include_etl_time=include_etl_time)
