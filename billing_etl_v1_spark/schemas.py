"""Explicit StructTypes for the three billing tables.

Column/type inventory derives from the reference's observed usage
(SURVEY.md §1.2; reference billing_calculation_service.py:164-187,238-284,
335-352 and calculate/service.py:10-43):

- fact ``ods_standard_daily_billing``: usage lines, one row per
  (day, account, project, service, SKU, cost_type) grain pre-aggregation;
  holds BOTH the nested credits arrays and the exploded ``c_*`` buckets.
- dim ``dim_contract``: per-month pricing rules; NULL in
  project_id / service_description / sku_id means "wildcard — match any"
  (reference calculate/service.py:117-124). NULL must never be collapsed
  to '' (SURVEY §2.10.4).
- target ``dwm_standard_daily_billing_calculated``: the 37-column invoice
  output (reference billing_calculation_service.py:335-352).

``discount``/``price`` in the dim are stored loosely as strings and re-cast
to double at every use in the reference (calculate/service.py:51,61,70,87-88);
we keep StringType to preserve that contract.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DateType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

CREDIT_BUCKET_COLUMNS = [
    "c_cud",
    "c_cud_db",
    "c_discount",
    "c_free_tier",
    "c_promotion",
    "c_rm",
    "c_sub_benefit",
    "c_sud",
]

# credits_type element -> exploded bucket column
# (reference calculate/service.py:12-21)
CREDIT_TYPE_TO_COLUMN = {
    "COMMITTED_USAGE_DISCOUNT": "c_cud",
    "COMMITTED_USAGE_DISCOUNT_DOLLAR_BASE": "c_cud_db",
    "DISCOUNT": "c_discount",
    "FREE_TIER": "c_free_tier",
    "PROMOTION": "c_promotion",
    "RESELLER_MARGIN": "c_rm",
    "SUBSCRIPTION_BENEFIT": "c_sub_benefit",
    "SUSTAINED_USAGE_DISCOUNT": "c_sud",
}


def _s(name: str, nullable: bool = False) -> StructField:
    return StructField(name, StringType(), nullable)


def _d(name: str, nullable: bool = False) -> StructField:
    return StructField(name, DoubleType(), nullable)


FACT_SCHEMA = StructType(
    [
        _s("invoice_month"),
        StructField("usage_day", DateType(), False),
        _s("billing_account_id"),
        _s("project_id"),
        _s("project_name"),
        _s("service_id"),
        _s("service_description"),
        _s("sku_id"),
        _s("sku_description"),
        _s("usage_pricing_unit"),
        _d("usage_amount_in_pricing_units"),
        _s("currency"),
        _d("currency_conversion_rate"),
        _s("cost_type"),
        _d("cost"),
        _d("cost_at_list"),
        *[_d(c) for c in CREDIT_BUCKET_COLUMNS],
        _d("internal_credits_cost"),
        _d("internal_credits_consumption"),
        StructField("credits_type", ArrayType(StringType()), True),
        StructField("credits_amount", ArrayType(DoubleType()), True),
    ]
)

DIM_CONTRACT_SCHEMA = StructType(
    [
        _s("month"),  # 'YYYY-MM' (reference main.py:34-36)
        _s("billing_account_id"),
        _s("project_id", nullable=True),  # NULL = wildcard
        _s("service_description", nullable=True),
        _s("sku_id", nullable=True),
        StructField("mode", IntegerType(), False),  # 1-4; 0 = unmatched
        _s("discount", nullable=True),  # loosely-typed, cast at use
        _s("price", nullable=True),
        _s("credit_fields", nullable=True),  # '/'-separated c_* names
        _s("customer_id", nullable=True),
        _s("contract_id", nullable=True),
    ]
)

# 37 columns in this exact order
# (reference billing_calculation_service.py:335-352)
TARGET_COLUMNS = [
    "usage_day",
    "invoice_month",
    "billing_account_id",
    "customer_id",
    "contract_id",
    "service_id",
    "service_description",
    "sku_id",
    "sku_description",
    "project_id",
    "project_name",
    "usage_pricing_unit",
    "usage_amount_in_pricing_units",
    "currency",
    "currency_conversion_rate",
    "cost_type",
    "cost",
    "cost_at_list",
    *CREDIT_BUCKET_COLUMNS,
    "internal_credits_cost",
    "internal_credits_consumption",
    "internal_cost",
    "internal_consumption",
    "external_consumption",
    "discount_amount",
    "mode",
    "price",
    "discount",
    "credit_fields",
    "etl_time",
]

# string columns flattened NaN->'' at the sink
# (reference billing_calculation_service.py:383-385)
TARGET_STRING_COLUMNS = [
    "billing_account_id",
    "service_id",
    "service_description",
    "sku_id",
    "sku_description",
    "project_id",
    "project_name",
    "usage_pricing_unit",
    "currency",
    "cost_type",
    "credit_fields",
    "invoice_month",
]

# Nullable(String) passthroughs that must keep NULL
# (reference billing_calculation_service.py:359-361,413-419)
TARGET_NULLABLE_STRING_COLUMNS = ["customer_id", "contract_id"]

TARGET_NUMERIC_COLUMNS = [
    c
    for c in TARGET_COLUMNS
    if c
    not in TARGET_STRING_COLUMNS
    + TARGET_NULLABLE_STRING_COLUMNS
    + ["etl_time", "usage_day", "mode"]
]

TARGET_SCHEMA = StructType(
    [
        StructField("usage_day", DateType(), False),
        _s("invoice_month"),
        _s("billing_account_id"),
        _s("customer_id", nullable=True),
        _s("contract_id", nullable=True),
        _s("service_id"),
        _s("service_description"),
        _s("sku_id"),
        _s("sku_description"),
        _s("project_id"),
        _s("project_name"),
        _s("usage_pricing_unit"),
        _d("usage_amount_in_pricing_units"),
        _s("currency"),
        _d("currency_conversion_rate"),
        _s("cost_type"),
        _d("cost"),
        _d("cost_at_list"),
        *[_d(c) for c in CREDIT_BUCKET_COLUMNS],
        _d("internal_credits_cost"),
        _d("internal_credits_consumption"),
        _d("internal_cost"),
        _d("internal_consumption"),
        _d("external_consumption"),
        _d("discount_amount"),
        StructField("mode", IntegerType(), False),
        _d("price"),
        _d("discount"),
        _s("credit_fields"),
        StructField("etl_time", TimestampType(), False),
    ]
)
