"""Deterministic synthetic billing tables derived from the TPC-H-ish testdata.

The driver's testdata (TESTDATA.md) has no billing tables, so every
billing-engine correctness check derives ``ods_standard_daily_billing`` (fact)
and ``dim_contract`` (dim) from ``lineitem`` with the SAME SQL text executed by
BOTH engines (Spark SQL for ``queries()`` and DuckDB for ``oracle_sql()``).
The SQL below is restricted to the dialect intersection (CASE, ``||``, ``%``,
``year``/``month``, ``lpad``, ``CAST .. AS STRING/DOUBLE``, inline ``VALUES``),
so both engines see bit-identical input rows and the comparison genuinely
exercises the engine operators, not the data generator.

Value-domain coverage mirrors FIXTURES.md: all 8 NULL-wildcard rule patterns
(reference calculate/service.py:117-124), every pricing mode 1-4 including the
mode-4 zero-price guard (reference calculate/service.py:93), priority-overlap
accounts for the 8>4>6>2>7>3>5>1 order (reference sql_template.py:93-98),
a per-column-coalesce fixture (reference pandas df.update skips NaN per cell,
calculate/service.py:136-138), duplicate dim rows for the dedup hazard
(SURVEY §2.3), unmatched accounts (mode-0 defaults), and an account whose
contract exists only in March months (month-filter coverage).

Credit buckets are sparse deterministic functions of ``l_orderkey`` so that
bucket sums, the mode-4 credit selection, and ``internal_credits_*``
invariants are all exercised; ``c_unknown`` models the reference's
unknown-credit-type case (ignored by buckets, included in totals —
reference calculate/service.py:35-40).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# --- fact ------------------------------------------------------------------

_CREDIT_CASES = """
      CASE WHEN l_orderkey % 7 = 0  THEN -(l_extendedprice * l_tax) ELSE CAST(0.0 AS DOUBLE) END AS c_cud,
      CASE WHEN l_orderkey % 11 = 0 THEN -(l_extendedprice * CAST(0.05 AS DOUBLE)) ELSE CAST(0.0 AS DOUBLE) END AS c_cud_db,
      CASE WHEN l_orderkey % 5 = 0  THEN -(l_extendedprice * l_discount * CAST(0.5 AS DOUBLE)) ELSE CAST(0.0 AS DOUBLE) END AS c_discount,
      CASE WHEN l_orderkey % 13 = 0 THEN CAST(-1.5 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS c_free_tier,
      CASE WHEN l_orderkey % 17 = 0 THEN CAST(-2.25 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS c_promotion,
      CASE WHEN l_orderkey % 3 = 0  THEN -(l_extendedprice * CAST(0.02 AS DOUBLE)) ELSE CAST(0.0 AS DOUBLE) END AS c_rm,
      CASE WHEN l_orderkey % 19 = 0 THEN CAST(-0.75 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS c_sub_benefit,
      CASE WHEN l_orderkey % 23 = 0 THEN -(l_quantity * CAST(0.1 AS DOUBLE)) ELSE CAST(0.0 AS DOUBLE) END AS c_sud,
      CASE WHEN l_orderkey % 29 = 0 THEN CAST(-0.5 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS c_unknown
"""

# Shared Spark-SQL/DuckDB text. Produces the reference fact schema
# (SURVEY §1.2) plus two helper columns: contract_month ('YYYY-MM', the
# reference derives it in the driver, main.py:34-36) and c_unknown.
FACT_SQL = f"""
SELECT
  invoice_month, contract_month, usage_day, billing_account_id,
  project_id, project_name, service_id, service_description,
  sku_id, sku_description, usage_pricing_unit,
  usage_amount_in_pricing_units, currency, currency_conversion_rate, cost_type,
  cost, cost_at_list,
  c_cud, c_cud_db, c_discount, c_free_tier, c_promotion, c_rm, c_sub_benefit, c_sud,
  (c_cud + c_cud_db + c_discount + c_free_tier + c_promotion + c_rm
     + c_sub_benefit + c_sud + c_unknown) AS internal_credits_cost,
  (c_cud + c_cud_db + c_discount + c_free_tier + c_promotion + c_rm
     + c_sub_benefit + c_sud + c_unknown) - c_rm AS internal_credits_consumption,
  c_unknown
FROM (
  SELECT
      CAST(year(l_shipdate) * 100 + month(l_shipdate) AS STRING) AS invoice_month,
      CAST(year(l_shipdate) AS STRING) || '-' || lpad(CAST(month(l_shipdate) AS STRING), 2, '0') AS contract_month,
      CAST(l_shipdate AS DATE) AS usage_day,
      'ACCT-' || CAST(l_suppkey % 20 AS STRING) AS billing_account_id,
      'proj-' || CAST(l_partkey % 5 AS STRING) AS project_id,
      'Project ' || CAST(l_partkey % 5 AS STRING) AS project_name,
      'svc-' || CAST(l_partkey % 4 AS STRING) AS service_id,
      'service-' || CAST(l_partkey % 4 AS STRING) AS service_description,
      'sku-' || CAST(l_partkey % 10 AS STRING) AS sku_id,
      'SKU ' || CAST(l_partkey % 10 AS STRING) AS sku_description,
      CASE WHEN l_linenumber % 2 = 0 THEN 'hour' ELSE 'gibibyte hour' END AS usage_pricing_unit,
      CAST(l_quantity AS DOUBLE) AS usage_amount_in_pricing_units,
      'USD' AS currency,
      CAST(1.0 AS DOUBLE) AS currency_conversion_rate,
      CASE WHEN l_returnflag = 'R' THEN 'adjustment'
           WHEN l_linestatus = 'O' THEN 'regular'
           ELSE 'tax' END AS cost_type,
      l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS cost,
      CAST(l_extendedprice AS DOUBLE) AS cost_at_list,
      {_CREDIT_CASES}
  FROM lineitem
) base
"""

# --- dim -------------------------------------------------------------------

# (billing_account_id, project_id, service_description, sku_id, mode,
#  discount, price, credit_fields, customer_id, contract_id)
# NULL key columns are wildcards. Coverage notes inline.
_DIM_ROWS = """
    ('ACCT-0',  NULL,     NULL,        NULL,    1, '0.85', NULL,   NULL,                    'CUST-00', 'CTR-00'),
    ('ACCT-1',  NULL,     NULL,        NULL,    2, NULL,   '0.02', NULL,                    'CUST-01', NULL),
    ('ACCT-2',  NULL,     NULL,        NULL,    3, '0.9',  '0.03', NULL,                    'CUST-02', 'CTR-02'),
    ('ACCT-2',  NULL,     NULL,        NULL,    3, '0.95', '0.03', NULL,                    'CUST-02b','CTR-02b'),
    ('ACCT-3',  NULL,     NULL,        NULL,    4, '0.8',  '1.2',  'c_cud/c_discount/c_rm', 'CUST-03', 'CTR-03'),
    ('ACCT-4',  NULL,     NULL,        NULL,    4, '0.7',  '0',    'c_cud',                 'CUST-04', 'CTR-04'),
    ('ACCT-5',  'proj-1', NULL,        NULL,    1, '0.75', NULL,   NULL,                    'CUST-05', 'CTR-05'),
    ('ACCT-6',  NULL,     'service-2', NULL,    2, NULL,   '0.05', NULL,                    'CUST-06', 'CTR-06'),
    ('ACCT-7',  NULL,     NULL,        'sku-3', 3, '0.8',  '0.04', NULL,                    'CUST-07', 'CTR-07'),
    ('ACCT-8',  'proj-2', 'service-1', NULL,    1, '0.6',  NULL,   NULL,                    'CUST-08', 'CTR-08'),
    ('ACCT-9',  'proj-3', NULL,        'sku-7', 2, NULL,   '0.01', NULL,                    'CUST-09', 'CTR-09'),
    ('ACCT-10', NULL,     'service-3', 'sku-9', 4, '0.9',  '2.0',  'c_rm/c_sud',            'CUST-10', 'CTR-10'),
    ('ACCT-11', 'proj-0', 'service-0', 'sku-0', 3, '0.5',  '0.1',  NULL,                    'CUST-11', 'CTR-11'),
    ('ACCT-12', NULL,     NULL,        NULL,    1, '0.9',  NULL,   NULL,                    'CUST-12', 'CTR-12'),
    ('ACCT-12', 'proj-1', 'service-1', 'sku-1', 2, NULL,   '0.2',  NULL,                    'CUST-12a','CTR-12a'),
    ('ACCT-12', NULL,     NULL,        'sku-5', 3, '0.5',  '0.3',  NULL,                    'CUST-12b','CTR-12b'),
    ('ACCT-12', 'proj-0', NULL,        NULL,    4, '0.6',  '1.0',  'c_discount',            'CUST-12c','CTR-12c'),
    ('ACCT-13', NULL,     'service-1', NULL,    1, '0.8',  NULL,   NULL,                    'CUST-13', 'CTR-13'),
    ('ACCT-13', NULL,     NULL,        'sku-1', 2, NULL,   '0.07', NULL,                    'CUST-13a','CTR-13a'),
    ('ACCT-14', NULL,     'service-1', 'sku-1', 4, '0.85', '1.5',  'c_cud/c_cud_db',        'CUST-14', 'CTR-14'),
    ('ACCT-14', 'proj-1', NULL,        NULL,    1, '0.7',  NULL,   NULL,                    'CUST-14a','CTR-14a'),
    ('ACCT-15', 'proj-1', 'service-1', NULL,    2, NULL,   '0.15', NULL,                    'CUST-15', 'CTR-15'),
    ('ACCT-15', 'proj-1', NULL,        'sku-1', 3, '0.66', '0.2',  NULL,                    'CUST-15a','CTR-15a'),
    ('ACCT-16', NULL,     NULL,        NULL,    1, '0.8',  NULL,   NULL,                    NULL,      'CTR-16'),
    ('ACCT-16', 'proj-1', 'service-1', 'sku-1', 2, NULL,   '0.3',  NULL,                    'CUST-16x', NULL),
    ('ACCT-18', NULL,     NULL,        NULL,    1, '0.95', NULL,   NULL,                    'CUST-18', 'CTR-18'),
    ('ACCT-99', NULL,     NULL,        NULL,    1, '0.5',  NULL,   NULL,                    'CUST-99', 'CTR-99')
"""

# Contracts exist for every month present in the fact (cross join), except
# ACCT-18 whose contract exists only in March months (month-filter coverage).
DIM_SQL = f"""
SELECT m.month,
       r.billing_account_id, r.project_id, r.service_description, r.sku_id,
       r.mode, r.discount, r.price, r.credit_fields, r.customer_id, r.contract_id
FROM (
  SELECT DISTINCT
    CAST(year(l_shipdate) AS STRING) || '-' || lpad(CAST(month(l_shipdate) AS STRING), 2, '0') AS month
  FROM lineitem
) m
CROSS JOIN (
  SELECT * FROM (VALUES
{_DIM_ROWS}
  ) AS t(billing_account_id, project_id, service_description, sku_id, mode,
         discount, price, credit_fields, customer_id, contract_id)
) r
WHERE NOT (r.billing_account_id = 'ACCT-18' AND substr(m.month, 6, 2) <> '03')
"""

# Spark-only: attach the nested credits arrays (Array(String)/Array(Float64)
# columns of the reference fact, calculate/service.py:22) built from the same
# deterministic buckets. DuckDB's list syntax differs, so the oracle checks
# array-consuming operators against the scalar-derived truth instead.
_ARRAY_PAIRS = ", ".join(
    f"named_struct('t', '{t}', 'a', {c})"
    for t, c in [
        ("COMMITTED_USAGE_DISCOUNT", "c_cud"),
        ("COMMITTED_USAGE_DISCOUNT_DOLLAR_BASE", "c_cud_db"),
        ("DISCOUNT", "c_discount"),
        ("FREE_TIER", "c_free_tier"),
        ("PROMOTION", "c_promotion"),
        ("RESELLER_MARGIN", "c_rm"),
        ("SUBSCRIPTION_BENEFIT", "c_sub_benefit"),
        ("SUSTAINED_USAGE_DISCOUNT", "c_sud"),
        ("SOME_FUTURE_CREDIT_TYPE", "c_unknown"),
    ]
)

FACT_WITH_ARRAYS_SQL = f"""
SELECT f.*,
       transform(pairs, x -> x.t) AS credits_type,
       transform(pairs, x -> x.a) AS credits_amount
FROM (
  SELECT f.*, filter(array({_ARRAY_PAIRS}), x -> x.a <> CAST(0.0 AS DOUBLE)) AS pairs
  FROM ({FACT_SQL}) f
) f
"""


def fact_df(spark: SparkSession, with_arrays: bool = False) -> DataFrame:
    """Synthetic fact; requires ``lineitem`` registered as a temp view."""
    return spark.sql(FACT_WITH_ARRAYS_SQL if with_arrays else FACT_SQL)


def dim_df(spark: SparkSession) -> DataFrame:
    """Synthetic contract dim; requires ``lineitem`` registered as a temp view."""
    return spark.sql(DIM_SQL)
