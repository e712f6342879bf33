"""DuckDB oracle SQL builders for the billing-engine queries.

Every query the engine exposes in ``__spark_entry__.queries()`` has a twin
here: ANSI/DuckDB SQL over the same parquet views, reproducing the chosen
reference semantics (SURVEY §2.10 — pandas production path) independently of
the Spark implementation. The synthetic fact/dim derivation CTEs are the
SAME SQL text both engines execute (sources/synthetic.py), so a hash match
verifies the engine's operators, not the generator.

All double outputs are ROUND(x, 6) in both engines (SURVEY §7.4).
"""

from __future__ import annotations

from billing_etl_v1_spark.operators.rules import PRIORITY, RULE_PATTERNS, RULE_COLUMNS
from billing_etl_v1_spark.schemas import CREDIT_BUCKET_COLUMNS
from billing_etl_v1_spark.sources.synthetic import DIM_SQL, FACT_SQL

# extra-discount overlay used by all synthetic-fixture queries: synthetic
# accounts at the reference's four factor tiers plus its ratio outlier
# (calculate/service.py:189-199; DEFAULT_EXTRA_DISCOUNTS itself defaults
# empty — the overlay is deployment config, not engine code)
TEST_EXTRA_DISCOUNTS: dict[str, float] = {
    "ACCT-0": 0.975,
    "ACCT-5": 0.965,
    "ACCT-12": 0.95,
    "ACCT-17": 0.88,
    "ACCT-19": 28.5 / 27.2,
}

FLAGSHIP_MONTH = "199506"

def _r6(expr: str) -> str:
    """Same quantization as functions.quantize6 — floor(x*1e6+0.5)/1e6 in pure
    double arithmetic, bit-identical across engines (ROUND ties differ).
    Out-of-envelope values (|x| > 9e12 — where Spark's LONG floor would
    saturate but DuckDB's DOUBLE floor would not) pass through unchanged,
    mirroring functions.quantize6."""
    # CAST the constants: Spark SQL types a bare 1000000.0 literal as
    # DECIMAL(8,1), which would silently turn the whole expression decimal
    q = (
        f"floor(({expr}) * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))"
        f" / CAST(1000000.0 AS DOUBLE)"
    )
    return (
        f"CASE WHEN abs(CAST(({expr}) AS DOUBLE)) <= 9e12 THEN {q}"
        f" ELSE CAST(({expr}) AS DOUBLE) END"
    )


SUM_MEASURES = [
    "usage_amount_in_pricing_units",
    "cost",
    "cost_at_list",
    *CREDIT_BUCKET_COLUMNS,
    "internal_credits_cost",
    "internal_credits_consumption",
]

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


def _dsum(m: str, dialect: str = "duckdb") -> str:
    """Partition-order-proof sum, fast form: quantize each double to an
    exact 1e-10 integer grid (round half toward +inf), accumulate as a
    sign-safe (hi, lo) BIGINT pair — lo = pmod(v, 1e9) ∈ [0, 1e9), hi the
    exact co-quotient — and reassemble in DECIMAL(38,0) at the end.

    Exact and associative like the previous DECIMAL(38,10) accumulation
    (same determinism contract), but the hot sums are primitive longs
    inside whole-stage codegen instead of BigDecimal boxes — measured
    2.8× faster on the sf0.1 13-key aggregate. Overflow envelope: lo sums
    bound ~9e9 rows/group, hi sums ~9e12 rows/group at 1e5-scale money —
    far beyond any real per-(account, day, sku) grain; whole-table
    rollup/cube totals keep the DECIMAL path. Every operation except the
    integer division (DuckDB ``//`` vs Spark ``div`` — the one dialect
    split, exact either way since (v10 - lo) divides evenly) is in the
    Spark SQL ∩ DuckDB dialect intersection and IEEE-identical, so both
    engines agree bit-for-bit; matches operators.aggregate.source_aggregate.
    Integer div (not ``/``): a double division truncates hi off-by-one once
    |v10| > 2^53 (per-row |value| ~9e5); integer div is exact to ~9e8.

    The CASE guard excludes values outside the grid (|v| > 9e8, finite but
    corrupt for measure semantics) from the sum, mirroring
    functions.exact_sum: without it Spark saturates the BIGINT cast while
    DuckDB raises — silent poison on one engine, a dead job on the other."""
    idiv = "//" if dialect == "duckdb" else "div"
    bounded = f"CASE WHEN abs(CAST({m} AS DOUBLE)) <= 9e8 THEN CAST({m} AS DOUBLE) END"
    v10 = f"CAST(floor(({bounded}) * 1e10 + 0.5) AS BIGINT)"
    lo = f"((({v10}) % 1000000000) + 1000000000) % 1000000000"
    hi = f"((({v10}) - ({lo})) {idiv} 1000000000"  + ")"
    return (
        f"CAST(CAST(sum({hi}) AS DECIMAL(38,0)) * 1000000000"
        f" + sum({lo}) AS DOUBLE) / 1e10"
    )


def _sums(dialect: str = "duckdb") -> str:
    return ",\n         ".join(f"{_dsum(m, dialect)} AS {m}" for m in SUM_MEASURES)


def _base_ctes(month: str | None = None) -> str:
    month_filter = f"WHERE invoice_month = '{month}'" if month else ""
    return f"""
WITH fact AS (
  SELECT * FROM ({FACT_SQL}) {month_filter}
),
dim AS ({DIM_SQL}),
dim_dedup AS (
  SELECT month, billing_account_id, project_id, service_description, sku_id,
         mode, discount, price, credit_fields, customer_id, contract_id
  FROM (
    SELECT d.*, row_number() OVER (
      PARTITION BY month, billing_account_id, project_id, service_description, sku_id
      ORDER BY mode ASC NULLS LAST, discount ASC NULLS LAST, price ASC NULLS LAST,
               credit_fields ASC NULLS LAST, customer_id ASC NULLS LAST,
               contract_id ASC NULLS LAST
    ) AS rn
    FROM dim d
  )
  WHERE rn = 1
)"""


def _rule_ctes() -> str:
    parts = []
    for rule, pattern in RULE_PATTERNS.items():
        conds = []
        for c in ("project_id", "service_description", "sku_id"):
            conds.append(f"{c} IS {'NOT ' if c in pattern else ''}NULL")
        parts.append(f"r{rule} AS (SELECT * FROM dim_dedup WHERE {' AND '.join(conds)})")
    return ",\n".join(parts)


def _source_cte(keys: list[str], dialect: str = "duckdb") -> str:
    key_list = ", ".join(keys + ["contract_month"])
    return f"""
source AS (
  SELECT {key_list},
         {_sums(dialect)}
  FROM fact
  GROUP BY {key_list}
)"""


def _matched_cte() -> str:
    joins = []
    for rule, pattern in RULE_PATTERNS.items():
        on = [f"s.contract_month = d{rule}.month",
              f"s.billing_account_id = d{rule}.billing_account_id"]
        on += [f"s.{c} = d{rule}.{c}" for c in pattern]
        joins.append(f"LEFT JOIN r{rule} d{rule} ON {' AND '.join(on)}")
    coalesces = ",\n    ".join(
        f"COALESCE({', '.join(f'd{r}.{c}' for r in PRIORITY)}) AS {c}"
        for c in RULE_COLUMNS
    )
    return f"""
matched AS (
  SELECT s.*,
    {coalesces}
  FROM source s
  {chr(10).join('  ' + j for j in joins)}
)"""


def _extra_discount_case(mapping: dict[str, float]) -> str:
    by_factor: dict[float, list[str]] = {}
    for acct, f in mapping.items():
        by_factor.setdefault(f, []).append(acct)
    whens = "\n      ".join(
        f"WHEN billing_account_id IN ({', '.join(repr(a) for a in accounts)}) THEN CAST({factor!r} AS DOUBLE)"
        for factor, accounts in by_factor.items()
    )
    return f"CASE\n      {whens}\n      ELSE CAST(1.0 AS DOUBLE) END"


def _credit_part(dialect: str = "duckdb") -> str:
    contains, split = (
        ("list_contains", "string_split") if dialect == "duckdb" else ("array_contains", "split")
    )
    terms = "\n      + ".join(
        f"(CASE WHEN {contains}({split}(COALESCE(credit_fields, ''), '/'), '{c}') "
        f"THEN {c} ELSE CAST(0.0 AS DOUBLE) END)"
        for c in CREDIT_BUCKET_COLUMNS
    )
    return f"({terms})"


def _priced_cte(mapping: dict[str, float], dialect: str = "duckdb") -> str:
    """Pandas-path pricing semantics (SURVEY §2.10):

    - extra-discount factor scales internal_cost only
      (reference calculate/service.py:209)
    - mode-4 NULL price/discount -> 1.0 (calculate/service.py:87-88)
    - mode-4 zero-price guard (calculate/service.py:93)
    """
    return f"""
priced AS (
  SELECT m.*,
    (cost + internal_credits_cost) * ({_extra_discount_case(mapping)}) AS internal_cost,
    (cost + internal_credits_consumption) AS internal_consumption,
    CAST(discount AS DOUBLE) AS discount_d,
    CAST(price AS DOUBLE) AS price_d,
    COALESCE(CAST(discount AS DOUBLE), 1.0) AS disc4,
    COALESCE(CAST(price AS DOUBLE), 1.0) AS price4,
    {_credit_part(dialect)} AS credit_part
  FROM matched m
),
calc AS (
  SELECT p.*,
    (CASE WHEN price4 <> 0 THEN credit_part / price4 ELSE 0.0 END) AS credit_over_price,
    CASE
      WHEN mode = 1 THEN internal_consumption * discount_d
      WHEN mode = 2 THEN usage_amount_in_pricing_units * price_d
      WHEN mode = 3 THEN usage_amount_in_pricing_units * price_d * discount_d
      WHEN mode = 4 THEN cost_at_list * disc4
                         + (CASE WHEN price4 <> 0 THEN credit_part / price4 ELSE 0.0 END) * disc4
      ELSE 0.0
    END AS external_consumption_raw,
    CASE
      WHEN mode = 1 THEN internal_credits_consumption
      WHEN mode = 4 THEN (CASE WHEN price4 <> 0 THEN credit_part / price4 ELSE 0.0 END)
      ELSE 0.0
    END AS discount_amount_raw
  FROM priced p
)"""


def _final_select(keys: list[str], production_defaults: bool = False) -> str:
    """Project onto the 36-column target (etl_time excluded for determinism)
    with the sink's conformance defaults
    (reference billing_calculation_service.py:354-425)."""
    detail_only = {
        "sku_description",
        "project_name",
        "usage_pricing_unit",
        "currency",
        "currency_conversion_rate",
    }
    cols = []
    for name in [
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
    ]:
        if production_defaults and name in detail_only:
            if name == "currency_conversion_rate":
                cols.append(f"CAST(0.0 AS DOUBLE) AS {name}")
            else:
                cols.append(f"'' AS {name}")
        elif name == "usage_day":
            cols.append("CAST(usage_day AS DATE) AS usage_day")
        elif name == "mode":
            cols.append("COALESCE(mode, 0) AS mode")
        elif name == "price":
            cols.append(f"{_r6('COALESCE(price_d, 0.0)')} AS price")
        elif name == "discount":
            cols.append(f"{_r6('COALESCE(discount_d, 0.0)')} AS discount")
        elif name == "credit_fields":
            cols.append("COALESCE(credit_fields, '') AS credit_fields")
        elif name in ("customer_id", "contract_id"):
            cols.append(f"{name}")
        elif name == "external_consumption":
            cols.append(f"{_r6('COALESCE(external_consumption_raw, 0.0)')} AS external_consumption")
        elif name == "discount_amount":
            cols.append(f"{_r6('COALESCE(discount_amount_raw, 0.0)')} AS discount_amount")
        elif name in SUM_MEASURES + ["internal_cost", "internal_consumption"]:
            cols.append(f"{_r6(f'COALESCE({name}, 0.0)')} AS {name}")
        else:
            cols.append(name)
    return "SELECT\n  " + ",\n  ".join(cols) + "\nFROM calc"


def flagship_sql(
    month: str | None = None,
    grain: str = "detail",
    mapping: dict[str, float] | None = None,
    dialect: str = "duckdb",
) -> str:
    """The whole pipeline as ONE SQL statement — the analogue of the
    reference's pure-SQL engine (calculate/sql_template.py:3-209, operator
    S6). ``dialect='spark'`` yields a statement ``spark.sql`` runs verbatim
    (the fragments are dialect-shared except credit-field membership);
    ``dialect='duckdb'`` is the oracle."""
    keys = DETAIL_KEYS if grain == "detail" else PIPELINE_KEYS
    mapping = TEST_EXTRA_DISCOUNTS if mapping is None else mapping
    return (
        _base_ctes(month)
        + ",\n"
        + _rule_ctes()
        + ",\n"
        + _source_cte(keys, dialect)
        + ",\n"
        + _matched_cte()
        + ",\n"
        + _priced_cte(mapping, dialect)
        + "\n"
        + _final_select(keys, production_defaults=(grain != "detail"))
    )


def source_agg_sql(keys: list[str]) -> str:
    key_list = ", ".join(keys)
    rounded = ",\n       ".join(f"{_r6(_dsum(m))} AS {m}" for m in SUM_MEASURES)
    return f"""
WITH fact AS ({FACT_SQL})
SELECT {key_list},
       {rounded}
FROM fact
GROUP BY {key_list}
"""


def rollup_sql() -> str:
    """ROLLUP subtotals twin of operators.aggregate.rollup_totals —
    DECIMAL(38,10) accumulation so partition order can't move the 6th
    decimal."""
    dec = lambda c: f"CAST({c} AS DECIMAL(38,10))"  # noqa: E731
    return f"""
WITH fact AS ({FACT_SQL})
SELECT invoice_month, billing_account_id,
       grouping(invoice_month)::INT AS month_is_total,
       grouping(billing_account_id)::INT AS account_is_total,
       count(*) AS n_rows,
       {_r6(f"sum({dec('cost')})::DOUBLE")} AS sum_cost,
       {_r6(f"sum({dec('cost_at_list')})::DOUBLE")} AS sum_cost_at_list,
       {_r6(f"sum({dec('usage_amount_in_pricing_units')})::DOUBLE")} AS sum_usage
FROM fact
GROUP BY ROLLUP (invoice_month, billing_account_id)
"""


def minmax_day_sql(month: str = FLAGSHIP_MONTH) -> str:
    return f"""
WITH fact AS ({FACT_SQL})
SELECT min(usage_day) AS min_day, max(usage_day) AS max_day
FROM fact WHERE invoice_month = '{month}'
"""


def distinct_accounts_sql() -> str:
    return f"""
WITH fact AS ({FACT_SQL})
SELECT DISTINCT billing_account_id FROM fact
"""


def dim_rules_sql() -> str:
    """Deduped dim with the derived rule tag (NULL-pattern number)."""
    tag = """CASE
      WHEN project_id IS NULL AND service_description IS NULL AND sku_id IS NULL THEN 1
      WHEN project_id IS NOT NULL AND service_description IS NULL AND sku_id IS NULL THEN 2
      WHEN project_id IS NULL AND service_description IS NOT NULL AND sku_id IS NULL THEN 3
      WHEN project_id IS NOT NULL AND service_description IS NOT NULL AND sku_id IS NULL THEN 4
      WHEN project_id IS NULL AND service_description IS NULL AND sku_id IS NOT NULL THEN 5
      WHEN project_id IS NOT NULL AND service_description IS NULL AND sku_id IS NOT NULL THEN 6
      WHEN project_id IS NULL AND service_description IS NOT NULL AND sku_id IS NOT NULL THEN 7
      ELSE 8 END"""
    return f"""{_base_ctes()}
SELECT d.*, {tag} AS rule
FROM dim_dedup d
"""


def rule_match_sql(month: str = FLAGSHIP_MONTH) -> str:
    keys = ", ".join(DETAIL_KEYS)
    return (
        _base_ctes(month)
        + ",\n"
        + _rule_ctes()
        + ",\n"
        + _source_cte(DETAIL_KEYS)
        + ",\n"
        + _matched_cte()
        + f"""
SELECT {keys}, mode, discount, price, credit_fields, customer_id, contract_id
FROM matched
"""
    )


def credits_pivot_sql() -> str:
    """Truth for the array-pivot path: the scalar-derived buckets and totals
    must equal what the engine reconstructs from the nested arrays."""
    buckets = ", ".join(f"{_r6(c)} AS {c}" for c in CREDIT_BUCKET_COLUMNS)
    return f"""
WITH fact AS ({FACT_SQL})
SELECT usage_day, billing_account_id, project_id, sku_id, cost_type,
       {_r6('cost_at_list')} AS cost_at_list,
       {buckets},
       {_r6('internal_credits_cost')} AS internal_credits_cost,
       {_r6('internal_credits_consumption')} AS internal_credits_consumption
FROM fact
"""


def running_totals_sql() -> str:
    """Twin of operators.analytics.daily_running_totals — DECIMAL(38,10)
    day sums so the running window totals are exact in both engines."""
    share = (
        "CASE WHEN CAST(sum(day_cost) OVER w_all AS DOUBLE) <> 0.0 "
        "THEN CAST(day_cost AS DOUBLE) / CAST(sum(day_cost) OVER w_all AS DOUBLE) "
        "ELSE 0.0 END"
    )
    return f"""
WITH fact AS ({FACT_SQL}),
day_agg AS (
  SELECT invoice_month, billing_account_id, usage_day,
         sum(CAST(cost AS DECIMAL(38,10))) AS day_cost
  FROM fact
  GROUP BY invoice_month, billing_account_id, usage_day
)
SELECT invoice_month, billing_account_id, usage_day,
  {_r6('CAST(day_cost AS DOUBLE)')} AS day_cost,
  {_r6('CAST(sum(day_cost) OVER w_cum AS DOUBLE)')} AS running_cost,
  CAST(row_number() OVER w_ord AS INT) AS day_rank,
  {_r6(share)} AS month_share
FROM day_agg
WINDOW
  w_cum AS (PARTITION BY invoice_month, billing_account_id ORDER BY usage_day
            ROWS UNBOUNDED PRECEDING),
  w_ord AS (PARTITION BY invoice_month, billing_account_id ORDER BY usage_day),
  w_all AS (PARTITION BY invoice_month, billing_account_id)
"""


def month_over_month_sql() -> str:
    """Twin of operators.analytics.month_over_month (LAG analytics)."""
    return f"""
WITH fact AS ({FACT_SQL}),
m AS (
  SELECT billing_account_id, invoice_month,
         sum(CAST(cost AS DECIMAL(38,10))) AS c
  FROM fact GROUP BY billing_account_id, invoice_month
)
SELECT billing_account_id, invoice_month,
  {_r6('CAST(c AS DOUBLE)')} AS month_cost,
  {_r6('CAST(COALESCE(lag(c) OVER w, 0) AS DOUBLE)')} AS prev_month_cost,
  CAST(lag(c) OVER w IS NOT NULL AS INT) AS has_prev,
  {_r6('CAST(c - COALESCE(lag(c) OVER w, 0) AS DOUBLE)')} AS mom_delta
FROM m
WINDOW w AS (PARTITION BY billing_account_id ORDER BY invoice_month)
"""


def new_usage_lines_sql(month: str = FLAGSHIP_MONTH, prior: str = "199505") -> str:
    """Twin of operators.analytics.new_usage_lines (EXCEPT set op)."""
    return f"""
WITH fact AS ({FACT_SQL})
SELECT DISTINCT billing_account_id, project_id, sku_id
FROM fact WHERE invoice_month = '{month}'
EXCEPT
SELECT DISTINCT billing_account_id, project_id, sku_id
FROM fact WHERE invoice_month = '{prior}'
"""


def pricing_modes_sql(month: str = FLAGSHIP_MONTH) -> str:
    keys = ", ".join(DETAIL_KEYS)
    return (
        _base_ctes(month)
        + ",\n"
        + _rule_ctes()
        + ",\n"
        + _source_cte(DETAIL_KEYS)
        + ",\n"
        + _matched_cte()
        + ",\n"
        + _priced_cte(TEST_EXTRA_DISCOUNTS)
        + f"""
SELECT {keys},
       COALESCE(mode, 0) AS mode,
       {_r6('COALESCE(internal_cost, 0.0)')} AS internal_cost,
       {_r6('COALESCE(internal_consumption, 0.0)')} AS internal_consumption,
       {_r6('COALESCE(external_consumption_raw, 0.0)')} AS external_consumption,
       {_r6('COALESCE(discount_amount_raw, 0.0)')} AS discount_amount
FROM calc
"""
    )


def repeat_usage_lines_sql(month: str = FLAGSHIP_MONTH, prior: str = "199505") -> str:
    """Twin of operators.analytics.repeat_usage_lines (INTERSECT set op)."""
    return f"""
WITH fact AS ({FACT_SQL})
SELECT DISTINCT billing_account_id, project_id, sku_id
FROM fact WHERE invoice_month = '{month}'
INTERSECT
SELECT DISTINCT billing_account_id, project_id, sku_id
FROM fact WHERE invoice_month = '{prior}'
"""


def gap_fill_daily_sql(month: str = FLAGSHIP_MONTH) -> str:
    """Twin of operators.timeseries.gap_fill_daily — date spine via
    generate_series over the month's observed [min, max] day span, with the
    day grain clamped to the invoice month's calendar window (mirrors the
    Spark-side guard against out-of-month corrupt usage_day rows)."""
    return f"""
WITH fact AS ({FACT_SQL}),
day_agg AS (
  SELECT billing_account_id, usage_day,
         sum(CAST(cost AS DECIMAL(38,10))) AS c
  FROM fact WHERE invoice_month = '{month}'
    AND usage_day BETWEEN strptime('{month}', '%Y%m')::DATE
                      AND last_day(strptime('{month}', '%Y%m')::DATE)
  GROUP BY billing_account_id, usage_day
),
bounds AS (SELECT min(usage_day) AS d0, max(usage_day) AS d1 FROM day_agg),
spine AS (
  SELECT a.billing_account_id, CAST(t.d AS DATE) AS usage_day
  FROM (SELECT DISTINCT billing_account_id FROM day_agg) a,
       bounds,
       unnest(generate_series(bounds.d0::TIMESTAMP, bounds.d1::TIMESTAMP,
                              INTERVAL 1 DAY)) t(d)
)
SELECT s.billing_account_id, s.usage_day,
  {_r6('CAST(COALESCE(d.c, 0) AS DOUBLE)')} AS day_cost,
  CAST(d.c IS NULL AS INT) AS is_gap
FROM spine s
LEFT JOIN day_agg d
  ON s.billing_account_id = d.billing_account_id AND s.usage_day = d.usage_day
"""


def rolling_daily_cost_sql(window_days: int = 7) -> str:
    """Twin of operators.analytics.rolling_daily_cost — the RANGE frame
    orders by integer epoch-day in both engines so frame bounds agree."""
    ed = "datediff('day', DATE '1970-01-01', CAST(usage_day AS DATE))"
    frame = f"(PARTITION BY billing_account_id ORDER BY {ed} RANGE BETWEEN {window_days - 1} PRECEDING AND CURRENT ROW)"
    return f"""
WITH fact AS ({FACT_SQL}),
day_agg AS (
  SELECT billing_account_id, usage_day,
         sum(CAST(cost AS DECIMAL(38,10))) AS c
  FROM fact GROUP BY billing_account_id, usage_day
)
SELECT billing_account_id, usage_day,
  {_r6('CAST(c AS DOUBLE)')} AS day_cost,
  {_r6('CAST(sum(c) OVER w AS DOUBLE)')} AS trailing_sum,
  {_r6('CAST(sum(c) OVER w AS DOUBLE) / count(*) OVER w')} AS trailing_avg,
  count(*) OVER w AS days_present
FROM day_agg
WINDOW w AS {frame}
"""


def cube_sql() -> str:
    """CUBE twin of operators.aggregate.cube_totals."""
    dec = lambda c: f"CAST({c} AS DECIMAL(38,10))"  # noqa: E731
    return f"""
WITH fact AS ({FACT_SQL})
SELECT invoice_month, cost_type,
       grouping(invoice_month)::INT AS month_is_total,
       grouping(cost_type)::INT AS type_is_total,
       count(*) AS n_rows,
       {_r6(f"sum({dec('cost')})::DOUBLE")} AS sum_cost
FROM fact
GROUP BY CUBE (invoice_month, cost_type)
"""


def month_reconciliation_sql(month_a: str = "199506", month_b: str = "199507") -> str:
    """Twin of operators.analytics.month_reconciliation (FULL OUTER)."""
    return f"""
WITH fact AS ({FACT_SQL}),
a AS (
  SELECT billing_account_id, sum(CAST(cost AS DECIMAL(38,10))) AS ca
  FROM fact WHERE invoice_month = '{month_a}' GROUP BY billing_account_id
),
b AS (
  SELECT billing_account_id, sum(CAST(cost AS DECIMAL(38,10))) AS cb
  FROM fact WHERE invoice_month = '{month_b}' GROUP BY billing_account_id
)
SELECT coalesce(a.billing_account_id, b.billing_account_id) AS billing_account_id,
  {_r6('CAST(coalesce(ca, 0) AS DOUBLE)')} AS cost_a,
  {_r6('CAST(coalesce(cb, 0) AS DOUBLE)')} AS cost_b,
  {_r6('CAST(coalesce(cb, 0) - coalesce(ca, 0) AS DOUBLE)')} AS delta,
  CASE WHEN ca IS NULL THEN 'added'
       WHEN cb IS NULL THEN 'removed'
       WHEN ca = cb THEN 'unchanged'
       ELSE 'changed' END AS status
FROM a FULL OUTER JOIN b ON a.billing_account_id = b.billing_account_id
"""


def dq_audit_sql() -> str:
    """Twin of operators.conform.dq_audit over the flagship output."""
    # the 13 DETAIL_KEYS (the grain the flagship output is actually at;
    # hand-listing had dropped currency_conversion_rate — review finding)
    grain = ("invoice_month, billing_account_id, usage_day, project_id, "
             "project_name, service_id, service_description, sku_id, "
             "sku_description, usage_pricing_unit, currency, "
             "currency_conversion_rate, cost_type")
    return f"""
WITH calc AS ({flagship_sql()}),
checks AS (
  -- CAST each aggregate: DuckDB sums of ints widen to HUGEINT, which the
  -- driver's comparator materializes as float (0.0) and hash-mismatches
  -- against Spark's BIGINT 0
  -- coalesce(.., 0): sums over an EMPTY frame are NULL in both engines,
  -- and the Spark side zero-fills (a gate asserting == 0 must not see NULL)
  SELECT
    CAST(coalesce(sum((invoice_month IS NULL OR billing_account_id IS NULL
         OR usage_day IS NULL)::BIGINT), 0) AS BIGINT) AS null_required_keys,
    CAST(coalesce(sum((cost < 0)::BIGINT), 0) AS BIGINT) AS negative_cost,
    CAST(coalesce(sum((mode < 0 OR mode > 4)::BIGINT), 0) AS BIGINT) AS mode_out_of_range,
    -- a real zero-price-guard leak is division fallout: NaN/Inf
    -- discount_amount on a mode-4 row (price = 0 post-conform is also the
    -- legitimate NULL-price default, so the old price=0 form flagged
    -- correct rows — review finding; mirrors the Spark check)
    CAST(coalesce(sum((mode = 4 AND (isnan(discount_amount)
         OR isinf(discount_amount)))::BIGINT), 0) AS BIGINT)
      AS mode4_zero_price_leak
  FROM calc
),
dup AS (
  SELECT CAST(coalesce(sum(n - 1), 0) AS BIGINT) AS duplicate_grain_rows
  FROM (SELECT count(*) AS n FROM calc GROUP BY {grain}) WHERE n > 1
)
SELECT 'null_required_keys' AS "check", null_required_keys AS violations FROM checks
UNION ALL SELECT 'negative_cost', negative_cost FROM checks
UNION ALL SELECT 'mode_out_of_range', mode_out_of_range FROM checks
UNION ALL SELECT 'mode4_zero_price_leak', mode4_zero_price_leak FROM checks
UNION ALL SELECT 'duplicate_grain_rows', duplicate_grain_rows FROM dup
"""


def scd2_history_sql() -> str:
    """Twin of operators.rules.scd2_history — same key, same attribute
    fingerprint, same gap-breaks-version rule, HUGE-free window math."""
    key = (
        "billing_account_id, project_id, service_description, sku_id, "
        "customer_id, contract_id"
    )
    # per-field (is_null, value) struct, matching the Spark side: a joined
    # string collides across field boundaries and a sentinel collides with
    # sentinel-valued data, merging REAL version changes (review finding);
    # struct comparison/ordering is field-wise in both engines
    attrs = (
        "struct_pack(m := struct_pack(n := mode IS NULL, "
        "v := coalesce(CAST(mode AS VARCHAR), '')), "
        "d := struct_pack(n := discount IS NULL, v := coalesce(discount, '')), "
        "p := struct_pack(n := price IS NULL, v := coalesce(price, '')), "
        "c := struct_pack(n := credit_fields IS NULL, "
        "v := coalesce(credit_fields, '')))"
    )
    return f"""{_base_ctes()},
staged AS (
  SELECT {key}, mode, discount, price, credit_fields, month,
         CAST(substr(month, 1, 4) AS INT) * 12
           + CAST(substr(month, 6, 2) AS INT) AS midx,
         {attrs} AS attrs
  FROM dim
),
chg AS (
  SELECT *, CASE WHEN lag(midx) OVER w = midx - 1
                  AND lag(attrs) OVER w = attrs
                 THEN 0 ELSE 1 END AS c
  FROM staged
  WINDOW w AS (PARTITION BY {key} ORDER BY midx, attrs)
),
ver AS (
  SELECT *, CAST(sum(c) OVER (
    PARTITION BY {key} ORDER BY midx, attrs ROWS UNBOUNDED PRECEDING
  ) AS INT) AS version
  FROM chg
),
hist AS (
  SELECT {key}, version,
         min(mode) AS mode, min(discount) AS discount, min(price) AS price,
         min(credit_fields) AS credit_fields,
         min(month) AS valid_from, max(month) AS valid_to,
         CAST(count(*) AS BIGINT) AS n_months
  FROM ver GROUP BY {key}, version
)
SELECT {key}, version, mode, discount, price, credit_fields,
       valid_from, valid_to, n_months,
       valid_to = (SELECT max(month) FROM dim) AS is_current
FROM hist
"""


def profile_columns_sql() -> str:
    """Twin of operators.conform.profile_columns — the melt as UNION ALL."""
    from billing_etl_v1_spark.operators.conform import PROFILE_COLUMNS

    selects = [
        f"SELECT '{c}' AS column_name, {c} AS value FROM fact"
        for c in PROFILE_COLUMNS
    ]
    selects.append(
        "SELECT 'usage_day' AS column_name, CAST(usage_day AS VARCHAR) AS value FROM fact"
    )
    union = "\n  UNION ALL ".join(selects)
    return f"""{_base_ctes()},
melted AS (
  {union}
)
SELECT column_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum((value IS NULL)::BIGINT) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT value) AS BIGINT) AS n_distinct,
       min(value) AS min_value,
       max(value) AS max_value
FROM melted GROUP BY column_name
"""


def monthly_cost_forecast_sql(min_months: int = 2) -> str:
    """Twin of operators.analytics.monthly_cost_forecast — same exact
    decimal monthly totals, integer regression sums, and double closed
    form."""
    return f"""
WITH fact AS ({FACT_SQL}),
m AS (
  SELECT billing_account_id, invoice_month,
         sum(CAST(cost AS DECIMAL(38,10))) AS c
  FROM fact GROUP BY billing_account_id, invoice_month
),
staged AS (
  SELECT billing_account_id,
         CAST(CAST(substr(invoice_month, 1, 4) AS INT) * 12
              + CAST(substr(invoice_month, 5, 2) AS INT) AS BIGINT) AS x,
         CAST(floor(c * 1000000) AS BIGINT) AS yk
  FROM m
),
a AS (
  SELECT billing_account_id,
         CAST(count(*) AS BIGINT) AS n_months,
         max(x) AS maxx,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(yk) AS BIGINT) AS syk,
         CAST(sum(x * yk) AS BIGINT) AS sxyk,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM staged GROUP BY billing_account_id
),
d AS (
  SELECT billing_account_id, n_months,
         n_months::DOUBLE AS n, sx::DOUBLE AS sxd,
         syk::DOUBLE / 1000000.0 AS syd,
         sxyk::DOUBLE / 1000000.0 AS sxyd, sxx::DOUBLE AS sxxd,
         (maxx + 1)::DOUBLE AS nxt
  FROM a
),
f AS (
  SELECT *, (n * sxyd - sxd * syd) / (n * sxxd - sxd * sxd) AS slope
  FROM d WHERE n_months >= {min_months} AND n * sxxd - sxd * sxd <> 0
)
SELECT billing_account_id, n_months,
  {_r6('slope')} AS slope_per_month,
  {_r6('(syd - slope * sxd) / n + slope * nxt')} AS forecast_next_cost
FROM f
"""


def effective_unit_price_sql() -> str:
    """Twin of operators.analytics.effective_unit_price — exact decimal
    sums, double division of the cast sums."""
    return f"""
WITH fact AS ({FACT_SQL}),
a AS (
  SELECT sku_id, invoice_month,
         sum(CAST(cost AS DECIMAL(38,10))) AS c,
         sum(CAST(usage_amount_in_pricing_units AS DECIMAL(38,10))) AS u,
         CAST(count(*) AS BIGINT) AS n_lines
  FROM fact GROUP BY sku_id, invoice_month
)
SELECT sku_id, invoice_month, n_lines,
  {_r6('CAST(c AS DOUBLE)')} AS total_cost,
  {_r6('CAST(u AS DOUBLE)')} AS total_usage,
  {_r6('CAST(c AS DOUBLE) / CAST(u AS DOUBLE)')} AS effective_unit_price
FROM a WHERE u <> 0
"""


def account_statement_sql() -> str:
    """Twin of operators.analytics.account_statement — struct-max argmax
    with the same (cost, service_id) ordering."""
    return f"""
WITH fact AS ({FACT_SQL}),
svc AS (
  SELECT billing_account_id, invoice_month, service_id,
         sum(CAST(cost AS DECIMAL(38,10))) AS c
  FROM fact GROUP BY billing_account_id, invoice_month, service_id
),
top_svc AS (
  SELECT billing_account_id, invoice_month,
         (max(struct_pack(c := c, s := service_id))).s AS top_service_id
  FROM svc GROUP BY billing_account_id, invoice_month
),
t AS (
  SELECT billing_account_id, invoice_month,
         CAST(count(*) AS BIGINT) AS n_lines,
         {_r6('CAST(sum(CAST(cost AS DECIMAL(38,10))) AS DOUBLE)')} AS total_cost,
         {_r6('CAST(sum(CAST(internal_credits_cost AS DECIMAL(38,10))) AS DOUBLE)')} AS total_credits,
         {_r6('CAST(sum(CAST(internal_credits_consumption AS DECIMAL(38,10))) AS DOUBLE)')} AS total_consumption
  FROM fact GROUP BY billing_account_id, invoice_month
)
SELECT t.billing_account_id, t.invoice_month, t.n_lines,
       t.total_cost, t.total_credits, t.total_consumption, s.top_service_id
FROM t JOIN top_svc s USING (billing_account_id, invoice_month)
"""


def weekday_profile_sql() -> str:
    """Twin of operators.analytics.weekday_profile — epoch-day arithmetic
    weekday (0 = Monday), convention-free across engines."""
    return f"""
WITH fact AS ({FACT_SQL})
SELECT CAST(((usage_day - DATE '1970-01-05') % 7 + 7) % 7 AS INT) AS weekday,
       CAST(count(*) AS BIGINT) AS n_lines,
       {_r6('CAST(sum(CAST(cost AS DECIMAL(38,10))) AS DOUBLE)')} AS total_cost
FROM fact GROUP BY 1
"""
