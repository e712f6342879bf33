"""Contract-rule matching: the 8-way NULL-wildcard priority join (J1).

Reference semantics (both implementations agree — SURVEY §2.3):

- ``dim_contract`` rows are partitioned into 8 subsets by the NULL pattern of
  (project_id, service_description, sku_id); NULL means wildcard
  (reference calculate/service.py:117-124; sql_template.py:47-61).
- The fact is LEFT-joined to each subset on progressively longer key sets and
  the winner is chosen **per column** with priority 8>4>6>2>7>3>5>1:
  the SQL path is a per-column COALESCE (sql_template.py:93-98), and the
  pandas path's ``df.update`` skips NaN cells, which is the same per-column
  fallback (calculate/service.py:126-138 applies rules in reverse priority,
  last-writer-wins per non-null cell).
- Duplicate-dim hazard (SURVEY §2.3): the reference silently assumes dim keys
  are unique per (month, key-tuple); we make that explicit with a
  deterministic dedup (row_number over the key window, ordered by the rule
  payload columns, nulls last).

Scale posture: the dim is broadcast-small (the reference keeps it whole in
driver memory, billing_calculation_service.py:291-327), so all 8 joins are
broadcast hash joins — zero shuffle of the 100 TB fact, one stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from billing_etl_v1_spark.operators import _memo

# rule number -> non-wildcard dim columns (join keys beyond account)
RULE_PATTERNS: dict[int, tuple[str, ...]] = {
    1: (),
    2: ("project_id",),
    3: ("service_description",),
    4: ("project_id", "service_description"),
    5: ("sku_id",),
    6: ("project_id", "sku_id"),
    7: ("service_description", "sku_id"),
    8: ("project_id", "service_description", "sku_id"),
}

WILDCARD_COLUMNS = ("project_id", "service_description", "sku_id")

# specificity priority (reference sql_template.py:93 comment;
# calculate/service.py:126 application order reversed)
PRIORITY = (8, 4, 6, 2, 7, 3, 5, 1)

# rule payload carried onto the fact (reference calculate/service.py:115)
RULE_COLUMNS = ("mode", "discount", "price", "credit_fields", "customer_id", "contract_id")


def dedupe_dim(dim: DataFrame) -> DataFrame:
    """Deterministically keep one rule per (month, account, key-tuple).

    The reference assumes uniqueness (pd.merge would otherwise row-multiply,
    calculate/service.py:136); we enforce it: smallest payload wins, ordered
    by the rule columns with NULLs last.
    """
    w = Window.partitionBy("month", "billing_account_id", *WILDCARD_COLUMNS).orderBy(
        *[F.col(c).asc_nulls_last() for c in RULE_COLUMNS]
    )
    return (
        dim.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def split_rules(dim: DataFrame) -> dict[int, DataFrame]:
    """P8: 8-way partition of the dim by NULL pattern
    (reference calculate/service.py:117-124; sql_template.py:47-61)."""
    out: dict[int, DataFrame] = {}
    for rule, pattern in RULE_PATTERNS.items():
        cond = F.lit(True)
        for c in WILDCARD_COLUMNS:
            cond = cond & (F.col(c).isNotNull() if c in pattern else F.col(c).isNull())
        out[rule] = dim.filter(cond)
    return out


# session-scoped memo of cached (deduped) dims: repeated pipeline runs over
# the same dim reuse ONE cached relation instead of stacking a new orphan
# per call (round-1 advice); hits confirmed via sameResult — see _memo
_DIM_CACHE: _memo.Registry = {}


def _memo_cache_dim(dim: DataFrame) -> DataFrame:
    return _memo.memo_persist(dim, _DIM_CACHE)


def release_dim_cache(spark=None) -> int:
    """Unpersist every dim ``match_rules`` cached (for ``spark`` only, or
    all sessions); returns how many were released. Call between pipeline
    generations when the dim changes."""
    return _memo.release(_DIM_CACHE, spark)


def match_rules(
    fact: DataFrame,
    dim: DataFrame,
    month_col: str = "contract_month",
    dedupe: bool = True,
    cache_dim: bool = True,
) -> DataFrame:
    """J1: attach the winning rule's payload columns to the fact.

    ``fact`` must carry ``month_col`` ('YYYY-MM', reference main.py:34-36,
    billing_calculation_service.py:129). Adds the 6 RULE_COLUMNS; ``discount``
    and ``price`` stay loosely-typed strings exactly like the dim
    (cast at use — reference calculate/service.py:51,61,70,87-88).

    ``cache_dim`` materializes the deduped dim once so the 8 join subtrees
    broadcast from one in-memory relation instead of re-computing the dim
    lineage 8 times — the Spark analogue of the reference loading the whole
    dim into driver memory once per run
    (billing_calculation_service.py:291-327). The dim is broadcast-small by
    contract, so this is O(rules) memory. The cached relation is memoized
    per (session, dim plan) — repeated calls share it rather than leaking
    one per call; ``release_dim_cache`` drops it explicitly.
    """
    if dedupe:
        dim = dedupe_dim(dim)
    if cache_dim:
        dim = _memo_cache_dim(dim)
    subsets = split_rules(dim)

    df = fact
    for rule in PRIORITY:
        pattern = RULE_PATTERNS[rule]
        keys = ("billing_account_id",) + pattern
        r = subsets[rule].select(
            F.col("month").alias(f"__m_{rule}"),
            *[F.col(k).alias(f"__k_{rule}_{k}") for k in keys],
            *[F.col(c).alias(f"__{c}_{rule}") for c in RULE_COLUMNS],
        )
        cond = F.col(month_col) == F.col(f"__m_{rule}")
        for k in keys:
            cond = cond & (F.col(k) == F.col(f"__k_{rule}_{k}"))
        df = df.join(F.broadcast(r), on=cond, how="left").drop(
            f"__m_{rule}", *[f"__k_{rule}_{k}" for k in keys]
        )

    # per-column priority coalesce (sql_template.py:93-98)
    for c in RULE_COLUMNS:
        df = df.withColumn(c, F.coalesce(*[F.col(f"__{c}_{r}") for r in PRIORITY]))
    return df.drop(*[f"__{c}_{r}" for c in RULE_COLUMNS for r in PRIORITY])


def restrict_dim_to_fact_accounts(dim: DataFrame, fact: DataFrame) -> DataFrame:
    """J2/P9: the reference filters the dim to accounts present in the batch
    with a driver-side ``isin`` (calculate/service.py:166-168). Distributed
    form is a left-semi join; with a broadcast dim it is a no-op for
    correctness, so this exists only as an exposed operator."""
    return dim.join(
        fact.select("billing_account_id").distinct(), on="billing_account_id", how="left_semi"
    )


def scd2_history(dim: DataFrame, include_current: bool = True) -> DataFrame:
    """Collapse the monthly contract-dim snapshots into SCD Type-2 history:
    one row per (rule key, version) with a [valid_from, valid_to] month
    range, where a new version starts whenever the pricing attributes
    (mode, discount, price, credit_fields) change OR the month sequence
    has a gap (a contract absent for a month and back later is a NEW
    version — e.g. the reference's March-only account,
    sources/synthetic.py ACCT-18 / reference dim_contract month filtering,
    billing_calculation_service.py:296-315).

    The rule key includes customer_id/contract_id so the deliberately
    duplicated dim rows (the SURVEY §2.3 dedup hazard) version
    independently instead of colliding at the same month.

    Shape: one key-partitioned window (lag month-index + lag attribute
    fingerprint), a running change-count giving the version number, then
    one aggregate per (key, version) — two key-clustered exchanges total,
    no self-join. This is the standard warehouse pattern for turning
    snapshot feeds into effective-dated dimensions at any scale; the month
    spine never leaves the key partition.
    """
    key_cols = [
        "billing_account_id",
        "project_id",
        "service_description",
        "sku_id",
        "customer_id",
        "contract_id",
    ]
    attr_cols = ["mode", "discount", "price", "credit_fields"]
    midx = (
        F.substring("month", 1, 4).cast("int") * 12
        + F.substring("month", 6, 2).cast("int")
    )
    # attribute fingerprint as a STRUCT, not a joined string: concat_ws
    # collides across field boundaries (('a|b','c') vs ('a','b|c')) and a
    # literal sentinel collides with sentinel-valued data — either merged
    # REAL version changes (review finding). Per field, (is_null, value)
    # makes NULL vs '' distinct with no sentinel; struct comparison is
    # field-wise and structs order deterministically in the window.
    attrs = F.struct(
        *[
            F.struct(
                F.col(c).cast("string").isNull().alias("n"),
                F.coalesce(F.col(c).cast("string"), F.lit("")).alias("v"),
            ).alias(c)
            for c in attr_cols
        ]
    )
    # __attrs tiebreak: duplicate (key, month) rows never occur in the
    # synthetic dim, but a library operator must not let window-order ties
    # pick versions nondeterministically if a caller feeds them
    w = Window.partitionBy(*key_cols).orderBy("__midx", "__attrs")
    staged = dim.select(
        *key_cols, *attr_cols, "month", midx.alias("__midx"), attrs.alias("__attrs")
    ).withColumn(
        "__chg",
        F.when(
            (F.lag("__midx").over(w) == F.col("__midx") - 1)
            & (F.lag("__attrs").over(w) == F.col("__attrs")),
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    wv = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    versioned = staged.withColumn("version", F.sum("__chg").over(wv).cast("int"))
    hist = versioned.groupBy(*key_cols, "version").agg(
        F.min("mode").alias("mode"),
        F.min("discount").alias("discount"),
        F.min("price").alias("price"),
        F.min("credit_fields").alias("credit_fields"),
        F.min("month").alias("valid_from"),
        F.max("month").alias("valid_to"),
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
    )
    hist = hist.select(
        *key_cols, "version", *attr_cols, "valid_from", "valid_to", "n_months"
    )
    if not include_current:
        # incremental maintainers persist the version FACTS only and derive
        # "current" at read time against the store-wide max month — a flag
        # baked at write time goes stale the moment a later month arrives
        # for any OTHER key (see streaming.streaming_scd2_maintenance)
        return hist
    latest = dim.agg(F.max("month").alias("__maxm"))
    return hist.crossJoin(F.broadcast(latest)).select(
        *key_cols,
        "version",
        *attr_cols,
        "valid_from",
        "valid_to",
        "n_months",
        (F.col("valid_to") == F.col("__maxm")).alias("is_current"),
    )
