"""Time-series surface: calendar gap-filling and per-group distribution
statistics.

The reference iterates calendar days in driver Python (``timedelta`` loop,
reference billing_calculation_service.py:87-94) and has no distribution
operators at all (SURVEY §2.11). Here the calendar itself is relational
data: ``F.sequence`` + ``explode`` build the date spine inside the DAG, so
gap detection is a left join — no driver loop, no collect.

Scale posture: the spine is (accounts x days) — microscopic next to the
fact (a month of days per account vs thousands of usage lines per account
per day). The day-grain aggregation is the only fact-sized shuffle; the
spine join then broadcasts the exploded day list (a single aggregated row)
and shuffles only the day grain. Exact percentiles sort each group's values
once inside one aggregation — right for the grouped-report grain; at
raw-fact grain the sketch path (``approx_percentile``, see
``approx_group_stats``) replaces the exact sort with a mergeable KLL-style
summary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from billing_etl_v1_spark.functions import finite_or_null, quantize6

PERCENTILES = (0.25, 0.5, 0.75, 0.9, 0.99)


def gap_fill_daily(fact: DataFrame, month: str) -> DataFrame:
    """Zero-filled daily cost series per account over ``month``'s observed
    day span: every (account, day) cell of the spine appears exactly once,
    with ``is_gap = 1`` marking days the account had no usage.

    The spine span is the month's global [min, max] usage_day so every
    account is comparable over the same calendar window.

    The day grain is a diamond (it feeds the bounds agg, the account list,
    and the join probe); Catalyst does not share common subplans, so the
    month's fact partition is scanned three times. That is fine when the
    fact is at rest in cache/parquet with the month filter pushed down; in
    a 100 TB pipeline, materialize the day grain once (it is only
    accounts x days rows) and feed this operator from that table instead.
    """
    # the day grain is additionally clamped to the invoice month's CALENDAR
    # window: a corrupt usage_day that disagrees with its invoice_month (a
    # valid date like 9999-12-31 passes every cast) would otherwise stretch
    # the [min, max] spine to millions of days and the accounts x spine
    # cross join to billions of rows — one bad row, one dead job. Inside
    # the month the clamp is a no-op; out-of-month garbage is excluded
    # here and flagged by the dq audit, not silently reported as usage.
    m0 = F.to_date(F.lit(month), "yyyyMM")
    day = (
        fact.filter(F.col("invoice_month") == month)
        .filter(F.col("usage_day").between(m0, F.last_day(m0)))
        .groupBy("billing_account_id", "usage_day")
        .agg(F.sum(F.col("cost").cast("decimal(38,10)")).alias("__cost"))
    )
    bounds = day.agg(F.min("usage_day").alias("d0"), F.max("usage_day").alias("d1"))
    spine_days = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("usage_day")
    )
    accounts = day.select("billing_account_id").distinct()
    spine = accounts.crossJoin(F.broadcast(spine_days))
    return spine.join(day, ["billing_account_id", "usage_day"], "left").select(
        "billing_account_id",
        "usage_day",
        quantize6(F.coalesce(F.col("__cost").cast("double"), F.lit(0.0))).alias(
            "day_cost"
        ),
        F.col("__cost").isNull().cast("int").alias("is_gap"),
    )


def value_percentiles(
    events: DataFrame, qs: tuple[float, ...] = PERCENTILES
) -> DataFrame:
    """Exact value percentiles per event_type (linear interpolation — the
    PERCENTILE_CONT definition both Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` implement), plus count/min/max context."""
    events = events.withColumn("value", finite_or_null("value"))
    pct = F.percentile("value", F.array(*[F.lit(q) for q in qs]))
    cols = [
        quantize6(F.element_at(pct, i + 1)).alias(f"p{int(q * 100)}")
        for i, q in enumerate(qs)
    ]
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        quantize6(F.min("value")).alias("min_value"),
        *cols,
        quantize6(F.max("value")).alias("max_value"),
    )


def approx_group_stats(
    events: DataFrame, qs: tuple[float, ...] = PERCENTILES, rsd: float = 0.01
) -> DataFrame:
    """The 100 TB path for the same report: mergeable sketches instead of
    exact sorts — HyperLogLog++ cardinality (``approx_count_distinct``) and
    KLL-style quantiles (``approx_percentile``). Constant memory per group,
    one map-side-combinable aggregation, no per-group sort.

    No DuckDB oracle (sketch estimates are engine-specific); correctness is
    bounded against the exact operators in tests/test_timeseries.py.
    """
    events = events.withColumn("value", finite_or_null("value"))
    pct = F.percentile_approx(
        "value", F.array(*[F.lit(q) for q in qs]), F.lit(100_000)
    )
    cols = [
        quantize6(F.element_at(pct, i + 1)).alias(f"approx_p{int(q * 100)}")
        for i, q in enumerate(qs)
    ]
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("user_id", rsd).alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
        *cols,
    )


def approx_stats_checked(
    events: DataFrame,
    qs: tuple[float, ...] = PERCENTILES,
    rsd: float = 0.01,
    q_tol: float = 0.02,
) -> DataFrame:
    """Driver-checkable form of ``approx_group_stats``: runs the sketch
    aggregation for real, then emits only deterministic columns — the exact
    count / distinct-count plus one boolean per sketch asserting the
    estimate landed inside its published error bound.

    Sketch estimates themselves are engine-specific (HLL++ / KLL internals),
    so they can never hash-match a DuckDB oracle; the *bounds* are part of
    each sketch's contract and deterministically TRUE whenever the
    implementation honors it:

    - HLL++ with ``rsd`` = 1% on small-cardinality groups runs in sparse
      (exact) mode; the flag allows ``max(5, 5%)`` absolute drift.
    - ``approx_percentile`` with accuracy 100k returns an order statistic
      whose rank error is ``≤ n/accuracy`` — inside the exact
      [p(q−q_tol), p(q+q_tol)] envelope for any group with ≥ 1/q_tol rows.

    The oracle (oracle_ext.approx_stats_sql) emits the exact columns and
    literal TRUEs, so a sketch regression beyond bounds flips a flag and
    fails the driver hash.
    """
    # the exact-bounds frame joins the sketch frame ON event_type: a NULL
    # category would drop from the equi-join on Spark while the twin (no
    # join) kept it — corrupt category rows are excluded on both engines
    events = events.filter(F.col("event_type").isNotNull()).withColumn(
        "value", finite_or_null("value")
    )
    approx = approx_group_stats(events, qs, rsd)
    lo_hi = [
        (max(0.0, q - q_tol), min(1.0, q + q_tol)) for q in qs
    ]
    pct_lo = F.percentile("value", F.array(*[F.lit(lo) for lo, _ in lo_hi]))
    pct_hi = F.percentile("value", F.array(*[F.lit(hi) for _, hi in lo_hi]))
    exact = events.groupBy("event_type").agg(
        *[
            quantize6(F.element_at(pct_lo, i + 1)).alias(f"__lo{i}")
            for i in range(len(qs))
        ],
        *[
            quantize6(F.element_at(pct_hi, i + 1)).alias(f"__hi{i}")
            for i in range(len(qs))
        ],
    )
    eps = F.lit(1e-6)  # quantize6 grid step: bound comparison off-by-one-ulp guard
    joined = approx.join(F.broadcast(exact), "event_type")
    # the rank-error envelope is only guaranteed for groups with >= 1/q_tol
    # rows: approx_percentile returns a data ELEMENT while the exact bounds
    # interpolate, so a tiny group (e.g. 2 rows at a small scale factor) can
    # legitimately land outside [p(q-tol), p(q+tol)]. Below that size the
    # flag is trivially TRUE — matching the documented contract, and the
    # oracle's literal TRUE, for ALL inputs.
    small_group = F.col("n_events") < F.lit(int(1.0 / q_tol))
    flags = [
        (
            small_group
            | (
                (F.col(f"approx_p{int(q * 100)}") >= F.col(f"__lo{i}") - eps)
                & (F.col(f"approx_p{int(q * 100)}") <= F.col(f"__hi{i}") + eps)
            )
        ).alias(f"p{int(q * 100)}_in_bounds")
        for i, q in enumerate(qs)
    ]
    users_flag = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        <= F.greatest(F.lit(5), (F.lit(0.05) * F.col("exact_users")).cast("bigint"))
    ).alias("users_in_bounds")
    return joined.select("event_type", "n_events", "exact_users", users_flag, *flags)


def user_value_trend(events: DataFrame, min_points: int = 2) -> DataFrame:
    """Per-user linear trend (least-squares slope/intercept) of `value` over
    event time, x in whole days.

    Implemented as ONE grouped aggregate accumulating the five classic
    regression sums — n, Σx, Σy, Σxy, Σx² — as exact integers (y quantized
    to micro-units: the fit's determinism contract), then the closed-form
    slope/intercept in double on the driver-free final projection. This is
    the scalable shape for per-key regression at 100 TB: no window, no
    second pass, one shuffle on the group key.
    Degenerate groups (fewer than `min_points` events or zero x-variance)
    are filtered, matching the oracle.

    x = epoch-days (unix seconds integer-divided by 86400) keeps the
    slope in a quantizable range (per-day units) and the Σx² sums inside
    DECIMAL(38,10) headroom.
    """
    # Every accumulated term is an EXACT INTEGER: x = epoch-days, y scaled
    # to micro-units via the house floor(v*1e6+0.5) quantization. Summing
    # doubles-cast-to-decimal is NOT cross-engine-safe for full-precision
    # products (Spark casts double→decimal through the shortest-round-trip
    # string, DuckDB through the exact binary expansion — they disagree at
    # the 10th decimal), but integer sums in DECIMAL(38,0) are exact
    # everywhere, and the closed form below starts from identical doubles.
    # rows whose y (corrupt value → NULL via the guard) or x (NULL ts) is
    # missing must leave ALL five sums, not just the ones that touch the
    # NULL: F.sum skips NULLs per-column, so keeping the row would count
    # it in n/Σx/Σx² but not Σy/Σxy — the closed form then fits mismatched
    # sums instead of the valid points (review finding; oracle mirrors)
    events = events.withColumn("value", finite_or_null("value")).filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    dec0 = lambda c: F.sum(c.cast("decimal(38,0)"))  # noqa: E731
    x = F.floor(F.unix_timestamp("ts") / F.lit(86400))
    yk = F.floor(F.col("value") * F.lit(1_000_000.0) + F.lit(0.5))
    agg = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        dec0(x).alias("__sx"),
        dec0(yk).alias("__syk"),
        dec0(x.cast("decimal(38,0)") * yk.cast("decimal(38,0)")).alias("__sxyk"),
        dec0(x.cast("decimal(38,0)") * x.cast("decimal(38,0)")).alias("__sxx"),
    )
    n = F.col("n_events").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__syk").cast("double") / F.lit(1_000_000.0)
    sxy = F.col("__sxyk").cast("double") / F.lit(1_000_000.0)
    sxx = F.col("__sxx").cast("double")
    denom = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / denom
    return (
        agg.filter((F.col("n_events") >= min_points) & (denom != 0))
        .select(
            "user_id",
            "n_events",
            quantize6(slope).alias("slope_per_day"),
            quantize6((sy - slope * sx) / n).alias("intercept"),
            quantize6(sy / n).alias("mean_value"),
        )
    )


def daily_anomaly_flags(
    events: DataFrame,
    window_days: int = 7,
    min_days: int = 4,
    z2: int = 9,
) -> DataFrame:
    """Rolling z-score spike detection on the daily event-value series,
    computed entirely in EXACT arithmetic: per (event_type, day), flag the
    day whose total value exceeds the trailing ``window_days`` mean by
    more than z standard deviations (``z2`` = z², so z=3 by default).

    The float-free formulation (the reason this is driver-hashable):
    values become integer cents (``round(value*100)`` — exact in both
    engines), and the test ``(x-mean)² > z²·var`` is cleared of divisions:

        (m·x − s)² > z²·(m·ss − s²)     [m = days in window, s = Σ,
                                         ss = Σx² over the window]

    with every product in DECIMAL(38,0) (the user_value_trend pattern), so
    the flag is bit-identical cross-engine — no sqrt, no float variance.
    Spikes only (``dev > 0``); a day needs ``min_days`` trailing days of
    history to be flaggable. The current day is excluded from its own
    baseline (``rowsBetween(-window_days, -1)``).

    Scale: one day-grain aggregate (the only fact-sized shuffle), then a
    window over the tiny (type, day) grain — the same posture as
    gap_fill_daily. The per-day cent totals must stay under ~1e18 for the
    BIGINT window sums (at larger volumes aggregate dollars, not cents —
    DuckDB fails loudly on overflow, Spark non-ANSI wraps, so stay well
    inside).
    """
    from pyspark.sql import Window

    # NULL ts has no day and would sort differently per engine (Spark
    # NULLS FIRST vs DuckDB NULLS LAST) inside the trailing window
    events = events.filter(F.col("ts").isNotNull()).withColumn(
        "value", finite_or_null("value")
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(cents).alias("v_cents"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-window_days, -1)
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    vc = F.col("v_cents")
    m = F.count("v_cents").over(w)
    s = F.sum("v_cents").over(w)
    ss = F.sum(dec(vc) * dec(vc)).over(w)
    base = daily.select(
        "event_type",
        "day",
        "n_events",
        "v_cents",
        m.cast("bigint").alias("base_days"),
        s.alias("__s"),
        ss.alias("__ss"),
    )
    dev = dec(F.col("base_days")) * dec(vc) - dec(F.col("__s"))
    lhs = dev * dev
    rhs = F.lit(z2).cast("decimal(38,0)") * (
        dec(F.col("base_days")) * F.col("__ss")
        - dec(F.col("__s")) * dec(F.col("__s"))
    )
    return base.select(
        "event_type",
        "day",
        "n_events",
        "v_cents",
        "base_days",
        (
            (F.col("base_days") >= min_days) & (dev > 0) & (lhs > rhs)
        ).alias("is_spike"),
    )


def hll_daily_merge(events: DataFrame, rel_tol: float = 0.05) -> DataFrame:
    """Sketch MERGEABILITY as a verified query — the property that makes
    sketches the 100 TB answer: per-(type, day) HLL sketches unioned up to
    the month must estimate exactly what one direct monthly sketch
    estimates (DataSketches HLL union is register-wise lossless), so daily
    jobs can persist tiny sketch columns and any rollup grain is a cheap
    union away — no re-scan of raw events, ever.

    Output per event_type: the exact distinct-user count (the
    oracle-computable truth), ``merged_equals_direct`` (structural
    equality of the two estimates — lossless union), and
    ``within_tol`` (estimate within ``rel_tol`` of exact, with the
    small-cardinality bypass of the approx_stats_checked contract: below
    1/rel_tol the comparison is trivially TRUE since HLL's sparse mode is
    exact there).
    """
    # merged and direct frames join ON event_type: NULL categories would
    # drop from the Spark equi-join but not the twin — excluded both sides
    events = events.filter(F.col("event_type").isNotNull())
    daily = events.groupBy("event_type", F.to_date("ts").alias("__d")).agg(
        F.hll_sketch_agg("user_id").alias("__sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias("__est_merged")
    )
    direct = events.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("__est_direct"),
        F.countDistinct("user_id").cast("bigint").alias("n_exact"),
    )
    n = F.col("n_exact")
    within = (
        (F.abs(F.col("__est_direct") - n) <= F.lit(rel_tol) * n)
        | (n < F.lit(int(1 / rel_tol)))
    )
    return merged.join(direct, "event_type").select(
        "event_type",
        "n_exact",
        (F.col("__est_merged") == F.col("__est_direct")).alias("merged_equals_direct"),
        within.alias("within_tol"),
    )
