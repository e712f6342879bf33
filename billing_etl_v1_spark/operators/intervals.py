"""Interval-overlap join for two LARGE interval sets — bin decomposition.

The engine already covers the small-side case (broadcast non-equi join,
plans/examples.py price_bands) and the ordered point-lookup case (as-of
join, operators/events.py). What was missing — and explicitly called out
as the remaining shape in plans/examples.py:108-110 — is the overlap join
where BOTH sides are large interval sets: sessions × outage windows,
usage periods × rate periods, span annotations × span annotations. A
naive `a.start <= b.end AND b.start <= a.end` join has no equi-key, so
Spark would plan a cartesian / broadcast-nested-loop — quadratic and
undriveable at 100 TB.

The scale-correct decomposition (the same banding idea as the LSH pair
join in operators/dedup.py, applied to the time axis):

1. Pick a bin width ``w``. Replicate every interval to each bin its
   span touches: ``explode(sequence(floor(start/w), floor(end/w)))`` —
   replication factor is interval_length/w + 1, chosen by the caller to
   match interval scale.
2. Equi-join on the bin id (plus any caller equi-keys) — a plain hash
   shuffle join Spark executes at any scale, AQE-skew-splittable.
3. Keep a pair only where the exact overlap predicate holds AND the join
   bin is the FIRST bin the two intervals share:
   ``bin == greatest(floor(l_start/w), floor(r_start/w))``. Every
   overlapping pair shares exactly that bin (max of the two start bins
   is <= both end bins whenever the intervals overlap, floor being
   monotone), so each pair surfaces EXACTLY ONCE — no `distinct`
   de-duplication shuffle afterwards.

Endpoints are numeric (use epoch seconds for time — integer-exact in
both engines; `F.window`-free so the DuckDB oracle reproduces bins
bit-for-bit). Intervals are CLOSED on both ends: touching endpoints
(l_end == r_start) count as overlap, matching the SQL predicate the
oracle runs verbatim.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from billing_etl_v1_spark.operators import _memo

__all__ = [
    "interval_join",
    "interval_join_left",
    "point_in_interval_join",
    "activity_spans",
    "concurrency_profile",
    "session_type_overlap",
    "session_type_overlap_left",
    "session_concurrency",
    "suggest_bin_width",
    "release_boundary_cache",
]

_NET_CACHE: _memo.Registry = {}


def release_boundary_cache(spark=None) -> int:
    """Unpersist the memoized boundary-rank tables
    :func:`concurrency_profile` hands to its two-phase prefix sum (for
    ``spark`` only, or all sessions); returns how many were released.
    Call between pipeline generations — the same contract as
    ``dedup.release_signature_cache``.

    This is a STALE-DATA boundary, not just a storage knob (r10 ADVICE):
    the memo matches on the logical PLAN (sameResult), so if the data
    under an unchanged plan changes within a session — a parquet path
    rewritten between pipeline generations — the memo keeps serving the
    materialization of the OLD bytes until released."""
    return _memo.release(_NET_CACHE, spark)


_RESERVED = ("_ij_bin", "_ij_l_sb", "_ij_r_sb")


def _binned(
    df: DataFrame, s: str, e: str, bin_col: str, sb_col: str, bin_width: int
) -> DataFrame:
    """Well-formed rows replicated to every bin their [s, e] span touches,
    carrying the start bin in ``sb_col`` (the exactly-once rule joins on
    it) — the shared decomposition step of every interval face here."""
    well_formed = (
        F.col(s).isNotNull() & F.col(e).isNotNull() & (F.col(e) >= F.col(s))
    )
    sb = F.floor(F.col(s) / F.lit(bin_width)).cast("bigint")
    eb = F.floor(F.col(e) / F.lit(bin_width)).cast("bigint")
    return (
        df.filter(well_formed)
        .withColumn(sb_col, sb)
        .withColumn(bin_col, F.explode(F.sequence(sb, eb)))
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """All (left, right) row pairs whose closed intervals overlap:
    ``l_start <= r_end AND r_start <= l_end`` (plus equality on ``keys``
    when given), via the bin decomposition described in the module
    docstring — one equi-shuffle, no cartesian, each pair exactly once.

    Rows with a NULL endpoint are excluded from BOTH sides (a NULL bound
    can anchor no bin range, and SQL's overlap predicate would silently
    drop them anyway — excluding them here makes the contract explicit),
    as are malformed rows with ``end < start``. Column names must be
    disjoint across the two sides except for ``keys``; the output carries
    every column of both inputs.

    ``bin_width`` trades replication for join fan-in: replication factor
    is interval_length/bin_width + 1, rows-per-bin grows as bin_width
    does. Pick it near the TYPICAL interval length so both stay O(1).
    """
    if bin_width < 1:
        raise ValueError(f"bin_width must be >= 1, got {bin_width}")
    keys = list(keys or [])
    overlap_cols = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap_cols:
        raise ValueError(
            f"left/right column names must be disjoint apart from keys; "
            f"shared: {sorted(overlap_cols)}"
        )
    for side, s_col, e_col in ((left, l_start, l_end), (right, r_start, r_end)):
        missing = {s_col, e_col, *keys} - set(side.columns)
        if missing:
            raise ValueError(f"missing interval/key columns: {sorted(missing)}")
        reserved = set(_RESERVED) & set(side.columns)
        if reserved:
            raise ValueError(f"column names {sorted(reserved)} are reserved")

    lb = _binned(left, l_start, l_end, "_ij_bin", "_ij_l_sb", bin_width)
    rb = _binned(right, r_start, r_end, "_ij_bin", "_ij_r_sb", bin_width)
    joined = lb.join(rb, on=["_ij_bin", *keys], how="inner")
    exact = (F.col(l_start) <= F.col(r_end)) & (F.col(r_start) <= F.col(l_end))
    first_shared_bin = F.col("_ij_bin") == F.greatest("_ij_l_sb", "_ij_r_sb")
    return joined.filter(exact & first_shared_bin).drop(
        "_ij_bin", "_ij_l_sb", "_ij_r_sb"
    )


def interval_join_left(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Left-outer overlap join: every well-formed left row appears — with
    the matching right columns where intervals overlap, with NULL right
    columns where nothing does (usage periods that hit no rate period are
    the billing exceptions report, not rows to silently drop).

    The matched part is exactly :func:`interval_join`; the unmatched part
    is one broadcast-friendly left-anti join of ``left`` against the
    DISTINCT matched ``left_id``s. ``left_id`` must uniquely identify
    left rows — outer semantics need row identity, and deriving one
    internally (monotonically_increasing_id) would be retry-unstable at
    scale, so the contract makes the caller name it. NULL counts as one
    key VALUE here (the anti-join is null-safe — a matched NULL-id row
    is not re-emitted as unmatched), so at most ONE left row may carry a
    NULL id, exactly as any other id value may appear at most once. Left
    rows excluded by the well-formedness rule (NULL/inverted endpoints)
    stay excluded — they are corrupt input, not unmatched intervals.

    Scale note: ``matched`` is referenced twice (output rows + the
    anti-join id set) and Catalyst does not share subtrees across union
    branches, so the join computes twice. That is the honest cost of
    ROW-LEVEL outer pairs; a consumer that aggregates per left row
    should instead fold the outer semantics into one binned left-outer
    join with conditional aggregation — :func:`session_type_overlap_left`
    is the worked example.
    """
    if left_id not in left.columns:
        raise ValueError(f"left_id column {left_id!r} missing from left")
    if "_ijl_mid" in left.columns:
        raise ValueError("column name '_ijl_mid' is reserved")
    matched = interval_join(
        left, right, l_start, l_end, r_start, r_end, bin_width, keys=keys
    )
    well_formed = (
        F.col(l_start).isNotNull()
        & F.col(l_end).isNotNull()
        & (F.col(l_end) >= F.col(l_start))
    )
    # null-safe anti-join: `on=left_id` would never match a NULL key, so
    # a matched NULL-id left row would silently reappear as unmatched
    unmatched = left.filter(well_formed).join(
        matched.select(F.col(left_id).alias("_ijl_mid")).distinct(),
        F.col(left_id).eqNullSafe(F.col("_ijl_mid")),
        "left_anti",
    )
    for f in matched.schema.fields:
        if f.name not in left.columns:
            unmatched = unmatched.withColumn(f.name, F.lit(None).cast(f.dataType))
    return matched.unionByName(unmatched.select(*matched.columns))


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    p_col: str,
    i_start: str,
    i_end: str,
    bin_width: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Point-in-interval containment join — the billing-native special
    case (usage events × rate periods) of :func:`interval_join` where the
    left intervals are degenerate ``[p, p]``: a point replicates to ONE
    bin, so the left side carries no replication cost at all and the
    exactly-once rule holds trivially. Matches where
    ``i_start <= p <= i_end`` (closed)."""
    tmp = "_pij_end"
    if tmp in points.columns or tmp in intervals.columns:
        raise ValueError(f"column name {tmp!r} is reserved")
    out = interval_join(
        points.withColumn(tmp, F.col(p_col)),
        intervals,
        p_col,
        tmp,
        i_start,
        i_end,
        bin_width,
        keys=keys,
    )
    return out.drop(tmp)


def activity_spans(
    events: DataFrame,
    part_col: str,
    gap_s: int = 3600,
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    bucket_s: int | None = None,
) -> DataFrame:
    """Contiguous activity spans per ``part_col``: the gap rule of
    :func:`operators.events.sessionize`, generalized from user_id to any
    partition column, with bounds in floored epoch seconds (BIGINT) so
    downstream interval math is integer-exact in both engines.

    Output: one row per (part, span_idx) with span_start_s, span_end_s,
    n_events. NULL-ts rows are excluded (the engines disagree on where
    NULL sorts — the standing sessionize rationale); NULL partition keys
    are excluded too (both engines pool them into ONE span stream, which
    is never the analytic intent for an unknown key).

    ``part_col`` is often LOW-cardinality (event types, tenants), which
    makes the single window partition a one-task sort of a whole type —
    fine at test scale, a bottleneck at 100 TB. ``bucket_s`` (must be
    > gap_s) turns on the two-level formulation: the gap rule runs per
    (part, floor(ep/bucket_s)) — bounded partitions — emitting local
    spans, then the SAME gap rule stitches the per-part local spans
    ordered by start. Equivalence is exact, not approximate: within a
    bucket consecutive gaps <= gap_s are already merged, and the gap
    between adjacent local spans IS the true inter-event gap (span end =
    last event, next span start = next event), so stitching with the
    identical predicate reproduces the event-level spans — and the
    stitch window runs over the SPAN table, whose size is bounded by
    real_spans + time_range/bucket_s, never by event count
    (property-tested equal to the single-level form).
    """
    fep = F.floor(F.unix_timestamp(F.col(ts_col).cast("timestamp"))).cast("bigint")
    base = (
        events.filter(F.col(ts_col).isNotNull() & F.col(part_col).isNotNull())
        .withColumn("_ep", fep)
    )
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]

    def _gap_spans(df: DataFrame, parts: list[str]) -> DataFrame:
        w = Window.partitionBy(*parts).orderBy(*order)
        new_span = F.when(
            F.lag("_ep").over(w).isNull()
            | ((F.col("_ep") - F.lag("_ep").over(w)) > gap_s),
            1,
        ).otherwise(0)
        wsum = (
            Window.partitionBy(*parts)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            df.withColumn("_span", F.sum(new_span).over(wsum))
            .groupBy(*parts, "_span")
            .agg(
                F.min("_ep").alias("span_start_s"),
                F.max("_ep").alias("span_end_s"),
                F.count(F.lit(1)).alias("n_events"),
            )
        )

    if bucket_s is None:
        out = _gap_spans(base, [part_col])
        return out.select(
            part_col,
            F.col("_span").alias("span_idx"),
            "span_start_s",
            "span_end_s",
            "n_events",
        )

    if bucket_s <= gap_s:
        raise ValueError(
            f"bucket_s must exceed gap_s ({gap_s}), got {bucket_s} — a gap "
            f"can otherwise span a whole bucket and the stitch misses it"
        )
    local = _gap_spans(
        base.withColumn("_bkt", F.floor(F.col("_ep") / F.lit(bucket_s))),
        [part_col, "_bkt"],
    )
    # stitch: the identical gap predicate over per-part local spans in
    # start order (starts are unique per part: local spans never overlap)
    ws = Window.partitionBy(part_col).orderBy(F.col("span_start_s").asc())
    new_chain = F.when(
        F.lag("span_end_s").over(ws).isNull()
        | ((F.col("span_start_s") - F.lag("span_end_s").over(ws)) > gap_s),
        1,
    ).otherwise(0)
    wc = ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        local.withColumn("span_idx", F.sum(new_chain).over(wc))
        .groupBy(part_col, "span_idx")
        .agg(
            F.min("span_start_s").alias("span_start_s"),
            F.max("span_end_s").alias("span_end_s"),
            F.sum("n_events").alias("n_events"),
        )
    )


def concurrency_profile(
    intervals: DataFrame,
    s_col: str,
    e_col: str,
    keys: list[str] | None = None,
    persist_net: bool = True,
) -> DataFrame:
    """How many intervals are active at once — the step function of the
    classic boundary sweep (+1 at start, −1 at end+1 for closed integer
    intervals), distributed: capacity planning over sessions, overlap
    audits over rate periods.

    Output: one row per distinct boundary time (per key group when
    ``keys`` is given) with ``concurrency`` = active intervals on
    [t, next boundary). Peak concurrency is ``max(concurrency)`` —
    ties-at-a-boundary are handled exactly because ends retire BEFORE
    starts land at the same tick (end+1 encoding), so touching intervals
    [0,5], [6,10] never read as concurrent. Non-integer endpoints are
    FLOORED onto ticks — the same convention :func:`interval_join` bins
    by, so the two operators agree on which tick an interval occupies
    even for negative endpoints (cast-to-bigint would truncate toward
    zero instead).

    Scale shape: boundaries aggregate per tick first (map-side combine),
    then the running sum needs a TOTAL order — per key group that is an
    ordinary key-partitioned window; globally it is the same two-phase
    distributed prefix sum every ranked operator here uses
    (:func:`operators.events.distributed_total_rank` — range-partitioned
    parallel sorts + a broadcast offset join, NO single-task global
    sort). The rank references its windowed input three times (ranked
    output + both sides of the offsets self-join), so the global path
    hands the rank a memo registry (``persist_net=True``): the rank
    memo-persists its windowed table, and the expensive upstream —
    typically a sessionize window over raw events — plus the rank's own
    range-shuffle/windows compute ONCE instead of three times (r10; one
    events scan in the plan, pinned by tests/test_scale_posture.py).
    Call :func:`release_boundary_cache` between pipeline generations.
    ``persist_net`` applies to the GLOBAL path only: the keyed path is a
    single key-partitioned window pass with nothing referenced twice, so
    there is nothing to persist and the flag is a documented no-op there.
    NULL/malformed intervals are excluded as in :func:`interval_join`.
    """
    from billing_etl_v1_spark.operators.events import distributed_total_rank

    keys = list(keys or [])
    if "_b" in keys:
        raise ValueError("key name '_b' is reserved")
    well_formed = (
        F.col(s_col).isNotNull() & F.col(e_col).isNotNull()
        & (F.col(e_col) >= F.col(s_col))
    )
    base = intervals.filter(well_formed)
    if keys:
        base = base.na.drop(subset=keys)
    # floor (not cast) to integer ticks — cast('bigint') truncates toward
    # zero, so a negative non-integer endpoint would land one tick HIGHER
    # than interval_join's floor()-based binning says it occupies.
    # Both boundaries emit from ONE explode, not a two-branch union: the
    # input here is typically itself an aggregate (sessions = a window
    # over events), and Catalyst does not share subtrees across union
    # branches — the union form computed the whole upstream twice (r9).
    bounds = base.select(
        *keys,
        F.explode(
            F.array(
                F.struct(
                    F.floor(F.col(s_col)).cast("bigint").alias("t"),
                    F.lit(1).alias("delta"),
                ),
                F.struct(
                    (F.floor(F.col(e_col)).cast("bigint") + F.lit(1)).alias("t"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("_b"),
    ).select(*keys, F.col("_b.t").alias("t"), F.col("_b.delta").alias("delta"))
    net = bounds.groupBy(*keys, "t").agg(F.sum("delta").alias("_net"))
    if keys:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("t").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = net.withColumn("concurrency", F.sum("_net").over(w).cast("bigint"))
        return out.select(*keys, "t", "concurrency")
    # The two-phase rank references its windowed input three times (ranked
    # output + both sides of the offsets self-join) and Catalyst shares no
    # subtrees across references — without a persist the whole upstream
    # (typically a sessionize window over raw events) PLUS the rank's own
    # range-shuffle and windows compute once per reference. The memo is
    # handed to the rank so it caches AFTER its windowed pass (persisting
    # `net` alone measured 1.7x at sf0.1 but parity at x16, where the
    # double window over the grown net table dominated — probe_r10.json
    # concurrency_profile_memo_ab). release_boundary_cache() frees it;
    # persist_net=False keeps the pure lazy plan (A/B probes, callers that
    # embed this in a larger DAG with their own persistence policy).
    ranked = distributed_total_rank(
        net,
        order_cols=["t"],
        sum_col="_net",
        cum_col="concurrency",
        memo=_NET_CACHE if persist_net else None,
    )
    return ranked.select("t", "concurrency")


def _user_sessions(events: DataFrame, gap_s: int) -> DataFrame:
    """Per-user session intervals in floored epoch seconds: one row per
    (user_id, session_idx) with BIGINT s_start/s_end — the left side every
    session-interval face here shares (gap rule = operators.events
    sessionize; NULL-ts rows excluded at that shared chokepoint)."""
    from billing_etl_v1_spark.operators.events import with_session_idx

    fep = F.floor(F.unix_timestamp(F.col("ts").cast("timestamp"))).cast("bigint")
    return (
        with_session_idx(events, gap_s=gap_s)
        .withColumn("_ep", fep)
        .groupBy("user_id", "session_idx")
        .agg(F.min("_ep").alias("s_start"), F.max("_ep").alias("s_end"))
    )


def session_type_overlap(
    events: DataFrame,
    session_gap_s: int = 1800,
    span_gap_s: int = 3600,
    bin_width_s: int = 21600,
    span_bucket_s: int = 86400,
) -> DataFrame:
    """Which event-type activity spans did each user's sessions overlap,
    and for how long — the two-large-sides interval join exercised
    end-to-end: per-user sessions (gap 30 min) overlap-joined against
    per-event-type activity spans (gap 60 min), aggregated to one row per
    (user_id, event_type) with the pair count, distinct spans touched,
    and total overlap seconds.

    Both sides GROW with the data (sessions with users × time, spans
    with types × time), which is exactly the shape the broadcast
    interval join of plans/examples.py cannot take at scale; the bin
    decomposition keeps it one equi-shuffle. All interval math is on
    floored epoch seconds — BIGINT in both engines, so the DuckDB twin
    (oracle_ext.session_type_overlap_sql) hash-matches without float
    tolerance anywhere.

    ``bin_width_s`` stays a FIXED default here rather than calling
    :func:`suggest_bin_width` (r12, closing the r10 evidence item):
    deriving it would run an eager percentile aggregate at PLAN-BUILD
    time — an untimed corpus pass hidden outside every bench/oracle
    measurement window, and a nondeterministic plan shape for the pinned
    scale-posture tests. The measured sweep
    (probe_r9_x64/probe_r10 ``session_type_overlap_bin_width_sweep``)
    shows the replication-vs-fan-in trade is flat across 1 h/6 h/24 h at
    session-scale lengths, so the fixed 6 h default is safe; a deployment
    with very different interval lengths should call
    :func:`suggest_bin_width` once on a sample and pass the result in.
    """
    sessions = _user_sessions(events, session_gap_s)
    # span side: event_type is LOW-cardinality, so the spans come from the
    # two-level bucketed gap rule (bounded window partitions at any scale;
    # provably identical output — see activity_spans)
    spans = activity_spans(
        events, "event_type", gap_s=span_gap_s, bucket_s=span_bucket_s
    ).select(
        "event_type",
        "span_idx",
        F.col("span_start_s").alias("p_start"),
        F.col("span_end_s").alias("p_end"),
    )
    pairs = interval_join(
        sessions, spans, "s_start", "s_end", "p_start", "p_end", bin_width_s
    )
    overlap_s = F.least("s_end", "p_end") - F.greatest("s_start", "p_start")
    return (
        pairs.groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_overlaps"),
            F.countDistinct("span_idx").alias("n_spans"),
            F.sum(overlap_s).alias("overlap_s"),
        )
    )


def session_type_overlap_left(
    events: DataFrame,
    target_type: str,
    session_gap_s: int = 1800,
    span_gap_s: int = 1800,
    bin_width_s: int = 21600,
    span_bucket_s: int = 86400,
) -> DataFrame:
    """LEFT-OUTER face of the overlap join: EVERY per-user session, one
    row each, annotated with how many activity spans of ``target_type``
    it overlapped and for how long — sessions touching no span stay as
    rows with n_spans = 0 / overlap_s = 0. That zero-row population is
    the report :func:`session_type_overlap` (inner) cannot produce:
    "sessions during which no <type> activity was live" is the billing
    exceptions shape (usage periods hitting no rate period), and dropping
    them silently is exactly the failure left-outer overlap semantics
    exist to prevent. Because this face aggregates per session, the
    outer semantics come from ONE binned left-outer equi-join with
    conditional aggregation (see the inline note) rather than
    :func:`interval_join_left`'s matched-union-anti shape, which is for
    consumers that need the row-level pairs.

    Row identity for the outer semantics is the composed
    ``session_id = user_id * 1_000_000 + session_idx`` (BIGINT — exact;
    session_idx is a per-user counter that reaches 1e6 only after ~57
    user-years of back-to-back 30-min-gap sessions, and the composition
    is documented rather than hidden so the oracle twin can reproduce it
    textually). All interval math on floored epoch seconds — BIGINT in
    both engines, hash-exact with no float tolerance.
    """
    sessions = _user_sessions(events, session_gap_s).withColumn(
        "session_id",
        (F.col("user_id") * F.lit(1_000_000) + F.col("session_idx")).cast("bigint"),
    )
    spans = activity_spans(
        events.filter(F.col("event_type") == target_type),
        "event_type",
        gap_s=span_gap_s,
        bucket_s=span_bucket_s,
    ).select(
        F.col("span_idx"),
        F.col("span_start_s").alias("p_start"),
        F.col("span_end_s").alias("p_end"),
    )
    # ONE binned LEFT-OUTER equi-join + conditional aggregation, NOT
    # interval_join_left: the generic matched-union-anti formulation
    # references the matched join twice and Catalyst does not share
    # subtrees across union branches — the whole join (and the session
    # window beneath it) computed twice (r9; bench showed this face at
    # ~2x the inner join's cost). Because this face AGGREGATES per
    # session anyway, outer semantics fall out of one pass: every
    # session-bin row survives the left join, a (session, span) pair
    # counts only where the exact-overlap predicate holds on its first
    # shared bin (exactly once — interval_join's rule), and sessions
    # with no valid pair aggregate to n_spans = 0 / overlap_s = 0.
    lb = _binned(
        sessions.select("session_id", "user_id", "s_start", "s_end"),
        "s_start",
        "s_end",
        "_ij_bin",
        "_ij_l_sb",
        bin_width_s,
    )
    rb = _binned(spans, "p_start", "p_end", "_ij_bin", "_ij_r_sb", bin_width_s)
    j = lb.join(rb, on="_ij_bin", how="left")
    pair_ok = (
        (F.col("s_start") <= F.col("p_end"))
        & (F.col("p_start") <= F.col("s_end"))
        & (F.col("_ij_bin") == F.greatest("_ij_l_sb", "_ij_r_sb"))
    )
    overlap_s = F.when(
        pair_ok, F.least("s_end", "p_end") - F.greatest("s_start", "p_start")
    )
    return j.groupBy("session_id", "user_id", "s_start", "s_end").agg(
        F.count(F.when(pair_ok, F.col("span_idx"))).alias("n_spans"),
        F.coalesce(F.sum(overlap_s), F.lit(0)).cast("bigint").alias("overlap_s"),
    )


def session_concurrency(
    events: DataFrame, session_gap_s: int = 1800, persist_net: bool = True
) -> DataFrame:
    """Global session-concurrency step function: how many user sessions
    were simultaneously active at every boundary tick — the capacity-
    planning face of :func:`concurrency_profile` over the same per-user
    session intervals every interval face here derives
    (:func:`_user_sessions`, gap rule + floored epoch seconds).

    Output: (t BIGINT, concurrency BIGINT), one row per distinct
    boundary; the global running sum is the two-phase distributed prefix
    sum (range-partitioned parallel sorts + broadcast offsets — no
    single-task global sort at any scale)."""
    sessions = _user_sessions(events, session_gap_s)
    return concurrency_profile(sessions, "s_start", "s_end", persist_net=persist_net)


def suggest_bin_width(df: DataFrame, s_col: str, e_col: str) -> int:
    """Data-derived ``bin_width`` for the interval faces: the median
    well-formed interval length, rounded UP to the nearest friendly
    1-2-5 x 10^k value (1, 2, 5, 10, 20, 50, ...).

    Why the median: a bin of one typical interval length caps the
    replication factor of :func:`_binned` near 2 (length/width + 1)
    while keeping per-bin fan-in bounded. Why rounding is safe: the
    measured bin-width sweep (probe_r9_x64.json / probe_r10.json
    ``session_type_overlap_bin_width_sweep``) shows the
    replication-vs-fan-in trade is FLAT across 1 h / 6 h / 24 h bins at
    session-scale interval lengths (~1.4-1.7 s at sf0.1 x16 for all
    three), so any value within an order of magnitude of the interval
    scale is fine — the helper just removes the hand-picked 21600 at
    100 TB, it does not need to be exact.

    One ``percentile_approx`` aggregate (map-side sketch merge, one
    driver-side row — the layout.py diagnostics idiom, not a collect of
    data). Degenerate inputs: all-point intervals (median length 0)
    suggest 1; no well-formed rows raise ValueError rather than guess.
    """
    well_formed = (
        F.col(s_col).isNotNull() & F.col(e_col).isNotNull()
        & (F.col(e_col) >= F.col(s_col))
    )
    row = (
        df.filter(well_formed)
        .agg(
            F.percentile_approx(
                F.col(e_col) - F.col(s_col), F.lit(0.5)
            ).alias("_med")
        )
        .first()
    )
    med = row["_med"] if row is not None else None
    if med is None:
        raise ValueError("suggest_bin_width: no well-formed intervals")
    med = float(med)
    if med < 1.0:
        return 1
    exp = math.floor(math.log10(med))
    for mult in (1, 2, 5, 10):
        cand = mult * 10**exp
        if cand >= med:
            return int(cand)
    raise AssertionError("unreachable: 10 * 10^floor(log10(med)) >= med")
