"""Skew-mitigating join: deterministic key salting.

The reference hand-chunks 14 known-heavy accounts into 1-day pieces
(`/root/reference/main.py:86-104`) — a manual skew workaround baked into
driver code. The Spark-native answers are (a) AQE skew-join splitting,
which is enabled session-wide (session.py) and needs nothing from the
query author, and (b) explicit key salting when the skewed side must
shuffle-join a side that is too big to broadcast but small enough to
replicate `buckets`×. This module implements (b) as a reusable operator.

Salting contract: the big side's rows get a deterministic bucket from a
row-identifying column (never `rand()` — results must be reproducible and
retry-stable at 100 TB), the small side is exploded once per bucket, and
the equi-join runs on (key, bucket) so one hot key fans out across
`buckets` reducers instead of melting a single one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from billing_etl_v1_spark.functions import finite_or_null, quantize6

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: str | Column,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big ⋈ small` on `key`, salted into `buckets` sub-keys.

    `salt_from` must identify big-side rows (e.g. a primary key): the
    bucket is `pmod(xxhash64(salt_from), buckets)`, so the same row lands
    in the same bucket on every run and every task retry. The small side
    is replicated `buckets`× via a literal-array explode — its shuffled
    footprint grows by the same factor, which is the price of splitting
    the hot key; keep `buckets` at the skew ratio you need to flatten,
    not higher.

    Result is row-identical to `big.join(small, key, how)` (the salt
    column is internal and dropped) — the DuckDB oracle for queries built
    on this operator is therefore the PLAIN join.
    """
    salt_src = F.col(salt_from) if isinstance(salt_from, str) else salt_from
    salted_big = big.withColumn(SALT_COL, F.pmod(F.xxhash64(salt_src), F.lit(buckets)).cast("int"))
    salted_small = small.withColumn(
        SALT_COL, F.explode(F.array([F.lit(i) for i in range(buckets)]))
    )
    return salted_big.join(salted_small, on=[key, SALT_COL], how=how).drop(SALT_COL)


def user_activity_enriched(events: DataFrame, buckets: int = 8) -> DataFrame:
    """Enrich each event with its user's total activity via a salted join.

    The per-user rollup is far smaller than events but at 100 TB can
    exceed the broadcast threshold (hundreds of millions of users), while
    event traffic per user is heavily skewed (bots/whales) — exactly the
    salted-join case: the rollup replicates `buckets`×, the whale user's
    events spread over `buckets` reducers.
    """
    events = events.withColumn("value", finite_or_null("value"))
    totals = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("user_events"),
        F.sum(F.col("value").cast("decimal(38,10)")).alias("__tv"),
    )
    enriched = salted_join(
        events.select("event_id", "user_id", "event_type", "value"),
        totals,
        key="user_id",
        salt_from="event_id",
        buckets=buckets,
    )
    return enriched.select(
        "event_id",
        "user_id",
        "event_type",
        quantize6(F.col("value")).alias("value"),
        "user_events",
        quantize6(F.col("__tv").cast("double")).alias("user_total_value"),
    )


def key_skew_report(
    df: DataFrame, key_col: str = "user_id", top_k: int = 10
) -> DataFrame:
    """Join-key skew diagnostic: the ``top_k`` heaviest keys with their row
    share, plus the global skew factor (max key count over mean key count)
    — the measurement that decides between AQE alone, explicit salting
    (:func:`salted_join`), or broadcasting before a big join melts one
    reducer. The reference hard-coded its 14 known-heavy accounts
    (reference main.py:86-104); this is how that list gets DISCOVERED.

    One key aggregate, a TakeOrdered top-k (distributed partial top-k —
    NOT a global rank window, which would sort every key through one
    task), and a 1-row stats broadcast — run it on a sample or the full
    table, the plan is the same shape. Ranks are recovered from the
    k-row result by a trivial self-join count.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    stats = counts.agg(
        F.max("n_rows").alias("__max"),
        F.sum("n_rows").alias("__total"),
        F.count(F.lit(1)).alias("__n_keys"),
    )
    top = counts.orderBy(F.col("n_rows").desc(), F.col("key").asc()).limit(top_k)
    a, b = top.alias("a"), top.alias("b")
    better = (F.col("b.n_rows") > F.col("a.n_rows")) | (
        (F.col("b.n_rows") == F.col("a.n_rows")) & (F.col("b.key") < F.col("a.key"))
    )
    ranked = (
        a.join(F.broadcast(b), better, "left")
        .groupBy(F.col("a.key").alias("key"), F.col("a.n_rows").alias("n_rows"))
        .agg((F.count(F.col("b.key")) + 1).cast("int").alias("rank"))
    )
    return ranked.crossJoin(F.broadcast(stats)).select(
        "key",
        "n_rows",
        "rank",
        quantize6(F.col("n_rows") / F.col("__total")).alias("share"),
        quantize6(
            F.col("__max") * F.col("__n_keys") / F.col("__total")
        ).alias("skew_factor"),
    )
