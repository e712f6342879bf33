"""Training-corpus preparation: deterministic sampling and the composed
quality-filter → dedup pipeline a 100 TB documents table feeds through
before tokenization.

Sampling is hash-based, not ``df.sample``: ``TABLESAMPLE``/Bernoulli
sampling is seeded per-partition, so its row set changes with the
partitioning — useless for reproducible corpus splits and impossible to
oracle-check. A content hash of the key (md5 → 60-bit int, same trick as
operators.text.md5_long) is stable under any layout, any engine, and any
cluster size, and gives exact train/holdout disjointness when the buckets
partition the hash space.

Everything here is built-in expressions + one window — JVM-side, no UDFs,
no shuffle beyond the dedup window's hash partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from billing_etl_v1_spark.operators.text import lang_id, md5_long, text_stats

SAMPLE_BUCKETS = 1_000_000


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic ``fraction`` sample: keep rows whose salted key hash
    lands in the first ``fraction`` of the bucket space. Different salts
    give independent samples; (salt, 1-fraction complement) gives the exact
    holdout set."""
    bucket = md5_long(F.col(key_col).cast("string"), salt=salt) % SAMPLE_BUCKETS
    return df.filter(bucket < int(fraction * SAMPLE_BUCKETS))


def quality_corpus(
    docs: DataFrame,
    min_tokens: int = 30,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en", "de", "fr", "es"),
) -> DataFrame:
    """The composed corpus-prep pipeline: stats → quality/lang gate →
    exact near-dup removal (normalized-text fingerprint, smallest doc_id
    survives).

    One pass of narrow expression work, then a single shuffle on the
    fingerprint for the keep-first window — the same shape at 500 rows and
    at 100 TB.
    """
    scored = lang_id(text_stats(docs))
    kept = scored.filter(
        (F.col("token_count") >= min_tokens)
        & (F.col("quality_score") >= min_quality)
        & F.col("lang_pred").isin(*langs)
    )
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    w = Window.partitionBy("__fp").orderBy(F.col("doc_id").asc())
    return (
        kept.withColumn("__fp", md5_long(norm))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "doc_id",
            "lang",
            "lang_pred",
            "token_count",
            "bpe_token_count",
            "quality_score",
            "text",
        )
    )
