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

from billing_etl_v1_spark.operators import _memo
from billing_etl_v1_spark.operators.text import WS_RE, lang_id, md5_long, text_stats

SAMPLE_BUCKETS = 1_000_000

# session-scoped memo for multi-consumer intermediates (the gated corpus in
# training_corpus feeds three split branches twice each); same pattern and
# lifetime rules as dedup._SIG_CACHE
_CORPUS_CACHE: _memo.Registry = {}


def release_corpus_cache(spark=None) -> int:
    """Unpersist intermediates cached by :func:`training_corpus` (for
    ``spark`` only, or all sessions); returns how many were released."""
    return _memo.release(_CORPUS_CACHE, spark)


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic ``fraction`` sample: keep rows whose salted key hash
    lands in the first ``fraction`` of the bucket space. Different salts
    give independent samples. For an exact train/holdout split use
    :func:`hash_sample_complement` with the SAME (fraction, salt) — calling
    this with 1-fraction selects buckets [0, t(1-f)), which OVERLAPS the
    sample and does not partition the space (review finding; the old
    docstring advertised exactly that broken recipe)."""
    bucket = md5_long(F.col(key_col).cast("string"), salt=salt) % SAMPLE_BUCKETS
    return df.filter(bucket < int(fraction * SAMPLE_BUCKETS))


def hash_sample_complement(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """EXACT complement of ``hash_sample(df, fraction, key_col, salt)``:
    every row lands in exactly one of the two (bucket >= threshold vs <
    threshold), so sample ∪ complement = df and sample ∩ complement = ∅ —
    the train/holdout disjointness contract."""
    bucket = md5_long(F.col(key_col).cast("string"), salt=salt) % SAMPLE_BUCKETS
    return df.filter(bucket >= int(fraction * SAMPLE_BUCKETS))


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
    at 100 TB. Stats and language-ID share ONE staged token array
    (text_stats keep_tokens_col -> lang_id tokens_col), so each document
    is tokenized once for the whole gate.
    """
    # NULL-key lane: the dedup window orders by doc_id and the engines
    # disagree on where NULL sorts (Spark NULLS FIRST kept a NULL-id dup
    # survivor that DuckDB dropped — review finding, verified live, and
    # the NULL survivor then vanished at the token-offset join anyway);
    # excluded at ingestion, mirrored in quality_corpus_sql
    docs = docs.filter(F.col("doc_id").isNotNull())
    scored = lang_id(
        text_stats(docs, keep_tokens_col="__gate_toks"), tokens_col="__gate_toks"
    ).drop("__gate_toks")
    kept = scored.filter(
        (F.col("token_count") >= min_tokens)
        & (F.col("quality_score") >= min_quality)
        & F.col("lang_pred").isin(*langs)
    )
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), WS_RE, " ")
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


# deliberately simple patterns that parse identically in Java regex (Spark)
# and RE2 (DuckDB): no backrefs, no lookaround
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\-. ]{7,}[0-9]"


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Training-data PII pass: count and redact email/phone-shaped spans.

    Pure regexp_replace/regexp_count expressions — JVM-side, zero
    shuffles, linear over a 100 TB corpus. The patterns are intentionally
    conservative (high precision); a production pass would chain more
    specific recognizers in the same shape.
    """
    c = F.col(text_col)
    # regexp_count == size(regexp_extract_all(...)) for the same pattern
    # (same non-overlapping match walk) without materializing every
    # matched span into an array per document (r11)
    n_email = F.regexp_count(c, F.lit(EMAIL_RE))
    scrubbed = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    n_phone = F.regexp_count(scrubbed, F.lit(PHONE_RE))
    return df.select(
        "doc_id",
        n_email.cast("int").alias("n_emails"),
        n_phone.cast("int").alias("n_phones"),
        F.regexp_replace(scrubbed, PHONE_RE, "<PHONE>").alias("scrubbed_text"),
    )


def stratified_sample(
    df: DataFrame,
    cap: int,
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Deterministic stratified downsample: keep at most ~``cap`` rows per
    stratum by hash-thresholding each stratum at floor(cap×B/count) of the
    B-bucket hash space — the balanced-language corpus cut an LLM data
    pipeline applies before mixing.

    All-integer threshold math (floor division, exact in any engine) and
    the layout-independent key hash make the selected row SET reproducible
    across engines, partitionings, and cluster sizes. Scale shape: stratum
    counts are a tiny aggregate broadcast back onto the scan; the filter
    itself is map-side, so the only shuffle is over len(strata) rows.
    """
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n"))
    thresh = counts.select(
        stratum_col,
        F.least(
            F.lit(SAMPLE_BUCKETS).cast("bigint"),
            # explicit floor: Spark's double->bigint cast truncates but
            # DuckDB's rounds, so the truncation must happen before the cast
            F.floor(F.lit(cap) * F.lit(SAMPLE_BUCKETS) / F.col("__n")),
        ).alias("__thresh"),
    )
    bucket = md5_long(F.col(key_col).cast("string"), salt=salt) % SAMPLE_BUCKETS
    return (
        df.join(F.broadcast(thresh), stratum_col)
        .filter(bucket < F.col("__thresh"))
        .drop("__thresh")
    )


PACK_BUCKETS = 256


def pack_shards(
    df: DataFrame,
    shard_tokens: int = 4000,
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack",
) -> DataFrame:
    """Fixed-token-budget shard packing: lay documents on a deterministic
    hash-ordered line, accumulate token counts, and cut a shard every
    ``shard_tokens`` — the sharding step before tokenization/serialization
    in an LLM training pipeline (a doc belongs to the shard its STARTING
    offset falls in, so shards overflow by at most one document).

    The global running sum is computed as a distributed two-phase prefix
    sum, NOT one global window: an unpartitioned ORDER BY window would
    funnel the whole corpus through a single task at 100 TB. Phase 1 is a
    per-bucket cumulative sum (hash-partitioned window over PACK_BUCKETS
    buckets); phase 2 adds each bucket's exclusive offset, computed from
    the PACK_BUCKETS-row bucket-total table via a broadcast cross-join with
    a conditional sum (no window at all — the plan-wide "no unpartitioned
    Window" posture assertion holds with zero exceptions) and broadcast
    back. Output depends only on the (hash, id) order — identical for any
    partitioning, cluster size, or engine (the oracle uses the
    single-window formulation, which is equivalent and fine at test scale).
    """
    offs = _global_token_offsets(df, key_col, text_col, salt)
    return offs.select(
        key_col,
        "n_tokens",
        F.floor(F.col("__start") / shard_tokens).alias("shard_id"),
    )


def _global_token_offsets(
    df: DataFrame,
    key_col: str,
    text_col: str,
    salt: str,
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Each document's EXCLUSIVE start offset on the deterministic
    hash-ordered token line — the distributed two-phase prefix sum shared
    by pack_shards (shard = start div budget) and pack_blocks (blocks may
    split a document). Output: [*extra_keys,] key, n_tokens, __start.

    ``extra_keys`` (r11) scopes the line: one INDEPENDENT token line per
    distinct extra-key tuple, all computed in the same single pass (the
    local window and the bucket totals partition by (*extra_keys, bucket),
    and phase 2 sums lower-bucket totals within the same tuple). This is
    exactly equivalent to filtering per tuple and running the helper per
    slice — training_corpus used to do that, once per split, which
    re-windowed and re-joined the gated corpus three times.

    NULL keys are excluded: the packing line is ordered by (hash(key),
    key), and a NULL key has no hash — Spark sorts NULLs FIRST where
    DuckDB sorts them LAST, so one identity-less document would shift
    every downstream shard/block boundary differently per engine. The
    oracle twins mirror with ``key IS NOT NULL``."""
    from billing_etl_v1_spark.operators.text import md5_long, token_count

    df = df.filter(F.col(key_col).isNotNull())
    h = md5_long(F.col(key_col).cast("string"), salt=salt)
    ek = list(extra_keys)
    base = df.select(
        *ek,
        F.col(key_col),
        token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
        h.alias("__h"),
    # RANGE buckets (top 8 bits of the 60-bit hash), NOT modulo: bucket-major
    # order must equal global (h, id) order for phase-2 offsets to be a true
    # prefix sum; md5 uniformity keeps range buckets load-balanced
    ).withColumn("__b", F.shiftright("__h", 52))
    w_local = (
        Window.partitionBy(*ek, "__b")
        .orderBy("__h", key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("__cum", F.sum("n_tokens").over(w_local))
    totals = base.groupBy(*ek, "__b").agg(F.sum("n_tokens").alias("__bt"))
    a, b = totals.alias("a"), totals.alias("b")
    if ek:
        cond = F.lit(True)
        for k in ek:
            cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
        paired = a.join(F.broadcast(b), cond)
    else:
        paired = a.crossJoin(F.broadcast(b))
    offsets = paired.groupBy(
        *[F.col(f"a.{k}").alias(k) for k in ek], F.col("a.__b").alias("__b")
    ).agg(
        F.sum(
            F.when(F.col("b.__b") < F.col("a.__b"), F.col("b.__bt")).otherwise(0)
        ).alias("__off")
    )
    return local.join(F.broadcast(offsets), [*ek, "__b"]).select(
        *ek,
        key_col,
        "n_tokens",
        (F.col("__cum") + F.col("__off") - F.col("n_tokens")).alias("__start"),
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    stratum_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Training-mixture composition: per-source sampling fractions (e.g.
    wiki 1.0, web 0.25, forum 0.1) applied as deterministic hash thresholds
    — the weighted-mixture step after quality gating and before packing.

    Sources absent from ``weights`` are dropped (explicit mixture = the
    contract). Same layout-independent hash discipline as hash_sample, so
    re-runs and engines agree row-for-row; entirely map-side after the tiny
    weight-table broadcast.
    """
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(s, int(f * SAMPLE_BUCKETS)) for s, f in sorted(weights.items())],
        f"{stratum_col} string, __thresh bigint",
    )
    bucket = md5_long(F.col(key_col).cast("string"), salt=salt) % SAMPLE_BUCKETS
    return (
        df.join(F.broadcast(wdf), stratum_col)
        .filter(bucket < F.col("__thresh"))
        .drop("__thresh")
    )


def corpus_build(
    docs: DataFrame,
    shard_tokens: int = 4000,
    min_tokens: int = 30,
    min_quality: float = 0.5,
) -> DataFrame:
    """The composed end-to-end corpus build: quality/lang gate + exact
    near-dup removal (quality_corpus) followed by fixed-token-budget shard
    packing (pack_shards) — raw documents table in, training-shard
    assignments out. The full pre-tokenization path a 100 TB corpus takes,
    as one lazy DAG: narrow expression work, one fingerprint shuffle, one
    (bucketed) prefix-sum window, everything else map-side.
    """
    # memo-persisted for the same multi-consumer reason as training_corpus:
    # pack_shards scans its input twice (local cumsum + bucket totals) and
    # the attribute join reads it a third time — without the persist the
    # full stats→gate→fingerprint-shuffle pipeline executed ~3x per run
    # (review finding), the most expensive narrow stage at 100 TB
    kept = _memo.memo_persist(
        quality_corpus(docs, min_tokens=min_tokens, min_quality=min_quality),
        _CORPUS_CACHE,
    )
    packed = pack_shards(kept, shard_tokens=shard_tokens)
    return packed.join(
        kept.select("doc_id", "lang_pred", "quality_score"), "doc_id"
    )


def train_split(
    df: DataFrame,
    key_col: str = "doc_id",
    val_pct: int = 1,
    test_pct: int = 1,
    salt: str = "split",
) -> DataFrame:
    """Deterministic, disjoint, exhaustive train/val/test assignment: the
    salted key hash lands each row in exactly one split (val takes the
    first ``val_pct``% of bucket space, test the next ``test_pct``%, train
    the rest). Hash-based (not random): the assignment is reproducible on
    any cluster layout, stable under re-runs and corpus growth (existing
    docs never migrate), and the salt versions the whole split — the
    properties a training pipeline needs from its holdout boundary.
    Zero-shuffle: one hash + two comparisons per row.
    """
    bucket = md5_long(F.col(key_col).cast("string"), salt=salt) % SAMPLE_BUCKETS
    val_hi = val_pct * SAMPLE_BUCKETS // 100
    test_hi = (val_pct + test_pct) * SAMPLE_BUCKETS // 100
    return df.withColumn(
        "split",
        F.when(bucket < val_hi, F.lit("val"))
        .when(bucket < test_hi, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def shard_manifest(
    df: DataFrame,
    shard_tokens: int = 4000,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Manifest of a packed corpus (the index file a training loader reads
    before touching any shard): per shard, document count, total tokens,
    total bytes, and the covered doc_id range. Composes
    :func:`pack_shards`, joins the byte sizes back on the key, and rolls
    up at shard grain — one key-partitioned join plus one tiny aggregate
    on top of the packing DAG."""
    packed = pack_shards(df, shard_tokens=shard_tokens, key_col=key_col, text_col=text_col)
    sizes = df.select(F.col(key_col), F.length(F.col(text_col)).alias("__bytes"))
    return (
        packed.join(sizes, key_col)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("__bytes").cast("bigint").alias("total_bytes"),
            F.min(key_col).alias("min_doc_id"),
            F.max(key_col).alias("max_doc_id"),
        )
    )


def training_corpus(
    docs: DataFrame,
    shard_tokens: int = 4000,
    min_tokens: int = 30,
    min_quality: float = 0.5,
    eval_mod: int = 97,
    val_pct: int = 1,
    test_pct: int = 1,
) -> DataFrame:
    """The WHOLE pre-tokenization path as one composed DAG: quality/lang
    gate + exact near-dup removal (quality_corpus) → benchmark
    decontamination (drop contaminated docs AND the eval slice itself) →
    deterministic train/val/test split → per-split fixed-token-budget
    shard packing. Raw documents in; (doc_id, split, shard_id, n_tokens,
    lang_pred, quality_score) out — the manifest a tokenizer job consumes.

    Packing runs WITHIN each split (shards never straddle the holdout
    boundary — a shard is the unit a loader streams, so a mixed shard
    would leak val/test text into training). Each split's prefix sum is
    the same distributed two-phase machinery as pack_shards, and (r11)
    ALL THREE splits pack in one pass — the prefix-sum window and bucket
    totals partition by (split, bucket), so no per-split branch, join or
    union remains; the gated corpus is memo-persisted because packing
    still reads it more than once (window base + bucket totals + the
    attribute rejoin). Scale shape: everything before packing is map-side
    expression work plus the fingerprint shuffle; packing adds ONE
    bucketed window total.
    """
    from billing_etl_v1_spark.operators.text import decontaminate

    clean_ids = (
        decontaminate(docs, eval_mod=eval_mod)
        .filter(~F.col("is_contaminated"))
        .select("doc_id")
    )
    kept = quality_corpus(docs, min_tokens=min_tokens, min_quality=min_quality).join(
        clean_ids, "doc_id", "left_semi"
    )
    split_df = _memo.memo_persist(
        train_split(kept, val_pct=val_pct, test_pct=test_pct), _CORPUS_CACHE
    )
    # ONE packing pass for all three splits (r11): the per-split token
    # lines are independent, so they compute in a single two-phase prefix
    # sum scoped by extra_keys=("split",) — exactly equivalent to the old
    # filter-per-split loop (pack_shards per split + rejoin + unionByName),
    # which re-windowed and re-joined the memoized split table three times
    # and planned 3 window passes, 3 joins and a 3-way union.
    offs = _global_token_offsets(
        split_df, "doc_id", "text", salt="pack", extra_keys=("split",)
    )
    packed = offs.select(
        "doc_id",
        "n_tokens",
        F.floor(F.col("__start") / shard_tokens).alias("shard_id"),
        "split",
    )
    return packed.join(
        split_df.select("doc_id", "split", "lang_pred", "quality_score"),
        ["doc_id", "split"],
    ).select("doc_id", "n_tokens", "shard_id", "split", "lang_pred", "quality_score")


def cluster_quality_report(
    docs: DataFrame,
    embeddings: DataFrame,
    centroid_mod: int = 25,
) -> DataFrame:
    """Cross-modal curation report: text-quality statistics per EMBEDDING
    cluster — the query that finds semantic neighborhoods full of
    low-quality text (boilerplate clusters, spam clusters) so whole
    regions of embedding space can be gated at once instead of doc by
    doc. Joins the documents and embeddings tables on their shared id.

    Means accumulate through exact_sum (order-proof), so the per-cluster
    doubles hash-verify; the cluster assignment is the broadcast-centroid
    argmax of similarity.assign_clusters. One id-keyed join, one
    cluster-grain aggregate.
    """
    from billing_etl_v1_spark.functions import exact_sum, quantize6
    from billing_etl_v1_spark.operators.similarity import assign_clusters

    scored = text_stats(docs).select("doc_id", "quality_score", "token_count")
    assigned = assign_clusters(embeddings, "vec_id", "embedding", centroid_mod).select(
        F.col("vid").alias("doc_id"), "cluster"
    )
    joined = scored.join(assigned, "doc_id")
    return joined.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        quantize6(
            exact_sum(F.col("quality_score")) / F.count(F.lit(1))
        ).alias("mean_quality"),
        quantize6(
            F.sum("token_count").cast("double") / F.count(F.lit(1))
        ).alias("mean_tokens"),
        quantize6(F.min("quality_score")).alias("min_quality"),
    )


def pack_blocks(
    df: DataFrame,
    block_tokens: int = 256,
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack",
) -> DataFrame:
    """GPT-style sequence packing: concatenate the whole corpus along the
    deterministic hash-ordered token line and cut fixed ``block_tokens``
    blocks, documents CROSSING block boundaries — the third packing
    flavor next to per-document chunking (text.chunk_documents, windows
    within one doc) and document-grain sharding (pack_shards, docs never
    split). This is how decoder pretraining actually consumes a corpus:
    every block except the last is exactly full, zero padding waste.

    Shape: each doc gets its global start offset from the shared
    distributed prefix sum, computes ARITHMETICALLY which blocks it spans,
    and explodes into per-block slices (map-side, 1-to-few); blocks then
    reassemble with one block-keyed aggregate whose per-group work is
    bounded by ``block_tokens``. No global sort, no unpartitioned window.
    Output per block: doc count, token count (== block_tokens except the
    tail), and the block text.
    """
    from billing_etl_v1_spark.operators.text import _tokens

    offs = _global_token_offsets(df, key_col, text_col, salt)
    toks = df.select(F.col(key_col), _tokens(F.col(text_col)).alias("__t"))
    j = toks.join(offs, key_col).filter(F.col("n_tokens") > 0)
    # integer div, not floor(double /): exact past 2^53 total tokens
    first_b = F.expr(f"__start div {block_tokens}")
    last_b = F.expr(f"(__start + n_tokens - 1) div {block_tokens}")
    pieces = j.select(
        F.col(key_col),
        "__t",
        "__start",
        "n_tokens",
        F.explode(F.sequence(first_b, last_b)).alias("block_id"),
    )
    p_from = F.greatest(F.col("__start"), F.col("block_id") * block_tokens)
    p_to = F.least(
        F.col("__start") + F.col("n_tokens"), (F.col("block_id") + 1) * block_tokens
    )  # exclusive
    piece = pieces.select(
        "block_id",
        p_from.alias("__abs"),
        (p_to - p_from).alias("__len"),
        F.concat_ws(
            " ",
            F.slice(
                "__t",
                (p_from - F.col("__start") + 1).cast("int"),
                (p_to - p_from).cast("int"),
            ),
        ).alias("__text"),
    )
    return piece.groupBy("block_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__len").cast("bigint").alias("n_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__abs", "__text"))),
                lambda s: s["__text"],
            ),
            " ",
        ).alias("block_text"),
    )


def source_mix_report(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus composition at source grain — the report read before setting
    mixture_sample weights: per source, document and token counts with
    corpus shares (exact counts, single divisions). One tiny aggregate +
    a 1-row broadcast total."""
    from billing_etl_v1_spark.operators.text import token_count

    per = df.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(token_count(F.col(text_col)).cast("bigint"))
        .cast("bigint")
        .alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_docs").cast("bigint").alias("__td"),
        F.sum("n_tokens").cast("bigint").alias("__tt"),
    )
    from billing_etl_v1_spark.functions import quantize6

    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        quantize6(F.col("n_docs") / F.col("__td")).alias("doc_share"),
        quantize6(F.col("n_tokens") / F.col("__tt")).alias("token_share"),
    )


def dsir_importance(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    num_buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, arXiv:2302.03169):
    score every raw document by how much its hashed n-gram features look
    like the TARGET domain rather than the raw corpus — the data-selection
    method behind "sample pretraining data that resembles Wikipedia".
    Output: (doc_id, n_feats, importance); importance is the per-doc sum
    of feature-count × log((t_f+α)/(T+αB) ÷ (r_f+α)/(R+αB)) — the
    log-likelihood ratio of the doc under the two hashed-n-gram unigram
    models, Laplace-smoothed so unseen buckets stay finite. Positive ⇒
    target-like; importance 0.0 for docs with no features.

    Scale shape: both corpora make ONE map-side-combined (bucket, count)
    aggregate (the wordcount shape); the ratio table is ≤ ``num_buckets``
    rows and BROADCASTS into the per-doc join — structurally bounded by a
    hyperparameter, never corpus-scaled (the bpe_token_ids posture), so
    the only corpus-sized shuffles are the two feature aggregates. The
    per-feature hash is the engine-identical md5 trick (text.md5_long),
    so the DuckDB twin buckets identically; log() agreement rides the
    same quantize6 grid every double query uses."""
    from billing_etl_v1_spark.functions import quantize6
    from billing_etl_v1_spark.operators.text import _tokens, _word_grams

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if num_buckets < 2:
        raise ValueError(f"num_buckets must be >= 2, got {num_buckets}")

    def feats(df: DataFrame, with_id: bool) -> DataFrame:
        cols = [F.col(id_col)] if with_id else []
        toks = df.select(*cols, _tokens(F.col(text_col)).alias("__t"))
        grams = toks.select(
            *cols, F.explode(_word_grams("__t", n)).alias("__g")
        )
        return grams.select(
            *cols, (md5_long(F.col("__g")) % num_buckets).alias("bucket")
        )

    t = feats(target, False).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("__tf")
    )
    r = feats(raw, False).groupBy("bucket").agg(F.count(F.lit(1)).alias("__rf"))
    # every doc feature exists in the raw corpus by construction, so the
    # ratio table keys on r's buckets; target-absent buckets smooth to α
    totals = (
        r.join(t, "bucket", "left")
        .crossJoin(
            F.broadcast(
                r.agg(F.sum("__rf").alias("__R")).crossJoin(
                    t.agg(F.coalesce(F.sum("__tf"), F.lit(0)).alias("__T"))
                )
            )
        )
        .select(
            "bucket",
            (
                F.log(F.coalesce(F.col("__tf").cast("double"), F.lit(0.0)) + alpha)
                - F.log(F.col("__T") + alpha * num_buckets)
                - F.log(F.col("__rf").cast("double") + alpha)
                + F.log(F.col("__R") + alpha * num_buckets)
            ).alias("__lr"),
        )
    )
    doc_counts = feats(raw, True).groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).alias("__c")
    )
    per_doc = (
        doc_counts.join(F.broadcast(totals), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("__c").cast("bigint").alias("__nf"),
            F.sum(F.col("__c") * F.col("__lr")).alias("__imp"),
        )
    )
    return (
        raw.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("__nf", F.lit(0)).cast("bigint").alias("n_feats"),
            quantize6(F.coalesce("__imp", F.lit(0.0))).alias("importance"),
        )
    )
