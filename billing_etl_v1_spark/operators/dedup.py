"""Deduplication operators for large-scale training-data pipelines.

Four families (SURVEY §7.2 step 8), all designed for the 100 TB posture:

- exact:        one shuffle on a 60-bit content hash (map-side combine).
- n-gram Jaccard: shingle explode -> equi-join on shingle -> pair agg; the
                  only shuffles are on shingle and pair keys, both fine-
                  grained; ultra-common shingles can be frequency-pruned.
- MinHash+LSH:  signatures are computed PER ROW from the shingle array:
                 ONE engine-identical md5 pass to a 30-bit base hash, then
                 k Carter-Wegman transforms (array_min, no explode, no
                 shuffle); only candidate pairing shuffles, on band keys
                 whose cardinality is controlled by band width.
- SimHash:      16-bit per-row signature from token hashes; pairing by
                 hamming distance.
- embedding-cosine: near-dup pairs over an embedding column — brute-force
                 baseline plus a sign-LSH bucketed scale path (band join on
                 coordinate-sign bits, exact cosine only within buckets).

All hashing uses the engine-identical md5→60-bit-int trick (text.md5_long),
so every operator here has a full DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from billing_etl_v1_spark.functions import exact_sum, quantize6, quantize6_staged
from billing_etl_v1_spark.operators import _memo
from billing_etl_v1_spark.operators.text import WS_RE, md5_long

NUM_MINHASH = 16
BANDS = 4  # 4 bands x 4 rows

# session-scoped memo for every expensive per-call persist in this module
# (minhash signatures, exploded shingles, prepped vectors, simhash sigs):
# repeated calls over the same input share ONE cached relation instead of
# leaking one per call (round-2 advice for minhash_incremental_pairs —
# the same cached-relation leak class round 1 flagged for match_rules)
_SIG_CACHE: _memo.Registry = {}


def _memo_persist_sig(df: DataFrame) -> DataFrame:
    from pyspark import StorageLevel

    return _memo.memo_persist(df, _SIG_CACHE, StorageLevel.MEMORY_AND_DISK)


def release_signature_cache(spark=None) -> int:
    """Unpersist every intermediate this module cached (for ``spark`` only,
    or all sessions); returns how many were released. Call between ingest
    generations — e.g. after each :func:`minhash_incremental_pairs` batch
    is materialized — to free superseded signature tables."""
    return _memo.release(_SIG_CACHE, spark)

# Carter-Wegman universal-hash family for MinHash: ONE md5 pass per shingle
# produces a 30-bit base hash hb, then mh_i = (a_i*hb + b_i) mod p with
# p = 2^31-1 (prime) and fixed md5-derived constants a_i (non-zero), b_i.
# k independent salted-md5 passes cost k string hashes per shingle; this
# family costs ONE, plus k two-op integer transforms — the measured
# difference at sf0.1 was ~10x on signature build. a_i*hb + b_i <= 2^61
# so the arithmetic never overflows BIGINT in either engine.
MINHASH_IN_MOD = 1 << 30
MINHASH_PRIME = (1 << 31) - 1


def _cw_constants(k: int) -> list[tuple[int, int]]:
    import hashlib

    def h15(tag: str) -> int:
        return int(hashlib.md5(tag.encode()).hexdigest()[:15], 16)

    return [
        (h15(f"mh-a-{i}") % (MINHASH_PRIME - 1) + 1, h15(f"mh-b-{i}") % MINHASH_PRIME)
        for i in range(k)
    ]


CW_CONSTANTS = _cw_constants(NUM_MINHASH)


def _norm_text(text_col: str) -> Column:
    return F.regexp_replace(F.trim(F.lower(F.col(text_col))), WS_RE, " ")


def _bind_once(expr: Column, build) -> Column:
    """Evaluate ``expr`` exactly once per row and hand it to ``build`` as a
    HOF lambda VARIABLE (a materialized attribute, O(1) to reference)
    instead of a free sub-expression.

    Interpreted higher-order lambdas re-evaluate every free expression
    they close over once PER ELEMENT — ``transform(sequence(1, size(t)),
    i -> element_at(t, i))`` with ``t = split(text)`` re-splits the whole
    document for each position, O(len^2) per doc (the docs_chunk /
    winnowing hang, re-found in round 5 on word_shingles: one 400k-token
    document stalled the MinHash family >300s). Wrapping as
    ``element_at(transform(array(t), x -> body(x)), 1)`` makes ``t`` the
    HOF *argument* — evaluated once — and ``x`` a bound variable inside
    ``body``."""
    return F.element_at(F.transform(F.array(expr), build), 1)


def word_shingles(text_col: str = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles (1-based element_at, mirroring the
    oracle's 1-based list indexing); short docs use the whole token string.

    The token array is bound via :func:`_bind_once` so the document is
    tokenized ONCE per row; the per-position lambda then does O(1) array
    reads — linear in document length."""

    def _build(toks: Column) -> Column:
        ngrams = F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + off) for off in range(n)]
            ),
        )
        return F.when(F.size(toks) >= n, F.array_distinct(ngrams)).otherwise(
            F.array(F.concat_ws(" ", toks))
        )

    return _bind_once(F.split(F.trim(F.lower(F.col(text_col))), WS_RE), _build)


def _nonnull_docs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """NULL-key/NULL-text ingestion lane for the text-similarity family
    (review finding, verified live): a NULL id cannot pair or rank
    consistently cross-engine, and NULL text hashes like EMPTY text on
    Spark (concat_ws skips the NULL, so every NULL-text doc landed in one
    giant est=1.0 false-duplicate cluster) while the twins' NULL shingles
    never equi-join (0 pairs) — excluded identically at every signature/
    pair ingestion. exact_dedup is NOT routed here: it handles NULLs by
    grouping, identically on both engines."""
    return df.filter(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup on normalized content hash: one row per distinct content,
    keeping the smallest id as representative."""
    h = md5_long(_norm_text(text_col))
    return (
        df.select(F.col(id_col), h.alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("rep_doc_id"), F.count(F.lit(1)).alias("n_docs"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.1,
    max_rows: int | None = 200_000,
    max_doc_freq: int | None = 256,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >=1 shingle.

    The exploded shingle table is persisted (it feeds the self-join twice
    plus the per-doc sizes — 3 consumers of a non-trivial explode), and
    the join key is the 60-bit md5 of the shingle rather than the string:
    an 8-byte fixed-width shuffle key instead of a ~30-byte string. The
    oracle hashes identically, so the pair set matches by construction.
    Inherently quadratic in co-occurring docs per shingle — this is the
    EXACT baseline; the scale path is minhash_lsh_pairs.

    ``max_rows`` guards against silently running the quadratic baseline on
    a large corpus, exactly like :func:`embedding_cosine_pairs`; pass
    ``None`` to disable for deliberate offline recall measurement.
    ``max_doc_freq`` drops shingles appearing in more than that many docs
    before pairing (standard stop-shingle pruning — bounds the per-shingle
    join fan-out at the cost of slightly under-counting intersections for
    pairs sharing only ultra-common shingles; Jaccard denominators keep
    the FULL per-doc shingle counts so scores only ever shrink, never
    inflate). ON BY DEFAULT at 256 so the worst-case fan-out of any one
    shingle is <=256·255/2 pairs regardless of corpus size — without it
    the guarded baseline is still quadratic inside hot-shingle clusters
    below ``max_rows``. Measured on the test corpus (2026-08, DuckDB twin
    of this exact plan): max shingle doc-freq is 7 at sf0.01 and 25 at
    sf0.1, so the default prune changes NOTHING there — pair recall vs
    the unpruned exact baseline is 1.000 at threshold 0.1 (25/25 pairs,
    0 lost / 0 gained) and every cap in {16..256} is output-identical.
    Pass ``None`` to disable for deliberate offline ground-truth runs.
    """
    df = _nonnull_docs(df, id_col, text_col)
    if max_rows is not None:
        n_docs = df.count()
        if n_docs > max_rows:
            raise ValueError(
                f"ngram_jaccard_pairs is the quadratic exactness baseline; "
                f"input has {n_docs} rows > max_rows={max_rows}. Use "
                f"minhash_lsh_pairs (the banded scale path), set "
                f"max_doc_freq to prune hot shingles, or pass "
                f"max_rows=None deliberately."
            )
    sh = df.select(
        F.col(id_col).alias("doc"), F.explode(word_shingles(text_col, n)).alias("__s")
    ).select("doc", md5_long(F.col("__s")).alias("shingle"))
    sh = _memo_persist_sig(sh)
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    paired = sh
    if max_doc_freq is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_doc_freq)
            .select("shingle")
        )
        paired = sh.join(keep, "shingle", "left_semi")
    a = paired.alias("a")
    b = paired.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnsRenamed({"doc": "doc_a", "sz": "sz_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc": "doc_b", "sz": "sz_b"}), "doc_b")
        .withColumn(
            "jaccard",
            quantize6(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def shingle_base_hashes(text_col: str = "text", n: int = 3) -> Column:
    """Per-row array of 30-bit base hashes of the distinct shingles — the
    single md5 pass every MinHash component reuses."""
    return F.transform(
        word_shingles(text_col, n), lambda s: md5_long(s) % F.lit(MINHASH_IN_MOD)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = NUM_MINHASH,
) -> DataFrame:
    """The persistable MinHash signature table: (doc, mh0..mh{k-1}).

    ~k×8 bytes per document — the intermediate worth writing to storage
    once per corpus. Incremental dedup (:func:`minhash_incremental_pairs`)
    then joins each new batch against this table instead of re-hashing
    the historical corpus.

    Shape: base hashes explode to ROWS through one Generate (the shingle
    pass runs exactly once per document — a chained
    ``select(hs).select(k mins over hs)`` projection-collapses into k
    copies of the whole shingle+md5 expression, a measured k× blowup),
    then ONE groupBy(doc) computes all k component minima with map-side
    partial aggregation: each partition pre-reduces its shingles to one
    k-int row per doc before the shuffle, so shuffle bytes are ~k×8 per
    document regardless of document length. word_shingles guarantees a
    non-empty shingle array for every row (short/empty/NULL docs get one
    whole-string shingle), so no document is dropped by the explode."""
    rows = _nonnull_docs(df, id_col, text_col).select(
        F.col(id_col).alias("doc"),
        F.explode(shingle_base_hashes(text_col, n)).alias("__h"),
    )
    aggs = [
        F.min((F.lit(a) * F.col("__h") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(
            f"mh{i}"
        )
        for i, (a, b) in enumerate(CW_CONSTANTS[:k])
    ]
    return rows.groupBy("doc").agg(*aggs)


def _banded(sig: DataFrame, bands: int = BANDS, k: int = NUM_MINHASH) -> DataFrame:
    """(doc, band_idx, band_key) rows from a signature table — band keys as
    ROWS so candidate pairing is ONE equi-join regardless of band count."""
    rows = k // bands
    return sig.select(
        "doc",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws("_", *[f"mh{b * rows + r}" for r in range(rows)])
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_key"),
    )


def _estimated_jaccard(cand: DataFrame, sig: DataFrame, k: int) -> DataFrame:
    """Attach est_jaccard (fraction of equal signature components) to a
    (doc_a, doc_b) candidate set via two hash joins of the signature
    table — candidates are tiny relative to the corpus."""
    sa = sig.select(
        F.col("doc").alias("doc_a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(k)]
    )
    sb = sig.select(
        F.col("doc").alias("doc_b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(k)]
    )
    est = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(k)
    ) / F.lit(float(k))
    # staged so the k signature comparisons run once per candidate pair,
    # not once per quantize6 guard reference
    return quantize6_staged(
        cand.join(sa, "doc_a").join(sb, "doc_b"),
        ["doc_a", "doc_b"],
        est,
        "est_jaccard",
    )


def minhash_incremental_pairs(
    new_docs: DataFrame,
    old_signatures: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bands: int = BANDS,
    k: int = NUM_MINHASH,
) -> DataFrame:
    """Incremental near-dup detection: candidate pairs of a NEW document
    batch against an existing corpus represented ONLY by its persisted
    signature table (:func:`minhash_signatures`), plus new-vs-new pairs
    inside the batch. Historical old-vs-old pairs were found when the
    corpus was built and are deliberately not re-derived.

    This is the daily-ingest shape at 100 TB: the text of the historical
    corpus is never re-read or re-hashed — only the new batch is shingled,
    and the band join probes the old table's band keys. Cost scales with
    the batch (plus one narrow scan of old signatures), not with corpus
    content. Requires doc ids disjoint between batch and corpus.

    Output matches :func:`minhash_lsh_pairs` restricted to pairs with at
    least one side in the batch (property-tested), with ``doc_a`` always
    the batch side for new-vs-old pairs.

    The batch signature table persists through the session-scoped memo
    (one cached relation per distinct batch plan, NOT one per call —
    round-2 advice); call :func:`release_signature_cache` between ingest
    generations to free superseded batches.
    """
    new_sig = _memo_persist_sig(minhash_signatures(new_docs, id_col, text_col, n, k))
    nb, ob = _banded(new_sig, bands, k), _banded(old_signatures, bands, k)
    a, c = nb.alias("a"), ob.alias("c")
    new_old = a.join(
        c,
        (F.col("a.band_idx") == F.col("c.band_idx"))
        & (F.col("a.band_key") == F.col("c.band_key")),
    ).select(F.col("a.doc").alias("doc_a"), F.col("c.doc").alias("doc_b"))
    a2, c2 = nb.alias("a"), nb.alias("c")
    new_new = a2.join(
        c2,
        (F.col("a.band_idx") == F.col("c.band_idx"))
        & (F.col("a.band_key") == F.col("c.band_key"))
        & (F.col("a.doc") < F.col("c.doc")),
    ).select(F.col("a.doc").alias("doc_a"), F.col("c.doc").alias("doc_b"))
    cand = new_old.unionByName(new_new).dropDuplicates(["doc_a", "doc_b"])
    all_sig = old_signatures.unionByName(new_sig)
    return _estimated_jaccard(cand, all_sig, k)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bands: int = BANDS,
    k: int = NUM_MINHASH,
) -> DataFrame:
    """MinHash LSH candidate pairs with the estimated Jaccard
    (fraction of equal signature components)."""
    # The signature is by far the expensive part (k salted md5 passes over
    # every shingle of every doc) — materialize it ONCE and let every
    # downstream use read the cached k-int-per-doc table. Without this the
    # lazy plan recomputes it on BOTH sides of every band join (2×bands×
    # at bands=4: an 8× blowup measured at 27× wall-clock on sf0.1). At
    # 100 TB the signature table is ~k×8 bytes/doc — the one intermediate
    # worth persisting (MEMORY_AND_DISK: spills, never recomputes). The
    # session-scoped memo means repeated calls over the same corpus share
    # ONE cached relation; release_signature_cache() frees them.
    sig = _memo_persist_sig(minhash_signatures(df, id_col, text_col, n, k))
    # band keys as ROWS (band_idx, band_key): ONE self-join on the pair
    # instead of `bands` separate joins + union — same candidate set,
    # 1/bands the shuffle count, and AQE sees one join to size/skew-split
    banded = _banded(sig, bands, k)
    a, c = banded.alias("a"), banded.alias("c")
    cand = (
        a.join(
            c,
            (F.col("a.band_idx") == F.col("c.band_idx"))
            & (F.col("a.band_key") == F.col("c.band_key"))
            & (F.col("a.doc") < F.col("c.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("c.doc").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # estimate from the cached signatures — candidate set is tiny relative
    # to the corpus, so these are two cheap hash joins
    return _estimated_jaccard(cand, sig, k)


def simhash16_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, sig) 16-bit SimHash signatures over distinct tokens: bit b of
    the signature = 1 iff sum over tokens of (+1 if bit b of the token
    hash else -1) > 0.

    Shape: distinct tokens explode to rows through one Generate, each row
    hashes ONCE, and one groupBy(doc) sums all 16 bit votes with map-side
    partial aggregation — a doc's tokens start co-located in its source
    row, so each partition pre-reduces to one 16-int row per doc and the
    shuffle carries ~#docs rows. The previous per-row Column form ran 16
    separate ``F.aggregate`` passes over the token-hash array, re-hashing
    every token once per bit (md5 dominates; 16× the hash work).

    Integer vote sums are order-independent, so signatures are
    bit-identical to the per-row form and to the DuckDB oracle. NULL-id /
    NULL-text docs are EXCLUDED (the _nonnull_docs lane): the old sig-0
    branch false-paired every NULL-text doc with each other and with any
    real doc whose signature had <= max_hamming bits set, while the twin
    emitted no pairs for them (review finding, verified live)."""
    toks = F.array_distinct(F.split(F.trim(F.lower(F.col(text_col))), WS_RE))
    base = _nonnull_docs(df, id_col, text_col).select(
        F.col(id_col).alias("doc"), toks.alias("__t")
    )
    hashed = (
        base.select("doc", F.explode("__t").alias("__tok"))
        .select("doc", md5_long(F.col("__tok")).alias("__h"))
    )
    votes = hashed.groupBy("doc").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
            ).alias(f"__v{b}")
            for b in range(16)
        ]
    )
    bits = [
        F.when(F.col(f"__v{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        for b in range(16)
    ]
    return votes.select("doc", sum(bits[1:], bits[0]).cast("int").alias("sig"))


def embedding_cosine_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    max_rows: int | None = 200_000,
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (brute-force baseline).

    All id_a < id_b pairs with quantized cosine >= threshold. O(n²) — the
    correctness baseline; the scale path is :func:`embedding_lsh_pairs`.

    ``max_rows`` guards against silently running all-pairs on a large
    corpus (the one count() is nothing next to the n² join it prevents);
    pass ``None`` to disable for deliberate offline recall measurement.
    """
    from billing_etl_v1_spark.operators.similarity import _dot, _prep

    if max_rows is not None:
        n = embeddings.count()
        if n > max_rows:
            raise ValueError(
                f"embedding_cosine_pairs is the O(n²) exactness baseline; "
                f"input has {n} rows > max_rows={max_rows}. Use "
                f"embedding_lsh_pairs (the banded scale path) or pass "
                f"max_rows=None deliberately."
            )
    base = _prep(embeddings, id_col, vec_col)
    a, b = base.alias("a"), base.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.norm") * F.col("b.norm"))
    # staged so the vector dot product runs once per pair, not once per
    # quantize6 guard reference
    return quantize6_staged(
        a.join(b, F.col("a.vid") < F.col("b.vid")),
        [F.col("a.vid").alias("vid_a"), F.col("b.vid").alias("vid_b")],
        cos,
        "cosine",
    ).filter(F.col("cosine") >= threshold)


def semantic_dedup(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_mod: int = 25,
    threshold: float = 0.35,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space, then mark as duplicates the vectors that have a
    same-cluster neighbor with cosine >= ``threshold`` and a smaller id —
    the deterministic "keep the first" policy, so exactly one
    representative of every near-duplicate chain inside a cluster
    survives. Output per vector: its cluster, how many kept-side
    near-duplicates it has, the strongest such similarity, and the keep
    flag.

    Scale shape — the reason SemDeDup exists: the quadratic pair search is
    confined to single clusters, so the self-join is a *cluster-keyed
    equi-join* (one shuffle on cluster id), never an all-pairs product.
    Cost is sum over clusters of |c|² — bounded by the coarse-quantizer
    granularity, which is the tunable: at 100 TB raise the centroid count
    (the paper uses ~100k clusters for billions of docs) so |c| stays
    ~10^4. Centroids here are the deterministic id-mod seeds of
    :func:`similarity.assign_clusters` (broadcast, one pass), which keeps
    the operator fully oracle-expressible; swap in
    :func:`similarity.kmeans_refine` assignments for production use.
    The argmax assignment window and the pair join both move NARROW rows
    (id, cluster, scalars) — vectors are carried only where the dot
    product is computed.
    """
    from billing_etl_v1_spark.operators.similarity import _dot, assign_clusters

    # both sides of the pair self-join reference the assignment; without
    # the memo-persist the centroid-argmax (the corpus x centroids dot
    # sweep) runs twice per query
    assigned = _memo_persist_sig(
        assign_clusters(embeddings, id_col, vec_col, centroid_mod)
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.norm") * F.col("b.norm"))
    # pairs inside one cluster only; a.vid < b.vid means `b` is the
    # candidate duplicate and `a` the kept-side witness. Staged so the
    # dot product runs once per pair, not once per quantize6 reference.
    dup_edges = quantize6_staged(
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vid") < F.col("b.vid")),
        ),
        [F.col("b.vid").alias("vid")],
        cos,
        "cosine",
    ).filter(F.col("cosine") >= threshold)
    hits = dup_edges.groupBy("vid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dups"),
        quantize6(F.max("cosine")).alias("max_dup_sim"),
    )
    return (
        assigned.join(hits, "vid", "left")
        .select(
            F.col("vid").alias(id_col),
            F.col("cluster"),
            F.coalesce(F.col("n_dups"), F.lit(0)).cast("bigint").alias("n_dups"),
            F.coalesce(F.col("max_dup_sim"), F.lit(0.0)).alias("max_dup_sim"),
            (F.coalesce(F.col("n_dups"), F.lit(0)) == 0).alias("is_kept"),
        )
    )


SIGN_BITS = 16
SIGN_BANDS = 4  # 4 bands x 4 sign bits


def _sign_band_keys(vec: Column, bits: int = SIGN_BITS, bands: int = SIGN_BANDS) -> list[Column]:
    """Band keys from coordinate signs: band b concatenates the >=0 indicator
    of `bits/bands` leading dimensions (1-based element_at, matching the
    oracle's 1-based list indexing). Random-hyperplane LSH restricted to
    axis-aligned hyperplanes — deterministic, hence oracle-expressible."""
    per = bits // bands
    return [
        F.concat_ws(
            "",
            *[
                (F.element_at(vec, b * per + r + 1) >= 0).cast("int")
                for r in range(per)
            ],
        ).alias(f"sband{b}")
        for b in range(bands)
    ]


def embedding_lsh_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    bits: int = SIGN_BITS,
    bands: int = SIGN_BANDS,
) -> DataFrame:
    """Sign-LSH bucketed near-dup: candidates must agree on ALL sign bits of
    at least one band; exact cosine is computed only within buckets.

    At 100 TB the all-pairs step disappears: each band join shuffles on a
    band key whose selectivity is tuned by `bits/bands`; everything else is
    per-row. Same output shape as the brute-force baseline, so recall is
    directly measurable (LSH output ⊆ brute-force output).
    """
    # _dot_unrolled, not _dot: this cosine evaluates in a hash-join output
    # projection that whole-stage codegen compiles, where the unrolled form
    # measured 1.454 -> 1.195 s (full query) / 2.36 -> 1.45 s (isolated
    # 455k-candidate stage) — see similarity._dot_unrolled for the contexts
    # where the opposite holds
    from billing_etl_v1_spark.operators.similarity import _dot_unrolled as _dot
    from billing_etl_v1_spark.operators.similarity import _prep

    # a vector shorter than the signature width cannot produce a full
    # sign signature: element_at past the end is a JOB-KILLING
    # INVALID_ARRAY_INDEX under ANSI mode (review finding, verified live),
    # while the twin's CASE silently 0-fills the missing dims — both
    # engines now exclude such ragged vectors (len >= bits), the corrupt-
    # vector posture
    embeddings = embeddings.filter(F.size(F.col(vec_col)) >= bits)
    base = _memo_persist_sig(_prep(embeddings, id_col, vec_col))
    # the minhash_lsh_pairs layout: band keys as ROWS over ids only (the
    # vectors stay out of the exploded relation and the pair-dedup shuffle),
    # ONE self-join on (band_idx, band_key) instead of `bands` joins +
    # union, then exact cosine via two hash joins of the deduped candidate
    # ids back against the cached vector table — candidates are a tiny
    # fraction of the corpus, so the rejoin moves far fewer vectors than
    # either carrying them through the band join or recomputing per band.
    banded = base.select(
        "vid",
        F.posexplode(F.array(*_sign_band_keys(F.col("v"), bits, bands))).alias(
            "band_idx", "band_key"
        ),
    )
    a, c = banded.alias("a"), banded.alias("c")
    cand = (
        a.join(
            c,
            (F.col("a.band_idx") == F.col("c.band_idx"))
            & (F.col("a.band_key") == F.col("c.band_key"))
            & (F.col("a.vid") < F.col("c.vid")),
        )
        .select(F.col("a.vid").alias("vid_a"), F.col("c.vid").alias("vid_b"))
        .dropDuplicates(["vid_a", "vid_b"])
    )
    sa = base.select(F.col("vid").alias("vid_a"), F.col("v").alias("va"), F.col("norm").alias("na"))
    sb = base.select(F.col("vid").alias("vid_b"), F.col("v").alias("vb"), F.col("norm").alias("nb"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    # staged so the exact dot product runs once per bucketed candidate,
    # not once per quantize6 guard reference
    return quantize6_staged(
        cand.join(sa, "vid_a").join(sb, "vid_b"),
        ["vid_a", "vid_b"],
        cos,
        "cosine",
    ).filter(F.col("cosine") >= threshold)


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance.

    Pigeonhole banding makes this an EQUI-join: the 16-bit signature splits
    into (max_hamming + 1) bands, and any pair within `max_hamming` flipped
    bits must agree on at least one whole band — so joining on
    (band_idx, band_bits) finds every qualifying pair (result set is
    IDENTICAL to the naive all-pairs join, which planned as a quadratic
    broadcast nested-loop). The oracle keeps the all-pairs formulation;
    the hash-join plan is asserted in tests/test_scale_posture.py.
    """
    n_bands = max_hamming + 1
    assert 16 % n_bands == 0, "banding needs max_hamming+1 to divide 16"
    width = 16 // n_bands
    mask = (1 << width) - 1
    sig = _memo_persist_sig(simhash16_signatures(df, id_col, text_col))
    banded = sig.select(
        "doc",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("sig", width * b).bitwiseAND(F.lit(mask))
                    for b in range(n_bands)
                ]
            )
        ).alias("band_idx", "band_bits"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_bits") == F.col("b.band_bits"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
    )


def near_dup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard: float = 0.5,
    max_iters: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components over the MinHash-LSH near-dup graph: every doc
    labeled with its cluster representative (the component's min id), the
    step that turns pair lists into an actual deduped corpus (keep
    ``is_canonical = 1``, drop the rest).

    Iterative min-label propagation (the Pregel/GraphX connected-components
    recipe): each round every node takes the min of its own label and its
    neighbors' labels; converges in O(component diameter) rounds — near-dup
    clusters are shallow (dups of a common source), so a handful of rounds
    in practice, ``max_iters`` as the safety bound. This is the one operator
    family where a driver-side loop is legitimate: the convergence test is a
    global fixpoint no single SQL statement expresses (the DuckDB oracle
    uses a RECURSIVE CTE — fine at oracle scale, quadratic blowup at 100 TB).

    Scale shape: every round is one join edges⋈labels (both sides hash on
    the same key) + one per-node min — shuffle size is O(edges), and the
    label frame is localCheckpoint()ed each round so the plan/lineage stays
    O(1) deep instead of O(rounds). The edge list is persisted once;
    label updates never touch the raw corpus.

    .. warning:: EXECUTES EAGERLY at call time — the fixpoint loop runs all
       its Spark jobs (one join + one convergence count per round, each
       label frame localCheckpoint()ed) before this function returns, unlike
       every other operator here which only builds a lazy plan. Calling this
       "just to build a DAG" already pays the full clustering cost; the
       returned DataFrame is the (cheap) checkpointed result. Measured cost
       lives in SCALE_PROBE (iterative_ops): construction is the work,
       the subsequent write is O(nodes).
    """
    pairs = minhash_lsh_pairs(df, id_col=id_col, text_col=text_col).filter(
        F.col("est_jaccard") >= min_jaccard
    )
    # NULL ids are excluded from the node set (the _nonnull_docs lane:
    # they can't join the edge list and the twin's GROUP BY would merge
    # them into one bogus NULL cluster); distinct() so duplicated ids
    # label once, like the twin's GROUP BY node
    nodes = (
        df.filter(F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("node"))
        .distinct()
    )
    comp = connected_components(nodes, pairs, max_iters=max_iters, stats=stats)
    return comp.select(
        F.col("node").alias(id_col),
        "cluster_id",
        (F.col("node") == F.col("cluster_id")).cast("int").alias("is_canonical"),
    )


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    max_iters: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """Generic distributed connected components: (node) × (doc_a, doc_b)
    undirected pairs → (node, cluster_id = component min). The iterative
    core of ``near_dup_clusters``, factored out so any pair generator
    (simhash, embedding-LSH, exact) can feed it, and so the fixpoint logic
    is property-testable against a union-find model on arbitrary graphs.

    EXECUTES EAGERLY (see :func:`near_dup_clusters`). Pass a ``stats`` dict
    to receive ``{"rounds": N}`` — N includes the final no-change round
    that proves the fixpoint; probes record it because cost is
    O(rounds × edges) and rounds tracks component diameter, not data size."""
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionAll(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .persist()
    )
    labels = nodes.select("node", F.col("node").alias("label")).localCheckpoint()
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        neigh_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("__nl"))
        )
        updated = (
            labels.join(neigh_min, labels["node"] == neigh_min["src"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("__nl"), F.col("label"))).alias(
                    "__new"
                ),
            )
        )
        # checkpoint FIRST, then test convergence between the two
        # checkpointed frames: the join pipeline executes once per round,
        # not twice (a pre-checkpoint count re-ran the whole round's join
        # just to answer yes/no — measured ~2x the fixpoint cost)
        new_labels = updated.withColumnRenamed("__new", "label").localCheckpoint()
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "__old"), "node")
            .filter(F.col("label") != F.col("__old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    if stats is not None:
        stats["rounds"] = rounds
    return labels.select("node", F.col("label").alias("cluster_id"))


def lsh_recall_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    gt_max_doc_freq: int | None = None,
) -> DataFrame:
    """Measured LSH quality, as a query: exact n-gram Jaccard pairs at
    ``threshold`` (ground truth) full-outer-joined against the MinHash-LSH
    candidates, rolled up to one row of recall/precision. "Measure, don't
    guess" applied to the dedup stack itself — banding parameters (bands ×
    rows, signature width) should be tuned against THIS number on a sample
    before a 100 TB run, where the exact baseline is unaffordable but a
    sampled recall estimate is not.

    The ground truth is the UNPRUNED exact baseline: ``gt_max_doc_freq``
    defaults to ``None`` (not :func:`ngram_jaccard_pairs`' production
    default of 256) because a recall number measured against a pruned
    truth set under-counts true pairs exactly on the hot-shingle corpora
    the report exists to tune for, and the bias would be invisible — the
    pruned truth is smaller, so recall reads HIGHER. The quadratic cost is
    bounded by the row-count guard instead (max_rows=200k): at scale, run
    the report on a hash-sampled slice (corpus.hash_sample), which
    preserves pair recall in expectation. Pass a cap explicitly only to
    measure recall *against the pruned baseline itself*.
    """
    gt = ngram_jaccard_pairs(
        df, id_col, text_col, threshold=threshold, max_doc_freq=gt_max_doc_freq
    ).select("doc_a", "doc_b", F.lit(1).alias("__gt"))
    est = minhash_lsh_pairs(df, id_col, text_col).select(
        "doc_a", "doc_b", F.lit(1).alias("__est")
    )
    j = gt.join(est, ["doc_a", "doc_b"], "full_outer")
    agg = j.agg(
        F.sum("__gt").cast("bigint").alias("n_true"),
        F.sum("__est").cast("bigint").alias("n_candidates"),
        F.sum(
            F.when(F.col("__gt").isNotNull() & F.col("__est").isNotNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_hit"),
    )
    return agg.select(
        "n_true",
        "n_candidates",
        "n_hit",
        quantize6(F.col("n_hit") / F.col("n_true")).alias("recall"),
        quantize6(F.col("n_hit") / F.col("n_candidates")).alias("precision"),
    )


def similarity_pagerank(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    iters: int = 2,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over the MinHash-LSH similarity graph: documents central to
    dense near-duplicate neighborhoods score high — a redundancy signal
    corpus curation uses to pick canonical docs (complementing
    :func:`near_dup_clusters`' hard assignment with a soft centrality).
    Standard damped PageRank with uniform dangling-mass redistribution,
    run a fixed ``iters`` rounds.

    Cross-engine exactness for an ITERATIVE float algorithm (the kmeans
    playbook): the only order-dependent operations — the per-target
    contribution sums and the dangling-mass total — run through
    ``functions.exact_sum`` (order-proof (hi, lo) BIGINT pairs), and every
    remaining expression is a fixed-shape scalar tree, so all ``iters``
    rounds produce bit-identical doubles in DuckDB (the oracle unrolls the
    rounds as chained CTEs).

    Scale shape per round: one edge-keyed equi-join (contributions to
    edges), one dst-keyed aggregate, one broadcast of the 1-row dangling
    mass — the vertex-program shape, no all-pairs anything. Edge count is
    bounded by LSH banding, the same knob that bounds the dedup pass.
    """
    # every unrolled round references the edge set (and deg derives from
    # it); without the memo-persist the whole LSH banding lineage re-plans
    # per reference — 60+ joins in the executed plan at 2 iterations
    pairs = _memo_persist_sig(
        minhash_lsh_pairs(df, id_col, text_col).select("doc_a", "doc_b")
    )
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    nodes = df.select(F.col(id_col).alias("node"))
    n_row = nodes.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    deg = edges.groupBy(F.col("doc_a").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    # the iteration runs on SCALED mass s = pr * n, not pr itself: pr
    # values are ~1/n, and exact_sum's fixed 1e-10 grid would quantize
    # per-node contributions to a handful of grid units at n ~ 1e9 (and
    # to 0 beyond ~2e10), numerically destroying the scores exactly at
    # the corpus sizes this operator is documented for (review finding).
    # Scaled, every summed term is O(1) — six-plus digits of grid
    # headroom at ANY corpus size — and the recurrence is the same by
    # linearity: s' = (1-d) + d*(Σ s/deg + dm/n), pr = s/n at output.
    # The oracle mirrors the scaled rounds term for term.
    pr = nodes.select("node", F.lit(1.0).alias("s"))
    base = F.lit(1.0 - damping)
    d = F.lit(damping)
    for _ in range(iters):
        state = pr.join(deg, "node", "left")
        contrib = state.filter(F.col("deg").isNotNull()).select(
            F.col("node").alias("doc_a"), (F.col("s") / F.col("deg")).alias("c")
        )
        inmass = (
            edges.join(contrib, "doc_a")
            .groupBy(F.col("doc_b").alias("node"))
            .agg(exact_sum(F.col("c")).alias("m"))
        )
        dangling = state.filter(F.col("deg").isNull()).agg(
            exact_sum(F.col("s")).alias("dm")
        )
        pr = (
            nodes.crossJoin(F.broadcast(n_row))
            .crossJoin(F.broadcast(dangling))
            .join(inmass, "node", "left")
            .select(
                "node",
                (
                    base
                    + d
                    * (
                        F.coalesce(F.col("m"), F.lit(0.0))
                        + F.coalesce(F.col("dm"), F.lit(0.0)) / F.col("__n")
                    )
                ).alias("s"),
            )
        )
    out = pr.crossJoin(F.broadcast(n_row)).join(deg, "node", "left")
    return out.select(
        F.col("node").alias(id_col),
        F.coalesce(F.col("deg"), F.lit(0)).cast("bigint").alias("degree"),
        quantize6(F.col("s") / F.col("__n")).alias("pagerank"),
    )
