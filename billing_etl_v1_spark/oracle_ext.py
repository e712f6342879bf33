"""DuckDB oracle SQL for the extension operators (text / dedup / similarity /
events / relational demos).

Formulas mirror the Spark operators exactly:

- token/shingle definitions share the same regex + 1-based indexing
- all integer hashing is the engine-identical md5 trick:
  Spark  conv(substr(md5(x),1,15),16,10)::bigint
  DuckDB ('0x' || substr(md5(x),1,15))::BIGINT
- doubles quantized with floor(x*1e6+0.5)/1e6 (see oracle._r6)
- epoch arithmetic truncated to whole seconds in both engines
- large-group sums (TPC-H Q1) accumulate in DECIMAL(38,10) in BOTH engines
  because double summation order differs across engines by more than 1e-6
  at 10k+ rows per group
"""

from __future__ import annotations

from billing_etl_v1_spark.operators.dedup import BANDS, NUM_MINHASH
from billing_etl_v1_spark.operators.text import (
    BPE_TOKEN_RE,
    LANG_STOPWORDS,
    QUALITY_STOPWORDS,
    WS_RE,
)
from billing_etl_v1_spark.oracle import _r6

_MD5INT = "('0x' || substr(md5({x}), 1, 15))::BIGINT"



# Corrupt-float posture shared by the Spark operators (functions.finite_or_null
# / finite_vectors) and these twins: out-of-domain event values (non-finite
# OR |v| > 9e8, the exact-grid envelope — a finite 1e300 saturates Spark's
# quantization and overflows DECIMAL casts) read as NULL, vectors with any
# non-finite component are excluded from every index.
_EVF = (
    "(SELECT * REPLACE (CASE WHEN isfinite(value) AND abs(value) <= 9e8 "
    "THEN value END AS value) FROM events)"
)
_FINITE_VEC = (
    # x IS NOT NULL first: bool_and SKIPS NULLs, so a bare isfinite(NULL)
    # would silently keep vectors with NULL components that the Spark side
    # (forall + isNotNull) drops
    "coalesce(list_aggregate(list_transform(embedding::DOUBLE[], "
    "x -> x IS NOT NULL AND isfinite(x)), 'bool_and'), FALSE)"
)


def _md5int(x: str, salt: str | None = None) -> str:
    if salt is not None:
        x = f"'{salt}|' || ({x})"
    return _MD5INT.format(x=x)


_TOKENS = f"regexp_split_to_array(trim(lower(text)), '{WS_RE}')"
_NORM = f"regexp_replace(trim(lower(text)), '{WS_RE}', ' ', 'g')"


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def text_stats_sql() -> str:
    stop = _sql_list(QUALITY_STOPWORDS)
    return f"""
WITH t AS (
  SELECT doc_id, text, lang, source, n_chars,
    CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_TOKENS}) END AS token_count,
    CASE WHEN length(text) = 0 THEN 0.0
         ELSE (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE / length(text) END AS punct,
    CASE WHEN length(text) = 0 THEN 0.0
         ELSE (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE / length(text) END AS digit,
    len(list_filter({_TOKENS}, x -> list_contains({stop}, x))) AS stop_hits
  FROM documents
)
SELECT doc_id, text, lang, source, n_chars,
  length(text)::INT AS char_count,
  token_count::INT AS token_count,
  len(regexp_extract_all(text, '{BPE_TOKEN_RE}'))::INT AS bpe_token_count,
  {_r6('punct')} AS punct_ratio,
  {_r6('digit')} AS digit_ratio,
  {_r6('CASE WHEN token_count = 0 THEN 0.0 ELSE stop_hits::DOUBLE / token_count END')} AS stopword_ratio,
  {_r6('least(1.0, token_count / 100.0) * (1.0 - least(1.0, 4.0 * punct)) * (1.0 - least(1.0, 4.0 * digit))')} AS quality_score
FROM t
"""


def lang_id_sql() -> str:
    scores = ",\n    ".join(
        f"len(list_filter({_TOKENS}, x -> list_contains({_sql_list(sw)}, x))) AS s_{lang}"
        for lang, sw in LANG_STOPWORDS.items()
    )
    langs = sorted(LANG_STOPWORDS)
    best = "greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    whens = "\n      ".join(f"WHEN s_{lg} = best THEN '{lg}'" for lg in langs)
    return f"""
WITH t AS (
  SELECT doc_id, text, lang, source, n_chars,
    {scores}
  FROM documents
),
b AS (SELECT *, {best} AS best FROM t)
SELECT doc_id, text, lang, source, n_chars,
  CASE WHEN best = 0 THEN 'und'
      {whens}
      ELSE 'und' END AS lang_pred
FROM b
"""


def fingerprint_sql() -> str:
    return f"""
SELECT doc_id, text, lang, source, n_chars,
  md5({_NORM}) AS fingerprint_md5,
  {_md5int(_NORM)} AS fingerprint_int
FROM documents
"""


def dedup_exact_sql() -> str:
    return f"""
WITH h AS (SELECT doc_id, {_md5int(_NORM)} AS content_hash FROM documents)
SELECT content_hash, min(doc_id) AS rep_doc_id, count(*) AS n_docs
FROM h GROUP BY content_hash
"""


_SHINGLES = f"""
toks AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
    CASE WHEN len(t) >= 3 THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2]
         ELSE array_to_string(t, ' ') END AS shingle
  FROM toks,
       UNNEST(generate_series(1, CASE WHEN len(t) >= 3 THEN len(t) - 2 ELSE 1 END)) AS g(i)
)"""


def ngram_jaccard_sql(threshold: float = 0.1, max_doc_freq: int | None = 256) -> str:
    # join on the 60-bit shingle hash exactly like the Spark side; the
    # stop-shingle prune (doc_freq > max_doc_freq dropped before pairing,
    # sizes keep FULL counts) mirrors ngram_jaccard_pairs' default;
    # None = unpruned exact baseline (ground-truth mode, lsh_recall_sql)
    jac = _r6("inter::DOUBLE / (sa.sz + sb.sz - inter)")
    if max_doc_freq is None:
        pairing = "p AS (SELECT doc_id, sh_h FROM shh),"
    else:
        pairing = f"""keep AS (
  SELECT sh_h FROM (SELECT sh_h, count(*) AS d FROM shh GROUP BY sh_h)
  WHERE d <= {max_doc_freq}
),
p AS (SELECT doc_id, sh_h FROM shh SEMI JOIN keep USING (sh_h)),"""
    return f"""
WITH {_SHINGLES},
shh AS (SELECT doc_id, {_md5int('shingle')} AS sh_h FROM sh),
sizes AS (SELECT doc_id, count(*) AS sz FROM shh GROUP BY doc_id),
{pairing}
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM p a JOIN p b ON a.sh_h = b.sh_h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
j AS (
  SELECT doc_a, doc_b, {jac} AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
)
SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= {threshold}
"""


def minhash_lsh_sql(k: int = NUM_MINHASH, bands: int = BANDS) -> str:
    from billing_etl_v1_spark.operators.dedup import (
        CW_CONSTANTS,
        MINHASH_IN_MOD,
        MINHASH_PRIME,
    )

    rows = k // bands
    hb = f"({_md5int('shingle')}) % {MINHASH_IN_MOD}"
    mins = ",\n    ".join(
        f"min(({a} * ({hb}) + {b}) % {MINHASH_PRIME}) AS mh{i}"
        for i, (a, b) in enumerate(CW_CONSTANTS[:k])
    )
    band_cols = ",\n    ".join(
        " || '_' || ".join(f"mh{b * rows + r}::VARCHAR" for r in range(rows)) + f" AS band{b}"
        for b in range(bands)
    )
    band_or = " OR ".join(f"a.band{b} = b.band{b}" for b in range(bands))
    est = " + ".join(f"(CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END)" for i in range(k))
    return f"""
WITH {_SHINGLES},
sig AS (
  SELECT doc_id,
    {mins}
  FROM sh GROUP BY doc_id
),
banded AS (
  SELECT *,
    {band_cols}
  FROM sig
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       {_r6(f'({est}) / {float(k)}')} AS est_jaccard
FROM banded a JOIN banded b
  ON a.doc_id < b.doc_id AND ({band_or})
"""


def decontaminate_fuzzy_sql(
    eval_mod: int = 97, threshold: float = 0.5, k: int = NUM_MINHASH, bands: int = BANDS
) -> str:
    """Twin of operators.text.decontaminate_fuzzy — the minhash_lsh_sql
    signature/banding machinery, asymmetric train-vs-eval, aggregated per
    training doc."""
    from billing_etl_v1_spark.operators.dedup import (
        CW_CONSTANTS,
        MINHASH_IN_MOD,
        MINHASH_PRIME,
    )

    rows = k // bands
    hb = f"({_md5int('shingle')}) % {MINHASH_IN_MOD}"
    mins = ",\n    ".join(
        f"min(({a} * ({hb}) + {b}) % {MINHASH_PRIME}) AS mh{i}"
        for i, (a, b) in enumerate(CW_CONSTANTS[:k])
    )
    band_cols = ",\n    ".join(
        " || '_' || ".join(f"mh{b * rows + r}::VARCHAR" for r in range(rows)) + f" AS band{b}"
        for b in range(bands)
    )
    band_or = " OR ".join(f"t.band{b} = e.band{b}" for b in range(bands))
    est_raw = " + ".join(f"(CASE WHEN t.mh{i} = e.mh{i} THEN 1 ELSE 0 END)" for i in range(k))
    est = _r6(f"({est_raw}) / {float(k)}")
    return f"""
WITH {_SHINGLES},
sig AS (
  SELECT doc_id,
    {mins}
  FROM sh GROUP BY doc_id
),
banded AS (
  SELECT *,
    {band_cols}
  FROM sig
),
scored AS (
  SELECT t.doc_id AS doc_a, e.doc_id AS doc_b, {est} AS est
  FROM banded t JOIN banded e
    ON t.doc_id % {eval_mod} <> 0 AND e.doc_id % {eval_mod} = 0 AND ({band_or})
),
hits AS (
  SELECT doc_a,
         count(*) AS n_candidates,
         sum(CASE WHEN est >= {threshold} THEN 1 ELSE 0 END) AS n_near_eval,
         {_r6('max(est)')} AS max_est_jaccard
  FROM scored GROUP BY doc_a
)
SELECT d.doc_id, d.lang, d.source,
       COALESCE(h.n_candidates, 0)::BIGINT AS n_candidates,
       COALESCE(h.n_near_eval, 0)::BIGINT AS n_near_eval,
       COALESCE(h.max_est_jaccard, 0.0) AS max_est_jaccard,
       COALESCE(h.n_near_eval, 0) > 0 AS is_contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_a
WHERE d.doc_id % {eval_mod} <> 0
"""


def simhash_pairs_sql(max_hamming: int = 3) -> str:
    votes = ",\n    ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}" for b in range(16)
    )
    sig = " + ".join(f"(CASE WHEN v{b} > 0 THEN {2 ** b} ELSE 0 END)" for b in range(16))
    return f"""
WITH toks AS (SELECT doc_id, list_distinct({_TOKENS}) AS t FROM documents),
tok AS (SELECT doc_id, unnest(t) AS tk FROM toks),
th AS (SELECT doc_id, {_md5int('tk')} AS h FROM tok),
v AS (
  SELECT doc_id,
    {votes}
  FROM th GROUP BY doc_id
),
sig AS (SELECT doc_id, ({sig})::INT AS sig FROM v)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.sig, b.sig))::INT AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}
"""


_DOT = "list_reduce(list_transform(list_zip({a}, {b}), x -> x[1] * x[2]), (x, y) -> x + y)"


def embedding_cosine_sql(threshold: float = 0.4) -> str:
    dot = _DOT.format(a="a.v", b="b.v")
    cos = _r6(f"({dot}) / (a.nrm * b.nrm)")
    return f"""
WITH {_norms_cte()}
SELECT a.vec_id AS vid_a, b.vec_id AS vid_b, {cos} AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE {cos} >= {threshold}
"""


def embedding_lsh_sql(threshold: float = 0.4, bits: int = 16, bands: int = 4) -> str:
    per = bits // bands
    band_cols = ",\n    ".join(
        " || ".join(
            f"(CASE WHEN v[{b * per + r + 1}] >= 0 THEN 1 ELSE 0 END)::VARCHAR"
            for r in range(per)
        )
        + f" AS sband{b}"
        for b in range(bands)
    )
    band_or = " OR ".join(f"a.sband{b} = b.sband{b}" for b in range(bands))
    dot = _DOT.format(a="a.v", b="b.v")
    cos = _r6(f"({dot}) / (a.nrm * b.nrm)")
    return f"""
WITH {_norms_cte()},
sig AS (
  -- len(v) >= bits mirrors the Spark side: a ragged vector cannot produce
  -- a full sign signature (the CASE would silently 0-fill missing dims)
  SELECT vec_id, v, nrm,
    {band_cols}
  FROM n WHERE len(v) >= {bits}
)
SELECT a.vec_id AS vid_a, b.vec_id AS vid_b, {cos} AS cosine
FROM sig a JOIN sig b ON a.vec_id < b.vec_id AND ({band_or})
WHERE {cos} >= {threshold}
"""


def _norms_cte() -> str:
    # WHERE mirrors functions.finite_vectors: vectors with any non-finite
    # (or NULL) component are excluded from the index on both engines.
    # nrm > 0 mirrors similarity._prep's zero-norm exclusion (an all-zero
    # embedding would otherwise divide cosine by zero).
    self_dot = _DOT.format(a="v", b="v")
    return f"""
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE vec_id IS NOT NULL AND {_FINITE_VEC}),
n AS (SELECT * FROM (SELECT vec_id, v, sqrt({self_dot}) AS nrm FROM e)
      WHERE nrm > 0)"""


def sim_topk_bruteforce_sql(query_mod: int = 50, k: int = 5) -> str:
    dot = _DOT.format(a="n.v", b="q.qv")
    return f"""
WITH {_norms_cte()},
q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id % {query_mod} = 0),
s AS (
  SELECT q.qid, n.vec_id, {_r6(f'({dot}) / (n.nrm * q.qn)')} AS score
  FROM n, q WHERE n.vec_id <> q.qid
),
r AS (
  SELECT qid, vec_id, score,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC) AS rnk
  FROM s
)
SELECT qid AS query_id, vec_id AS neighbor_id, rnk::INT AS rank, score
FROM r WHERE rnk <= {k}
"""


def sim_topk_ivf_sql(query_mod: int = 50, centroid_mod: int = 25, k: int = 5) -> str:
    cdot = _DOT.format(a="n.v", b="c.cv")
    qdot = _DOT.format(a="a.v", b="q.qv")
    return f"""
WITH {_norms_cte()},
cents AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id % {centroid_mod} = 0),
asg0 AS (
  SELECT n.vec_id AS vid, n.v, n.nrm, c.cid,
         row_number() OVER (
           PARTITION BY n.vec_id
           ORDER BY {_r6(f'({cdot}) / (n.nrm * c.cn)')} DESC, c.cid ASC
         ) AS crk
  FROM n, cents c
),
asg AS (SELECT vid, v, nrm, cid AS cluster FROM asg0 WHERE crk = 1),
q AS (SELECT vid AS qid, v AS qv, nrm AS qn, cluster AS qc FROM asg WHERE vid % {query_mod} = 0),
s AS (
  SELECT q.qid, a.vid, {_r6(f'({qdot}) / (a.nrm * q.qn)')} AS score
  FROM asg a, q WHERE a.cluster = q.qc AND a.vid <> q.qid
),
r AS (
  SELECT qid, vid, score,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, vid ASC) AS rnk
  FROM s
)
SELECT qid AS query_id, vid AS neighbor_id, rnk::INT AS rank, score
FROM r WHERE rnk <= {k}
"""


_QUANT_CTE = """
qt0 AS (
  SELECT vec_id, v, nrm, list_max(list_transform(v, x -> abs(x))) AS amax FROM n
),
qt1 AS (
  SELECT vec_id, v, nrm,
         CASE WHEN amax > 0 THEN amax / 127.0 ELSE 1.0 END AS scale
  FROM qt0
),
qt AS (
  SELECT vec_id, nrm, scale,
         list_transform(v, x -> CAST(round(x / scale) AS BIGINT)) AS q
  FROM qt1
)"""

_IDOT = "list_reduce(list_transform(list_zip({a}, {b}), x -> x[1] * x[2]), (x, y) -> x + y)"


def quantize_embeddings_sql() -> str:
    """Twin of operators.similarity.quantize_embeddings_int8, summarized to
    hashable scalars: the codes themselves are folded to exact integer
    checksums (sum and sum-of-squares of the int8 codes)."""
    return f"""
WITH {_norms_cte()},
{_QUANT_CTE}
SELECT vec_id, {_r6('nrm')} AS norm, {_r6('scale')} AS scale,
       CAST(list_reduce(q, (x, y) -> x + y) AS BIGINT) AS qsum,
       CAST({_IDOT.format(a='q', b='q')} AS BIGINT) AS qnorm2
FROM qt
"""


def sim_topk_quantized_sql(query_mod: int = 50, k: int = 5) -> str:
    """Twin of operators.similarity.cosine_topk_quantized — exact integer
    code dot, one fixed-shape float reconstruction, same tie-breaks."""
    idot = _IDOT.format(a="a.q", b="b.qq")
    score = _r6(f"({idot}) * (a.scale * b.qscale) / (a.nrm * b.qnorm)")
    return f"""
WITH {_norms_cte()},
{_QUANT_CTE},
q2 AS (
  SELECT vec_id AS qid, q AS qq, scale AS qscale, nrm AS qnorm
  FROM qt WHERE vec_id % {query_mod} = 0
),
s AS (
  SELECT b.qid, a.vec_id, {score} AS score
  FROM qt a, q2 b WHERE a.vec_id <> b.qid
),
r AS (
  SELECT qid, vec_id, score,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC) AS rnk
  FROM s
)
SELECT qid AS query_id, vec_id AS neighbor_id, rnk::INT AS rank, score
FROM r WHERE rnk <= {k}
"""


def similarity_pagerank_sql(iters: int = 2, damping: float = 0.85) -> str:
    """Twin of operators.dedup.similarity_pagerank — the same fixed rounds
    UNROLLED as chained CTEs, contribution/dangling sums via oracle._dsum
    (the exact_sum twin) so every round's doubles are bit-identical."""
    from billing_etl_v1_spark.oracle import _dsum

    base = repr(1.0 - damping)
    d = repr(damping)
    parts = [
        f"pairs AS (SELECT doc_a, doc_b FROM ({minhash_lsh_sql()}))",
        "edges AS (SELECT doc_a, doc_b FROM pairs"
        " UNION ALL SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs)",
        "nodes AS (SELECT doc_id AS node FROM documents)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "deg AS (SELECT doc_a AS node, count(*) AS deg FROM edges GROUP BY doc_a)",
        # SCALED mass s = pr * n, mirroring the Spark side: pr-scale values
        # (~1/n) would quantize to nothing on the fixed 1e-10 exact-sum
        # grid at corpus scale; the recurrence is identical by linearity
        "pr0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS s FROM nodes)",
    ]
    for i in range(iters):
        parts.append(
            f"""c{i} AS (
  SELECT p.node AS doc_a, p.s / d.deg AS c
  FROM pr{i} p JOIN deg d USING (node)
),
m{i} AS (
  SELECT e.doc_b AS node, {_dsum('c.c')} AS m
  FROM edges e JOIN c{i} c USING (doc_a) GROUP BY e.doc_b
),
dm{i} AS (
  SELECT {_dsum('p.s')} AS dm
  FROM pr{i} p LEFT JOIN deg d USING (node) WHERE d.deg IS NULL
),
pr{i + 1} AS (
  SELECT n.node,
         CAST({base} AS DOUBLE)
           + CAST({d} AS DOUBLE)
             * (coalesce(m.m, 0.0) + coalesce(dm.dm, 0.0) / nn.n) AS s
  FROM nodes n
  CROSS JOIN nn
  CROSS JOIN dm{i} dm
  LEFT JOIN m{i} m ON m.node = n.node
)"""
        )
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT p.node AS doc_id,
       CAST(coalesce(d.deg, 0) AS BIGINT) AS degree,
       {_r6('p.s / nn.n')} AS pagerank
FROM pr{iters} p CROSS JOIN nn LEFT JOIN deg d USING (node)
"""


def lsh_recall_sql(threshold: float = 0.5) -> str:
    """Twin of operators.dedup.lsh_recall_report — composes the jaccard
    ground-truth and LSH candidate twins, same full-outer rollup. The
    truth side is UNPRUNED (max_doc_freq=None), mirroring the Spark
    side's gt_max_doc_freq=None default."""
    return f"""
WITH gt AS (SELECT doc_a, doc_b, 1 AS g FROM ({ngram_jaccard_sql(threshold=threshold, max_doc_freq=None)})),
est AS (SELECT doc_a, doc_b, 1 AS e FROM ({minhash_lsh_sql()})),
j AS (SELECT * FROM gt FULL OUTER JOIN est USING (doc_a, doc_b)),
a AS (
  SELECT CAST(sum(g) AS BIGINT) AS n_true,
         CAST(sum(e) AS BIGINT) AS n_candidates,
         CAST(sum(CASE WHEN g IS NOT NULL AND e IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
  FROM j
)
SELECT n_true, n_candidates, n_hit,
       {_r6('n_hit / n_true')} AS recall,
       {_r6('n_hit / n_candidates')} AS precision
FROM a
"""


def hard_negatives_sql(query_mod: int = 50, k: int = 5) -> str:
    """Twin of operators.similarity.hard_negatives — same anchor set, same
    label-inequality pairing, same tie-breaks."""
    dot = _DOT.format(a="n.v", b="q.qv")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
          WHERE vec_id IS NOT NULL AND {_FINITE_VEC}),
n AS (SELECT * FROM (SELECT vec_id, v, label,
             sqrt({_DOT.format(a='v', b='v')}) AS nrm FROM e) WHERE nrm > 0),
q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn, label AS qlab
      FROM n WHERE vec_id % {query_mod} = 0),
s AS (
  SELECT q.qid, n.vec_id, n.label,
         {_r6(f'({dot}) / (n.nrm * q.qn)')} AS score
  FROM n, q WHERE n.label <> q.qlab
),
r AS (
  SELECT qid, vec_id, label, score,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC) AS rnk
  FROM s
)
SELECT qid AS anchor_id, vec_id AS negative_id, label AS negative_label,
       rnk::INT AS rank, score
FROM r WHERE rnk <= {k}
"""


def cluster_quality_sql(centroid_mod: int = 25) -> str:
    """Twin of operators.corpus.cluster_quality_report — text stats joined
    to the deterministic cluster assignment; means via oracle._dsum."""
    from billing_etl_v1_spark.oracle import _dsum

    cdot = _DOT.format(a="n.v", b="c.cv")
    return f"""
WITH s AS (
  SELECT doc_id, quality_score, token_count FROM ({text_stats_sql()})
),
{_norms_cte()},
cents AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id % {centroid_mod} = 0),
asg0 AS (
  SELECT n.vec_id AS vid, c.cid,
         row_number() OVER (
           PARTITION BY n.vec_id
           ORDER BY {_r6(f'({cdot}) / (n.nrm * c.cn)')} DESC, c.cid ASC
         ) AS crk
  FROM n, cents c
),
asg AS (SELECT vid, cid AS cluster FROM asg0 WHERE crk = 1),
j AS (
  SELECT s.quality_score, s.token_count, a.cluster
  FROM s JOIN asg a ON s.doc_id = a.vid
)
SELECT cluster,
  CAST(count(*) AS BIGINT) AS n_docs,
  {_r6(f'({_dsum("quality_score")}) / count(*)')} AS mean_quality,
  {_r6('CAST(sum(token_count) AS DOUBLE) / count(*)')} AS mean_tokens,
  {_r6('min(quality_score)')} AS min_quality
FROM j GROUP BY cluster
"""


def semantic_dedup_sql(centroid_mod: int = 25, threshold: float = 0.35) -> str:
    """Twin of operators.dedup.semantic_dedup — same deterministic cluster
    assignment as sim_topk_ivf_sql, same within-cluster smaller-id
    duplicate rule."""
    cdot = _DOT.format(a="n.v", b="c.cv")
    pdot = _DOT.format(a="a.v", b="b.v")
    cos = _r6(f"({pdot}) / (a.nrm * b.nrm)")
    return f"""
WITH {_norms_cte()},
cents AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id % {centroid_mod} = 0),
asg0 AS (
  SELECT n.vec_id AS vid, n.v, n.nrm, c.cid,
         row_number() OVER (
           PARTITION BY n.vec_id
           ORDER BY {_r6(f'({cdot}) / (n.nrm * c.cn)')} DESC, c.cid ASC
         ) AS crk
  FROM n, cents c
),
asg AS (SELECT vid, v, nrm, cid AS cluster FROM asg0 WHERE crk = 1),
edges AS (
  SELECT b.vid, {cos} AS cosine
  FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.vid < b.vid
  WHERE {cos} >= {threshold}
),
hits AS (
  SELECT vid, CAST(count(*) AS BIGINT) AS n_dups, {_r6('max(cosine)')} AS max_dup_sim
  FROM edges GROUP BY vid
)
SELECT asg.vid AS vec_id, asg.cluster,
       CAST(coalesce(h.n_dups, 0) AS BIGINT) AS n_dups,
       coalesce(h.max_dup_sim, 0.0) AS max_dup_sim,
       coalesce(h.n_dups, 0) = 0 AS is_kept
FROM asg LEFT JOIN hits h USING (vid)
"""


def kmeans_refine_sql(centroid_mod: int = 25, iters: int = 2) -> str:
    """Twin of operators.similarity.kmeans_refine — the same Lloyd rounds
    UNROLLED as chained CTEs. Centroid means go through oracle._dsum (the
    exact_sum twin), so every float in every round is bit-identical."""
    from billing_etl_v1_spark.oracle import _dsum

    def assign(cte: str, cents: str) -> str:
        dot = _DOT.format(a="n.v", b="c.cv")
        return f"""{cte}0 AS (
  SELECT n.vec_id AS vid, c.cid,
         {_r6(f'({dot}) / (n.nrm * c.cn)')} AS csim
  FROM n, {cents} c
),
{cte} AS (
  SELECT vid, cid, csim FROM (
    SELECT *, row_number() OVER (PARTITION BY vid ORDER BY csim DESC, cid ASC) AS crk
    FROM {cte}0
  ) WHERE crk = 1
)"""

    self_dot = _DOT.format(a="cv", b="cv")
    parts = [
        _norms_cte().strip(),
        f"c0 AS (SELECT vec_id AS cid, v AS cv, sqrt({_DOT.format(a='v', b='v')}) AS cn "
        f"FROM n WHERE vec_id % {centroid_mod} = 0)",
    ]
    for i in range(iters):
        parts.append(assign(f"a{i}", f"c{i}"))
        parts.append(
            f"""m{i} AS (
  SELECT a.cid, u.i AS pos,
         ({_dsum('n.v[u.i + 1]')}) / count(*) AS m
  FROM a{i} a JOIN n ON a.vid = n.vec_id, unnest(range(0, len(n.v))) u(i)
  GROUP BY a.cid, u.i
),
arr{i} AS (SELECT cid, list(m ORDER BY pos) AS cv FROM m{i} GROUP BY cid),
c{i + 1} AS (SELECT * FROM (SELECT cid, cv, sqrt({self_dot}) AS cn FROM arr{i})
             WHERE cn > 0)"""
        )
    parts.append(assign(f"a{iters}", f"c{iters}"))
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT vid AS vec_id, cid AS cluster, csim AS sim FROM a{iters}
"""


def events_window_sql(width_s: int = 300) -> str:
    return f"""
SELECT (floor(epoch(ts) / {width_s}) * {width_s})::BIGINT AS bucket_start_s,
       event_type,
       count(*) AS n_events,
       {_r6('sum(value)')} AS total_value
FROM {_EVF}
GROUP BY 1, 2
"""


def sessionize_sql(gap_s: int = 1800) -> str:
    return f"""
WITH e AS (SELECT event_id, user_id, ts, value, floor(epoch(ts))::BIGINT AS ep FROM {_EVF}
           WHERE ts IS NOT NULL),
m AS (
  SELECT *, CASE WHEN lag(ep) OVER w IS NULL OR ep - lag(ep) OVER w > {gap_s}
                 THEN 1 ELSE 0 END AS ns
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM m
)
SELECT user_id, session_idx::BIGINT AS session_idx,
       count(*) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end,
       {_r6('sum(value)')} AS total_value,
       {_r6('(floor(epoch(max(ts))) - floor(epoch(min(ts))))::DOUBLE')} AS duration_s
FROM s GROUP BY user_id, session_idx
"""


def top_event_types_sql(k: int = 3) -> str:
    return f"""
WITH a AS (
  SELECT user_id, event_type, {_r6('sum(value)')} AS total_value
  FROM {_EVF} GROUP BY 1, 2
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY total_value DESC, event_type ASC) AS rnk
  FROM a
)
SELECT user_id, event_type, total_value, rnk::INT AS rank FROM r WHERE rnk <= {k}
"""


def asof_purchase_sql() -> str:
    # DuckDB native ASOF JOIN as the oracle for the union-trick operator
    return f"""
WITH l AS (SELECT event_id, user_id, ts FROM {_EVF}
  -- ts IS NOT NULL mirrors the operator: a NULL-ts probe has no
  -- as-of point (DuckDB's ASOF would match it to the LATEST row)
  WHERE event_type = 'click' AND ts IS NOT NULL AND user_id IS NOT NULL),
r AS (
  SELECT user_id, ts, max(value) AS purchase_value
  FROM {_EVF} WHERE event_type = 'purchase' AND value IS NOT NULL
    AND ts IS NOT NULL AND user_id IS NOT NULL GROUP BY 1, 2
)
SELECT l.event_id, l.user_id, l.ts, r.purchase_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def json_props_sql() -> str:
    # TRY_CAST(props AS JSON) NULLs malformed documents (json_extract_string
    # ERRORS on them); the integral-format regex gate + TRY_CAST mirrors the
    # Spark side exactly — without the gate DuckDB ROUNDS '3.7'::INTEGER to
    # 4 while Spark's try_cast NULLs it
    k = (
        "TRY_CAST(CASE WHEN regexp_matches("
        "json_extract_string(TRY_CAST(props AS JSON), '$.k'), '^-?[0-9]+$') "
        "THEN json_extract_string(TRY_CAST(props AS JSON), '$.k') END "
        "AS INTEGER)"
    )
    return f"""
SELECT event_type,
       count(*) AS n_events,
       sum({k})::BIGINT AS sum_k,
       min({k}) AS min_k,
       max({k}) AS max_k
FROM events GROUP BY event_type
"""


def tpch_q1_sql() -> str:
    # exact (hi, lo) BIGINT-pair accumulation (oracle._dsum): associative,
    # so partition order cannot perturb the 6th decimal — mirrors
    # plans.examples.pricing_summary's functions.exact_sum formula-for-formula
    from billing_etl_v1_spark.oracle import _dsum

    sq = _dsum("l_quantity")
    sb = _dsum("l_extendedprice")
    sd = _dsum("(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount))")
    sdisc = _dsum("l_discount")
    return f"""
SELECT l_returnflag, l_linestatus,
  {_r6(sq)} AS sum_qty,
  {_r6(sb)} AS sum_base_price,
  {_r6(sd)} AS sum_disc_price,
  {_r6(f'({sq}) / count(*)')} AS avg_qty,
  {_r6(f'({sdisc}) / count(*)')} AS avg_disc,
  count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def top_customers_sql(k: int = 5) -> str:
    return f"""
WITH rev AS (
  SELECT n.n_name, c.c_custkey, c.c_name, {_r6('sum(o.o_totalprice)')} AS revenue
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2, 3
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY n_name
                               ORDER BY revenue DESC, c_custkey ASC) AS rnk
  FROM rev
)
SELECT n_name, c_custkey, c_name, revenue, rnk::INT AS rank FROM r WHERE rnk <= {k}
"""


def hash_sample_sql(fraction: float = 0.1, salt: str = "sample") -> str:
    """Twin of operators.corpus.hash_sample: salted md5-bucket sampling is
    layout-independent, so both engines select the identical row set."""
    bucket = _md5int("CAST(doc_id AS VARCHAR)", salt=salt)
    return f"""
SELECT doc_id, text, lang, source, n_chars
FROM documents
WHERE ({bucket}) % 1000000 < {int(fraction * 1_000_000)}
"""


def quality_corpus_sql(
    min_tokens: int = 30,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en", "de", "fr", "es"),
) -> str:
    """Twin of operators.corpus.quality_corpus: stats -> quality/lang gate ->
    exact dedup on the normalized-text fingerprint (min doc_id survives).
    quality_score is quantized BEFORE the gate, exactly like the Spark side
    (text_stats emits the quantized column)."""
    stop = _sql_list(QUALITY_STOPWORDS)
    scores = ",\n    ".join(
        f"len(list_filter({_TOKENS}, x -> list_contains({_sql_list(sw)}, x))) AS s_{lang}"
        for lang, sw in LANG_STOPWORDS.items()
    )
    lang_codes = sorted(LANG_STOPWORDS)
    best = "greatest(" + ", ".join(f"s_{lg}" for lg in lang_codes) + ")"
    whens = "\n      ".join(f"WHEN s_{lg} = {best} THEN '{lg}'" for lg in lang_codes)
    quality = _r6(
        "least(1.0, token_count / 100.0) * (1.0 - least(1.0, 4.0 * punct))"
        " * (1.0 - least(1.0, 4.0 * digit))"
    )
    in_langs = ", ".join(f"'{lg}'" for lg in langs)
    return f"""
WITH t AS (
  SELECT doc_id, text, lang,
    CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_TOKENS}) END AS token_count,
    len(regexp_extract_all(text, '{BPE_TOKEN_RE}'))::INT AS bpe_token_count,
    CASE WHEN length(text) = 0 THEN 0.0
         ELSE (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE / length(text) END AS punct,
    CASE WHEN length(text) = 0 THEN 0.0
         ELSE (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE / length(text) END AS digit,
    len(list_filter({_TOKENS}, x -> list_contains({stop}, x))) AS stop_hits,
    {scores}
  -- doc_id IS NOT NULL mirrors the Spark side: the dedup window orders by
  -- doc_id and the engines disagree on where NULL sorts
  FROM documents WHERE doc_id IS NOT NULL
),
scored AS (
  SELECT doc_id, text, lang, token_count, bpe_token_count,
    {quality} AS quality_score,
    CASE WHEN {best} = 0 THEN 'und'
      {whens}
      ELSE 'und' END AS lang_pred
  FROM t
),
kept AS (
  SELECT *, {_md5int(_NORM)} AS fp
  FROM scored
  WHERE token_count >= {min_tokens}
    AND quality_score >= {min_quality}
    AND lang_pred IN ({in_langs})
),
d AS (
  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id ASC) AS rn FROM kept
)
SELECT doc_id, lang, lang_pred, token_count::INT AS token_count,
       bpe_token_count, quality_score, text
FROM d WHERE rn = 1
"""


def tpch_q3_sql(segment: str = "BUILDING", cutoff: str = "1996-07-01", k: int = 10) -> str:
    """Twin of plans.examples.shipping_priority — DECIMAL revenue so the
    top-k row SET is exact and identical across engines."""
    rev = "CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(38,10))"
    return f"""
WITH rev AS (
  SELECT l_orderkey, o_orderdate, o_orderpriority, sum({rev}) AS r
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = '{segment}'
    AND o_orderdate < TIMESTAMP '{cutoff}'
    AND l_shipdate > TIMESTAMP '{cutoff}'
  GROUP BY l_orderkey, o_orderdate, o_orderpriority
)
SELECT l_orderkey, o_orderdate, o_orderpriority, {_r6('CAST(r AS DOUBLE)')} AS revenue
FROM rev ORDER BY r DESC, l_orderkey ASC LIMIT {k}
"""


def tpch_q5_sql(
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> str:
    """Twin of plans.examples.local_supplier_volume (TPC-H Q5 shape)."""
    rev = "CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(38,10))"
    return f"""
SELECT n_name, {_r6(f'CAST(sum({rev}) AS DOUBLE)')} AS revenue
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{region_name}'
  AND o_orderdate >= TIMESTAMP '{date_from}'
  AND o_orderdate < TIMESTAMP '{date_to}'
GROUP BY n_name
"""


def user_value_trend_sql(min_points: int = 2) -> str:
    """Twin of operators.timeseries.user_value_trend — the same exact-
    integer regression sums (x = epoch-days, y in floor(v*1e6+0.5) micro-
    units) and the same double closed form. Integer accumulation is the
    point: double→decimal casts of PRODUCTS diverge between engines at the
    10th decimal (shortest-repr vs exact-binary rounding), integer sums
    cannot."""
    x = "floor(floor(epoch(ts)) / 86400)::BIGINT"
    yk = "floor(value * 1000000.0 + 0.5)::BIGINT"
    return f"""
WITH s AS (
  SELECT user_id, count(*) AS n_events,
    sum({x}) AS sx,
    sum({yk}) AS syk,
    sum({x} * {yk}) AS sxyk,
    sum({x} * {x}) AS sxx
  -- NULL value (corrupt, guarded to NULL) or NULL ts rows leave ALL sums:
  -- mirrored Spark-side — partial per-column NULL-skipping would fit
  -- mismatched sums
  FROM {_EVF} WHERE value IS NOT NULL AND ts IS NOT NULL GROUP BY user_id
),
d AS (
  SELECT user_id, n_events,
    n_events::DOUBLE AS n, sx::DOUBLE AS sxd,
    syk::DOUBLE / 1000000.0 AS syd,
    sxyk::DOUBLE / 1000000.0 AS sxyd, sxx::DOUBLE AS sxxd
  FROM s
),
f AS (
  SELECT *, n * sxxd - sxd * sxd AS denom,
         (n * sxyd - sxd * syd) / (n * sxxd - sxd * sxd) AS slope
  FROM d WHERE n_events >= {min_points} AND n * sxxd - sxd * sxd <> 0
)
SELECT user_id, n_events,
  {_r6('slope')} AS slope_per_day,
  {_r6('(syd - slope * sxd) / n')} AS intercept,
  {_r6('syd / n')} AS mean_value
FROM f
"""


def purchase_attribution_sql(
    lookback_s: int = 3600, touch_types: tuple[str, ...] = ("click", "view")
) -> str:
    """Twin of operators.events.purchase_attribution — same range band,
    same (epoch_us, event_id) struct-max last-touch tiebreak."""
    in_list = ", ".join(f"'{t}'" for t in touch_types)
    counts = ",\n  ".join(
        f"CAST(sum(CASE WHEN t_type = '{tt}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{tt}"
        for tt in touch_types
    )
    return f"""
WITH p AS (
  SELECT event_id AS p_eid, user_id, epoch_us(ts) AS p_us,
         CAST(round(value * 100) AS BIGINT) AS purchase_cents
  FROM {_EVF} WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, event_id AS t_eid, epoch_us(ts) AS t_us, event_type AS t_type
  FROM {_EVF} WHERE event_type IN ({in_list})
),
j AS (
  SELECT p.p_eid, p.user_id, p.purchase_cents, t.t_eid, t.t_us, t.t_type
  FROM p LEFT JOIN t
    ON p.user_id = t.user_id
   AND t.t_us < p.p_us
   AND t.t_us >= p.p_us - {lookback_s * 1_000_000}
)
SELECT p_eid AS event_id, user_id, purchase_cents,
  CAST(count(t_eid) AS BIGINT) AS n_touches,
  {counts},
  CASE WHEN count(t_eid) > 0
       THEN (max(struct_pack(a := t_us, b := t_eid, c := t_type))).c
  END AS last_touch_type
FROM j GROUP BY p_eid, user_id, purchase_cents
"""


def gap_regularity_sql(
    min_gaps: int = 10, rel_var_num: int = 7, rel_var_den: int = 10
) -> str:
    """Twin of operators.events.gap_regularity_flags — same integer-second
    gaps and division-free relative-variance test."""
    return f"""
WITH g AS (
  SELECT user_id,
         floor(epoch(ts))::BIGINT
           - lag(floor(epoch(ts))::BIGINT)
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
),
a AS (
  SELECT user_id,
         CAST(count(gap) AS BIGINT) AS n_gaps,
         CAST(sum(gap) AS BIGINT) AS s,
         CAST(sum(gap * gap) AS BIGINT) AS ss
  FROM g WHERE gap IS NOT NULL GROUP BY user_id
)
SELECT user_id, n_gaps,
       {_r6('s / n_gaps')} AS mean_gap_s,
       (n_gaps >= {min_gaps} AND s > 0
        AND (n_gaps * ss - s * s) * {rel_var_den} < s * s * {rel_var_num})
         AS is_regular
FROM a
"""


def rfm_segments_sql(recent_days: int = 1, frequent_n: int = 14) -> str:
    """Twin of operators.events.rfm_segments — same corpus-max reference
    date, integer cents, and fixed segment thresholds."""
    rec = "CAST(floor((ref_us - last_us) / 86400000000.0) AS INT)"
    return f"""
WITH ref AS (SELECT max(epoch_us(ts)) AS ref_us FROM {_EVF}),
u AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS last_us,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS frequency,
         CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                                THEN CAST(round(value * 100) AS BIGINT) END), 0)
              AS BIGINT) AS monetary_cents
  FROM {_EVF} GROUP BY user_id
)
SELECT user_id,
  CASE WHEN frequency > 0 THEN {rec} END AS recency_days,
  frequency, monetary_cents,
  CASE WHEN frequency = 0 THEN 'none'
       WHEN {rec} <= {recent_days} AND frequency >= {frequent_n} THEN 'champion'
       WHEN {rec} <= {recent_days} THEN 'recent'
       WHEN frequency >= {frequent_n} THEN 'frequent'
       ELSE 'lapsed' END AS segment
FROM u, ref
"""


def key_skew_report_sql(top_k: int = 10) -> str:
    """Twin of operators.skew.key_skew_report — plain-window rank (oracle
    scale), same integer-exact share/skew arithmetic."""
    return f"""
WITH c AS (
  SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n_rows
  FROM events GROUP BY user_id
),
s AS (SELECT max(n_rows) AS mx, sum(n_rows) AS tot, count(*) AS nk FROM c),
r AS (
  SELECT key, n_rows,
         CAST(row_number() OVER (ORDER BY n_rows DESC, key) AS INT) AS rank
  FROM c
)
SELECT key, n_rows, rank,
       {_r6('n_rows / tot')} AS share,
       {_r6('mx * nk / tot')} AS skew_factor
FROM r, s WHERE rank <= {top_k}
"""


def hll_daily_merge_sql() -> str:
    """Twin of operators.timeseries.hll_daily_merge: exact distinct counts
    plus literal TRUE flags — the bounds-checked contract of
    approx_stats_checked (DuckDB cannot reproduce DataSketches registers;
    it CAN verify the exact truth and the documented invariants)."""
    return """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE AS merged_equals_direct,
       TRUE AS within_tol
FROM events WHERE event_type IS NOT NULL GROUP BY event_type
"""


def event_transitions_sql() -> str:
    """Twin of operators.events.event_transitions — same lead window over
    the (ts, event_id) total order, same count/total division."""
    return f"""
WITH nxt AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events WHERE ts IS NOT NULL
),
c AS (
  SELECT event_type AS from_type, next_type AS to_type,
         CAST(count(*) AS BIGINT) AS n_transitions
  FROM nxt WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
),
t AS (
  SELECT from_type, CAST(sum(n_transitions) AS BIGINT) AS tot
  FROM c GROUP BY from_type
)
SELECT c.from_type, c.to_type, c.n_transitions,
       {_r6('c.n_transitions / t.tot')} AS prob
FROM c JOIN t USING (from_type)
"""


def daily_anomaly_sql(window_days: int = 7, min_days: int = 4, z2: int = 9) -> str:
    """Twin of operators.timeseries.daily_anomaly_flags — same integer-cent
    series, same division-free z² test; HUGEINT products here mirror
    Spark's DECIMAL(38,0) products (both exact)."""
    dev = "(base_days::HUGEINT * v_cents::HUGEINT - s)"
    return f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v_cents
  FROM {_EVF} WHERE ts IS NOT NULL GROUP BY event_type, CAST(ts AS DATE)
),
w AS (
  SELECT event_type, day, n_events, v_cents,
    CAST(count(v_cents) OVER win AS BIGINT) AS base_days,
    CAST(sum(v_cents) OVER win AS HUGEINT) AS s,
    CAST(sum(v_cents::HUGEINT * v_cents::HUGEINT) OVER win AS HUGEINT) AS ss
  FROM daily
  WINDOW win AS (
    PARTITION BY event_type ORDER BY day
    ROWS BETWEEN {window_days} PRECEDING AND 1 PRECEDING
  )
)
SELECT event_type, day, n_events, v_cents, base_days,
  (base_days >= {min_days} AND {dev} > 0
   AND {dev} * {dev} > {z2} * (base_days::HUGEINT * ss - s * s)) AS is_spike
FROM w
"""


def event_type_pivot_sql(types: tuple[str, ...] = ("click", "view", "purchase", "signup", "error")) -> str:
    """Twin of operators.events.event_type_pivot — the pivot as explicit
    CASE aggregates."""
    cols = []
    for t in types:
        cols.append(f"sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)::BIGINT AS n_{t}")
        v = f"sum(CASE WHEN event_type = '{t}' THEN CAST(value AS DECIMAL(38,10)) ELSE CAST(0 AS DECIMAL(38,10)) END)"
        cols.append(f"{_r6(f'CAST({v} AS DOUBLE)')} AS v_{t}")
    sel = ",\n  ".join(cols)
    return f"""
SELECT user_id,
  {sel}
FROM {_EVF} GROUP BY user_id
"""


def value_deciles_sql() -> str:
    """Twin of operators.events.value_deciles — same deterministic
    (value, event_id) total order under ntile(10)."""
    return f"""
WITH d AS (
  SELECT value, ntile(10) OVER (ORDER BY value ASC, event_id ASC) AS decile
  FROM {_EVF} WHERE value IS NOT NULL
)
SELECT decile::INT AS decile, count(*) AS n_events,
  {_r6('min(value)')} AS min_value,
  {_r6('max(value)')} AS max_value,
  {_r6('CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE)')} AS total_value
FROM d GROUP BY decile
"""


def pii_scrub_sql() -> str:
    """Twin of operators.corpus.pii_scrub — same patterns; DuckDB needs the
    'g' flag to match Spark's replace-all semantics."""
    from billing_etl_v1_spark.operators.corpus import EMAIL_RE, PHONE_RE

    email = EMAIL_RE.replace("'", "''")
    phone = PHONE_RE.replace("'", "''")
    return f"""
WITH s AS (
  SELECT doc_id,
    len(regexp_extract_all(text, '{email}'))::INT AS n_emails,
    regexp_replace(text, '{email}', '<EMAIL>', 'g') AS t1
  FROM documents
)
SELECT doc_id, n_emails,
  len(regexp_extract_all(t1, '{phone}'))::INT AS n_phones,
  regexp_replace(t1, '{phone}', '<PHONE>', 'g') AS scrubbed_text
FROM s
"""


def salted_user_join_sql() -> str:
    """Twin of operators.skew.user_activity_enriched — the salted join is
    row-identical to the PLAIN join, so the oracle is the plain join (that
    equality is exactly what the check proves)."""
    return f"""
WITH u AS (
  SELECT user_id, count(*) AS user_events,
         sum(CAST(value AS DECIMAL(38,10))) AS tv
  FROM {_EVF} GROUP BY user_id
)
SELECT event_id, e.user_id, event_type, {_r6('value')} AS value,
       user_events, {_r6('CAST(tv AS DOUBLE)')} AS user_total_value
FROM {_EVF} e JOIN u USING (user_id)
"""


def top_ngrams_sql(k: int = 20) -> str:
    """Twin of operators.text.top_ngrams — DuckDB lists are 1-based like
    Spark's element_at, so the bigram construction matches index-for-index."""
    return f"""
WITH toks AS (SELECT {_TOKENS} AS t FROM documents),
grams AS (
  SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS ngram
  FROM toks WHERE len(t) >= 2
)
SELECT ngram, count(*) AS n FROM grams
GROUP BY ngram ORDER BY n DESC, ngram ASC LIMIT {k}
"""


def _grams_expr(n: int) -> str:
    """DuckDB word n-grams over token list ``t`` — 1-based inclusive list
    slicing t[i:i+n-1] matches Spark's slice(toks, i, n) index-for-index;
    range(1, len-n+2) is end-exclusive like sequence(1, len-n+1)."""
    return (
        f"list_transform(range(1, len(t) - {n} + 2),"
        f" i -> array_to_string(t[i:i+{n - 1}], ' '))"
    )


def repetition_stats_sql() -> str:
    """Twin of operators.text.repetition_stats — same token split, same
    1 − distinct/total duplicate fractions, same gate thresholds."""

    def dup(grams: str) -> str:
        return (
            f"CASE WHEN len({grams}) <= 0 THEN 0.0 "
            f"ELSE 1.0 - len(list_distinct({grams}))::DOUBLE / len({grams})::DOUBLE END"
        )

    g2, g3 = _grams_expr(2), _grams_expr(3)
    return f"""
WITH toks AS (SELECT doc_id, lang, source, text, {_TOKENS} AS t FROM documents),
g AS (
  SELECT doc_id, lang, source,
    CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(t) END AS n_tokens,
    {_r6(dup('t'))} AS dup_word_frac,
    {_r6(dup(f"CASE WHEN len(t) >= 2 THEN {g2} ELSE [] END"))} AS dup_2gram_frac,
    {_r6(dup(f"CASE WHEN len(t) >= 3 THEN {g3} ELSE [] END"))} AS dup_3gram_frac
  FROM toks
)
SELECT doc_id, lang, source, n_tokens, dup_word_frac, dup_2gram_frac, dup_3gram_frac,
       (dup_3gram_frac > 0.2 OR dup_word_frac > 0.9) AS is_repetitive
FROM g
"""


def bigram_fluency_sql() -> str:
    """Twin of operators.text.bigram_fluency — same bigram construction,
    exact integer counts, double division (no log: libm last-ulp drift)."""
    g2 = _grams_expr(2)
    return f"""
WITH toks AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
grams AS (
  SELECT doc_id, unnest({g2}) AS gram FROM toks WHERE len(t) >= 2
),
counts AS (SELECT gram, count(*) AS freq FROM grams GROUP BY gram),
scored AS (
  SELECT g.doc_id,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         sum(c.freq) AS sum_freq,
         sum(CASE WHEN c.freq = 1 THEN 1 ELSE 0 END) AS hapax
  FROM grams g JOIN counts c USING (gram)
  GROUP BY g.doc_id
)
SELECT d.doc_id, d.lang, d.source,
       CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       {_r6("coalesce(s.sum_freq / s.n_bigrams, 0.0)")} AS avg_bigram_freq,
       {_r6("coalesce(s.hapax / s.n_bigrams, 0.0)")} AS hapax_frac
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


def winnow_fingerprints_sql(k: int = 8, window: int = 4) -> str:
    """Twin of operators.text.winnow_fingerprints — same normalization,
    same Karp-Rabin polynomial k-gram hashes (Horner over codepoints mod a
    < 2^40 prime: exact BIGINT arithmetic in both engines), same window
    minima."""
    from billing_etl_v1_spark.operators.text import WINNOW_BASE, WINNOW_MOD

    h = f"(codes[i] % {WINNOW_MOD})"
    for j in range(1, k):
        h = f"(({h}) * {WINNOW_BASE} + codes[i + {j}]) % {WINNOW_MOD}"
    return f"""
WITH norm AS (
  SELECT doc_id, regexp_replace(trim(lower(text)), '{WS_RE}', ' ', 'g') AS n
  FROM documents
),
coded AS (
  SELECT doc_id, length(n) AS ln,
         list_transform(string_split(n, ''), c -> unicode(c)) AS codes
  FROM norm WHERE length(n) >= {k}
),
hashed AS (
  SELECT doc_id,
         list_transform(range(1, ln - {k} + 2), i -> {h}) AS hs
  FROM coded
),
fps AS (
  SELECT doc_id,
         CASE WHEN len(hs) >= {window}
              THEN list_distinct(list_transform(
                     range(1, len(hs) - {window} + 2),
                     j -> list_min(hs[j:j + {window - 1}])))
              ELSE [list_min(hs)] END AS f
  FROM hashed
)
SELECT doc_id, unnest(f) AS fingerprint FROM fps
"""


def chunk_documents_sql(chunk_tokens: int = 32, stride: int = 24) -> str:
    """Twin of operators.text.chunk_documents — range(1, len+1, stride) is
    end-exclusive so it matches Spark's inclusive sequence(1, len, stride);
    1-based inclusive slice t[s:s+chunk-1] truncates at the tail exactly
    like Spark's slice(toks, s, chunk)."""
    return f"""
WITH toks AS (
  -- doc_id IS NOT NULL mirrors the Spark side's NULL-key exclusion (its
  -- chunk reassembly groups by doc_id; this per-row form never merges,
  -- so the filter exists purely to keep the twins row-identical)
  SELECT doc_id, {_TOKENS} AS t FROM documents
  WHERE length(trim(text)) > 0 AND doc_id IS NOT NULL
),
starts AS (
  SELECT doc_id, t, unnest(range(1, len(t) + 1, {stride})) AS s FROM toks
)
SELECT doc_id,
       CAST((s - 1) / {stride} AS INT) AS chunk_idx,
       CAST(len(t[s:s + {chunk_tokens - 1}]) AS BIGINT) AS n_chunk_tokens,
       array_to_string(t[s:s + {chunk_tokens - 1}], ' ') AS chunk_text
FROM starts
"""


def decontaminate_sql(n: int = 5, eval_mod: int = 97) -> str:
    """Twin of operators.text.decontaminate — same eval slice, same n-gram
    construction, distinct-overlap count per non-eval doc."""
    g = _grams_expr(n)
    return f"""
WITH toks AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
grams AS (
  SELECT doc_id, unnest({g}) AS gram FROM toks WHERE len(t) >= {n}
),
eval_grams AS (SELECT DISTINCT gram FROM grams WHERE doc_id % {eval_mod} = 0),
hits AS (
  SELECT g.doc_id, CAST(count(DISTINCT g.gram) AS BIGINT) AS n_overlap_grams
  FROM grams g JOIN eval_grams e USING (gram)
  WHERE g.doc_id % {eval_mod} <> 0
  GROUP BY g.doc_id
)
SELECT d.doc_id, d.lang, d.source,
       CAST(coalesce(h.n_overlap_grams, 0) AS BIGINT) AS n_overlap_grams,
       coalesce(h.n_overlap_grams, 0) > 0 AS is_contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % {eval_mod} <> 0
"""


def tfidf_top_terms_sql(k: int = 3) -> str:
    """Twin of operators.text.tfidf_top_terms — same rational idf form and
    the same left-associative tf * (N+1.0) / (df+1.0) double arithmetic."""
    return f"""
WITH terms AS (
  SELECT doc_id, unnest({_TOKENS}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM terms WHERE term <> '' GROUP BY 1, 2
),
docfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT doc_id, term, tf, df, tf * (n + 1.0) / (df + 1.0) AS score
  FROM tf JOIN docfreq USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term ASC) AS rnk
  FROM scored
)
SELECT doc_id, term, tf, df, {_r6('score')} AS score, rnk::INT AS rank
FROM ranked WHERE rnk <= {k}
"""


def tpch_q6_sql(
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> str:
    """Twin of plans.examples.forecast_revenue_change (TPC-H Q6 shape)."""
    rev = "CAST(l_extendedprice * l_discount AS DECIMAL(38,10))"
    return f"""
SELECT {_r6(f'CAST(sum({rev}) AS DOUBLE)')} AS revenue, count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{date_from}' AND l_shipdate < TIMESTAMP '{date_to}'
  AND l_discount BETWEEN {disc_lo} AND {disc_hi} AND l_quantity < {max_qty}
"""


def tpch_q4_sql(
    date_from: str = "1996-01-01", date_to: str = "1996-07-01", grace_days: int = 90
) -> str:
    """Twin of plans.examples.late_shipment_priority (TPC-H Q4 shape)."""
    return f"""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '{date_from}' AND o_orderdate < TIMESTAMP '{date_to}'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL {grace_days} DAY)
GROUP BY o_orderpriority
"""


def tpch_q10_sql(
    date_from: str = "1996-01-01", date_to: str = "1996-04-01", k: int = 20
) -> str:
    """Twin of plans.examples.returned_item_revenue (TPC-H Q10 shape)."""
    rev = "CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(38,10))"
    return f"""
WITH rev AS (
  SELECT c_custkey, c_name, c_acctbal, n_name, sum({rev}) AS r
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '{date_from}' AND o_orderdate < TIMESTAMP '{date_to}'
  GROUP BY 1, 2, 3, 4
)
SELECT c_custkey, c_name, {_r6('c_acctbal')} AS c_acctbal, n_name,
       {_r6('CAST(r AS DOUBLE)')} AS revenue
FROM rev ORDER BY r DESC, c_custkey ASC LIMIT {k}
"""


def tpch_q12_sql(grace_days: int = 60) -> str:
    """Twin of plans.examples.priority_shipping_mix (TPC-H Q12 shape)."""
    from billing_etl_v1_spark.plans.examples import HIGH_PRIORITIES

    high = ", ".join(f"'{p}'" for p in HIGH_PRIORITIES)
    return f"""
SELECT year(l_shipdate)::INT AS ship_year,
  sum(CASE WHEN o_orderpriority IN ({high}) THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
  sum(CASE WHEN o_orderpriority IN ({high}) THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM orders JOIN lineitem
  ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL {grace_days} DAY
GROUP BY 1
"""


def tpch_q14_sql(
    date_from: str = "1996-01-01", date_to: str = "1997-01-01", promo_type: str = "PROMO"
) -> str:
    """Twin of plans.examples.promo_revenue_share (TPC-H Q14 shape)."""
    rev = "CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(38,10))"
    return f"""
WITH agg AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
    sum(CASE WHEN p_type = '{promo_type}' THEN {rev} ELSE CAST(0 AS DECIMAL(38,10)) END) AS promo,
    sum({rev}) AS total
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{date_from}' AND l_shipdate < TIMESTAMP '{date_to}'
  GROUP BY 1
)
SELECT ship_month,
  {_r6('CAST(100.0 AS DOUBLE) * CAST(promo AS DOUBLE) / CAST(total AS DOUBLE)')} AS promo_revenue_pct,
  {_r6('CAST(total AS DOUBLE)')} AS total_revenue
FROM agg
"""


def tpch_q16_sql() -> str:
    """Twin of plans.examples.supplier_part_diversity (TPC-H Q16 shape,
    lineitem standing in for the absent partsupp association)."""
    return """
SELECT p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_type, p_size
"""


def tpch_q18_sql(min_qty: float = 200.0) -> str:
    """Twin of plans.examples.large_volume_customers (TPC-H Q18 shape)."""
    return f"""
WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(38,10))) AS qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(38,10))) > CAST({min_qty} AS DECIMAL(38,10))
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       {_r6('o_totalprice')} AS o_totalprice,
       {_r6('CAST(qty AS DOUBLE)')} AS total_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def tpch_q19_sql() -> str:
    """Twin of plans.examples.brand_quantity_revenue (TPC-H Q19 shape)."""
    from billing_etl_v1_spark.plans.examples import BRAND_QTY_BANDS

    disj = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN {szlo} AND {szhi}"
        f" AND l_quantity BETWEEN {qlo} AND {qhi})"
        for b, szlo, szhi, qlo, qhi in BRAND_QTY_BANDS
    )
    rev = "CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(38,10))"
    return f"""
SELECT p_brand, {_r6(f'CAST(sum({rev}) AS DOUBLE)')} AS revenue, count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {disj}
GROUP BY p_brand
"""


def tpch_q22_sql(cutoff: str = "2000-01-01") -> str:
    """Twin of plans.examples.idle_rich_customers (TPC-H Q22 shape). The
    above-average test is cross-multiplied (bal × n > total) with an exact
    DECIMAL total, so no decimal-division rounding differs between engines."""
    return f"""
WITH pos AS (
  SELECT sum(CAST(c_acctbal AS DECIMAL(38,10))) AS total, count(*) AS n
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment, count(*) AS n_customers,
       {_r6('CAST(sum(CAST(c_acctbal AS DECIMAL(38,10))) AS DOUBLE)')} AS total_acctbal
FROM customer, pos
WHERE CAST(c_acctbal AS DECIMAL(38,10)) * n > total
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{cutoff}')
GROUP BY c_mktsegment
"""


def tpch_q7_sql(nation_a: str = "NATION_1", nation_b: str = "NATION_2") -> str:
    """Twin of plans.examples.nation_trade_volume (TPC-H Q7 shape)."""
    rev = "CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(38,10))"
    return f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       year(l_shipdate)::INT AS ship_year,
       {_r6(f'CAST(sum({rev}) AS DOUBLE)')} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
WHERE nc.n_name IN ('{nation_a}', '{nation_b}')
  AND ns.n_name IN ('{nation_a}', '{nation_b}')
  AND nc.n_name <> ns.n_name
GROUP BY 1, 2, 3
"""


def tpch_q13_sql(excluded_priority: str = "1-URGENT") -> str:
    """Twin of plans.examples.customer_order_distribution (TPC-H Q13 shape)."""
    return f"""
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '{excluded_priority}'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist FROM per_cust GROUP BY c_count
"""


def tpch_q15_sql(date_from: str = "1996-01-01", date_to: str = "1996-04-01") -> str:
    """Twin of plans.examples.top_revenue_suppliers (TPC-H Q15 shape)."""
    rev = "CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(38,10))"
    return f"""
WITH rev AS (
  SELECT l_suppkey, sum({rev}) AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{date_from}' AND l_shipdate < TIMESTAMP '{date_to}'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, {_r6('CAST(r AS DOUBLE)')} AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE r = (SELECT max(r) FROM rev)
"""


def tpch_q17_sql(brand: str = "Brand#1", num: int = 1, den: int = 5) -> str:
    """Twin of plans.examples.small_quantity_revenue (TPC-H Q17 shape) —
    the below-average cut cross-multiplied over exact DECIMAL sums."""
    return f"""
WITH li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{brand}'
),
avg_q AS (
  SELECT l_partkey AS pk, sum(CAST(l_quantity AS DECIMAL(38,10))) AS sq,
         count(*) AS n
  FROM li GROUP BY l_partkey
)
SELECT
  {_r6('CAST(sum(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) / 7.0')} AS avg_yearly,
  count(*) AS n_lines
FROM li JOIN avg_q ON l_partkey = pk
WHERE CAST(l_quantity AS DECIMAL(38,10)) * n * {den} < sq * {num}
"""


def tpch_q21_sql(grace_days: int = 90, k: int = 20) -> str:
    """Twin of plans.examples.waiting_suppliers (TPC-H Q21 shape)."""
    return f"""
WITH late AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate > o_orderdate + INTERVAL {grace_days} DAY
),
all_lines AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
blamed AS (
  SELECT t.l_orderkey, t.l_suppkey
  FROM late t
  WHERE EXISTS (SELECT 1 FROM all_lines o
                WHERE o.l_orderkey = t.l_orderkey AND o.l_suppkey <> t.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM late o
                    WHERE o.l_orderkey = t.l_orderkey AND o.l_suppkey <> t.l_suppkey)
)
SELECT s_suppkey, s_name, numwait
FROM (SELECT l_suppkey, count(*) AS numwait FROM blamed GROUP BY l_suppkey)
JOIN supplier ON l_suppkey = s_suppkey
ORDER BY numwait DESC, s_suppkey ASC LIMIT {k}
"""


def multimodal_frames_sql(frame_size: int = 256, every_n: int = 4) -> str:
    # frame boundaries are pure arithmetic over byte length, so the 1-to-N
    # mapInPandas expansion has an exact SQL twin via per-row series.
    # doc_id IS NOT NULL mirrors the sampler: identity-less frames are
    # useless, and a NULL id would crash the worker's int64 output column
    return f"""
WITH p AS (SELECT doc_id, octet_length(encode(text)) AS byte_len FROM documents
           WHERE doc_id IS NOT NULL),
f AS (
  SELECT doc_id, byte_len,
         unnest(range(0, (byte_len + {frame_size - 1}) // {frame_size})) AS frame_idx
  FROM p
)
SELECT doc_id, frame_idx::INT AS frame_idx,
       least({frame_size}, byte_len - frame_idx * {frame_size})::INT AS frame_len
FROM f WHERE frame_idx % {every_n} = 0
"""


def multimodal_meta_sql() -> str:
    return """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
            WHEN doc_id % 3 = 1 THEN 'audio/wav'
            ELSE 'video/mp4' END AS media_type,
       octet_length(encode(text))::INT AS byte_len
FROM documents
"""


def multimodal_resize_sql(target_len: int = 64) -> str:
    """Twin of operators.multimodal.resize_payload over the ASCII test
    payloads — the stride downsample as a floor-indexed character gather
    (floor, not round: Python's int() truncates; DuckDB's double->INT cast
    rounds)."""
    idx = f"CAST(floor(i * (n / {target_len}.0)) AS INT) + 1"
    return f"""
WITH d AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
)
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
            WHEN doc_id % 3 = 1 THEN 'audio/wav'
            ELSE 'video/mp4' END AS media_type,
       n::INT AS orig_len,
       CAST(CASE WHEN n IS NULL THEN NULL
                 WHEN n <= {target_len} THEN n ELSE {target_len} END AS INT) AS resized_len,
       CASE WHEN n IS NULL THEN NULL
            WHEN n <= {target_len} THEN text
            ELSE array_to_string(
              list_transform(range(0, {target_len}), i -> substr(text, {idx}, 1)), '')
       END AS resized_text
FROM d
"""


def remove_repeated_spans_sql(n: int = 5, max_freq: int = 1) -> str:
    """Twin of operators.text.remove_repeated_spans — same tokens regex,
    same 60-bit gram hash, same 0-based coverage arithmetic; the per-doc
    rebuild is string_agg ORDER BY pos (Spark: array_sort(collect_list))."""
    gram = f"array_to_string(t[i + 1 : i + {n}], ' ')"
    return f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS} AS t FROM documents WHERE doc_id IS NOT NULL
),
words AS (
  SELECT doc_id, i AS pos, t[i + 1] AS word
  FROM toks, unnest(range(0, len(t))) u(i)
),
grams AS (
  SELECT doc_id, i AS gpos, {_md5int(gram)} AS gh
  FROM toks, unnest(range(0, greatest(len(t) - {n - 1}, 0))) u(i)
),
hot AS (SELECT gh FROM grams GROUP BY gh HAVING count(*) > {max_freq}),
covered AS (
  SELECT DISTINCT doc_id, gpos + j AS pos
  FROM grams JOIN hot USING (gh), unnest(range(0, {n})) v(j)
),
kept AS (
  SELECT w.doc_id, w.pos, w.word
  FROM words w ANTI JOIN covered c ON w.doc_id = c.doc_id AND w.pos = c.pos
),
rebuilt AS (
  SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS clean_text,
         count(*) AS kept_n
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(r.clean_text, '') AS clean_text,
       len(t.t)::INT AS n_tokens,
       COALESCE(r.kept_n, 0)::INT AS n_tokens_kept
FROM toks t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
"""


def multimodal_features_sql(dim: int = 8) -> str:
    """Twin of operators.multimodal.extract_features(fake=True).

    The fake features are per-stride byte-sum means in 6-decimal fixed
    point: f_j = (sum of bytes at positions i ≡ j (mod dim)) * 1e6 // n / 1e6.
    Testdata text is pure ASCII at every scale factor (verified: octet_length
    == char length for all rows), so byte i of the utf-8 payload equals
    unicode(text[i+1]) and the mapInPandas fold has an exact SQL twin. The
    fixed-point floor keeps the doubles bit-identical across engines.
    """
    n = "greatest(byte_len, 1)"
    # NULL text (missing blob) -> NULL features, mirroring the mapInPandas
    # side's None propagation (element_at over a NULL features array)
    fcols = ",\n  ".join(
        f"CASE WHEN byte_len IS NULL THEN NULL ELSE "
        f"((COALESCE(list_sum(list_transform(range({j}, byte_len, {dim}), "
        f"i -> unicode(text[i + 1]))), 0)::BIGINT * 1000000) // {n}) / 1000000.0 "
        f"END AS f{j}"
        for j in range(dim)
    )
    return f"""
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image/png'
              WHEN doc_id % 3 = 1 THEN 'audio/wav'
              ELSE 'video/mp4' END AS media_type,
         text,
         octet_length(encode(text)) AS byte_len
  FROM documents
)
SELECT doc_id, media_type, byte_len::INT AS byte_len,
  {fcols}
FROM p
"""


def value_percentiles_sql(qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99)) -> str:
    """Twin of operators.timeseries.value_percentiles — quantile_cont uses
    the same PERCENTILE_CONT linear interpolation as Spark's percentile."""
    pcols = ",\n  ".join(
        f"{_r6(f'quantile_cont(value, {q})')} AS p{int(q * 100)}" for q in qs
    )
    return f"""
SELECT event_type,
  count(*) AS n_events,
  {_r6('min(value)')} AS min_value,
  {pcols},
  {_r6('max(value)')} AS max_value
FROM {_EVF}
GROUP BY event_type
"""


def top_event_paths_sql(length: int = 3, k: int = 20) -> str:
    """Twin of operators.events.top_event_paths — same lead() windows over
    (ts, event_id), same separator, same tie-breaks, same NULL-step
    sentinel (Spark's concat_ws SKIPS nulls while ``||`` nulls the whole
    path — both engines coalesce before the leads so a NULL event_type is
    a '<null>' step and lead() NULL means only end-of-sequence); NULL-ts
    rows are excluded like the Spark side (unorderable into a sequence —
    the engines place NULL at opposite ends)."""
    step = "coalesce(event_type, '<null>')"
    leads = [step] + [
        f"lead({step}, {i}) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        for i in range(1, length)
    ]
    concat = " || ' > ' || ".join(leads)
    return f"""
WITH stepped AS (
  SELECT {concat} AS path,
         {leads[-1]} AS last_step
  FROM events WHERE ts IS NOT NULL
)
SELECT path, CAST(count(*) AS BIGINT) AS n
FROM stepped WHERE last_step IS NOT NULL
GROUP BY path ORDER BY n DESC, path ASC LIMIT {k}
"""


def approx_stats_sql(qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99)) -> str:
    """Twin of operators.timeseries.approx_stats_checked. The sketch
    estimates are engine-specific so the checked form exports only exact
    aggregates plus in-bounds flags; the flags are deterministically TRUE
    when the sketches honor their error contracts, so the oracle emits
    literals — a sketch regression flips the Spark side and fails the
    hash."""
    flag_cols = ",\n  ".join(
        f"TRUE AS p{int(q * 100)}_in_bounds" for q in qs
    )
    return f"""
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
  TRUE AS users_in_bounds,
  {flag_cols}
FROM {_EVF}
WHERE event_type IS NOT NULL
GROUP BY event_type
"""


def price_band_summary_sql() -> str:
    """Twin of plans.examples.price_band_summary — same half-open [lo, hi)
    bands as a VALUES dim, inequality join."""
    from billing_etl_v1_spark.plans.examples import PRICE_BANDS

    rows = ", ".join(
        f"('{n}', {lo}, {'1e308' if hi == float('inf') else hi})"
        for n, lo, hi in PRICE_BANDS
    )
    return f"""
WITH bands(band, lo, hi) AS (VALUES {rows})
SELECT band, CAST(lo AS DOUBLE) AS lo,
  count(*) AS n_parts,
  {_r6('CAST(sum(CAST(p_retailprice AS DECIMAL(38,10))) AS DOUBLE)')} AS total_retail,
  {_r6('min(p_retailprice)')} AS min_price,
  {_r6('max(p_retailprice)')} AS max_price
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band, lo
"""


def tpch_q2_sql(
    region_name: str = "EUROPE", type_name: str = "STANDARD", size: int = 15, k: int = 100
) -> str:
    """Twin of plans.examples.cheapest_supplier_per_part (TPC-H Q2 shape,
    supply cost derived from lineitem — no partsupp in this schema)."""
    return f"""
WITH regional_sups AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{region_name}'
),
offers AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN regional_sups ON l_suppkey = s_suppkey
  WHERE p_type = '{type_name}' AND p_size = {size}
  GROUP BY ALL
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       {_r6('unit_cost')} AS unit_cost
FROM offers
QUALIFY rank() OVER (PARTITION BY p_partkey ORDER BY unit_cost ASC) = 1
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT {k}
"""


def tpch_q8_sql(
    target_nation: str = "NATION_3",
    region_name: str = "EUROPE",
    type_name: str = "ECONOMY",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> str:
    """Twin of plans.examples.nation_market_share (TPC-H Q8 shape)."""
    rev = "CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(38,10))"
    return f"""
WITH base AS (
  SELECT year(o_orderdate)::INT AS o_year,
         {rev} AS rev,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE p_type = '{type_name}'
    AND o_orderdate >= TIMESTAMP '{date_from}' AND o_orderdate < TIMESTAMP '{date_to}'
    AND EXISTS (
      SELECT 1 FROM customer
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region ON cn.n_regionkey = r_regionkey
      WHERE c_custkey = o_custkey AND r_name = '{region_name}'
    )
)
SELECT o_year,
       {_r6(f"CAST(coalesce(sum(CASE WHEN supp_nation = '{target_nation}' THEN rev END), 0) AS DOUBLE) / CAST(sum(rev) AS DOUBLE)")} AS mkt_share
FROM base GROUP BY o_year
"""


def tpch_q9_sql(
    name_word: str = "widget", cost_frac_num: int = 1, cost_frac_den: int = 10
) -> str:
    """Twin of plans.examples.product_type_profit (TPC-H Q9 shape, supply
    cost proxied as a fraction of p_retailprice — no partsupp)."""
    prof = (
        "CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)"
        f" - p_retailprice * l_quantity * {cost_frac_num} / {cost_frac_den}"
        " AS DECIMAL(38,10))"
    )
    return f"""
SELECT n_name AS nation, year(o_orderdate)::INT AS o_year,
       {_r6(f'CAST(sum({prof}) AS DOUBLE)')} AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%{name_word}%'
GROUP BY ALL
"""


def tpch_q11_sql(
    nation_name: str = "NATION_3", frac_num: int = 1, frac_den: int = 1000
) -> str:
    """Twin of plans.examples.important_part_values (TPC-H Q11 shape,
    shipped value instead of partsupp inventory value) — the threshold cut
    cross-multiplied over exact DECIMAL sums."""
    rev = "CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(38,10))"
    return f"""
WITH per_part AS (
  SELECT l_partkey, sum({rev}) AS val
  FROM lineitem
  WHERE EXISTS (
    SELECT 1 FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey = l_suppkey AND n_name = '{nation_name}'
  )
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, {_r6('CAST(val AS DOUBLE)')} AS value
FROM per_part
WHERE val * {frac_den} > (SELECT sum(val) FROM per_part) * {frac_num}
"""


def tpch_q20_sql(
    nation_name: str = "NATION_1",
    name_word: str = "widget",
    min_qty: float = 50.0,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> str:
    """Twin of plans.examples.bulk_part_suppliers (TPC-H Q20 shape,
    shipped-quantity threshold instead of partsupp availqty)."""
    return f"""
WITH moved AS (
  SELECT l_suppkey, count(*) AS n_bulk_parts
  FROM (
    SELECT l_suppkey, l_partkey,
           sum(CAST(l_quantity AS DECIMAL(38,10))) AS qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{date_from}' AND l_shipdate < TIMESTAMP '{date_to}'
      AND EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey
                  AND p_name LIKE '%{name_word}%')
    GROUP BY l_suppkey, l_partkey
  )
  WHERE qty > CAST({min_qty} AS DECIMAL(38,10))
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, n_bulk_parts
FROM moved
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = '{nation_name}'
"""


def funnel_sql(steps: tuple[str, ...] = ("view", "click", "purchase")) -> str:
    """Twin of operators.events.funnel — min-over-qualifying step times."""
    ctes = [
        f"s0 AS (SELECT user_id, min(ts) AS t0 FROM events"
        f" WHERE event_type = '{steps[0]}' GROUP BY user_id)"
    ]
    for i, step in enumerate(steps[1:], start=1):
        ctes.append(
            f"s{i} AS (SELECT e.user_id, min(e.ts) AS t{i}"
            f" FROM events e JOIN s{i-1} p ON e.user_id = p.user_id"
            f" WHERE e.event_type = '{step}' AND e.ts > p.t{i-1}"
            f" GROUP BY e.user_id)"
        )
    selects = [
        f"SELECT {i + 1}::INT AS step, '{step}' AS event_type,"
        f" (SELECT count(*) FROM s{i}) AS users"
        for i, step in enumerate(steps)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def session_funnel_sql(
    steps: tuple[str, ...] = ("view", "click", "purchase"), gap_s: int = 1800
) -> str:
    """Twin of operators.events.session_funnel — the sessionize assignment
    CTE feeding the chained min-over-qualifying steps at session grain."""
    ctes = [
        f"""e AS (SELECT event_id, user_id, ts, event_type,
         floor(epoch(ts))::BIGINT AS ep FROM events WHERE ts IS NOT NULL),
m AS (
  SELECT *, CASE WHEN lag(ep) OVER w IS NULL OR ep - lag(ep) OVER w > {gap_s}
                 THEN 1 ELSE 0 END AS ns
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
t AS (
  SELECT user_id, ts, event_type,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM m
)""",
        f"s0 AS (SELECT user_id, session_idx, min(ts) AS t0 FROM t"
        f" WHERE event_type = '{steps[0]}' GROUP BY user_id, session_idx)",
    ]
    for i, step in enumerate(steps[1:], start=1):
        ctes.append(
            f"s{i} AS (SELECT e.user_id, e.session_idx, min(e.ts) AS t{i}"
            f" FROM t e JOIN s{i-1} p"
            f" ON e.user_id = p.user_id AND e.session_idx = p.session_idx"
            f" WHERE e.event_type = '{step}' AND e.ts > p.t{i-1}"
            f" GROUP BY e.user_id, e.session_idx)"
        )
    selects = [
        f"SELECT {i + 1}::INT AS step, '{step}' AS event_type,"
        f" (SELECT count(*) FROM s{i}) AS sessions"
        for i, step in enumerate(steps)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def cohort_retention_sql(bucket: str = "week") -> str:
    """Twin of operators.events.cohort_retention."""
    days = {"week": 7, "day": 1}[bucket]
    return f"""
WITH first_seen AS (
  SELECT user_id, date_trunc('{bucket}', min(ts)) AS cohort
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, date_trunc('{bucket}', ts) AS period FROM events
)
SELECT CAST(cohort AS DATE) AS cohort,
       (datediff('day', CAST(cohort AS DATE), CAST(period AS DATE)) / {days})::INT AS "offset",
       count(*) AS n_active
FROM active JOIN first_seen USING (user_id)
GROUP BY ALL
"""


def stratified_sample_sql(
    cap: int = 60, stratum: str = "lang", key: str = "doc_id", salt: str = "strat"
) -> str:
    """Twin of operators.corpus.stratified_sample — all-integer threshold,
    explicit floor (DuckDB's double->bigint cast rounds, Spark's truncates)."""
    h = _md5int(f"{key}::VARCHAR", salt=salt)
    return f"""
WITH thresh AS (
  SELECT {stratum},
         least(1000000, floor(({cap} * 1000000.0) / count(*))::BIGINT) AS th
  FROM documents GROUP BY {stratum}
)
SELECT d.* FROM documents d
JOIN thresh t ON d.{stratum} = t.{stratum}
WHERE {h} % 1000000 < t.th
"""


def near_dup_clusters_sql(min_jaccard: float = 0.5) -> str:
    """Twin of operators.dedup.near_dup_clusters — transitive closure via a
    RECURSIVE CTE (exact at oracle scale; the Spark side uses iterative
    label propagation, which is the 100 TB formulation)."""
    return f"""
WITH RECURSIVE near AS (
  SELECT doc_a, doc_b FROM ({minhash_lsh_sql()}) WHERE est_jaccard >= {min_jaccard}
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM near
  UNION
  SELECT doc_b, doc_a FROM near
),
reach(node, r) AS (
  -- doc_id IS NOT NULL mirrors the Spark node set (NULL-key lane)
  SELECT doc_id, doc_id FROM documents WHERE doc_id IS NOT NULL
  UNION
  SELECT x.node, e.b FROM reach x JOIN edges e ON e.a = x.r
)
SELECT node AS doc_id, min(r) AS cluster_id,
       (node = min(r))::INT AS is_canonical
FROM reach GROUP BY node
"""


def pack_shards_sql(shard_tokens: int = 4000, salt: str = "pack") -> str:
    """Twin of operators.corpus.pack_shards — the single-global-window
    formulation, equivalent to the Spark side's two-phase prefix sum."""
    h = _md5int("doc_id::VARCHAR", salt=salt)
    nt = f"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_TOKENS}) END"
    return f"""
WITH base AS (
  SELECT doc_id, CAST({nt} AS BIGINT) AS n_tokens, {h} AS h
  FROM documents WHERE doc_id IS NOT NULL
),
cum AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY h, doc_id
                             ROWS UNBOUNDED PRECEDING) AS c
  FROM base
)
SELECT doc_id, n_tokens,
       floor((c - n_tokens) / {shard_tokens})::BIGINT AS shard_id
FROM cum
"""


def ccnet_buckets_sql() -> str:
    """Twin of operators.text.ccnet_buckets — the fluency twin ranked by a
    plain window (equivalent to the two-phase distributed rank), same
    integer third-assignment."""
    return f"""
WITH s AS (
  SELECT doc_id, lang, source, avg_bigram_freq FROM ({bigram_fluency_sql()})
),
r AS (
  SELECT doc_id, lang, source, avg_bigram_freq,
         CAST(row_number() OVER (ORDER BY avg_bigram_freq DESC, doc_id)
              AS BIGINT) AS rank,
         count(*) OVER () AS n
  FROM s
)
SELECT doc_id, lang, source, avg_bigram_freq, rank,
       CASE (rank - 1) * 3 // n + 1
            WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM r
"""


def vocabulary_coverage_sql(min_freq: int = 1) -> str:
    """Twin of operators.text.vocabulary_coverage — plain-window rank +
    running sum over the (freq DESC, token) total order (equivalent to the
    two-phase distributed form)."""
    return f"""
WITH toks AS (SELECT unnest({_TOKENS}) AS token FROM documents),
c AS (
  SELECT token, CAST(count(*) AS BIGINT) AS freq
  FROM toks GROUP BY token HAVING count(*) >= {min_freq}
),
r AS (
  SELECT token, freq,
         CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS rank,
         CAST(sum(freq) OVER (ORDER BY freq DESC, token
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_freq,
         CAST(sum(freq) OVER () AS BIGINT) AS tot
  FROM c
)
SELECT token, freq, rank, cum_freq, {_r6('cum_freq / tot')} AS cum_fraction
FROM r
"""


def quality_percentiles_sql() -> str:
    """Twin of operators.text.quality_percentiles — plain-window rank
    formulation (equivalent to the Spark side's two-phase distributed
    rank), same integer bucket arithmetic."""
    return f"""
WITH s AS (SELECT doc_id, quality_score FROM ({text_stats_sql()})
           WHERE doc_id IS NOT NULL),
r AS (
  SELECT doc_id, quality_score,
         row_number() OVER (ORDER BY quality_score, doc_id) AS rnk,
         count(*) OVER () AS n
  FROM s
)
SELECT doc_id, quality_score, CAST(rnk AS BIGINT) AS rank,
       CAST((rnk - 1) * 100 // n + 1 AS INT) AS percentile
FROM r
"""


def training_corpus_sql(
    shard_tokens: int = 4000,
    min_tokens: int = 30,
    min_quality: float = 0.5,
    eval_mod: int = 97,
    val_pct: int = 1,
    test_pct: int = 1,
) -> str:
    """Twin of operators.corpus.training_corpus — the full composed DAG as
    chained CTEs; per-split packing as ONE split-partitioned window
    (equivalent to the Spark side's per-split two-phase prefix sums)."""
    bucket = f"({_md5int('doc_id::VARCHAR', salt='split')}) % 1000000"
    val_hi = val_pct * 1_000_000 // 100
    test_hi = (val_pct + test_pct) * 1_000_000 // 100
    h = _md5int("doc_id::VARCHAR", salt="pack")
    nt = f"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_TOKENS}) END"
    return f"""
WITH decon AS ({decontaminate_sql(eval_mod=eval_mod)}),
clean AS (SELECT doc_id FROM decon WHERE NOT is_contaminated),
kept AS (
  SELECT k.* FROM ({quality_corpus_sql(min_tokens=min_tokens, min_quality=min_quality)}) k
  JOIN clean USING (doc_id)
),
sp AS (
  SELECT *, CASE WHEN {bucket} < {val_hi} THEN 'val'
                 WHEN {bucket} < {test_hi} THEN 'test'
                 ELSE 'train' END AS split
  FROM kept
),
base AS (
  SELECT doc_id, split, lang_pred, quality_score,
         CAST({nt} AS BIGINT) AS n_tokens, {h} AS hh
  FROM sp
),
cum AS (
  SELECT *, sum(n_tokens) OVER (
    PARTITION BY split ORDER BY hh, doc_id ROWS UNBOUNDED PRECEDING
  ) AS c
  FROM base
)
SELECT doc_id, n_tokens,
       floor((c - n_tokens) / {shard_tokens})::BIGINT AS shard_id,
       split, lang_pred, quality_score
FROM cum
"""


def train_split_sql(val_pct: int = 1, test_pct: int = 1, salt: str = "split") -> str:
    """Twin of operators.corpus.train_split — same salted buckets, same
    split boundaries."""
    bucket = f"({_md5int('doc_id::VARCHAR', salt=salt)}) % 1000000"
    val_hi = val_pct * 1_000_000 // 100
    test_hi = (val_pct + test_pct) * 1_000_000 // 100
    return f"""
SELECT doc_id, text, lang, source, n_chars,
       CASE WHEN {bucket} < {val_hi} THEN 'val'
            WHEN {bucket} < {test_hi} THEN 'test'
            ELSE 'train' END AS split
FROM documents
"""


def shard_manifest_sql(shard_tokens: int = 4000) -> str:
    """Twin of operators.corpus.shard_manifest — the packing twin rolled
    up at shard grain with byte sizes joined back."""
    return f"""
WITH packed AS ({pack_shards_sql(shard_tokens=shard_tokens)}),
sizes AS (SELECT doc_id, length(text) AS b FROM documents)
SELECT p.shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(p.n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(s.b) AS BIGINT) AS total_bytes,
       min(p.doc_id) AS min_doc_id,
       max(p.doc_id) AS max_doc_id
FROM packed p JOIN sizes s USING (doc_id)
GROUP BY p.shard_id
"""


def mixture_sample_sql(weights: dict[str, float], salt: str = "mix") -> str:
    """Twin of operators.corpus.mixture_sample."""
    h = _md5int("doc_id::VARCHAR", salt=salt)
    rows = ", ".join(
        f"('{s}', {int(f * 1000000)})" for s, f in sorted(weights.items())
    )
    return f"""
WITH w(source, th) AS (VALUES {rows})
SELECT d.* FROM documents d
JOIN w ON d.source = w.source
WHERE {h} % 1000000 < w.th
"""


MIXTURE_WEIGHTS = {
    "src0": 1.0,
    "src1": 0.5,
    "src2": 0.5,
    "src3": 0.25,
    "src4": 0.25,
    "src5": 0.1,
}


def corpus_build_sql(
    shard_tokens: int = 4000, min_tokens: int = 30, min_quality: float = 0.5
) -> str:
    """Twin of operators.corpus.corpus_build — pack_shards' single-window
    formulation over the quality_corpus subquery."""
    h = _md5int("doc_id::VARCHAR", salt="pack")
    nt = f"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_TOKENS}) END"
    return f"""
WITH kept AS ({quality_corpus_sql(min_tokens=min_tokens, min_quality=min_quality)}),
base AS (
  SELECT doc_id, lang_pred, quality_score,
         CAST({nt} AS BIGINT) AS n_tokens, {h} AS hh
  FROM kept
),
cum AS (
  SELECT doc_id, lang_pred, quality_score, n_tokens,
         sum(n_tokens) OVER (ORDER BY hh, doc_id ROWS UNBOUNDED PRECEDING) AS c
  FROM base
)
SELECT doc_id, n_tokens,
       floor((c - n_tokens) / {shard_tokens})::BIGINT AS shard_id,
       lang_pred, quality_score
FROM cum
"""


def pack_blocks_sql(block_tokens: int = 256, salt: str = "pack") -> str:
    """Twin of operators.corpus.pack_blocks — single-window offsets, the
    same arithmetic block spans and 1-based inclusive slices."""
    h = _md5int("doc_id::VARCHAR", salt=salt)
    nt = f"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_TOKENS}) END"
    B = block_tokens
    return f"""
WITH base AS (
  SELECT doc_id, {_TOKENS} AS t,
         CAST({nt} AS BIGINT) AS n_tokens, {h} AS hh
  FROM documents WHERE doc_id IS NOT NULL
),
cum AS (
  SELECT doc_id, t, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY hh, doc_id ROWS UNBOUNDED PRECEDING)
              - n_tokens AS BIGINT) AS s
  FROM base
),
pieces AS (
  SELECT doc_id, t, s, n_tokens,
         unnest(range(s // {B}, (s + n_tokens - 1) // {B} + 1)) AS block_id
  FROM cum WHERE n_tokens > 0
),
cut AS (
  SELECT block_id,
         greatest(s, block_id * {B}) AS abs_from,
         least(s + n_tokens, (block_id + 1) * {B}) AS abs_to,
         array_to_string(
           t[(greatest(s, block_id * {B}) - s + 1):(least(s + n_tokens, (block_id + 1) * {B}) - s)],
           ' ') AS ptext
  FROM pieces
)
SELECT block_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(abs_to - abs_from) AS BIGINT) AS n_tokens,
       string_agg(ptext, ' ' ORDER BY abs_from) AS block_text
FROM cut GROUP BY block_id
"""


def lang_confusion_sql() -> str:
    """Twin of operators.text.lang_confusion — the lang_id twin crosstabbed
    against the labeled column."""
    return f"""
WITH p AS (SELECT lang, lang_pred FROM ({lang_id_sql()})),
c AS (
  SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n_docs
  FROM p GROUP BY lang, lang_pred
),
t AS (SELECT lang, CAST(sum(n_docs) AS BIGINT) AS tt FROM c GROUP BY lang)
SELECT c.lang, c.lang_pred, c.n_docs, {_r6('c.n_docs / t.tt')} AS share_of_true
FROM c JOIN t USING (lang)
"""


def source_mix_sql() -> str:
    """Twin of operators.corpus.source_mix_report."""
    nt = f"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_TOKENS}) END"
    return f"""
WITH p AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum({nt}) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS td,
             CAST(sum(n_tokens) AS BIGINT) AS tt FROM p)
SELECT source, n_docs, n_tokens,
       {_r6('n_docs / td')} AS doc_share,
       {_r6('n_tokens / tt')} AS token_share
FROM p, t
"""


def dau_wau_sql(window_days: int = 7) -> str:
    """Twin of operators.events.dau_wau — same day-spine band join."""
    return f"""
WITH activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
days AS (SELECT DISTINCT day FROM activity),
dau AS (
  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
  FROM activity GROUP BY day
),
wau AS (
  SELECT d.day, CAST(count(DISTINCT a.user_id) AS BIGINT) AS wau
  FROM days d JOIN activity a
    ON a.day <= d.day AND a.day >= d.day - {window_days - 1}
  GROUP BY d.day
)
SELECT day, dau, wau, {_r6('dau / wau')} AS stickiness
FROM dau JOIN wau USING (day)
"""


def hourly_profile_sql() -> str:
    """Twin of operators.events.hourly_profile."""
    return f"""
WITH p AS (
  SELECT event_type,
         CAST(floor((((floor(epoch(ts))::BIGINT % 86400) + 86400) % 86400) / 3600) AS INT) AS hour,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
t AS (SELECT event_type, CAST(sum(n_events) AS BIGINT) AS tt FROM p GROUP BY event_type)
SELECT p.event_type, p.hour, p.n_events, {_r6('p.n_events / t.tt')} AS share
FROM p JOIN t USING (event_type)
"""


def dsir_importance_sql(
    target_where: str = "lang = 'en'",
    n: int = 2,
    num_buckets: int = 4096,
    alpha: float = 1.0,
) -> str:
    """Twin of operators.corpus.dsir_importance: hashed n-gram importance
    weights. Same md5-bucket hash, same Laplace-smoothed log-ratio term
    order; per-doc double sums land on the shared quantize grid."""
    gram = f"array_to_string(t[i : i + {n - 1}], ' ')" if n > 1 else "t[i]"

    def feats(src: str, with_id: bool) -> str:
        idsel = "doc_id, " if with_id else ""
        return f"""
  SELECT {idsel}('0x' || substr(md5(gram), 1, 15))::BIGINT % {num_buckets} AS bucket
  FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(t) - {n} + 2), i -> {gram})) AS gram
    FROM (SELECT doc_id, {_TOKENS} AS t FROM {src})
  )"""

    return f"""
WITH tgt_docs AS (SELECT * FROM documents WHERE {target_where}),
tf AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS tfc FROM ({feats('tgt_docs', False)}) GROUP BY bucket
),
rf AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS rfc FROM ({feats('documents', False)}) GROUP BY bucket
),
tot AS (
  SELECT (SELECT CAST(coalesce(sum(rfc), 0) AS BIGINT) FROM rf) AS R,
         (SELECT CAST(coalesce(sum(tfc), 0) AS BIGINT) FROM tf) AS T
),
ratio AS (
  SELECT rf.bucket,
         ln(coalesce(CAST(tf.tfc AS DOUBLE), 0.0) + {alpha})
           - ln(tot.T + {alpha} * {num_buckets})
           - ln(CAST(rf.rfc AS DOUBLE) + {alpha})
           + ln(tot.R + {alpha} * {num_buckets}) AS lr
  FROM rf LEFT JOIN tf USING (bucket), tot
),
dc AS (
  SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS c
  FROM ({feats('documents', True)}) GROUP BY doc_id, bucket
),
per_doc AS (
  SELECT dc.doc_id,
         CAST(sum(dc.c) AS BIGINT) AS nf,
         sum(dc.c * ratio.lr) AS imp
  FROM dc JOIN ratio USING (bucket)
  GROUP BY dc.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.nf, 0) AS BIGINT) AS n_feats,
       {_r6('coalesce(p.imp, 0.0)')} AS importance
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


def corpus_dq_audit_sql() -> str:
    """Twin of operators.text.corpus_dq_audit: one conditional-sum pass
    melted to (check, violations). DuckDB's regexp_replace needs the 'g'
    flag to match Spark's replace-all default."""
    checks = f"""
SELECT
  CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS null_doc_id_rows,
  CAST(sum(CASE WHEN doc_id IS NOT NULL THEN 1 ELSE 0 END)
       - count(DISTINCT doc_id) AS BIGINT) AS duplicate_doc_id_rows,
  CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS null_text_rows,
  CAST(sum(CASE WHEN text = '' THEN 1 ELSE 0 END) AS BIGINT)
    AS empty_text_rows,
  CAST(sum(CASE WHEN text <> '' AND regexp_replace(text, '{WS_RE}', '', 'g') = ''
           THEN 1 ELSE 0 END) AS BIGINT) AS whitespace_only_rows
FROM documents
"""
    rows = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS \"check\", CAST(coalesce({c}, 0) AS BIGINT) AS violations FROM counts"
        for c in (
            "null_doc_id_rows",
            "duplicate_doc_id_rows",
            "null_text_rows",
            "empty_text_rows",
            "whitespace_only_rows",
        )
    )
    return f"WITH counts AS ({checks})\n{rows}"


# --- tokenizer-exact BPE (operators/bpe.py) -------------------------------

_BPE_PRE_RE = BPE_TOKEN_RE


def _bpe_pre_re_sql(level: str) -> str:
    """SQL-escaped pre-token regex for the level (the byte-level GPT-2
    pattern contains apostrophes for the contraction alternatives)."""
    from billing_etl_v1_spark.operators.bpe import BPE_BYTE_TOKEN_RE

    pat = _BPE_PRE_RE if level == "char" else BPE_BYTE_TOKEN_RE
    return pat.replace("'", "''")


def _bpe_symbols_sql(level: str) -> str:
    """Initial-symbol list expression over a ``word`` column: one element
    per codepoint (char) or one uppercase hex pair per UTF-8 byte (byte —
    hex() is uppercase in both engines, so symbols compare identically)."""
    if level == "char":
        # regexp '.' yields one element per codepoint — the twin of
        # Spark's split-by-empty-pattern (surrogate pairs stay whole)
        return "regexp_extract_all(word, '.')"
    return "regexp_extract_all(hex(encode(word)), '..')"


def _bpe_round_ctes(i: int) -> str:
    """One unrolled merge round. INDEPENDENT formulation from the Spark
    fold: greedy left-to-right non-overlap via positional run-parity —
    consecutive overlapping matches are only possible when left = right,
    and within such a run exactly the even offsets start a merge. An empty
    best pair (fully merged vocabulary) turns the round into a no-op
    through the NULL scalar subqueries, matching the Spark left-join
    guard.

    The multiply-referenced CTEs are MATERIALIZED: DuckDB inlines CTEs by
    default, and with each round referencing the previous vocabulary ~3
    times the inlined tree re-opens the base parquet O(3^rounds) times
    (observed: 'Too many open files' at 8 rounds) — the SQL mirror of the
    localCheckpoint-per-round reasoning on the Spark side."""
    return f"""pc{i} AS (
  SELECT s[u.i + 1] AS a, s[u.i + 2] AS b, CAST(sum(freq) AS BIGINT) AS pair_count
  FROM v{i}, unnest(range(0, len(s) - 1)) u(i)
  GROUP BY 1, 2
),
b{i} AS MATERIALIZED (SELECT a, b, pair_count FROM pc{i} ORDER BY pair_count DESC, a ASC, b ASC LIMIT 1),
p{i} AS (
  SELECT word, u.i AS pos, s[u.i + 1] AS sym
  FROM v{i}, unnest(range(0, len(s))) u(i)
),
q{i} AS (
  SELECT word, pos, sym,
         coalesce(sym = (SELECT a FROM b{i})
                  AND lead(sym) OVER (PARTITION BY word ORDER BY pos)
                      = (SELECT b FROM b{i}), FALSE) AS mtch
  FROM p{i}
),
g{i} AS (
  SELECT *, CASE WHEN mtch
    THEN pos - row_number() OVER (PARTITION BY word, mtch ORDER BY pos) END AS grp
  FROM q{i}
),
st{i} AS (
  SELECT word, pos, sym,
         mtch AND (pos - min(pos) OVER (PARTITION BY word, grp)) % 2 = 0 AS strt
  FROM g{i}
),
c{i} AS (
  SELECT word, pos, sym, strt,
         coalesce(lag(strt) OVER (PARTITION BY word ORDER BY pos), FALSE) AS consumed
  FROM st{i}
),
v{i + 1} AS MATERIALIZED (
  SELECT c.word, v.freq,
         list(CASE WHEN c.strt THEN (SELECT a || b FROM b{i}) ELSE c.sym END
              ORDER BY c.pos) FILTER (WHERE NOT c.consumed) AS s
  FROM c{i} c JOIN v{i} v USING (word)
  GROUP BY c.word, v.freq
)"""


def _bpe_train_ctes(num_merges: int, max_word_len: int, level: str = "char") -> str:
    parts = [
        f"pre AS (SELECT unnest(regexp_extract_all(text, '{_bpe_pre_re_sql(level)}')) AS word FROM documents)",
        "vall AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS freq, "
        f"{_bpe_symbols_sql(level)} AS s FROM pre GROUP BY word)",
        # the max_word_len bypass (twin of bpe_learn's): len(s) counts
        # SYMBOLS (codepoints / bytes) identically on both engines;
        # longer pre-tokens skip merging
        f"v0 AS MATERIALIZED (SELECT * FROM vall WHERE len(s) <= {max_word_len})",
        f"vlong AS (SELECT * FROM vall WHERE len(s) > {max_word_len})",
    ]
    parts.extend(_bpe_round_ctes(i) for i in range(num_merges))
    return ",\n".join(parts)


def _bpe_merge_rows(num_merges: int) -> str:
    rows = "\nUNION ALL\n".join(
        f"SELECT {i} AS merge_rank, a AS left_sym, b AS right_sym, "
        f"a || b AS merged, pair_count FROM b{i}"
        for i in range(num_merges)
    )
    if not rows:
        rows = (
            "SELECT CAST(NULL AS INT) AS merge_rank, '' AS left_sym, "
            "'' AS right_sym, '' AS merged, CAST(NULL AS BIGINT) AS pair_count "
            "WHERE FALSE"
        )
    return rows


def bpe_merges_sql(
    num_merges: int = 8, max_word_len: int = 256, level: str = "char"
) -> str:
    """Twin of operators.bpe.bpe_learn's merge table — the same rounds
    unrolled as chained CTEs (the kmeans/pagerank playbook). All values
    are integers/strings, so the match is exact, including the argmax
    tie-break (both engines order strings by UTF-8 bytes)."""
    return f"""
WITH {_bpe_train_ctes(num_merges, max_word_len, level)}
{_bpe_merge_rows(num_merges)}
"""


def bpe_token_ids_sql(
    num_merges: int = 8, max_word_len: int = 256, level: str = "char"
) -> str:
    """Twin of operators.bpe.bpe_token_ids: the exported token-id table.
    byte: ids 0..255 are the fixed byte alphabet, merges at 256+rank.
    char: ids 0..n-1 are the corpus-observed initial codepoints in string
    order (binary UTF-8 collation in both engines), merges at n+rank.
    The oracle uses a plain ordered row_number — the INDEPENDENT
    formulation of the engine's two-phase distributed rank."""
    if level == "byte":
        return f"""
WITH {_bpe_train_ctes(num_merges, max_word_len, level)},
m AS ({_bpe_merge_rows(num_merges)})
SELECT printf('%02X', i) AS token, CAST(i AS INT) AS token_id, 'base' AS source
FROM range(256) t(i)
UNION ALL
SELECT merged AS token, CAST(256 + merge_rank AS INT) AS token_id,
       'merge' AS source
FROM m
"""
    return f"""
WITH {_bpe_train_ctes(num_merges, max_word_len, level)},
m AS ({_bpe_merge_rows(num_merges)}),
alpha AS (
  SELECT DISTINCT unnest(regexp_extract_all(word, '.')) AS token FROM vall
)
SELECT token, CAST(row_number() OVER (ORDER BY token) - 1 AS INT) AS token_id,
       'base' AS source
FROM alpha
UNION ALL
SELECT merged AS token,
       CAST((SELECT count(*) FROM alpha) + merge_rank AS INT) AS token_id,
       'merge' AS source
FROM m
"""


def bpe_token_sequences_sql(
    num_merges: int = 8, max_word_len: int = 256, level: str = "char"
) -> str:
    """Twin of operators.bpe.bpe_token_sequences: per-document token-id
    sequences under the corpus-trained vocabulary. Word positions come
    from the unnest(range(len(arr))) ordinality pattern (the p{i} CTE's);
    the token position is the same word-level cumulative-sum-plus-offset
    arithmetic the Spark side uses (wpos unique per doc, so the default
    window frame is equivalent on both engines)."""
    if level == "byte":
        ids = """
ids AS (
  SELECT printf('%02X', i) AS token, CAST(i AS INT) AS token_id
  FROM range(256) t(i)
  UNION ALL
  SELECT merged AS token, CAST(256 + merge_rank AS INT) AS token_id FROM m
)"""
    else:
        ids = """
alpha AS (
  SELECT DISTINCT unnest(regexp_extract_all(word, '.')) AS token FROM vall
),
ids AS (
  SELECT token, CAST(row_number() OVER (ORDER BY token) - 1 AS INT) AS token_id
  FROM alpha
  UNION ALL
  SELECT merged AS token,
         CAST((SELECT count(*) FROM alpha) + merge_rank AS INT) AS token_id
  FROM m
)"""
    return f"""
WITH {_bpe_train_ctes(num_merges, max_word_len, level)},
m AS ({_bpe_merge_rows(num_merges)}),
{ids.strip()},
wseq AS (
  SELECT doc_id, u.i AS wpos, arr[u.i + 1] AS word
  FROM (
    SELECT doc_id, regexp_extract_all(text, '{_bpe_pre_re_sql(level)}') AS arr
    FROM documents
  ) t, unnest(range(0, len(arr))) u(i)
),
cost AS (
  SELECT word, s FROM v{num_merges}
  UNION ALL
  SELECT word, s FROM vlong
),
wbase AS (
  SELECT w.doc_id, w.wpos, c.s,
         sum(len(c.s)) OVER (PARTITION BY w.doc_id ORDER BY w.wpos)
           - len(c.s) AS base
  FROM wseq w JOIN cost c USING (word)
)
SELECT s.doc_id, s.pos, s.token, i.token_id
FROM (
  SELECT b.doc_id,
         CAST(b.base + u.i AS BIGINT) AS pos,
         b.s[u.i + 1] AS token
  FROM wbase b, unnest(range(0, len(b.s))) u(i)
) s JOIN ids i ON i.token = s.token
"""


def bpe_fertility_sql(
    num_merges: int = 8,
    max_word_len: int = 256,
    level: str = "char",
    group_col: str = "lang",
) -> str:
    """Twin of operators.bpe.bpe_fertility: per-group tokenizer fertility
    (tokens/pre-token, bytes/token) — quantized to the shared 1e-6 grid,
    zero denominators → NULL (CASE guard on both engines)."""
    return f"""
WITH {_bpe_train_ctes(num_merges, max_word_len, level)},
occ AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS occ FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '{_bpe_pre_re_sql(level)}')) AS word
    FROM documents
  ) GROUP BY doc_id, word
),
cost AS (
  SELECT word, CAST(len(s) AS BIGINT) AS n_tokens FROM v{num_merges}
  UNION ALL
  SELECT word, CAST(len(s) AS BIGINT) AS n_tokens FROM vlong
),
perdoc AS (
  SELECT d.doc_id, d.{group_col},
         CAST(coalesce(octet_length(encode(d.text)), 0) AS BIGINT) AS b,
         CAST(coalesce(a.pre, 0) AS BIGINT) AS pre,
         CAST(coalesce(a.bpe, 0) AS BIGINT) AS bpe
  FROM documents d LEFT JOIN (
    SELECT o.doc_id,
           CAST(sum(o.occ) AS BIGINT) AS pre,
           CAST(sum(o.occ * c.n_tokens) AS BIGINT) AS bpe
    FROM occ o JOIN cost c USING (word)
    GROUP BY o.doc_id
  ) a USING (doc_id)
),
g AS (
  SELECT {group_col},
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(b) AS BIGINT) AS total_bytes,
         CAST(sum(pre) AS BIGINT) AS total_pretokens,
         CAST(sum(bpe) AS BIGINT) AS total_tokens
  FROM perdoc GROUP BY {group_col}
)
SELECT {group_col}, n_docs, total_bytes, total_pretokens, total_tokens,
       {_r6("CASE WHEN total_pretokens > 0 THEN total_tokens / CAST(total_pretokens AS DOUBLE) END")}
         AS tokens_per_pretoken,
       {_r6("CASE WHEN total_tokens > 0 THEN total_bytes / CAST(total_tokens AS DOUBLE) END")}
         AS bytes_per_token
FROM g
"""


def bpe_pack_blocks_sql(
    block_tokens: int,
    num_merges: int = 8,
    max_word_len: int = 256,
    level: str = "char",
) -> str:
    """Twin of operators.bpe.bpe_pack_blocks: the sequence query as a CTE,
    then one ordered row_number (the independent formulation of the
    engine's two-phase rank) and integer div/mod block arithmetic."""
    return f"""
WITH seq AS ({bpe_token_sequences_sql(num_merges, max_word_len, level)})
SELECT CAST((row_number() OVER (ORDER BY doc_id, pos) - 1) // {int(block_tokens)} AS BIGINT)
         AS block_id,
       CAST((row_number() OVER (ORDER BY doc_id, pos) - 1) % {int(block_tokens)} AS INT)
         AS "offset",
       doc_id,
       token_id
FROM seq
"""


def bpe_token_counts_sql(
    num_merges: int = 8, max_word_len: int = 256, level: str = "char"
) -> str:
    """Twin of operators.bpe.bpe_token_counts: exact per-document token
    counts under the corpus-trained vocabulary (word → len(tokens) join,
    never re-running merges per occurrence)."""
    return f"""
WITH {_bpe_train_ctes(num_merges, max_word_len, level)},
occ AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS occ FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '{_bpe_pre_re_sql(level)}')) AS word
    FROM documents
  ) GROUP BY doc_id, word
),
cost AS (
  SELECT word, CAST(len(s) AS BIGINT) AS n_tokens FROM v{num_merges}
  UNION ALL
  SELECT word, CAST(len(s) AS BIGINT) AS n_tokens FROM vlong
),
agg AS (
  SELECT o.doc_id,
         CAST(sum(o.occ) AS BIGINT) AS pre,
         CAST(sum(o.occ * c.n_tokens) AS BIGINT) AS bpe
  FROM occ o JOIN cost c USING (word)
  GROUP BY o.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.pre, 0) AS BIGINT) AS n_pretokens,
       CAST(coalesce(a.bpe, 0) AS BIGINT) AS n_bpe_tokens
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


# --- unigram-LM tokenizer (operators/unigram.py) ---------------------------


def _unigram_dp_ctes(r: int, max_piece_len: int, max_word_len: int) -> str:
    """One Viterbi sweep (round ``r``) unrolled over word positions — the
    SQL mirror of operators.unigram.viterbi_segment: dp cell j keeps the
    best (score DESC, piece-length DESC) extension over piece lengths
    l = 1..min(max_piece_len, j); the row_number tie-break is a total
    order because l determines the predecessor cell. Each dp CTE is
    MATERIALIZED (referenced by up to max_piece_len later cells — the
    _bpe_round_ctes inline-blowup lesson). Scores are BIGINT sums of the
    integer log-prob grid, so the argmax is exact in both engines."""
    parts = [
        f"d{r}_0 AS (SELECT word, freq, CAST(0 AS BIGINT) AS score, "
        f"CAST([] AS VARCHAR[]) AS segs FROM incap)"
    ]
    for j in range(1, max_word_len + 1):
        branches = "\n      UNION ALL\n".join(
            f"""      SELECT d.word, d.freq, d.score + p.ilp AS score,
             d.segs || [p.piece] AS segs, {l} AS plen
      FROM d{r}_{j - l} d JOIN p{r} p ON p.piece = substr(d.word, {j - l + 1}, {l})
      WHERE len(d.word) >= {j}"""
            for l in range(1, min(max_piece_len, j) + 1)
        )
        parts.append(
            f"""d{r}_{j} AS MATERIALIZED (
  SELECT word, freq, score, segs FROM (
    SELECT word, freq, score, segs,
           row_number() OVER (PARTITION BY word ORDER BY score DESC, plen DESC) AS rn
    FROM (
{branches}
    )
  ) WHERE rn = 1
)"""
        )
    finals = "\n  UNION ALL\n".join(
        f"  SELECT word, freq, segs FROM d{r}_{j} WHERE len(word) = {j}"
        for j in range(1, max_word_len + 1)
    )
    parts.append(f"f{r} AS MATERIALIZED (\n{finals}\n)")
    return ",\n".join(parts)


def _unigram_train_ctes(
    vocab_size: int,
    max_piece_len: int,
    max_word_len: int,
    em_rounds: int,
    seed_multiplier: int,
) -> str:
    """The full trainer as chained CTEs (the bpe_merges_sql playbook):
    substring seeding, em_rounds+1 Viterbi sweeps with recounts (the last
    under the pruned piece set), alphabet floored at count 1 throughout.
    Integer-log-prob tables p{r} carry ilp = floor(1e6 * ln(cnt/total))
    — the identical formula the Spark side evaluates, so DP decisions
    agree exactly (module docstring of operators/unigram.py, §3)."""
    pre = _bpe_pre_re_sql("char")
    n_multi_seed = f"greatest(0, {seed_multiplier * vocab_size} - (SELECT count(*) FROM alpha))"
    n_multi_keep = f"greatest(0, {vocab_size} - (SELECT count(*) FROM alpha))"

    def floored(src: str) -> str:
        return f"""(
  SELECT a.piece, greatest(coalesce(s.cnt, 0), CAST(1 AS BIGINT)) AS cnt
  FROM alpha a LEFT JOIN (SELECT piece, cnt FROM {src} WHERE len(piece) = 1) s USING (piece)
  UNION ALL
  SELECT piece, cnt FROM {src} WHERE len(piece) > 1
)"""

    def ilp(counts: str) -> str:
        return f"""(
  SELECT piece,
         CAST(floor(1e6 * ln(CAST(cnt AS DOUBLE) / t.total)) AS BIGINT) AS ilp
  FROM {counts}, (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM {counts}) t
)"""

    parts = [
        f"pre AS (SELECT unnest(regexp_extract_all(text, '{pre}')) AS word FROM documents)",
        "wall AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS freq "
        "FROM pre GROUP BY word)",
        f"incap AS MATERIALIZED (SELECT * FROM wall WHERE len(word) <= {max_word_len})",
        "alpha AS MATERIALIZED (SELECT DISTINCT "
        "unnest(regexp_extract_all(word, '.')) AS piece FROM wall)",
        f"""sub AS MATERIALIZED (
  SELECT substr(w.word, st.i, l.i) AS piece, CAST(sum(w.freq) AS BIGINT) AS cnt
  FROM incap w,
       unnest(range(1, {max_piece_len + 1})) l(i),
       unnest(range(1, {max_word_len + 1})) st(i)
  WHERE st.i + l.i - 1 <= len(w.word)
  GROUP BY 1
)""",
        f"""seedm AS (
  SELECT piece, cnt FROM (
    SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece ASC) AS rn
    FROM sub WHERE len(piece) > 1
  ) WHERE rn <= {n_multi_seed}
)""",
        f"""c0 AS MATERIALIZED (SELECT * FROM {floored("(SELECT piece, cnt FROM sub WHERE len(piece) = 1 UNION ALL SELECT piece, cnt FROM seedm) seed0")})""",
    ]
    for r in range(em_rounds + 1):
        if r == em_rounds:
            parts.append(
                f"""cp AS MATERIALIZED (
  SELECT piece, cnt FROM c{r} WHERE len(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece ASC) AS rn
    FROM c{r} WHERE len(piece) > 1
  ) WHERE rn <= {n_multi_keep}
)"""
            )
            parts.append(f"p{r} AS MATERIALIZED (SELECT * FROM {ilp('cp')})")
        else:
            parts.append(f"p{r} AS MATERIALIZED (SELECT * FROM {ilp(f'c{r}')})")
        parts.append(_unigram_dp_ctes(r, max_piece_len, max_word_len))
        parts.append(
            f"""u{r} AS (
  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT freq, unnest(segs) AS piece FROM f{r})
  GROUP BY piece
)"""
        )
        parts.append(f"c{r + 1} AS MATERIALIZED (SELECT * FROM {floored(f'u{r}')})")
    return ",\n".join(parts)


def unigram_vocab_sql(
    vocab_size: int = 32,
    max_piece_len: int = 4,
    max_word_len: int = 16,
    em_rounds: int = 2,
    seed_multiplier: int = 4,
) -> str:
    """Twin of operators.unigram.unigram_learn's exported piece table:
    (piece, freq, logprob, token_id). All training decisions are integer
    (counts, the 1e-6 log-prob grid), so the match is exact; the oracle's
    plain ordered row_number is the independent formulation of the
    engine's two-phase distributed rank."""
    final = f"c{em_rounds + 1}"
    return f"""
WITH {_unigram_train_ctes(vocab_size, max_piece_len, max_word_len, em_rounds, seed_multiplier)}
SELECT piece, cnt AS freq,
       {_r6("ln(CAST(cnt AS DOUBLE) / t.total)")} AS logprob,
       CAST(row_number() OVER (ORDER BY cnt DESC, piece ASC) - 1 AS INT) AS token_id
FROM {final}, (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM {final}) t
"""


def unigram_token_counts_sql(
    vocab_size: int = 32,
    max_piece_len: int = 4,
    max_word_len: int = 16,
    em_rounds: int = 2,
    seed_multiplier: int = 4,
) -> str:
    """Twin of operators.unigram.unigram_token_counts: per-document token
    counts under the final segmentation — cost-table join (final-round
    segmentations; over-cap words cost one piece per codepoint), never
    re-running Viterbi per occurrence."""
    pre = _bpe_pre_re_sql("char")
    return f"""
WITH {_unigram_train_ctes(vocab_size, max_piece_len, max_word_len, em_rounds, seed_multiplier)},
cost AS (
  SELECT word, CAST(len(segs) AS BIGINT) AS n_tokens FROM f{em_rounds}
  UNION ALL
  SELECT word, CAST(len(word) AS BIGINT) AS n_tokens
  FROM wall WHERE len(word) > {max_word_len}
),
occ AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS occ FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '{pre}')) AS word
    FROM documents
  ) GROUP BY doc_id, word
),
agg AS (
  SELECT o.doc_id,
         CAST(sum(o.occ) AS BIGINT) AS pre,
         CAST(sum(o.occ * c.n_tokens) AS BIGINT) AS uni
  FROM occ o JOIN cost c USING (word)
  GROUP BY o.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.pre, 0) AS BIGINT) AS n_pretokens,
       CAST(coalesce(a.uni, 0) AS BIGINT) AS n_unigram_tokens
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def unigram_fertility_sql(
    vocab_size: int = 32,
    max_piece_len: int = 4,
    max_word_len: int = 16,
    em_rounds: int = 2,
    seed_multiplier: int = 4,
    group_col: str = "lang",
) -> str:
    """Twin of operators.unigram.unigram_fertility: per-group fertility
    under the trained unigram vocabulary — quantized ratios, zero
    denominators → NULL (the bpe_fertility_sql shape over the unigram
    cost table)."""
    pre = _bpe_pre_re_sql("char")
    return f"""
WITH {_unigram_train_ctes(vocab_size, max_piece_len, max_word_len, em_rounds, seed_multiplier)},
cost AS (
  SELECT word, CAST(len(segs) AS BIGINT) AS n_tokens FROM f{em_rounds}
  UNION ALL
  SELECT word, CAST(len(word) AS BIGINT) AS n_tokens
  FROM wall WHERE len(word) > {max_word_len}
),
occ AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS occ FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '{pre}')) AS word
    FROM documents
  ) GROUP BY doc_id, word
),
perdoc AS (
  SELECT d.doc_id, d.{group_col},
         CAST(coalesce(octet_length(encode(d.text)), 0) AS BIGINT) AS b,
         CAST(coalesce(a.pre, 0) AS BIGINT) AS pre,
         CAST(coalesce(a.uni, 0) AS BIGINT) AS uni
  FROM documents d LEFT JOIN (
    SELECT o.doc_id,
           CAST(sum(o.occ) AS BIGINT) AS pre,
           CAST(sum(o.occ * c.n_tokens) AS BIGINT) AS uni
    FROM occ o JOIN cost c USING (word)
    GROUP BY o.doc_id
  ) a USING (doc_id)
),
g AS (
  SELECT {group_col},
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(b) AS BIGINT) AS total_bytes,
         CAST(sum(pre) AS BIGINT) AS total_pretokens,
         CAST(sum(uni) AS BIGINT) AS total_tokens
  FROM perdoc GROUP BY {group_col}
)
SELECT {group_col}, n_docs, total_bytes, total_pretokens, total_tokens,
       {_r6("CASE WHEN total_pretokens > 0 THEN total_tokens / CAST(total_pretokens AS DOUBLE) END")}
         AS tokens_per_pretoken,
       {_r6("CASE WHEN total_tokens > 0 THEN total_bytes / CAST(total_tokens AS DOUBLE) END")}
         AS bytes_per_token
FROM g
"""


def unigram_token_sequences_sql(
    vocab_size: int = 32,
    max_piece_len: int = 4,
    max_word_len: int = 16,
    em_rounds: int = 2,
    seed_multiplier: int = 4,
) -> str:
    """Twin of operators.unigram.unigram_token_sequences: per-document
    (doc_id, pos, token, token_id) under the trained unigram vocabulary —
    the bpe_token_sequences_sql shape with the unigram cost/id tables
    (final-round segmentations + per-codepoint over-cap bypass; ids by
    (freq DESC, piece ASC) over the final counts)."""
    pre = _bpe_pre_re_sql("char")
    final = f"c{em_rounds + 1}"
    return f"""
WITH {_unigram_train_ctes(vocab_size, max_piece_len, max_word_len, em_rounds, seed_multiplier)},
ids AS (
  SELECT piece AS token,
         CAST(row_number() OVER (ORDER BY cnt DESC, piece ASC) - 1 AS INT) AS token_id
  FROM {final}
),
wseq AS (
  SELECT doc_id, u.i AS wpos, arr[u.i + 1] AS word
  FROM (
    SELECT doc_id, regexp_extract_all(text, '{pre}') AS arr
    FROM documents
  ) t, unnest(range(0, len(arr))) u(i)
),
cost AS (
  SELECT word, segs FROM f{em_rounds}
  UNION ALL
  SELECT word, regexp_extract_all(word, '.') AS segs
  FROM wall WHERE len(word) > {max_word_len}
),
wbase AS (
  SELECT w.doc_id, w.wpos, c.segs,
         sum(len(c.segs)) OVER (PARTITION BY w.doc_id ORDER BY w.wpos)
           - len(c.segs) AS base
  FROM wseq w JOIN cost c USING (word)
)
SELECT s.doc_id, s.pos, s.token, i.token_id
FROM (
  SELECT b.doc_id,
         CAST(b.base + u.i AS BIGINT) AS pos,
         b.segs[u.i + 1] AS token
  FROM wbase b, unnest(range(0, len(b.segs))) u(i)
) s JOIN ids i ON i.token = s.token
"""


def unigram_pack_blocks_sql(
    block_tokens: int,
    vocab_size: int = 32,
    max_piece_len: int = 4,
    max_word_len: int = 16,
    em_rounds: int = 2,
    seed_multiplier: int = 4,
) -> str:
    """Twin of operators.unigram.unigram_pack_blocks: the sequence query
    as a CTE, then ordered row_number + integer div/mod block arithmetic
    (the bpe_pack_blocks_sql shape)."""
    seq = unigram_token_sequences_sql(
        vocab_size, max_piece_len, max_word_len, em_rounds, seed_multiplier
    )
    return f"""
WITH seq AS ({seq})
SELECT CAST((row_number() OVER (ORDER BY doc_id, pos) - 1) // {int(block_tokens)} AS BIGINT)
         AS block_id,
       CAST((row_number() OVER (ORDER BY doc_id, pos) - 1) % {int(block_tokens)} AS INT)
         AS "offset",
       doc_id,
       token_id
FROM seq
"""


# --- WordPiece tokenizer (operators/wordpiece.py) ---------------------------


def _wp_round_ctes(i: int) -> str:
    """One unrolled WordPiece merge round — the _bpe_round_ctes mechanics
    (run-parity greedy non-overlap apply, MATERIALIZED multi-reference
    CTEs) with the likelihood-ratio argmax: best pair maximizes
    ``double(pair_count) / (double(left_count) * double(right_count))``
    over the CURRENT state's symbol counts. IEEE double *, / are
    correctly rounded and engine-independent (only transcendentals
    differ between libm and the JVM), and each count is cast to double
    BEFORE the product (the BIGINT-overflow-proof order the Spark side
    uses), so both engines rank every candidate bit-identically; ties
    break by (a, b) binary string order. The merged symbol keeps the
    left's position-form and drops the right's '##' marker
    (``a || b[3:]`` — every right-hand symbol is a continuation)."""
    return f"""sc{i} AS (
  SELECT s[u.i + 1] AS sym, CAST(sum(freq) AS BIGINT) AS cnt
  FROM v{i}, unnest(range(0, len(s))) u(i)
  GROUP BY 1
),
pc{i} AS (
  SELECT s[u.i + 1] AS a, s[u.i + 2] AS b, CAST(sum(freq) AS BIGINT) AS pair_count
  FROM v{i}, unnest(range(0, len(s) - 1)) u(i)
  GROUP BY 1, 2
),
b{i} AS MATERIALIZED (
  SELECT p.a, p.b, p.a || p.b[3:] AS merged, p.pair_count,
         ca.cnt AS left_count, cb.cnt AS right_count
  FROM pc{i} p
  JOIN sc{i} ca ON ca.sym = p.a
  JOIN sc{i} cb ON cb.sym = p.b
  ORDER BY CAST(p.pair_count AS DOUBLE)
             / (CAST(ca.cnt AS DOUBLE) * CAST(cb.cnt AS DOUBLE)) DESC,
           p.a ASC, p.b ASC
  LIMIT 1
),
p{i} AS (
  SELECT word, u.i AS pos, s[u.i + 1] AS sym
  FROM v{i}, unnest(range(0, len(s))) u(i)
),
q{i} AS (
  SELECT word, pos, sym,
         coalesce(sym = (SELECT a FROM b{i})
                  AND lead(sym) OVER (PARTITION BY word ORDER BY pos)
                      = (SELECT b FROM b{i}), FALSE) AS mtch
  FROM p{i}
),
g{i} AS (
  SELECT *, CASE WHEN mtch
    THEN pos - row_number() OVER (PARTITION BY word, mtch ORDER BY pos) END AS grp
  FROM q{i}
),
st{i} AS (
  SELECT word, pos, sym,
         mtch AND (pos - min(pos) OVER (PARTITION BY word, grp)) % 2 = 0 AS strt
  FROM g{i}
),
c{i} AS (
  SELECT word, pos, sym, strt,
         coalesce(lag(strt) OVER (PARTITION BY word ORDER BY pos), FALSE) AS consumed
  FROM st{i}
),
v{i + 1} AS MATERIALIZED (
  SELECT c.word, v.freq,
         list(CASE WHEN c.strt THEN (SELECT merged FROM b{i}) ELSE c.sym END
              ORDER BY c.pos) FILTER (WHERE NOT c.consumed) AS s
  FROM c{i} c JOIN v{i} v USING (word)
  GROUP BY c.word, v.freq
)"""


def _wp_train_ctes(num_merges: int, max_word_len: int) -> str:
    """Trainer CTE chain: char-level pre-tokens, position-form symbol
    arrays (raw first codepoint, '##'-prefixed continuations — DuckDB
    list_transform lambdas index from 1), the codepoint-count cap split,
    then the unrolled scored merge rounds."""
    parts = [
        f"pre AS (SELECT unnest(regexp_extract_all(text, '{_bpe_pre_re_sql('char')}')) AS word FROM documents)",
        "vall AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS freq, "
        "list_transform(regexp_extract_all(word, '.'), "
        "(c, i) -> CASE WHEN i = 1 THEN c ELSE '##' || c END) AS s "
        "FROM pre GROUP BY word)",
        f"v0 AS MATERIALIZED (SELECT * FROM vall WHERE len(s) <= {max_word_len})",
    ]
    parts.extend(_wp_round_ctes(i) for i in range(num_merges))
    return ",\n".join(parts)


def _wp_merge_rows(num_merges: int) -> str:
    rows = "\nUNION ALL\n".join(
        f"SELECT {i} AS merge_rank, a AS left_sym, b AS right_sym, merged, "
        f"pair_count, left_count, right_count FROM b{i}"
        for i in range(num_merges)
    )
    if not rows:
        rows = (
            "SELECT CAST(NULL AS INT) AS merge_rank, '' AS left_sym, "
            "'' AS right_sym, '' AS merged, CAST(NULL AS BIGINT) AS pair_count, "
            "CAST(NULL AS BIGINT) AS left_count, CAST(NULL AS BIGINT) AS right_count "
            "WHERE FALSE"
        )
    return rows


def _wp_greedy_ctes(num_merges: int, max_word_len: int) -> str:
    """Greedy longest-match-first encode of every DISTINCT in-cap word —
    the INDEPENDENT relational formulation of the Spark side's sequential
    scan: precompute a JUMP TABLE (for each word × start position, the
    LONGEST vocab piece matching there — a window argmax, no loop), then
    follow each word's unique chain from position 0 with one recursive
    CTE over the jump table (pure transitive closure; positions strictly
    increase, so it terminates). A word whose chain reaches exactly its
    codepoint count is encoded by the pieces along the chain; a word
    stuck earlier (no piece matches some position) or over the cap is
    the single [UNK] token — the HF max_input_chars_per_word semantics.
    Candidate lengths enumerate EVERY prefix of the remainder (words are
    capped, so ≤ max_word_len candidates per position), matching the
    Spark kernel's all-prefixes scan: which candidates MATCH depends
    only on piece-set membership, so the two formulations agree."""
    return f"""m AS ({_wp_merge_rows(num_merges)}),
alpha AS (SELECT DISTINCT unnest(s) AS token FROM vall),
pieces AS MATERIALIZED (
  SELECT '[UNK]' AS token
  UNION ALL SELECT token FROM alpha
  UNION ALL SELECT merged FROM m
),
wincap AS MATERIALIZED (
  SELECT word, regexp_extract_all(word, '.') AS cp, len(s) AS n
  FROM vall WHERE len(s) <= {max_word_len}
),
cand AS (
  SELECT w.word, u.p, v.l,
         CASE WHEN u.p = 0 THEN '' ELSE '##' END
           || array_to_string(cp[u.p + 1 : u.p + v.l], '') AS piece
  FROM wincap w,
       unnest(range(0, n)) u(p),
       unnest(range(1, {max_word_len} + 1)) v(l)
  WHERE u.p + v.l <= w.n
),
jump AS MATERIALIZED (
  SELECT word, p, l, piece FROM (
    SELECT c.*, row_number() OVER (PARTITION BY c.word, c.p ORDER BY c.l DESC) AS rn
    FROM cand c JOIN pieces ps ON ps.token = c.piece
  ) WHERE rn = 1
),
chain AS (
  SELECT word, 0 AS pos FROM wincap
  UNION ALL
  SELECT c.word, c.pos + j.l
  FROM chain c JOIN jump j ON j.word = c.word AND j.p = c.pos
),
enc AS (
  SELECT w.word, w.n,
         CASE WHEN max(c.pos) = w.n
              THEN list(j.piece ORDER BY c.pos) FILTER (WHERE j.piece IS NOT NULL)
              ELSE ['[UNK]'] END AS segs
  FROM wincap w
  JOIN chain c ON c.word = w.word
  LEFT JOIN jump j ON j.word = c.word AND j.p = c.pos
  GROUP BY w.word, w.n
),
cost AS (
  SELECT word, segs FROM enc
  UNION ALL
  SELECT word, ['[UNK]'] AS segs FROM vall WHERE len(s) > {max_word_len}
)"""


def wordpiece_vocab_sql(num_merges: int = 8, max_word_len: int = 16) -> str:
    """Twin of operators.wordpiece.wordpiece_vocab: the exported token-id
    table — [UNK] at id 0 (vocabulary proper, the BERT convention), the
    corpus-observed position-form alphabet at 1..n in binary string order
    (plain ordered row_number — the INDEPENDENT formulation of the
    engine's two-phase distributed rank), merges at n + 1 + rank. All
    integers and strings, so the match is exact."""
    return f"""
WITH {_wp_train_ctes(num_merges, max_word_len)},
m AS ({_wp_merge_rows(num_merges)}),
alpha AS (SELECT DISTINCT unnest(s) AS token FROM vall)
SELECT '[UNK]' AS token, CAST(0 AS INT) AS token_id, 'special' AS source
UNION ALL
SELECT token, CAST(row_number() OVER (ORDER BY token) AS INT) AS token_id,
       'base' AS source
FROM alpha
UNION ALL
SELECT merged AS token,
       CAST((SELECT count(*) FROM alpha) + 1 + merge_rank AS INT) AS token_id,
       'merge' AS source
FROM m
"""


def wordpiece_token_counts_sql(num_merges: int = 8, max_word_len: int = 16) -> str:
    """Twin of operators.wordpiece.wordpiece_token_counts: per-document
    (n_pretokens, n_wordpiece_tokens) under the trained vocabulary's
    GREEDY encode — cost-table join over distinct words, never re-running
    the greedy scan per occurrence."""
    pre = _bpe_pre_re_sql("char")
    return f"""
WITH RECURSIVE {_wp_train_ctes(num_merges, max_word_len)},
{_wp_greedy_ctes(num_merges, max_word_len)},
occ AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS occ FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '{pre}')) AS word
    FROM documents
  ) GROUP BY doc_id, word
),
agg AS (
  SELECT o.doc_id,
         CAST(sum(o.occ) AS BIGINT) AS pre,
         CAST(sum(o.occ * len(c.segs)) AS BIGINT) AS wpt
  FROM occ o JOIN cost c USING (word)
  GROUP BY o.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.pre, 0) AS BIGINT) AS n_pretokens,
       CAST(coalesce(a.wpt, 0) AS BIGINT) AS n_wordpiece_tokens
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def wordpiece_fertility_sql(
    num_merges: int = 8, max_word_len: int = 16, group_col: str = "lang"
) -> str:
    """Twin of operators.wordpiece.wordpiece_fertility: per-group fertility
    under the greedy-encoded WordPiece vocabulary — quantized ratios, zero
    denominators → NULL (the unigram_fertility_sql shape over the greedy
    cost table)."""
    pre = _bpe_pre_re_sql("char")
    return f"""
WITH RECURSIVE {_wp_train_ctes(num_merges, max_word_len)},
{_wp_greedy_ctes(num_merges, max_word_len)},
occ AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS occ FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '{pre}')) AS word
    FROM documents
  ) GROUP BY doc_id, word
),
perdoc AS (
  SELECT d.doc_id, d.{group_col},
         CAST(coalesce(octet_length(encode(d.text)), 0) AS BIGINT) AS b,
         CAST(coalesce(a.pre, 0) AS BIGINT) AS pre,
         CAST(coalesce(a.wpt, 0) AS BIGINT) AS wpt
  FROM documents d LEFT JOIN (
    SELECT o.doc_id,
           CAST(sum(o.occ) AS BIGINT) AS pre,
           CAST(sum(o.occ * len(c.segs)) AS BIGINT) AS wpt
    FROM occ o JOIN cost c USING (word)
    GROUP BY o.doc_id
  ) a USING (doc_id)
),
g AS (
  SELECT {group_col},
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(b) AS BIGINT) AS total_bytes,
         CAST(sum(pre) AS BIGINT) AS total_pretokens,
         CAST(sum(wpt) AS BIGINT) AS total_tokens
  FROM perdoc GROUP BY {group_col}
)
SELECT {group_col}, n_docs, total_bytes, total_pretokens, total_tokens,
       {_r6("CASE WHEN total_pretokens > 0 THEN total_tokens / CAST(total_pretokens AS DOUBLE) END")}
         AS tokens_per_pretoken,
       {_r6("CASE WHEN total_tokens > 0 THEN total_bytes / CAST(total_tokens AS DOUBLE) END")}
         AS bytes_per_token
FROM g
"""


def wordpiece_token_sequences_sql(
    num_merges: int = 8, max_word_len: int = 16
) -> str:
    """Twin of operators.wordpiece.wordpiece_token_sequences: per-document
    (doc_id, pos, token, token_id) under the greedy segmentations — the
    unigram_token_sequences_sql shape with the WordPiece cost/id tables
    ([UNK] id 0, alphabet 1..n, merges after)."""
    pre = _bpe_pre_re_sql("char")
    return f"""
WITH RECURSIVE {_wp_train_ctes(num_merges, max_word_len)},
{_wp_greedy_ctes(num_merges, max_word_len)},
ids AS (
  SELECT '[UNK]' AS token, CAST(0 AS INT) AS token_id
  UNION ALL
  SELECT token, CAST(row_number() OVER (ORDER BY token) AS INT) AS token_id
  FROM alpha
  UNION ALL
  SELECT merged AS token,
         CAST((SELECT count(*) FROM alpha) + 1 + merge_rank AS INT) AS token_id
  FROM m
),
wseq AS (
  SELECT doc_id, u.i AS wpos, arr[u.i + 1] AS word
  FROM (
    SELECT doc_id, regexp_extract_all(text, '{pre}') AS arr
    FROM documents
  ) t, unnest(range(0, len(arr))) u(i)
),
wbase AS (
  SELECT w.doc_id, w.wpos, c.segs,
         sum(len(c.segs)) OVER (PARTITION BY w.doc_id ORDER BY w.wpos)
           - len(c.segs) AS base
  FROM wseq w JOIN cost c USING (word)
)
SELECT s.doc_id, s.pos, s.token, i.token_id
FROM (
  SELECT b.doc_id,
         CAST(b.base + u.i AS BIGINT) AS pos,
         b.segs[u.i + 1] AS token
  FROM wbase b, unnest(range(0, len(b.segs))) u(i)
) s JOIN ids i ON i.token = s.token
"""


def wordpiece_pack_blocks_sql(
    block_tokens: int, num_merges: int = 8, max_word_len: int = 16
) -> str:
    """Twin of operators.wordpiece.wordpiece_pack_blocks: the sequence
    query as a CTE, then ordered row_number + exact BIGINT div/mod block
    arithmetic (the bpe/unigram pack shape)."""
    seq = wordpiece_token_sequences_sql(num_merges, max_word_len)
    return f"""
WITH seq AS ({seq})
SELECT CAST((row_number() OVER (ORDER BY doc_id, pos) - 1) // {int(block_tokens)} AS BIGINT)
         AS block_id,
       CAST((row_number() OVER (ORDER BY doc_id, pos) - 1) % {int(block_tokens)} AS INT)
         AS "offset",
       doc_id,
       token_id
FROM seq
"""


def session_type_overlap_sql(
    session_gap_s: int = 1800, span_gap_s: int = 3600
) -> str:
    """Twin of operators.intervals.session_type_overlap. DuckDB runs the
    overlap as a plain inequality join (IEJoin) — the bin decomposition is
    Spark's execution strategy, not part of the semantics — over the same
    two derived interval sets: per-user sessions (sessionize gap rule,
    NULL-ts rows excluded at the shared chokepoint) and per-event-type
    activity spans (same rule partitioned by type, NULL types excluded).
    All interval math on floored epoch seconds — BIGINT in both engines,
    no float tolerance anywhere."""
    return f"""
WITH e AS (
  SELECT event_id, user_id, event_type, ts, floor(epoch(ts))::BIGINT AS ep
  FROM events WHERE ts IS NOT NULL
),
sm AS (
  SELECT *, CASE WHEN lag(ep) OVER w IS NULL OR ep - lag(ep) OVER w > {session_gap_s}
                 THEN 1 ELSE 0 END AS ns
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_idx,
         ep
  FROM sm
),
sgrp AS (
  SELECT user_id, session_idx, min(ep) AS s_start, max(ep) AS s_end
  FROM sess GROUP BY 1, 2
),
t AS (SELECT event_id, event_type, ts, ep FROM e WHERE event_type IS NOT NULL),
tm AS (
  SELECT *, CASE WHEN lag(ep) OVER w IS NULL OR ep - lag(ep) OVER w > {span_gap_s}
                 THEN 1 ELSE 0 END AS ns
  FROM t WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
),
tspan AS (
  SELECT event_type,
         sum(ns) OVER (PARTITION BY event_type ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS span_idx,
         ep
  FROM tm
),
span AS (
  SELECT event_type, span_idx, min(ep) AS p_start, max(ep) AS p_end
  FROM tspan GROUP BY 1, 2
)
SELECT s.user_id, p.event_type,
       count(*)::BIGINT AS n_overlaps,
       count(DISTINCT p.span_idx)::BIGINT AS n_spans,
       sum(least(s.s_end, p.p_end) - greatest(s.s_start, p.p_start))::BIGINT
         AS overlap_s
FROM sgrp s JOIN span p ON s.s_start <= p.p_end AND p.p_start <= s.s_end
GROUP BY 1, 2
"""


def session_type_overlap_left_sql(
    target_type: str, session_gap_s: int = 1800, span_gap_s: int = 1800
) -> str:
    """Twin of operators.intervals.session_type_overlap_left. DuckDB runs
    the outer overlap as a plain inequality LEFT JOIN (IEJoin) — the bin
    decomposition plus matched/anti-union is Spark's execution strategy,
    not part of the semantics. Session identity is the SAME composed
    ``user_id * 1000000 + session_idx`` expression, textually; sessions
    overlapping no span survive with n_spans = 0 / overlap_s = 0 (the
    exceptions population the inner join drops). All math on floored
    epoch seconds — BIGINT both engines, no float tolerance."""
    tt = target_type.replace("'", "''")
    return f"""
WITH e AS (
  SELECT event_id, user_id, event_type, ts, floor(epoch(ts))::BIGINT AS ep
  FROM events WHERE ts IS NOT NULL
),
sm AS (
  SELECT *, CASE WHEN lag(ep) OVER w IS NULL OR ep - lag(ep) OVER w > {session_gap_s}
                 THEN 1 ELSE 0 END AS ns
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_idx,
         ep
  FROM sm
),
sgrp AS (
  SELECT user_id,
         (user_id * 1000000 + session_idx)::BIGINT AS session_id,
         min(ep) AS s_start, max(ep) AS s_end
  FROM sess GROUP BY user_id, session_idx
),
t AS (SELECT event_id, ts, ep FROM e WHERE event_type = '{tt}'),
tm AS (
  SELECT *, CASE WHEN lag(ep) OVER w IS NULL OR ep - lag(ep) OVER w > {span_gap_s}
                 THEN 1 ELSE 0 END AS ns
  FROM t WINDOW w AS (ORDER BY ts, event_id)
),
tspan AS (
  SELECT sum(ns) OVER (ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS span_idx,
         ep
  FROM tm
),
span AS (SELECT span_idx, min(ep) AS p_start, max(ep) AS p_end FROM tspan GROUP BY 1)
SELECT s.session_id, s.user_id, s.s_start, s.s_end,
       count(p.span_idx)::BIGINT AS n_spans,
       coalesce(sum(CASE WHEN p.span_idx IS NOT NULL
                         THEN least(s.s_end, p.p_end) - greatest(s.s_start, p.p_start)
                    END),
                0)::BIGINT AS overlap_s
FROM sgrp s LEFT JOIN span p ON s.s_start <= p.p_end AND p.p_start <= s.s_end
GROUP BY 1, 2, 3, 4
"""


def session_concurrency_sql(session_gap_s: int = 1800) -> str:
    """Twin of operators.intervals.session_concurrency: the boundary
    sweep (+1 at s_start, −1 at s_end+1 — closed integer intervals, so
    touching sessions never read concurrent) over per-user sessions, with
    DuckDB's single windowed running sum standing in for Spark's
    two-phase distributed prefix sum (identical semantics; the
    distribution strategy is not part of the contract)."""
    return f"""
WITH e AS (
  SELECT event_id, user_id, ts, floor(epoch(ts))::BIGINT AS ep
  FROM events WHERE ts IS NOT NULL
),
sm AS (
  SELECT *, CASE WHEN lag(ep) OVER w IS NULL OR ep - lag(ep) OVER w > {session_gap_s}
                 THEN 1 ELSE 0 END AS ns
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_idx,
         ep
  FROM sm
),
sgrp AS (
  SELECT user_id, session_idx, min(ep) AS s_start, max(ep) AS s_end
  FROM sess GROUP BY 1, 2
),
b AS (
  SELECT s_start AS t, 1 AS delta FROM sgrp
  UNION ALL
  SELECT s_end + 1, -1 FROM sgrp
),
n AS (SELECT t, sum(delta) AS net FROM b GROUP BY 1)
SELECT t,
       sum(net) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)::BIGINT AS concurrency
FROM n
"""


def zorder_stats_sql(bits: int = 8, prefix_bits: int = 6) -> str:
    """Twin of operators.layout.zorder_stats over events (user_id, value).

    The Morton cell ids use the SAME double expression text as the Spark
    side — (v - mn) / (mx - mn) * 2^bits, floored, clamped — so cell
    boundaries round bit-identically; the bit interleave is generated by
    the same Python loop shape as layout._interleave. Value sanitization
    via the shared _EVF envelope (= functions.finite_or_null)."""
    scale = float(1 << bits)
    cap = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"(((c1 >> {i}) & 1) << {2 * i})")
        terms.append(f"(((c2 >> {i}) & 1) << {2 * i + 1})")
    interleave = " | ".join(terms)
    shift = 2 * bits - prefix_bits
    return f"""
WITH e AS (
  SELECT user_id::DOUBLE AS x, value AS y FROM {_EVF}
  WHERE user_id IS NOT NULL AND value IS NOT NULL
),
st AS (SELECT min(x) AS mn1, max(x) AS mx1, min(y) AS mn2, max(y) AS mx2 FROM e),
k AS (
  SELECT x, y,
    CASE WHEN mx1 > mn1
         THEN least(floor((x - mn1) / (mx1 - mn1) * {scale})::BIGINT, {cap})
         ELSE 0 END AS c1,
    CASE WHEN mx2 > mn2
         THEN least(floor((y - mn2) / (mx2 - mn2) * {scale})::BIGINT, {cap})
         ELSE 0 END AS c2
  FROM e CROSS JOIN st
),
z AS (SELECT x, y, ({interleave})::BIGINT AS zkey FROM k),
g AS (
  SELECT (zkey >> {shift})::BIGINT AS zbucket,
         count(*)::BIGINT AS n_rows,
         {_r6('min(x)')} AS min_1, {_r6('max(x)')} AS max_1,
         {_r6('min(y)')} AS min_2, {_r6('max(y)')} AS max_2
  FROM z GROUP BY 1
)
SELECT zbucket, n_rows, min_1, max_1, min_2, max_2,
       {_r6('max_1 - min_1')} AS span_1,
       {_r6('max_2 - min_2')} AS span_2
FROM g
"""
