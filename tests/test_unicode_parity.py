"""Cross-engine parity must not depend on text being ASCII.

The shipped testdata is pure ASCII, so a text operator whose Spark plan
and DuckDB twin silently disagree on multibyte input (byte-length vs
char-length, byte-slicing vs char-slicing, locale-sensitive casing)
would pass every driver check and still be wrong for a real-world
corpus. This suite re-runs the text/dedup operator twins over a corpus
with CJK, accented latin, cyrillic, and emoji appended to half the docs
and requires the SAME exact-match parity the driver demands.

Deliberately exempt (byte-level media ops whose SQL twins model chars,
boundary documented at oracle_ext.multimodal_*_sql): multimodal_features
(per-byte bucket sums) and multimodal_resize (byte-stride slices can
split codepoints — the query surfaces those as NULL text via
try_validate_utf8 rather than throwing, covered below).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import TESTDATA_TABLES, assert_frames_match

# \x0b (vertical tab) is the regex-\s edge where Java and RE2 disagree —
# kept in the corpus so the explicit whitespace class in BPE_TOKEN_RE
# stays load-bearing; \xa0 (NBSP) is the Python-\s-only divergence twin
UNICODE_SUFFIX = " 日本語テスト café naïve über 😀🌍 привет 中文分析 a\x0bb c\xa0d"

# text-centric operators whose parity must be byte/char-assumption-free
TEXT_QUERIES = [
    "docs_text_stats",
    "docs_lang_id",
    "docs_fingerprint",
    "docs_repetition",
    "docs_chunk",
    "docs_top_ngrams",
    "docs_tfidf_top_terms",
    "docs_winnow_fingerprints",
    "docs_dedup_spans",
    "docs_vocabulary",
    "docs_ccnet_buckets",
    "docs_bpe_merges",
    "docs_bpe_tokens",
    # byte-level mode: \p{L}/\p{N} must classify CJK/accents/emoji the
    # same in Java regex and RE2, and the hex-pair byte split must agree
    "docs_bpe_merges_byte",
    "docs_bpe_tokens_byte",
    "docs_bpe_vocab",
    "docs_bpe_vocab_byte",
    "docs_bpe_token_seq",
    "docs_bpe_pack_ids",
    "docs_dq_audit",
    "docs_bpe_fertility",
    "docs_dsir_weights",
    # unigram-LM: substring seeding + Viterbi DP must index by CODEPOINT
    # identically in Spark substring()/split-by-empty, DuckDB substr()/
    # regexp '.' and Python slicing (the sequential reference)
    "docs_unigram_vocab",
    "docs_unigram_tokens",
    "docs_unigram_fertility",
    "docs_unigram_seq",
    "docs_unigram_pack_ids",
    # WordPiece: the ##-form symbol split, double-ratio argmax, and the
    # greedy jump-table/pandas-UDF pair must index by CODEPOINT
    # identically in Spark split-by-empty/substring, DuckDB regexp '.'/
    # list slicing, and Python string slicing
    "docs_wordpiece_vocab",
    "docs_wordpiece_tokens",
    "docs_wordpiece_fertility",
    "docs_wordpiece_seq",
    "docs_wordpiece_pack_ids",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "multimodal_meta",
    "multimodal_frame_sample",
]


@pytest.fixture(scope="module")
def unicode_sf_dir(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    d = tmp_path_factory.mktemp("testdata_unicode")
    for t in TESTDATA_TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        if t == "documents":
            df = df.withColumn(
                "text",
                F.when(
                    F.col("doc_id") % 2 == 0,
                    F.concat(F.col("text"), F.lit(UNICODE_SUFFIX)),
                ).otherwise(F.col("text")),
            )
        df.coalesce(1).write.mode("overwrite").parquet(str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def duck_unicode(unicode_sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{unicode_sf_dir}/{t}.parquet/*.parquet'"
        )
    return con


@pytest.mark.parametrize("name", TEXT_QUERIES)
def test_text_twin_parity_on_multibyte_corpus(spark, unicode_sf_dir, duck_unicode, name):
    q = entrymod.queries()[name]
    o = entrymod.oracle_sql()[name]
    assert_frames_match(
        q(spark, unicode_sf_dir).toPandas(), duck_unicode.execute(o).df(), name
    )


def test_multimodal_resize_tolerates_codepoint_splits(spark, unicode_sf_dir):
    """Byte-stride resize over multibyte payloads may slice mid-codepoint:
    the registered query must surface those as NULL resized_text, never
    throw MALFORMED_CHARACTER_CODING (it did, round 5)."""
    out = entrymod.queries()["multimodal_resize"](spark, unicode_sf_dir)
    assert out.count() == 500  # executes; invalid slices are NULL text
