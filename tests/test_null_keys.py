"""NULL-key posture: rows with NULL identity (doc_id, vec_id), NULL event
time, or NULL category keys are routine at 100 TB (dropped join columns,
anonymous events, schema drift) and they diverge across engines in quiet
ways — Spark windows sort NULLS FIRST where DuckDB sorts NULLS LAST, a
NULL key silently drops from one engine's equi-join but not the other's
grouping, and a NaN doc_id crashed the frame sampler's int64 output
column. Policy (round 5): key-/time-dependent operators exclude such rows
identically on BOTH engines at their ingestion chokepoints; this suite
poisons one corpus with every NULL-key class and hash-compares each
affected query's twins."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import TESTDATA_TABLES, normalize

# queries that diverged (or crashed) under NULL keys before the guards
AFFECTED = [
    "events_sessionize",
    "events_transitions",
    "events_anomaly",
    "events_approx_stats",
    "events_hll_merge",
    "docs_pack_shards",
    "docs_pack_blocks",
    "docs_dedup_spans",
    "docs_quality_percentiles",
    "dedup_semantic",
    "multimodal_frame_sample",
    # r5 code-review finds: chunk reassembly merged NULL-doc_id tokens
    # into one garbage chunk; hard_negatives' inline prep skipped the
    # NULL-vid exclusion its twin applies; trend rows with NULL ts fed
    # n/Σy but not Σx/Σx²
    "docs_chunk",
    "sim_hard_negatives",
    "events_user_trend",
    # second r5 review batch, each a live-verified divergence before the
    # guards: NULL-ts rows ordered at opposite ends of windows/sequences
    # (asof carry, paths, session assignment) and a NULL-doc_id dedup
    # survivor picked differently per engine (quality corpus and its
    # composed consumers)
    "events_top_paths",
    "events_asof_purchase",
    "events_session_funnel",
    "docs_quality_corpus",
    "docs_training_corpus",
    # third r5 review batch — NULL-TEXT divergences (poisoned above):
    # NULL text hashed like '' on Spark (one giant est=1.0 false cluster)
    # vs NULL shingles joining nothing in DuckDB; lang_id returned the
    # tie-break winner 'de' for NULL text vs the oracle's 'und'
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "docs_pagerank",
    "dedup_lsh_recall",
    "docs_lang_id",
    "docs_lang_confusion",
    "docs_decontaminate_fuzzy",
    "docs_fingerprint",
    # spot-check neighbors that already agreed on NULL keys (regression
    # guard for the ops that handle NULLs by grouping, not exclusion)
    "events_top_types",
    "events_json_props",
    "docs_text_stats",
    "dedup_exact",
    "sim_topk_bruteforce",
]


@pytest.fixture(scope="module")
def nullkey_sf_dir(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    d = tmp_path_factory.mktemp("testdata_nullkeys")
    for t in TESTDATA_TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        if t == "documents":
            df = df.withColumn(
                "doc_id",
                F.when(F.col("doc_id") % 101 == 0, F.lit(None)).otherwise(
                    F.col("doc_id")
                ),
            ).withColumn(
                # NULL text (failed extraction — routine at 100 TB): hashes
                # like EMPTY text on Spark but like NULL in DuckDB, which
                # false-clustered every NULL-text doc (r5 review, live)
                "text",
                F.when(F.col("doc_id") % 41 == 3, F.lit(None)).otherwise(
                    F.col("text")
                ),
            )
        if t == "embeddings":
            df = df.withColumn(
                "vec_id",
                F.when(F.col("vec_id") % 103 == 0, F.lit(None)).otherwise(
                    F.col("vec_id")
                ),
            )
        if t == "events":
            df = (
                df.withColumn(
                    "user_id",
                    F.when(F.col("event_id") % 107 == 0, F.lit(None)).otherwise(
                        F.col("user_id")
                    ),
                )
                .withColumn(
                    "ts",
                    F.when(F.col("event_id") % 109 == 0, F.lit(None)).otherwise(
                        F.col("ts")
                    ),
                )
                .withColumn(
                    "event_type",
                    F.when(F.col("event_id") % 113 == 0, F.lit(None)).otherwise(
                        F.col("event_type")
                    ),
                )
            )
        df.coalesce(1).write.mode("overwrite").parquet(str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def duck_nullkeys(nullkey_sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{nullkey_sf_dir}/{t}.parquet/*.parquet'"
        )
    return con


@pytest.mark.parametrize("name", AFFECTED)
def test_twin_parity_survives_null_keys(spark, nullkey_sf_dir, duck_nullkeys, name):
    q = entrymod.queries()[name]
    sdf = normalize(q(spark, nullkey_sf_dir).toPandas())
    o = entrymod.oracle_sql().get(name)
    if o is None:
        return  # weak-checked op: executing without raising is the contract
    ddf = normalize(duck_nullkeys.execute(o).df())
    assert sdf.equals(ddf), (
        f"{name}: NULL-key corpus diverged "
        f"(spark {len(sdf)} rows vs oracle {len(ddf)} rows)"
    )
