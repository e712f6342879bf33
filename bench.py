"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Each query is executed to completion with the no-op sink (full pipeline runs,
nothing materializes on the driver — no collect bottleneck, mirrors a real
distributed write). Extension queries run twice and the second (steady-state)
timing is reported: the first execution pays one-time JVM costs — class
loading, codegen JIT, parquet footer caches — that a long-lived cluster
amortizes across thousands of queries and that would otherwise dominate
sub-10s measurements at test scale.

The HEADLINE billing block reports the MEDIAN of 5 warm runs (after one
untimed cold run): round-3's recorded single-warm-shot numbers swung
±0.3-0.4s run-to-run on sub-2s queries (billing_rule_match was recorded
0.992s in r2 and 1.306s in r3, yet a 10-warm-run probe measured
min/median/max 0.46/0.63/0.85s on the same code — the first warm run is
systematically slowest because codegen JIT is still compiling). A median
of 5 makes the headline stable enough to compare across rounds. All raw
timings go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Reference-engine wall clock on the SAME synthetic fact, measured by
# baseline_ref.py (the reference's own CalculateService imported from
# /root/reference, driven per-day in 10k batches with DuckDB standing in
# for the ClickHouse server-side GROUP BY — see BASELINE.md). Keyed by sf.
# The comparable engine query is billing_flagship_production (same grain,
# same months, same rows out).
REFERENCE_BASELINE_SEC = {0.01: 129.4, 0.1: 181.1}

QUERY_NAMES = [
    "billing_source_agg",
    "billing_source_agg_detail",
    "billing_credits_pivot",
    "billing_rule_match",
    "billing_flagship_month",
    "billing_flagship",
    "billing_flagship_production",
]

# representative extension queries, timed and reported under "ext:" keys but
# EXCLUDED from the headline total so `value` stays comparable across rounds
EXTENDED_NAMES = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q6",
    "tpch_q18",
    "dedup_minhash_lsh",
    # dedup_clusters is excluded: its iterative fixpoint executes eagerly at
    # DataFrame-construction time (localCheckpoint per round), so the
    # write-phase timing bench measures would not include the real work
    "dedup_embedding_lsh",
    "dedup_semantic",
    "sim_topk_ivf",
    "sim_topk_quantized",
    "docs_quality_corpus",
    "docs_training_corpus",
    "docs_tfidf_top_terms",
    "docs_repetition",
    "docs_decontaminate",
    "docs_decontaminate_fuzzy",
    "docs_chunk",
    "docs_winnow_fingerprints",
    "docs_dedup_spans",
    "events_value_deciles",
    "events_anomaly",
    "events_attribution",
    "events_transitions",
    "events_rfm",
    "events_session_funnel",
    "events_sessionize",
    "events_funnel",
    "events_user_trend",
    "events_salted_user_join",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as em
    from billing_etl_v1_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = em.queries()
    timings: dict[str, float] = {}
    for name in QUERY_NAMES:
        if name not in queries:
            continue
        df = queries[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        cold = round(time.perf_counter() - t0, 3)
        warm = []
        for _ in range(5):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            warm.append(round(time.perf_counter() - t0, 3))
        timings[name] = sorted(warm)[len(warm) // 2]
        print(f"# {name}: {timings[name]}s (cold {cold}s, warm {warm})", file=sys.stderr)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    total = round(sum(timings.values()), 3)
    for name in EXTENDED_NAMES:
        if name not in queries:
            continue
        df = queries[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        cold = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[f"ext:{name}"] = round(time.perf_counter() - t0, 3)
        print(f"# ext:{name}: {timings[f'ext:{name}']}s (cold {cold}s)", file=sys.stderr)
    sf_num = float(sf) if sf else None
    ref_sec = REFERENCE_BASELINE_SEC.get(sf_num)
    flagship = timings.get("billing_flagship_production")
    print(
        json.dumps(
            {
                "metric": "billing_engine_headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_num,
                "baseline_reference_sec": ref_sec,
                "speedup_vs_reference": (
                    round(ref_sec / flagship, 1) if ref_sec and flagship else None
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
