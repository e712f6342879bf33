"""Interleaved A/B of the r12 tokenizer-trainer restructure.

Runs ONE code tree (the repo on sys.path[0] / cwd) and prints a JSON line
with per-lane wall times and _apply_merge round counts at the x16
vocabulary-replication scale (scale_probe's suffix lane — the VERDICT r11
done-criterion scale). The driver alternates invocations between the old
tree (git worktree at the pre-rewrite commit) and HEAD so load lands on
both arms; see plans/r12/ab_trainers_results.json for the recorded runs.

Usage: python plans/r12/ab_trainers.py [replication]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

from pyspark.sql import SparkSession  # noqa: E402

rep = int(sys.argv[1]) if len(sys.argv) > 1 else 16
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("ab_trainers")
    # session.py's driver sizing — the raw-builder 1g default made the
    # 64-merge lane GC-bound (50-136s swings on BOTH arms)
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import scale_probe  # noqa: E402
import billing_etl_v1_spark.operators.bpe as bpe_ops  # noqa: E402
import billing_etl_v1_spark.operators.unigram as ug_ops  # noqa: E402
import billing_etl_v1_spark.operators.wordpiece as wp_ops  # noqa: E402

# count merge-apply rounds (each is one localCheckpoint'd Spark pass)
calls = {"n": 0}
_orig_apply = bpe_ops._apply_merge


def _counting_apply(*a, **k):
    calls["n"] += 1
    return _orig_apply(*a, **k)


bpe_ops._apply_merge = _counting_apply
wp_ops._apply_merge = _counting_apply

docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
corpus = scale_probe._replicate_docs(docs, rep, suffix_words=True).localCheckpoint()

out = {"rep": rep, "tree": os.getcwd()}


def lane(name, fn, n_runs=3):
    runs = []
    for _ in range(n_runs):
        calls["n"] = 0
        t0 = time.perf_counter()
        n = fn()
        runs.append(
            {"sec": round(time.perf_counter() - t0, 3), "rounds": calls["n"], "out_rows": n}
        )
    out[name] = runs
    print(f"# {name}: {runs}", file=sys.stderr)


def bpe_char():
    bpe_ops.release_bpe_cache(spark)
    m, _ = bpe_ops.bpe_learn(corpus)
    return m.count()


def bpe_byte():
    bpe_ops.release_bpe_cache(spark)
    m, _ = bpe_ops.bpe_learn(corpus, level="byte")
    return m.count()


def bpe_char_64():
    bpe_ops.release_bpe_cache(spark)
    m, _ = bpe_ops.bpe_learn(corpus, num_merges=64)
    return m.count()


def wordpiece():
    wp_ops.release_wordpiece_cache(spark)
    m, _ = wp_ops.wordpiece_learn(corpus)
    return m.count()


def unigram():
    ug_ops.release_unigram_cache(spark)
    p, _ = ug_ops.unigram_learn(corpus)
    return p.count()


lane("bpe_char_8", bpe_char)
lane("bpe_byte_8", bpe_byte)
lane("bpe_char_64", bpe_char_64)
lane("wordpiece_8", wordpiece)
lane("unigram", unigram)

print(json.dumps(out))
spark.stop()
