"""VERDICT r11 item 6 probe: docs_quality_corpus residual.

(a) fingerprint-key distribution — is the keep-first window skewed?
(b) isolated stage timings: gate-only vs gate+fingerprint vs full
    (fingerprint + keep-first window), plus a min(struct) aggregate
    variant of the keep-first, interleaved.

Run: python plans/r12/probe_quality_fp.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

from pyspark.sql import SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = (
    SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    .appName("probe_quality_fp")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from billing_etl_v1_spark.operators.corpus import quality_corpus  # noqa: E402
from billing_etl_v1_spark.operators.text import (  # noqa: E402
    WS_RE,
    lang_id,
    md5_long,
    text_stats,
)

docs = spark.read.parquet(f"{SF}/documents.parquet")

# (a) fingerprint distribution over the GATED set (what the window sees)
scored = lang_id(
    text_stats(docs.filter(F.col("doc_id").isNotNull()), keep_tokens_col="__t"),
    tokens_col="__t",
).drop("__t")
kept = scored.filter(
    (F.col("token_count") >= 30)
    & (F.col("quality_score") >= 0.5)
    & F.col("lang_pred").isin("en", "de", "fr", "es")
)
norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), WS_RE, " ")
fp = kept.withColumn("__fp", md5_long(norm))
dist = (
    fp.groupBy("__fp").count().groupBy("count").agg(F.count("*").alias("n_fps"))
).collect()
dist_d = {int(r["count"]): int(r["n_fps"]) for r in dist}
print(f"# fp group-size histogram: {dist_d}", file=sys.stderr)


def timed(df, label, n=4):
    df.write.format("noop").mode("overwrite").save()  # cold
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
    print(f"# {label}: {runs}", file=sys.stderr)
    return runs


out_cols = [
    "doc_id", "lang", "lang_pred", "token_count", "bpe_token_count",
    "quality_score", "text",
]
w = Window.partitionBy("__fp").orderBy(F.col("doc_id").asc())
window_form = (
    fp.withColumn("__rn", F.row_number().over(w))
    .filter(F.col("__rn") == 1)
    .select(*out_cols)
)
agg_form = (
    fp.groupBy("__fp")
    .agg(F.min(F.struct(*out_cols)).alias("__w"))
    .select(*[F.col(f"__w.{c}").alias(c) for c in out_cols])
)

res = {"fp_hist": dist_d, "lanes": {}}
res["lanes"]["gate_only"] = timed(kept.select(*out_cols), "gate_only")
res["lanes"]["gate_plus_fp"] = timed(fp.select(*out_cols, "__fp"), "gate_plus_fp")
# interleaved window-vs-aggregate
wlane, alane = [], []
for i in range(4):
    t0 = time.perf_counter()
    window_form.write.format("noop").mode("overwrite").save()
    wlane.append(round(time.perf_counter() - t0, 3))
    t0 = time.perf_counter()
    agg_form.write.format("noop").mode("overwrite").save()
    alane.append(round(time.perf_counter() - t0, 3))
res["lanes"]["keepfirst_window"] = wlane
res["lanes"]["keepfirst_minstruct"] = alane
print(f"# window {wlane} vs minstruct {alane}", file=sys.stderr)

# value equality of the two keep-first forms
a = sorted(map(tuple, window_form.collect()))
b = sorted(map(tuple, agg_form.collect()))
res["forms_equal"] = a == b
print(json.dumps(res))
spark.stop()
