"""Plan dumps + interleaved A/B for the r12 centroid-argmax rewrite
(window row_number rank-1 -> max(struct) aggregate) and the
quality-corpus keep-first probe.

Usage:
  python plans/r12/capture_argmax.py plans   # formatted plans at sf0.1
  python plans/r12/capture_argmax.py ab      # interleaved noop A/B vs HEAD~ tree
                                             # (run from each tree; alternated by driver)
"""

import os
import sys
import time

sys.path.insert(0, os.getcwd())

from pyspark.sql import SparkSession  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("capture_argmax")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as em  # noqa: E402

QUERIES = ["dedup_semantic", "sim_topk_ivf", "embeddings_kmeans", "docs_cluster_quality", "docs_quality_corpus"]


def build(name):
    return em.queries()[name](spark, SF)


if sys.argv[1] == "plans":
    tag = sys.argv[2] if len(sys.argv) > 2 else "after"
    outdir = os.path.dirname(os.path.abspath(__file__))
    for name in QUERIES:
        df = build(name)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"{outdir}/{name}_{tag}.txt", "w") as fh:
            fh.write(plan)
        print(f"# wrote {name}_{tag}.txt", file=sys.stderr)
else:
    out = {}
    for name in QUERIES:
        df = build(name)
        spark.sparkContext.setJobDescription(f"ab:{name}")
        df.write.format("noop").mode("overwrite").save()  # cold
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = runs
        print(f"# {name}: {runs}", file=sys.stderr)
    import json

    print(json.dumps({"tree": os.getcwd(), "queries": out}))
spark.stop()
