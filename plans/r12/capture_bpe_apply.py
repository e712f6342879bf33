"""Formatted plan of ONE BPE merge-apply round (the per-round workhorse),
committed as plans/r12/bpe_apply_round_{before,after}.txt — the evidence
behind the r12 claim that the apply's window family went from three
differently-keyed exchanges to one word-hash exchange, and that pair
counting reads the checkpointed nxt column with no window.

Usage: python capture_bpe_apply.py <tag>   (run from each tree)
"""

import os
import sys

sys.path.insert(0, os.getcwd())

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

tag = sys.argv[1]
spark = (
    SparkSession.builder.master("local[8]").appName("capture_bpe_apply").getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from billing_etl_v1_spark.operators import bpe  # noqa: E402

docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
base = bpe.word_vocab(docs).localCheckpoint()
pos = base.filter(F.size("s") <= 256).select(
    "word", "freq", F.posexplode("s").alias("pos", "sym")
)
if hasattr(bpe, "_with_nxt"):
    pos = bpe._with_nxt(pos)
pos = pos.localCheckpoint()
best = bpe._best_pair(pos)
applied = bpe._apply_merge(pos, best)

outdir = "/root/repo/plans/r12"
for name, df in (("bpe_pair_counts", best), ("bpe_apply_round", applied)):
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(f"{outdir}/{name}_{tag}.txt", "w") as fh:
        fh.write(plan)
    print(f"# wrote {name}_{tag}.txt", file=sys.stderr)
spark.stop()
