import sys, os; sys.path.insert(0, os.getcwd())
import sys, time
import __spark_entry__ as em
from billing_etl_v1_spark.session import get_spark

suffix = sys.argv[1]
sf = "/root/testdata/sf0.1"
spark = get_spark("dq-measure")
spark.sparkContext.setLogLevel("ERROR")
for name in ["billing_dq_audit", "docs_dq_audit"]:
    df = em.queries()[name](spark, sf)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    open(f"plans/r11/{name}_{suffix}.txt", "w").write(plan)
    spark.sparkContext.setJobDescription(f"{name} {suffix}")
    runs = []
    for _ in range(4):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
    import re
    scans = len(set(re.findall(r"\((\d+)\) Scan parquet\b", plan)))
    imts = len(set(re.findall(r"\((\d+)\) InMemoryTableScan\b", plan)))
    print(f"{name} {suffix}: runs={runs} parquet_scans={scans} imts={imts}")
spark.stop()
