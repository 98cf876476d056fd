#!/usr/bin/env python
"""Profile shacl_report_summary / shacl_dcat_ap_es_report phase-by-phase:
plan build (py4j expression construction), Catalyst analyze/optimize, and
execution — so the scan-fanout fix targets the real cost (VERDICT r3 #1)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from shacl_validator_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="profile", master="local[32]", shuffle_partitions=32)

# warmup (same as bench)
spark.range(0, 10**6).selectExpr("sum(id)").collect()
spark.read.parquet(f"{sf_dir}/customer.parquet").count()
t0 = time.time()
entrymod._cust_triples(spark, sf_dir)
print(f"cust_triples materialize: {time.time()-t0:.2f}s", flush=True)

for name in ("shacl_report_summary", "shacl_dcat_ap_es_report"):
    fn = entrymod.queries()[name]
    t0 = time.time()
    df = fn(spark, sf_dir)
    t1 = time.time()
    print(f"{name}: plan build {t1-t0:.2f}s", flush=True)
    # force analysis + optimization without running
    df._jdf.queryExecution().optimizedPlan()
    t2 = time.time()
    print(f"{name}: analyze+optimize {t2-t1:.2f}s", flush=True)
    df.count()
    t3 = time.time()
    print(f"{name}: exec1 (incl physical plan+codegen) {t3-t2:.2f}s", flush=True)
    df.count()
    t4 = time.time()
    print(f"{name}: exec2 {t4-t3:.2f}s", flush=True)
    # rebuild plan fresh (memoized caches hit) to see steady-state
    t5 = time.time()
    df2 = fn(spark, sf_dir)
    df2.count()
    print(f"{name}: rep2-style (cached plan) total {time.time()-t5:.2f}s", flush=True)

spark.stop()
