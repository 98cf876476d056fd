#!/usr/bin/env python
"""Bench-protocol timing (clearCache before each rep, min of reps) for
selected queries."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from shacl_validator_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(app_name="benchstyle", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
spark.range(0, 10**6).selectExpr("sum(id)").collect()
spark.read.parquet(f"{sf_dir}/customer.parquet").count()
entrymod._cust_triples(spark, sf_dir)

names = sys.argv[1:] or ["shacl_report_summary", "shacl_dcat_ap_es_report"]
qs = entrymod.queries()
for name in names:
    fn = qs[name]
    best = None
    for rep in range(3):
        spark.catalog.clearCache()
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.count()
        dt = time.time() - t0
        print(f"{name} rep{rep}: {dt:.2f}s", flush=True)
        best = dt if best is None else min(best, dt)
    print(f"{name}: min {best:.2f}s", flush=True)
spark.stop()
