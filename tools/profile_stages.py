#!/usr/bin/env python
"""Stage-level profile of shacl_report_summary via the Spark UI REST API."""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from shacl_validator_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(
    app_name="profile_stages",
    master="local[32]",
    shuffle_partitions=32,
    extra_conf={"spark.ui.enabled": "true"},
)

spark.range(0, 10**6).selectExpr("sum(id)").collect()
entrymod._cust_triples(spark, sf_dir)

name = sys.argv[1] if len(sys.argv) > 1 else "shacl_report_summary"
fn = entrymod.queries()[name]
df = fn(spark, sf_dir)
df.count()  # warm: codegen + persist population
import datetime

t0 = time.time()
wall_t0 = datetime.datetime.now(datetime.timezone.utc).timestamp()
df.count()
print(f"steady exec: {time.time()-t0:.2f}s", flush=True)

app_id = spark.sparkContext.applicationId
base = f"http://localhost:4040/api/v1/applications/{app_id}"
stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
rows = []
total_run = total_cpu = 0.0
for s in stages:
    sub = s.get("submissionTime")
    if not sub:
        continue
    ts = datetime.datetime.strptime(sub, "%Y-%m-%dT%H:%M:%S.%f%Z").replace(
        tzinfo=datetime.timezone.utc
    ).timestamp()
    if ts < wall_t0:
        continue
    rt = s["executorRunTime"] / 1000.0
    cpu = s.get("executorCpuTime", 0) / 1e9
    total_run += rt
    total_cpu += cpu
    rows.append(
        (s["stageId"], s["numCompleteTasks"], rt, cpu, s["name"].split("\n")[0][:90])
    )
rows.sort(key=lambda r: -r[2])
print(f"{len(rows)} stages in window; total runTime {total_run:.1f}s cpu {total_cpu:.1f}s")
for r in rows[:15]:
    print(f"stage {r[0]:4d} tasks {r[1]:4d} runTime {r[2]:7.2f}s cpu {r[3]:7.2f}s  {r[4]}")
spark.stop()
