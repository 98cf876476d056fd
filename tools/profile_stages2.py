#!/usr/bin/env python
"""Detailed metric dump for the expensive stages of one query."""
import datetime
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
    app_name="profile_stages2",
    master="local[32]",
    shuffle_partitions=32,
    extra_conf={"spark.ui.enabled": "true"},
)
spark.range(0, 10**6).selectExpr("sum(id)").collect()
entrymod._cust_triples(spark, sf_dir)
name = sys.argv[1] if len(sys.argv) > 1 else "shacl_report_summary"
fn = entrymod.queries()[name]
df = fn(spark, sf_dir)
df.count()
wall_t0 = datetime.datetime.now(datetime.timezone.utc).timestamp()
t0 = time.time()
df.count()
print(f"steady exec: {time.time()-t0:.2f}s", flush=True)

app_id = spark.sparkContext.applicationId
base = f"http://localhost:4040/api/v1/applications/{app_id}"
stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete&details=false"))
sel = []
for s in stages:
    sub = s.get("submissionTime")
    if not sub:
        continue
    ts = datetime.datetime.strptime(sub, "%Y-%m-%dT%H:%M:%S.%f%Z").replace(
        tzinfo=datetime.timezone.utc
    ).timestamp()
    if ts < wall_t0:
        continue
    sel.append(s)
sel.sort(key=lambda s: -s["executorRunTime"])
for s in sel[:8]:
    keep = {
        k: v
        for k, v in s.items()
        if isinstance(v, (int, float)) and v not in (0, 0.0)
    }
    print(f"\n=== stage {s['stageId']} ===")
    for k, v in sorted(keep.items()):
        print(f"  {k}: {v}")
    # RDD/scan info from the detail endpoint
    det = json.load(
        urllib.request.urlopen(f"{base}/stages/{s['stageId']}/0?details=false")
    )
    print("  desc:", (det.get("description") or "")[:200])
spark.stop()
