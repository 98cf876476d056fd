"""Run the pipeline once and report wall vs JVM GC time.

Usage: python tools/gc_probe.py <cpus> <n_pages>
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def gc_millis(spark) -> int:
    beans = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    total = 0
    for i in range(beans.size()):
        total += beans.get(i).getCollectionTime()
    return total


def main() -> None:
    cpus = int(sys.argv[1])
    n_pages = int(sys.argv[2])
    from shacl_validator_spark.plans.pipeline import run_pipeline
    from shacl_validator_spark.session import get_spark
    from shacl_validator_spark.sources.pages import synthesize_pages

    spark = get_spark(app_name=f"gcprobe{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.range(0, 1000000, 1, cpus).selectExpr("sum(id)").collect()

    out_dir = tempfile.mkdtemp(prefix="gc_kg_")
    try:
        pages = synthesize_pages(spark, n_pages)
        g0, t0 = gc_millis(spark), time.time()
        res = run_pipeline(spark, pages, out_dir, n_groups=1, resume=False)
        wall, gc = time.time() - t0, gc_millis(spark) - g0
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    print(json.dumps({
        "cpus": cpus, "n_pages": n_pages, "wall": round(wall, 2),
        "gc_sec": round(gc / 1000, 2),
        "heap_used_gb": round((rt.totalMemory() - rt.freeMemory()) / 2**30, 2),
        "heap_max_gb": round(rt.maxMemory() / 2**30, 2),
        "stages": res.stage_seconds,
    }))


if __name__ == "__main__":
    main()
