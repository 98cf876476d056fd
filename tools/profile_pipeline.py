"""Profile pipeline stages at a given parallelism level.

Usage: python tools/profile_pipeline.py <cpus> <n_pages>
Prints one JSON line with per-stage wall seconds.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    cpus = int(sys.argv[1])
    n_pages = int(sys.argv[2])
    from shacl_validator_spark.plans.pipeline import run_pipeline
    from shacl_validator_spark.session import get_spark
    from shacl_validator_spark.sources.pages import synthesize_pages

    spark = get_spark(
        app_name=f"profile{cpus}", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    # warm up JVM + python workers
    spark.range(0, 1000000, 1, cpus).selectExpr("sum(id)").collect()

    out_dir = tempfile.mkdtemp(prefix="prof_kg_")
    pages_dir = os.path.join(out_dir, "pages")
    try:
        # input is a parquet table, as in production — corpus generation is
        # not part of the measured pipeline
        synthesize_pages(spark, n_pages).write.mode("overwrite").parquet(pages_dir)
        pages = spark.read.parquet(pages_dir)
        t0 = time.time()
        res = run_pipeline(spark, pages, out_dir, n_groups=1, resume=False)
        wall = time.time() - t0
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_pages": n_pages,
                "wall": round(wall, 2),
                "stages": res.stage_seconds,
                "triples_in": res.triples_in,
                "valid_tps": round(res.triples_valid / wall, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
