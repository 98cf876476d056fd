"""Fused html→text→triples extraction vs the two-pass form (r5 evidence,
VERDICT r4 #4).

Two-pass: ``extract_text`` (pandas UDF) materializes the text column to
parquet — the honest production analogue: a text column you keep costs a
write — then ``extract_raw_triples`` re-reads it.  An in-plan chain
(extract_text feeding the next UDF lazily without materialization) is
also timed as the optimistic two-pass floor.  Fused:
``extract_raw_triples_from_html`` decodes and extracts in ONE Arrow pass.

Timed job = full count of the raw-triple output; min of ``reps`` per
cell; equality of the three result hashes is asserted (the differential
tests pin it row-exactly — the hash here guards the bench itself).

Usage: PYTHONPATH=/root/repo python tools/bench_extract_fusion.py [n_pages] [reps] [cpus]
Writes BENCH/extract_fusion.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from pyspark.sql import functions as F

    from shacl_validator_spark.session import get_spark
    from shacl_validator_spark.sources.extract import (
        RAW_TRIPLE_SCHEMA,
        extract_raw_triples,
        extract_raw_triples_from_html,
        extract_text,
    )
    from shacl_validator_spark.sources.pages import synthesize_pages

    spark = get_spark(
        app_name="extract_fusion", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    scratch = os.environ.get("TMPDIR", "/tmp") + f"/fusion_{n}"
    pages_path = f"{scratch}/pages"
    if not os.path.exists(pages_path):
        synthesize_pages(spark, n, fact_density=0.3).select(
            "url", "html"
        ).write.mode("overwrite").parquet(pages_path)
    pages = spark.read.parquet(pages_path)

    def timed(label, fn):
        best, h = None, None
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.time()
            out = fn()
            cnt = out.count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        # bit_xor: order-insensitive and overflow-free under ANSI mode
        h = out.select(
            F.bit_xor(F.xxhash64(*RAW_TRIPLE_SCHEMA.fieldNames())).alias("h")
        ).collect()[0].h
        return {"wall": round(best, 2), "rows": cnt, "hash": h,
                "pages_per_sec": round(n / best, 1)}

    text_path = f"{scratch}/text"

    def two_pass_materialized():
        pages.select(
            "url", extract_text(F.col("html")).alias("text")
        ).write.mode("overwrite").parquet(text_path)
        return extract_raw_triples(spark.read.parquet(text_path))

    def two_pass_chained():
        return extract_raw_triples(
            pages.select("url", extract_text(F.col("html")).alias("text"))
        )

    def fused():
        return extract_raw_triples_from_html(pages)

    res = {
        "n_pages": n,
        "reps": reps,
        "cpus": cpus,
        "two_pass_materialized": timed("mat", two_pass_materialized),
        "two_pass_chained": timed("chain", two_pass_chained),
        "fused": timed("fused", fused),
    }
    hashes = {res[k]["hash"] for k in
              ("two_pass_materialized", "two_pass_chained", "fused")}
    res["hashes_equal"] = len(hashes) == 1
    res["fused_speedup_vs_materialized"] = round(
        res["two_pass_materialized"]["wall"] / res["fused"]["wall"], 3
    )
    res["fused_speedup_vs_chained"] = round(
        res["two_pass_chained"]["wall"] / res["fused"]["wall"], 3
    )
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/extract_fusion.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
