#!/usr/bin/env python
"""Benchmark harness.

Default mode (driver contract): run the headline queries + the flagship
KG-construction pipeline at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON
line: {"metric", "value" (total seconds), "unit": "sec", "queries": {name:
sec}, "sf", plus throughput extras}.

``--scaling`` mode (BASELINE.json north_rule evidence): run the same
pipeline job at two parallelism levels (local[8] vs local[32] — the
sandbox stand-in for N vs 4N executors) in fresh JVMs and report both
throughputs and the scaling efficiency; results are appended to
BENCH/BASELINE.md by tools/run_scaling.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def _cpu_ticks() -> tuple[int, int] | None:
    """(steal_ticks, total_ticks) from /proc/stat, or None off-Linux."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        # sum only user..steal (first 8 fields): guest/guest_nice are
        # already contained in user/nice, and double-counting them biases
        # steal_pct low on exactly the contended hosts the witness flags
        return (vals[7] if len(vals) > 7 else 0, sum(vals[:8]))
    except (OSError, ValueError, IndexError):
        return None


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_bench(
    sf_dir: str,
    cpus: int,
    pipeline_pages: int | None = None,
    pipeline_only: bool = False,
) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from shacl_validator_spark.plans.pipeline import run_pipeline
    from shacl_validator_spark.session import get_spark
    from shacl_validator_spark.sources.pages import synthesize_pages

    spark = get_spark(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    # saturated local[N]: Python workers compete with the JVM for the same
    # cores, which is the regime where the extractor's JVM-side sentence
    # prune wins (+30% pages/s measured r4; see sources/extract.py) — the
    # same regime as a real cluster with workers on executor cores.  The
    # 1-core-executor scaling protocol (tools/run_scaling.py) keeps it off.
    spark.conf.set("spark.kg.extract.pruneSentences", "true")

    # untimed warmup: JVM JIT / janino codegen / Arrow / parquet-reader init
    # otherwise lands entirely on whichever query runs first (~10 s of
    # session warmup misattributed to it; see .claude/skills/verify
    # gotchas).  The mini-validate warms the validator's operator classes
    # (broadcast hash join, hash agg, explode) on 3 unrelated literal rows —
    # JMH-style code warmup, no measured data is touched or cached.
    from pyspark.sql import functions as _F  # noqa: F401

    from shacl_validator_spark.operators.validate import validate as _validate
    from shacl_validator_spark.shapes import compile_shapes, profile_shapes_ttl

    spark.range(0, 10**6).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    _warm = spark.createDataFrame(
        [
            ("w:1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
             "http://example.org/kg#Organization", "iri", None, None, "w"),
            ("w:1", "http://example.org/kg#name", "Warm Co", "literal", None, None, "w"),
            ("w:1", "http://example.org/kg#founded", "1999", "literal", None, None, "w"),
        ],
        "subject string, predicate string, object_value string, object_type string, "
        "object_datatype string, object_lang string, graph string",
    )
    _validate(spark, _warm, compile_shapes(profile_shapes_ttl("kg_extraction"))).count()
    # input prep (untimed, same protocol as the pages corpus below): the
    # synthesized triples TABLE the shacl queries read is materialized to
    # scratch parquet before the timer — production input is a table
    entrymod._cust_triples(spark, sf_dir)

    qs = entrymod.queries()
    headline = [
        "shacl_report_summary",
        "shacl_dcat_ap_es_report",
        "severity_summary",
        "grouped_findings",
        "tpch_q1",
        "tpch_q3",
        "revenue_by_nation",
        "top_parts",
        "user_event_rank",
        "sessionize",
        "dedup_exact",
        "minhash_dup_pairs",
        "dedup_clusters",
        "clean_corpus",
        "repetition_stats",
        "chunk_dedup",
        "lm_logprob",
        "decontaminate",
        "unicode_nfc",
        "asof_view_click",
        "embedding_quantize",
        "embedding_ivf_topk",
        "token_stats",
        "language_id",
        "embedding_topk",
        "embedding_lsh_topk",
        "knn_arrow_topk",
        "discovery_datasets",
        "extract_relations",
        "graph_pagerank",
        "bpe_pair_stats",
        "incremental_dedup",
        "dsir_weights",
        "corpus_datasheet",
    ]
    if pipeline_only:
        headline = []
    # Per-query wall = MIN over reps: this VM's memory bandwidth collapses
    # under neighbor load (documented in BENCH/BASELINE.md), so a single
    # shot conflates host noise with query cost.  The cache is cleared
    # before EVERY rep, so each rep pays the query's own materialization
    # (persists inside a query never carry across reps) — the min removes
    # noise, not work.
    # default 3 (VERDICT r4 #8): with 2 reps a single noisy shot still
    # leaks into round-over-round per-query comparisons
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    ticks0 = _cpu_ticks()
    times: dict[str, float] = {}
    for name in headline:
        fn = qs[name]
        best: float | None = None
        for _rep in range(reps):
            spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)

    # flagship pipeline throughput: validated triples/sec on a synthesized
    # CC-realistic corpus (6.5 KB text/page, 30% of pages carrying
    # extractable relations) sized to the scale factor.  The corpus is
    # materialized to parquet BEFORE the timer — production input is a
    # table, not an in-JVM generator.
    sf = _sf_from_dir(sf_dir)
    n_pages = pipeline_pages or max(2000, int(2_000_000 * max(sf, 0.001)))
    out_dir = tempfile.mkdtemp(prefix="bench_kg_")
    try:
        pages_dir = os.path.join(out_dir, "pages")
        synthesize_pages(
            spark, n_pages, filler_sentences=96, fact_density=0.3
        ).write.mode("overwrite").parquet(pages_dir)
        # flush the GB-scale corpus write before any timed rep: background
        # write-back otherwise competes with the first timed read for the
        # disk (measured: extract stage 4.5 s warm vs ~30 s under
        # write-back on this host)
        os.sync()
        pages = spark.read.parquet(pages_dir)
        wall = None
        for rep in range(reps):
            rep_dir = os.path.join(out_dir, f"rep{rep}")
            t0 = time.time()
            res = run_pipeline(spark, pages, rep_dir, n_groups=1, resume=False)
            w = time.time() - t0
            wall = w if wall is None else min(wall, w)
        times["kg_pipeline"] = round(wall, 3)
        triples_per_sec = res.triples_in / wall if wall > 0 else 0.0
        valid_per_sec = res.triples_valid / wall if wall > 0 else 0.0
        pages_per_sec = n_pages / wall if wall > 0 else 0.0
        # parallel-groups axis (VERDICT r2 #9): same corpus, 2 groups
        # processed by the thread-pooled path — exercises the serialized
        # MERGE commit under contention; merged count must match the
        # sequential run (exactly-once invariant)
        # reported as its own field, NOT in the summed headline: the
        # headline metric's query set stays comparable round-over-round;
        # min-of-reps like every other number (a single shot conflates
        # host noise with the thread-pooled path's cost)
        pg2_wall = None
        for rep in range(reps):
            out_dir2 = os.path.join(out_dir, f"pg2_{rep}")
            t0 = time.time()
            res2 = run_pipeline(
                spark, pages, out_dir2, n_groups=2, parallel_groups=2, resume=False
            )
            w = round(time.time() - t0, 3)
            pg2_wall = w if pg2_wall is None else min(pg2_wall, w)
        pg2_merged_equal = res2.merged == res.merged
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    # Iceberg MERGE seam (VERDICT r3 #7): when the Iceberg runtime is on
    # the classpath the REAL `MERGE INTO` runs on a deterministic batch and
    # its inserted/replay counts are compared against the parquet
    # emulation; in the jar-less sandbox this records the documented
    # fallback instead.  Untimed — it attributes the merge path, it is not
    # a headline number.
    from shacl_validator_spark.model import TRIPLE_SCHEMA  # noqa: F401
    from shacl_validator_spark.plans.merge import bench_iceberg_merge

    ice_batch = (
        spark.range(10_000)
        .selectExpr(
            "concat('e:', id % 2000) AS subject",
            "concat('p:', id % 7) AS predicate",
            "cast(id as string) AS object_value",
            "'literal' AS object_type",
            "cast(null as string) AS object_datatype",
            "cast(null as string) AS object_lang",
            "'bench' AS graph",
        )
    )
    ice_dir = tempfile.mkdtemp(prefix="bench_ice_")
    try:
        iceberg_merge = bench_iceberg_merge(spark, ice_batch, ice_dir)
    finally:
        shutil.rmtree(ice_dir, ignore_errors=True)

    total = round(sum(times.values()), 3)
    # Host-contention witness: this sandbox is a VM on a shared host, and
    # hypervisor steal has been measured anywhere from ~0% to >25% under
    # load — enough to inflate every stage wall 2-3x run-over-run with zero
    # code change (straggler tasks gate Spark stage walls, so random steal
    # amplifies).  Recording steal% over the measured window makes each
    # bench JSON self-documenting about how trustworthy its absolute
    # numbers are; compare rounds on plan shape + like-steal runs.
    ticks1 = _cpu_ticks()
    steal_pct = None
    if ticks0 and ticks1 and ticks1[1] > ticks0[1]:
        steal_pct = round(100.0 * (ticks1[0] - ticks0[0]) / (ticks1[1] - ticks0[1]), 1)
    return {
        "metric": "headline_queries_plus_kg_pipeline_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": cpus,
        "pipeline_pages": n_pages,
        "pipeline_triples_in": res.triples_in,
        "pipeline_triples_valid": res.triples_valid,
        "pipeline_stage_seconds": res.stage_seconds,
        "validated_triples_per_sec": round(valid_per_sec, 1),
        "extracted_triples_per_sec": round(triples_per_sec, 1),
        "pages_per_sec": round(pages_per_sec, 1),
        "bench_reps": reps,
        "kg_pipeline_pg2_sec": pg2_wall,
        "pg2_merged_equal": pg2_merged_equal,
        "iceberg_merge": iceberg_merge,
        "host_steal_pct": steal_pct,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    pages = None
    if "--pages" in sys.argv:
        pages = int(sys.argv[sys.argv.index("--pages") + 1])
    result = run_bench(
        sf_dir, cpus, pipeline_pages=pages, pipeline_only="--pipeline-only" in sys.argv
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
