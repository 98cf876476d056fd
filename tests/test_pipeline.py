"""End-to-end pipeline tests: conformant-only MERGE, lineage, idempotent
resume (FIXTURES.md §8), and report round-trip (S8 ↔ S11)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from shacl_validator_spark.plans.merge import merge_triples
from shacl_validator_spark.plans.pipeline import run_pipeline
from shacl_validator_spark.sources.pages import synthesize_pages
from shacl_validator_spark.sources.rdf_io import triples_from_turtle
from shacl_validator_spark.sources.report_io import (
    parse_report_turtle,
    report_to_turtle,
)

N = 200


def test_pipeline_end_to_end(spark, tmp_path):
    out = str(tmp_path / "kg")
    pages = synthesize_pages(spark, N)
    res = run_pipeline(spark, pages, out, n_groups=2)
    assert res.triples_in > 0
    assert res.merged > 0
    assert res.triples_valid <= res.triples_in
    merged = spark.read.parquet(f"{out}/triples")
    assert merged.count() == res.merged
    # merge keys unique
    dupes = (
        merged.groupBy("subject", "predicate", "object_value", "graph")
        .count()
        .filter(F.col("count") > 1)
    )
    assert dupes.isEmpty()
    # lineage rows complete
    with open(os.path.join(out, "lineage.jsonl")) as f:
        lineage = [json.loads(line) for line in f]
    assert {r["partition_key"] for r in lineage} == {"grp=0", "grp=1"}
    assert sum(r["triples_in"] for r in lineage) == res.triples_in


def test_pipeline_resume_is_idempotent(spark, tmp_path):
    """Kill-after-k-partitions simulation: first run handles group 0 only
    (forced via manifest), re-run completes the rest; no duplicates."""
    out = str(tmp_path / "kg")
    pages = synthesize_pages(spark, N)
    res1 = run_pipeline(spark, pages, out, n_groups=2)
    total = spark.read.parquet(f"{out}/triples").count()

    # simulate a partial-failure replay: mark group 1 as not-done and rerun —
    # the idempotent MERGE must insert nothing new
    manifest = os.path.join(out, "checkpoint_manifest.json")
    with open(manifest) as f:
        done = json.load(f)
    del done["grp=1"]
    with open(manifest, "w") as f:
        json.dump(done, f)
    res2 = run_pipeline(spark, pages, out, n_groups=2)
    assert res2.merged == 0  # replayed batch inserted nothing
    assert spark.read.parquet(f"{out}/triples").count() == total
    assert res1.merged == total


def test_pipeline_parallel_groups_matches_sequential(spark, tmp_path):
    """parallel_groups drives groups through a thread pool with a
    serialized MERGE commit — outputs must be set-identical to the
    sequential loop."""
    pages = synthesize_pages(spark, N)
    out_s = str(tmp_path / "seq")
    out_p = str(tmp_path / "par")
    rs = run_pipeline(spark, pages, out_s, n_groups=4)
    rp = run_pipeline(spark, pages, out_p, n_groups=4, parallel_groups=4)
    assert rp.merged == rs.merged
    assert rp.triples_in == rs.triples_in
    assert rp.violations == rs.violations
    cols = ["subject", "predicate", "object_value", "graph"]
    a = spark.read.parquet(f"{out_s}/triples").select(*cols)
    b = spark.read.parquet(f"{out_p}/triples").select(*cols)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_merge_is_exactly_once(spark, tmp_path):
    table = str(tmp_path / "t")
    batch = triples_from_turtle(
        spark,
        """
        @prefix ex: <http://example.org/> .
        ex:a ex:p ex:b .
        ex:a ex:q "v" .
        """,
        graph="g1",
    )
    n1 = merge_triples(spark, table, batch)
    n2 = merge_triples(spark, table, batch)
    assert n1 == 2 and n2 == 0
    assert spark.read.parquet(table).count() == 2


def test_iceberg_merge_sql_contract():
    """The cluster-path MERGE statement carries the full 7-column key with
    null-safe equality and is insert-only — the same contract the parquet
    emulation implements (replays insert nothing)."""
    from shacl_validator_spark.plans.merge import MERGE_KEY, iceberg_merge_sql

    sql = iceberg_merge_sql("cat.kg.triples", "batch_v")
    assert sql.startswith("MERGE INTO cat.kg.triples t USING batch_v s ON ")
    for c in MERGE_KEY:
        assert f"t.{c} <=> s.{c}" in sql  # null-safe: datatype/lang are NULL for IRIs
    assert sql.endswith("WHEN NOT MATCHED THEN INSERT *")
    assert "WHEN MATCHED" not in sql  # insert-only ⇒ idempotent replay


def test_iceberg_merge_requires_catalog(spark):
    """Without Iceberg jars the cluster path refuses cleanly (callers fall
    back to merge_triples) and leaves no temp view behind."""
    import pytest

    from shacl_validator_spark.plans.merge import merge_triples_iceberg

    batch = triples_from_turtle(
        spark,
        "@prefix ex: <http://example.org/> . ex:a ex:p ex:b .",
        graph="g1",
    )
    with pytest.raises(RuntimeError, match="row-level-operation catalog"):
        merge_triples_iceberg(spark, "nonexistent.db.triples", batch)
    assert "_merge_batch_src" not in [v.name for v in spark.catalog.listTables()]


def test_report_round_trip(spark):
    """S8 writer ↔ S11 parser round-trip preserves every result field
    (reference ReportViewer.tsx:64-78 ↔ SHACLValidationService.ts:426-555)."""
    from shacl_validator_spark.operators.validate import validate_report
    from shacl_validator_spark.shapes import compile_shapes, profile_shapes_ttl

    from . import fixtures_data as FX

    shapes = compile_shapes(profile_shapes_ttl("mini_dcat_ap"))
    triples = triples_from_turtle(spark, FX.BAD_IDENTIFIER)
    rep = validate_report(spark, triples, shapes)
    ttl = report_to_turtle(rep.results, rep.conforms, profile="mini_dcat_ap")
    conforms2, parsed = parse_report_turtle(spark, ttl)
    assert conforms2 == rep.conforms
    orig = {
        (r.focusNode, r.resultPath, r.value, r.resultSeverity, r.sourceConstraintComponent)
        for r in rep.results.collect()
    }
    back = {
        (r.focusNode, r.resultPath, r.value, r.resultSeverity, r.sourceConstraintComponent)
        for r in parsed.collect()
    }
    assert orig == back


def test_pipeline_empty_and_factless_inputs(spark, tmp_path):
    """Degenerate inputs must not crash and must keep MERGE/lineage
    invariants: zero pages, and pages that carry no extractable facts."""
    out0 = str(tmp_path / "kg0")
    res0 = run_pipeline(spark, synthesize_pages(spark, 200).limit(0), out0, n_groups=1)
    assert res0.triples_in == 0 and res0.merged == 0

    out1 = str(tmp_path / "kg1")
    pages = synthesize_pages(spark, 50, filler_sentences=6, fact_density=0.0)
    res1 = run_pipeline(spark, pages, out1, n_groups=1)
    assert res1.triples_in == 0 and res1.violations == 0


def test_prune_lineage_caps_history(tmp_path):
    """Last-10 history-cap parity (reference ValidationResults.tsx:246)."""
    import json

    from shacl_validator_spark.plans.pipeline import prune_lineage

    out = tmp_path / "kg"
    out.mkdir()
    rows = [json.dumps({"partition_key": f"grp={i}", "triples_in": i}) for i in range(25)]
    (out / "lineage.jsonl").write_text("\n".join(rows) + "\n")
    dropped = prune_lineage(str(out), keep=10)
    assert dropped == 15
    kept = [json.loads(ln) for ln in (out / "lineage.jsonl").read_text().splitlines()]
    assert [r["triples_in"] for r in kept] == list(range(15, 25))
    # idempotent below the cap
    assert prune_lineage(str(out), keep=10) == 0


def test_compiled_profile_branch_cache_dimension():
    """(profile, branch) cache key parity (SHACLValidationService.ts:115)."""
    from shacl_validator_spark.shapes import profiles

    a = profiles.compiled_profile("dcat_ap_es")
    b = profiles.compiled_profile("dcat_ap_es", branch="main")
    c = profiles.compiled_profile("dcat_ap_es", branch="develop")
    assert a is b  # same (profile, branch) → cached object
    assert c is not a and len(c) == len(a)  # distinct cache slot per branch
    assert "dcat_ap_es_develop" in profiles._shapes_cache


def test_iceberg_merge_seam_documented_fallback(spark):
    """r4 (VERDICT r3 #7): the bench's Iceberg MERGE probe must run the
    real MERGE INTO when the runtime is present and record a documented
    fallback otherwise — this sandbox has no Iceberg jars, so the probe
    reports 'unavailable' with the fallback note, never an exception."""
    import tempfile

    from shacl_validator_spark.plans.merge import (
        bench_iceberg_merge,
        iceberg_available,
    )

    batch = spark.createDataFrame(
        [("e:1", "p:1", "v", "literal", None, None, "g")],
        "subject string, predicate string, object_value string, object_type string, "
        "object_datatype string, object_lang string, graph string",
    )
    rec = bench_iceberg_merge(spark, batch, tempfile.mkdtemp())
    if iceberg_available(spark):  # pragma: no cover - cluster-only branch
        assert rec["status"] == "ran" and rec["counts_equal"]
    else:
        assert rec["status"] == "unavailable"
        assert "fallback" in rec["detail"]


def test_pipeline_html_only_input_matches_text_input(spark, tmp_path):
    """r5: html-only pages route through the fused extractor and must
    produce the same merged triples as the text-carrying input."""
    pages = synthesize_pages(spark, N)
    out_t = str(tmp_path / "kg_text")
    out_h = str(tmp_path / "kg_html")
    rt = run_pipeline(spark, pages, out_t, n_groups=2)
    rh = run_pipeline(spark, pages.drop("text"), out_h, n_groups=2)
    assert rh.triples_in == rt.triples_in
    assert rh.merged == rt.merged
    a = {tuple(r) for r in spark.read.parquet(f"{out_t}/triples").collect()}
    b = {tuple(r) for r in spark.read.parquet(f"{out_h}/triples").collect()}
    assert a == b
