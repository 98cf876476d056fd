"""Full profile shape suites: compile, conforming samples, violating
mutations (SURVEY.md §5.1 — the reference anchors correctness on official
sample catalogs per profile, mqa-config.json:50,76,106,126)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shacl_validator_spark.model import SH
from shacl_validator_spark.operators.validate import validate_report
from shacl_validator_spark.shapes.profiles import compiled_profile
from shacl_validator_spark.shapes.suites import SAMPLE_CATALOGS, SUITE_FILES
from shacl_validator_spark.sources import triples_from_turtle

PROFILES = sorted(SUITE_FILES)


@pytest.mark.parametrize("profile", PROFILES)
def test_suite_compiles_with_expected_breadth(profile):
    rows = compiled_profile(profile)
    assert len(rows) >= 8, profile
    # every suite exercises at least cardinality + kind/vocabulary checks
    assert any(r["min_count"] for r in rows)
    assert any(r["node_kind"] or r["in_list"] or r["class_iri"] for r in rows)


@pytest.mark.parametrize("profile", PROFILES)
def test_sample_catalog_conforms(spark, profile):
    triples = triples_from_turtle(spark, SAMPLE_CATALOGS[profile], graph="sample")
    rep = validate_report(spark, triples, compiled_profile(profile))
    bad = [
        r.asDict()
        for r in rep.results.filter(F.col("resultSeverity") == "Violation").collect()
    ]
    assert rep.conforms, bad


def test_es_suite_catches_mutations(spark):
    """Dropping the dataset description and pointing the theme outside the
    EU authority table must fire MinCount + In on the ES suite."""
    ttl = SAMPLE_CATALOGS["dcat_ap_es"].replace(
        'dct:description "Mediciones horarias de calidad del aire"@es ;\n', ""
    ).replace(
        "<http://publications.europa.eu/resource/authority/data-theme/ENVI>",
        "<https://example.org/not-a-theme>",
    )
    assert ttl != SAMPLE_CATALOGS["dcat_ap_es"]
    rep = validate_report(spark, triples_from_turtle(spark, ttl), compiled_profile("dcat_ap_es"))
    assert not rep.conforms
    import re

    got = {
        (r.sourceConstraintComponent.rsplit("#", 1)[-1], re.split(r"[#/]", r.resultPath)[-1])
        for r in rep.results.collect()
    }
    assert ("MinCountConstraintComponent", "description") in got
    assert ("InConstraintComponent", "theme") in got


def test_hvd_suite_requires_legislation(spark):
    """The HVD profile must reject a dataset missing the implementing
    regulation reference and the HVD category (minCount + hasValue)."""
    rep = validate_report(
        spark,
        triples_from_turtle(spark, SAMPLE_CATALOGS["dcat_ap_es"]),
        compiled_profile("dcat_ap_es_hvd"),
    )
    assert not rep.conforms
    comps = {r.sourceConstraintComponent.rsplit("#", 1)[-1] for r in rep.results.collect()}
    assert "MinCountConstraintComponent" in comps
    assert "HasValueConstraintComponent" in comps


def test_nti_suite_dir3_pattern(spark):
    """NTI-RISP publisher must match the DIR3 organism IRI pattern."""
    ttl = SAMPLE_CATALOGS["nti_risp"].replace(
        "<http://datos.gob.es/recurso/sector-publico/org/Organismo/E00003901>",
        "<https://example.org/some-org>",
    )
    rep = validate_report(spark, triples_from_turtle(spark, ttl), compiled_profile("nti_risp"))
    assert not rep.conforms
    pat = [
        r
        for r in rep.results.collect()
        if r.sourceConstraintComponent == SH + "PatternConstraintComponent"
    ]
    assert pat and pat[0].value == "https://example.org/some-org"


def test_multi_file_bnode_shapes_do_not_alias(spark):
    """Two files each with an anonymous (_:b1) nested shape: the sh:node
    reference in file A must resolve to file A's definition only — without
    per-file qualification both files' rows alias and B's pattern leaks
    into A's nested pass."""
    from shacl_validator_spark.operators.validate import validate
    from shacl_validator_spark.shapes.compiler import compile_shape_files

    file_a = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://example.org/> .
    ex:AShape a sh:NodeShape ; sh:targetClass ex:A ;
      sh:property [ sh:path ex:ref ; sh:node [ sh:property [
        sh:path ex:name ; sh:minCount 1 ] ] ] .
    """
    file_b = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://example.org/> .
    ex:BShape a sh:NodeShape ; sh:targetClass ex:B ;
      sh:property [ sh:path ex:code ; sh:node [ sh:property [
        sh:path ex:name ; sh:pattern "^B" ] ] ] .
    """
    rows = compile_shape_files([file_a, file_b])
    data = [
        ("ex:a1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "http://example.org/A", "iri", None, None, "g"),
        ("ex:a1", "http://example.org/ref", "ex:v1", "iri", None, None, "g"),
        # v1 HAS a name (satisfies A's nested minCount) but the name does
        # NOT match B's ^B pattern — a leak would flag it
        ("ex:v1", "http://example.org/name", "alpha", "literal", None, None, "g"),
    ]
    t = spark.createDataFrame(
        data,
        "subject string, predicate string, object_value string, "
        "object_type string, object_datatype string, object_lang string, "
        "graph string",
    )
    viols = validate(spark, t, rows).collect()
    assert viols == [], [r.asDict() for r in viols]
