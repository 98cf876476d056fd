"""Distributed Turtle source (sources/turtle.py): multi-file mapInPandas
path, single-file statement-boundary chunking, and the surfaced driver
fallback — each compared against the driver parser on identical content."""

from __future__ import annotations

import os
import tempfile

import pytest

import shacl_validator_spark.sources.turtle as tmod
from shacl_validator_spark.sources.rdf_io import triples_from_turtle
from shacl_validator_spark.sources.turtle import read_turtle

TTL_A = """
@prefix ex: <http://ex.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

ex:c1 a ex:Cust ;
  ex:name "Alice"@en ;
  ex:bal "10.5"^^xsd:decimal ;
  ex:knows ex:c2 .
ex:c2 a ex:Cust ; ex:name "Bo\\"b" .  # escaped quote + trailing comment
ex:c3 ex:tags ("x" "y") .
ex:c4 ex:addr [ ex:city "Paris" ; ex:zip "75" ] .
"""

TTL_B = """
@prefix ex: <http://ex.org/> .
ex:d1 a ex:Org ; ex:label "Órg" .
ex:d2 ex:ref ex:d1 .
"""


def _key_set(df):
    # anon bnode labels differ between paths by design — compare on the
    # bnode-label-independent projection (kind + literal facets), plus
    # exact values for non-bnodes
    rows = df.collect()
    out = set()
    for r in rows:
        s = "<bnode>" if r.subject.startswith("_:") else r.subject
        o = "<bnode>" if r.object_type == "bnode" else r.object_value
        out.add((s, r.predicate, o, r.object_type, r.object_datatype, r.object_lang))
    return out


def test_multi_file_matches_driver(spark):
    d = tempfile.mkdtemp(prefix="ttl_multi_")
    with open(os.path.join(d, "a.ttl"), "w") as f:
        f.write(TTL_A)
    with open(os.path.join(d, "b.ttl"), "w") as f:
        f.write(TTL_B)
    got = read_turtle(spark, d, graph="g")
    want = triples_from_turtle(spark, TTL_A, graph="g").unionByName(
        triples_from_turtle(spark, TTL_B, graph="g")
    )
    assert _key_set(got) == _key_set(want)
    assert got.count() == want.count()


def test_small_single_file_driver_path(spark):
    d = tempfile.mkdtemp(prefix="ttl_small_")
    p = os.path.join(d, "one.ttl")
    with open(p, "w") as f:
        f.write(TTL_A)
    got = read_turtle(spark, p, graph="g")
    want = triples_from_turtle(spark, TTL_A, graph="g")
    assert _key_set(got) == _key_set(want)


def test_chunked_single_file_matches_driver(spark, monkeypatch):
    """Force the chunker (threshold 0) on a file with multi-line
    statements, ; and , continuations, bracket blocks, collections,
    comments, and escapes — must equal the driver parse exactly."""
    monkeypatch.setattr(tmod, "SMALL_FILE_BYTES", 0)
    body = [TTL_A]
    for i in range(200):
        body.append(
            f"<http://ex.org/n{i}> <http://ex.org/p> \"v{i}.\" ;\n"
            f"  <http://ex.org/q> <http://ex.org/n{(i + 1) % 200}> .\n"
        )
    text = "\n".join(body)
    d = tempfile.mkdtemp(prefix="ttl_chunk_")
    p = os.path.join(d, "big.ttl")
    with open(p, "w") as f:
        f.write(text)
    # small chunks so the test exercises many chunk boundaries
    got = read_turtle(spark, p, graph="g", chunk_statements=7)
    want = triples_from_turtle(spark, text, graph="g")
    assert _key_set(got) == _key_set(want)
    assert got.count() == want.count()


def test_long_literal_falls_back_with_warning(spark, monkeypatch):
    monkeypatch.setattr(tmod, "SMALL_FILE_BYTES", 0)
    text = (
        '@prefix ex: <http://ex.org/> .\n'
        'ex:s ex:doc """line one\nwith a fake terminator .\nline three""" .\n'
        "ex:t ex:p ex:s .\n"
    )
    d = tempfile.mkdtemp(prefix="ttl_fall_")
    p = os.path.join(d, "long.ttl")
    with open(p, "w") as f:
        f.write(text)
    warnings: list[str] = []
    got = read_turtle(spark, p, graph="g", warnings=warnings)
    assert warnings and "falling back" in warnings[0]
    want = triples_from_turtle(spark, text, graph="g")
    assert _key_set(got) == _key_set(want)


def test_prefix_conflict_falls_back(spark, monkeypatch):
    monkeypatch.setattr(tmod, "SMALL_FILE_BYTES", 0)
    text = (
        "@prefix ex: <http://ex.org/> .\n"
        "ex:a ex:p ex:b .\n"
        "@prefix ex: <http://other.org/> .\n"
        "ex:a ex:p ex:b .\n"
    )
    d = tempfile.mkdtemp(prefix="ttl_conf_")
    p = os.path.join(d, "conf.ttl")
    with open(p, "w") as f:
        f.write(text)
    warnings: list[str] = []
    got = read_turtle(spark, p, warnings=warnings)
    assert warnings and "redefinitions" in warnings[0]
    want = triples_from_turtle(spark, text)
    assert _key_set(got) == _key_set(want)


def test_base_redefinition_falls_back(spark, monkeypatch):
    """ADVICE r4: two distinct @base directives must route to the driver
    fallback (prologue-prepending would let the last @base win globally);
    the fallback resolves each statement under its in-scope base."""
    monkeypatch.setattr(tmod, "SMALL_FILE_BYTES", 0)
    text = (
        "@base <http://one.org/> .\n"
        "<a> <http://ex.org/p> <http://ex.org/o> .\n"
        "@base <http://two.org/> .\n"
        "<b> <http://ex.org/p> <http://ex.org/o> .\n"
    )
    d = tempfile.mkdtemp(prefix="ttl_base_")
    p = os.path.join(d, "base.ttl")
    with open(p, "w") as f:
        f.write(text)
    warnings: list[str] = []
    got = read_turtle(spark, p, graph="g", warnings=warnings)
    assert warnings and "falling back" in warnings[0]
    subjects = {r.subject for r in got.collect()}
    assert "http://one.org/a" in subjects
    assert "http://two.org/b" in subjects


def test_single_base_with_relative_iris_falls_back(spark, monkeypatch):
    """One @base + relative IRIs written BEFORE it: resolution is
    position-sensitive, so the chunker must not prepend the directive —
    fallback with a warning."""
    monkeypatch.setattr(tmod, "SMALL_FILE_BYTES", 0)
    text = (
        "<http://doc.org/pre> <http://ex.org/p> <http://ex.org/o> .\n"
        "@base <http://one.org/> .\n"
        "<a> <http://ex.org/p> <http://ex.org/o> .\n"
    )
    d = tempfile.mkdtemp(prefix="ttl_base1_")
    p = os.path.join(d, "base1.ttl")
    with open(p, "w") as f:
        f.write(text)
    warnings: list[str] = []
    got = read_turtle(spark, p, graph="g", warnings=warnings)
    assert warnings and "@base" in warnings[0]
    subjects = {r.subject for r in got.collect()}
    assert "http://one.org/a" in subjects


def test_base_all_absolute_iris_stays_distributed(spark, monkeypatch):
    """A single @base with only absolute IRIs is chunker-safe (the
    prepended directive is inert) — no fallback, no warning."""
    monkeypatch.setattr(tmod, "SMALL_FILE_BYTES", 0)
    body = ["@base <http://one.org/> ."]
    for i in range(30):
        body.append(f"<http://ex.org/n{i}> <http://ex.org/p> \"v{i}\" .")
    text = "\n".join(body)
    d = tempfile.mkdtemp(prefix="ttl_base2_")
    p = os.path.join(d, "base2.ttl")
    with open(p, "w") as f:
        f.write(text)
    warnings: list[str] = []
    got = read_turtle(spark, p, graph="g", warnings=warnings, chunk_statements=7)
    assert warnings == []
    assert got.count() == 30


def test_labeled_bnodes_file_scoped_in_multi_file_path(spark):
    """ADVICE r4: the same _:x label in two part files must yield TWO
    nodes (blank-node labels are document-scoped in RDF 1.1)."""
    t1 = "_:x <http://ex.org/p> \"one\" .\n<http://ex.org/s1> <http://ex.org/r> _:x .\n"
    t2 = "_:x <http://ex.org/p> \"two\" .\n<http://ex.org/s2> <http://ex.org/r> _:x .\n"
    d = tempfile.mkdtemp(prefix="ttl_bn_")
    with open(os.path.join(d, "a.ttl"), "w") as f:
        f.write(t1)
    with open(os.path.join(d, "b.ttl"), "w") as f:
        f.write(t2)
    got = read_turtle(spark, d, graph="g")
    rows = got.collect()
    bnode_subjects = {r.subject for r in rows if r.subject.startswith("_:")}
    assert len(bnode_subjects) == 2, bnode_subjects
    # within-file linkage preserved: each file's object bnode equals that
    # file's subject bnode
    by_lit = {r.object_value: r.subject for r in rows if r.object_type == "literal"}
    links = {r.object_value for r in rows if r.object_type == "bnode"}
    assert links == bnode_subjects
    assert by_lit["one"] != by_lit["two"]


def test_labeled_bnodes_cross_chunk_in_single_file(spark, monkeypatch):
    """Single-file chunker keeps labeled bnodes verbatim so cross-chunk
    references within one document still meet (the opposite contract from
    the multi-file path)."""
    monkeypatch.setattr(tmod, "SMALL_FILE_BYTES", 0)
    body = ["_:hub <http://ex.org/p> \"hub\" ."]
    for i in range(40):
        body.append(f"<http://ex.org/n{i}> <http://ex.org/r> _:hub .")
    text = "\n".join(body)
    d = tempfile.mkdtemp(prefix="ttl_bnc_")
    p = os.path.join(d, "bnc.ttl")
    with open(p, "w") as f:
        f.write(text)
    got = read_turtle(spark, p, graph="g", chunk_statements=5)
    rows = got.collect()
    hubs = {r.object_value for r in rows if r.object_type == "bnode"}
    subj = {r.subject for r in rows if r.subject.startswith("_:")}
    assert len(hubs) == 1 and hubs == subj


def test_driver_fallback_preserves_duplicates_when_not_distinct(spark, monkeypatch):
    """ADVICE r4: distinct=False must reach the driver fallback too —
    duplicate statements survive, matching the distributed paths."""
    text = (
        "<http://ex.org/s> <http://ex.org/p> \"v\" .\n"
        "<http://ex.org/s> <http://ex.org/p> \"v\" .\n"
    )
    d = tempfile.mkdtemp(prefix="ttl_dup_")
    p = os.path.join(d, "dup.ttl")
    with open(p, "w") as f:
        f.write(text)
    assert read_turtle(spark, p, distinct=False).count() == 2
    assert read_turtle(spark, p, distinct=True).count() == 1
