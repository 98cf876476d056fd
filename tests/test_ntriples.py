"""Distributed N-Triples/N-Quads source + sink (S5/S6 scale path) and the
remote-fetch seam: parse fidelity vs the Turtle parser, escape round-trip,
strict-mode error surfacing, quad labels, and the file:// fetch workflow."""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from shacl_validator_spark.sources.fetch import fetch_document, triples_from_url
from shacl_validator_spark.sources.ntriples import (
    ntriples_lines,
    read_ntriples,
    write_ntriples,
)
from shacl_validator_spark.sources.rdf_io import triples_from_turtle

NT = """\
# a comment line

<http://ex.org/s1> <http://ex.org/p> <http://ex.org/o1> .
<http://ex.org/s1> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex.org/T> .
_:b0 <http://ex.org/p> "plain" .
<http://ex.org/s2> <http://ex.org/label> "hola"@es-MX .
<http://ex.org/s2> <http://ex.org/n> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://ex.org/s3> <http://ex.org/esc> "line1\\nline2\\t\\"q\\" back\\\\slash" .
"""

# the same content as Turtle (escapes spelled the Turtle way)
TTL = """
@prefix ex: <http://ex.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
ex:s1 ex:p ex:o1 ; a ex:T .
_:b0 ex:p "plain" .
ex:s2 <http://ex.org/label> "hola"@es-MX ;
      ex:n "42"^^xsd:integer .
ex:s3 ex:esc "line1\\nline2\\t\\"q\\" back\\\\slash" .
"""


def _canon(df):
    return sorted(
        tuple(r) for r in df.select(
            "subject", "predicate", "object_value", "object_type",
            "object_datatype", "object_lang",
        ).collect()
    )


def test_read_matches_turtle_parser(spark, tmp_path):
    p = tmp_path / "doc.nt"
    p.write_text(NT, encoding="utf-8")
    got = read_ntriples(spark, str(p))
    want = triples_from_turtle(spark, TTL)
    assert _canon(got) == _canon(want)
    # plain literal carries xsd:string, lang literal carries lowered tag
    rows = {r.object_value: r for r in got.collect()}
    assert rows["plain"].object_datatype.endswith("#string")
    assert rows["hola"].object_lang == "es-mx" and rows["hola"].object_datatype is None
    assert rows['line1\nline2\t"q" back\\slash'].object_type == "literal"


def test_roundtrip_write_read(spark, tmp_path):
    p = tmp_path / "doc.nt"
    p.write_text(NT, encoding="utf-8")
    orig = read_ntriples(spark, str(p))
    out = str(tmp_path / "out_nt")
    write_ntriples(orig, out)
    back = read_ntriples(spark, out)
    assert _canon(back) == _canon(orig)


def test_quads_label_and_default_graph(spark, tmp_path):
    p = tmp_path / "doc.nq"
    p.write_text(
        "<http://ex.org/s> <http://ex.org/p> \"v\" <http://ex.org/g1> .\n"
        "<http://ex.org/s> <http://ex.org/p2> \"w\" .\n",
        encoding="utf-8",
    )
    df = read_ntriples(spark, str(p), graph="http://src.example/doc")
    by_pred = {r.predicate: r.graph for r in df.collect()}
    # explicit quad label wins; triple-line falls back to the stamp
    assert by_pred["http://ex.org/p"] == "http://ex.org/g1"
    assert by_pred["http://ex.org/p2"] == "http://src.example/doc"
    # quad-form serialization round-trips the labels
    out = str(p) + ".rt"
    write_ntriples(df, out, quads=True)
    back = read_ntriples(spark, out)
    assert {r.predicate: r.graph for r in back.collect()} == by_pred


def test_strict_raises_lazily_permissive_filters(spark, tmp_path):
    p = tmp_path / "bad.nt"
    p.write_text(
        "<http://ex.org/s> <http://ex.org/p> <http://ex.org/o> .\n"
        "this is not a triple\n",
        encoding="utf-8",
    )
    # plan builds fine; the error surfaces at scan time
    df = read_ntriples(spark, str(p))
    with pytest.raises(Exception, match="unparseable"):
        df.collect()
    ok = read_ntriples(spark, str(p), strict=False)
    assert ok.count() == 1


def test_uchar_echar_and_trailing_comment(spark, tmp_path):
    r"""Spec surface beyond the happy path: \uXXXX / \UXXXXXXXX numeric
    escapes, the full ECHAR set (\b \f \'), escaped-backslash adjacency
    (\\u0041 is backslash + 'u0041', NOT 'A'), and a comment after the
    terminating dot (a W3C positive-syntax case)."""
    p = tmp_path / "u.nt"
    p.write_text(
        "<http://ex.org/s> <http://ex.org/p1> \"caf\\u00E9\" . # trailing comment\n"
        "<http://ex.org/s> <http://ex.org/p2> \"\\U0001F600 ok\" .\n"
        "<http://ex.org/s> <http://ex.org/p3> \"a\\bb\\fc\\'d\" .\n"
        "<http://ex.org/s> <http://ex.org/p4> \"not-\\\\u0041\" .\n",
        encoding="utf-8",
    )
    vals = {r.predicate.rsplit("/", 1)[1]: r.object_value
            for r in read_ntriples(spark, str(p)).collect()}
    assert vals["p1"] == "café"
    assert vals["p2"] == "\U0001F600 ok"
    assert vals["p3"] == "a\bb\fc'd"
    assert vals["p4"] == "not-\\u0041"


def test_bnode_graph_label_roundtrip(spark, tmp_path):
    p = tmp_path / "bg.nq"
    p.write_text('<http://ex.org/s> <http://ex.org/p> "v" _:g1 .\n', encoding="utf-8")
    df = read_ntriples(spark, str(p))
    assert df.collect()[0].graph == "_:g1"
    out = str(p) + ".rt"
    write_ntriples(df, out, quads=True)
    # serialized bare (not laundered into an IRI), and re-parses identically
    line = read_ntriples(spark, out).collect()[0]
    assert line.graph == "_:g1"


def test_set_semantics_and_opt_out(spark, tmp_path):
    p = tmp_path / "dup.nt"
    line = '<http://ex.org/s> <http://ex.org/p> "v" .\n'
    p.write_text(line * 3, encoding="utf-8")
    assert read_ntriples(spark, str(p)).count() == 1
    assert read_ntriples(spark, str(p), distinct=False).count() == 3


def test_unit_separator_literal_parses_exactly(spark, tmp_path):
    """Raw U+001F inside a literal is spec-VALID (STRING_LITERAL_QUOTE
    excludes only quote/backslash/LF/CR) — the branch-free pre-replace
    rewrites it into its numeric escape, which the decoder restores, so
    it parses bit-exactly and can never confuse the packed fast path.
    A NON-matching line that happens to contain three U+001F chars must
    still report unparseable (the forged-pack case)."""
    p = tmp_path / "sep.nt"
    p.write_text(
        '<http://ex.org/s> <http://ex.org/p> "a\x1fb" .\n'
        '<http://ex.org/s> <http://ex.org/q> "clean" .\n',
        encoding="utf-8",
    )
    vals = {r.predicate: r.object_value for r in read_ntriples(spark, str(p)).collect()}
    assert vals == {"http://ex.org/p": "a\x1fb", "http://ex.org/q": "clean"}

    bad = tmp_path / "forged.nt"
    bad.write_text('<http://s> <http://p> "a\x1fb\x1fc\x1fd"\n', encoding="utf-8")
    with pytest.raises(Exception, match="unparseable"):
        read_ntriples(spark, str(bad)).collect()
    assert read_ntriples(spark, str(bad), strict=False).count() == 0


def test_gzipped_dump_reads(spark, tmp_path):
    """Real dumps ship as .nt.gz — the text source decompresses by
    extension (one stream per file: drop many medium .gz parts, not one
    giant archive, for parallelism)."""
    import gzip

    p = tmp_path / "doc.nt.gz"
    with gzip.open(p, "wt", encoding="utf-8") as fh:
        fh.write(NT)
    got = read_ntriples(spark, str(p))
    want = triples_from_turtle(spark, TTL)
    assert _canon(got) == _canon(want)


def test_lines_are_plain_column_plan(spark, tmp_path):
    """Serialization must stay JVM-side: no Python eval nodes in the plan."""
    p = tmp_path / "doc.nt"
    p.write_text(NT, encoding="utf-8")
    plan = ntriples_lines(
        read_ntriples(spark, str(p))
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


_lit_text = st.text(
    # full BMP + astral, incl. quotes/backslashes/newlines/controls,
    # U+0000 AND the pack separator U+001F — the decode is collision-free
    # by construction and U+001F routes through the fallback branch; only
    # surrogates are excluded (not encodable to UTF-8 at all)
    alphabet=st.characters(blacklist_categories=("Cs",)),
    max_size=40,
)


@given(vals=st.lists(_lit_text, min_size=1, max_size=8))
@settings(
    max_examples=int(os.environ.get("PROP_EXAMPLES", "25")),
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
def test_property_literal_roundtrip(spark, tmp_path_factory, vals):
    """Any literal lexical form survives serialize → parse bit-exactly."""
    df = spark.createDataFrame(
        [
            ("http://ex.org/s", f"http://ex.org/p{i}", v, "literal", None, None, None)
            for i, v in enumerate(vals)
        ],
        "subject string, predicate string, object_value string, object_type string, "
        "object_datatype string, object_lang string, graph string",
    )
    out = str(tmp_path_factory.mktemp("ntprop"))
    write_ntriples(df, out, mode="overwrite")
    got = {
        (r.predicate, r.object_value)
        for r in read_ntriples(spark, out, distinct=False).collect()
    }
    assert got == {(f"http://ex.org/p{i}", v) for i, v in enumerate(vals)}


def test_fetch_file_url_turtle_and_nt(spark, tmp_path):
    ttl = tmp_path / "cat.ttl"
    ttl.write_text(TTL, encoding="utf-8")
    nt = tmp_path / "cat.nt"
    nt.write_text(NT, encoding="utf-8")
    df_ttl = triples_from_url(spark, f"file://{ttl}")
    df_nt = triples_from_url(spark, f"file://{nt}")
    assert _canon(df_ttl) == _canon(df_nt)
    # provenance stamp = source url
    assert df_ttl.select("graph").distinct().collect()[0][0] == f"file://{ttl}"
    text, _ = fetch_document(f"file://{ttl}")
    assert "ex:s1" in text


def test_fetch_max_bytes_guard(tmp_path):
    big = tmp_path / "big.ttl"
    big.write_text("#" + "x" * 1024, encoding="utf-8")
    with pytest.raises(ValueError, match="max_bytes"):
        fetch_document(f"file://{big}", max_bytes=100)
