"""sh:sparql SELECT constraints: parser subset, compile-time surfacing of
unsupported syntax, and end-to-end evaluation through validate() with
target scoping and message placeholder substitution."""

from __future__ import annotations

import pytest

from shacl_validator_spark.operators.validate import validate
from shacl_validator_spark.shapes.compiler import compile_shapes
from shacl_validator_spark.shapes.sparql import (
    SparqlUnsupported,
    eval_select,
    parse_select,
)
from shacl_validator_spark.sources.rdf_io import triples_from_turtle

DATA = """
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix ex: <http://ex.org/> .
ex:c1 a ex:Cust ; ex:bal "-5"^^<http://www.w3.org/2001/XMLSchema#integer> ;
      ex:name "alice"@en .
ex:c2 a ex:Cust ; ex:bal "10"^^<http://www.w3.org/2001/XMLSchema#integer> .
ex:c3 a ex:Cust .
ex:other ex:bal "-9"^^<http://www.w3.org/2001/XMLSchema#integer> .
"""

SHAPES = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://ex.org/> .
ex:CustShape a sh:NodeShape ;
  sh:targetClass ex:Cust ;
  sh:severity sh:Warning ;
  sh:sparql [
    sh:message "negative balance on {$this}: {?value}"@en ;
    sh:select \"\"\"
      SELECT $this ?value WHERE {
        $this ex:bal ?value .
        FILTER(?value < 0)
      }
    \"\"\" ;
  ] ;
  sh:sparql [
    sh:message "customer without balance" ;
    sh:select \"\"\"
      SELECT $this WHERE {
        $this a ex:Cust .
        FILTER NOT EXISTS { $this ex:bal ?b }
      }
    \"\"\" ;
  ] .
"""


def test_compile_and_validate_sparql(spark):
    warnings: list[str] = []
    rows = compile_shapes(SHAPES, warnings)
    assert warnings == []
    sparql_rows = [r for r in rows if r.get("sparql_select")]
    assert len(sparql_rows) == 2
    t = triples_from_turtle(spark, DATA)
    v = validate(spark, t, rows)
    got = {
        (r.focusNode, r.value, r.sourceConstraintComponent, r.resultSeverity)
        for r in v.collect()
    }
    SC = "http://www.w3.org/ns/shacl#SPARQLConstraintComponent"
    # ex:other matches the BGP but is NOT a target → excluded
    assert got == {
        ("http://ex.org/c1", "-5", SC, "Warning"),
        ("http://ex.org/c3", None, SC, "Warning"),
    }
    msg = {
        r.focusNode: r.message[0].text
        for r in v.collect()
        if r.focusNode == "http://ex.org/c1"
    }
    assert msg["http://ex.org/c1"] == "negative balance on http://ex.org/c1: -5"


def test_sh_prefixes_declare_resolution(spark):
    shapes = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://ex.org/> .
    ex:S a sh:NodeShape ; sh:targetClass ex:Cust ;
      sh:sparql [
        sh:prefixes [ sh:declare [ sh:prefix "b" ; sh:namespace "http://ex.org/" ] ] ;
        sh:select "SELECT $this ?value WHERE { $this b:bal ?value . FILTER(?value < 0) }" ;
      ] .
    """
    warnings: list[str] = []
    rows = compile_shapes(shapes, warnings)
    assert warnings == []
    v = validate(spark, triples_from_turtle(spark, DATA), rows)
    assert {r.focusNode for r in v.collect()} == {"http://ex.org/c1"}


def test_optional_compiles_clean_and_left_joins(spark):
    """r4: OPTIONAL compiles with zero warnings (VERDICT r3 missing #4) and
    evaluates as a left join — focus nodes keep their solution when the
    optional pattern is absent, with the optional variable unbound."""
    shapes = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://ex.org/> .
    ex:S a sh:NodeShape ; sh:targetClass ex:Cust ;
      sh:sparql [ sh:select \"\"\"
        SELECT $this ?w WHERE {
          $this <http://ex.org/p> ?v .
          OPTIONAL { ?v <http://ex.org/q> ?w }
          FILTER(!bound(?w))
        }
      \"\"\" ] .
    """
    warnings: list[str] = []
    rows = compile_shapes(shapes, warnings)
    assert warnings == []
    assert [r for r in rows if r.get("sparql_select")] != []
    data = """
    @prefix ex: <http://ex.org/> .
    ex:c1 a ex:Cust ; ex:p ex:v1 .
    ex:c2 a ex:Cust ; ex:p ex:v2 .
    ex:v2 ex:q "linked" .
    """
    v = validate(spark, triples_from_turtle(spark, data), rows)
    # only c1's ?v lacks the optional link → only c1 violates
    assert {r.focusNode for r in v.collect()} == {"http://ex.org/c1"}


def test_union_and_bind(spark):
    """{A} UNION {B} unions alternative bindings; BIND adds a column."""
    q = parse_select(
        """
        SELECT $this ?v WHERE {
          $this <http://ex.org/t> ?x .
          { $this <http://ex.org/a> ?v } UNION { $this <http://ex.org/b> ?v }
        }
        """
    )
    t = triples_from_turtle(
        spark,
        """
        @prefix ex: <http://ex.org/> .
        ex:s1 ex:t "1" ; ex:a "A" .
        ex:s2 ex:t "1" ; ex:b "B" .
        ex:s3 ex:t "1" .
        """,
    )
    got = {tuple(r) for r in eval_select(t, q).collect()}
    assert got == {("http://ex.org/s1", "A"), ("http://ex.org/s2", "B")}
    q2 = parse_select(
        "SELECT $this ?u WHERE { $this <http://ex.org/a> ?v . "
        'BIND(str(?v) AS ?u) FILTER(?u = "A") }'
    )
    got2 = {tuple(r) for r in eval_select(t, q2).collect()}
    assert got2 == {("http://ex.org/s1", "A")}


def test_parser_rejections():
    with pytest.raises(SparqlUnsupported, match=r"\$this"):
        parse_select("SELECT ?x WHERE { ?x a <http://t> }")
    with pytest.raises(SparqlUnsupported, match="UNDEF"):
        parse_select(
            "SELECT $this WHERE { $this a <http://t> . "
            "VALUES ?this { UNDEF } }"
        )
    with pytest.raises(SparqlUnsupported, match="VALUES must share"):
        q = parse_select(
            'SELECT $this WHERE { $this a <http://t> . VALUES ?v { "a" } }'
        )
        eval_select(None, q)  # raises before touching the DataFrame
    with pytest.raises(SparqlUnsupported, match="bare nested group"):
        parse_select("SELECT $this WHERE { { $this a <http://t> } }")
    with pytest.raises(SparqlUnsupported, match="cartesian"):
        q = parse_select("SELECT $this WHERE { $this a <http://t> . ?a <http://p> ?b }")
        eval_select(None, q)  # raises before touching the DataFrame
    with pytest.raises(SparqlUnsupported, match="undeclared prefix"):
        parse_select("SELECT $this WHERE { $this ex:p ?v }")


def test_review_findings_regressions(spark):
    """Round-3 review regressions: PN_LOCAL must not swallow the statement
    dot; regioned lang tags tokenize; UCHAR escapes decode in constants;
    literal subjects raise; SELECT * gets the curated message."""
    # ex:Cust. (no space before the dot) → IRI ends at 'Cust'
    q = parse_select(
        "PREFIX ex: <http://ex.org/> SELECT $this WHERE { $this a ex:Cust. }"
    )
    assert q.patterns[0].o == ("iri", "http://ex.org/Cust")
    # regioned lang tag tokenizes and lowercases
    q2 = parse_select(
        'PREFIX ex: <http://ex.org/> SELECT $this WHERE { $this ex:l "x"@en-GB }'
    )
    assert q2.patterns[0].o == ("lit", "x", None, "en-gb")
    # \\uXXXX decodes in string constants
    q3 = parse_select(
        'PREFIX ex: <http://ex.org/> SELECT $this WHERE { $this ex:n "caf\\u00E9" }'
    )
    assert q3.patterns[0].o[1] == "café"
    with pytest.raises(SparqlUnsupported, match="subject position"):
        parse_select('SELECT $this WHERE { "lit" <http://p> ?v . $this <http://q> ?v }')
        eval_select(None, parse_select(
            'SELECT $this WHERE { "lit" <http://p> ?v . $this <http://q> ?v }'
        ))
    with pytest.raises(SparqlUnsupported, match="outside the subset"):
        parse_select("SELECT * WHERE { $this a <http://t> }")


def test_term_identity_join(spark):
    """Shared variables unify on full RDF term identity, not lexical value:
    "5"^^xsd:integer and "5" (plain) are different terms and must not join."""
    rows = [
        ("ex:a", "http://ex.org/bal", "5", "literal",
         "http://www.w3.org/2001/XMLSchema#integer", None, None),
        ("ex:b", "http://ex.org/bal", "5", "literal",
         "http://www.w3.org/2001/XMLSchema#string", None, None),
        ("ex:a", "http://ex.org/flag", "y", "literal", None, None, None),
        ("ex:b", "http://ex.org/flag", "y", "literal", None, None, None),
    ]
    t = spark.createDataFrame(
        rows,
        "subject string, predicate string, object_value string, object_type string, "
        "object_datatype string, object_lang string, graph string",
    )
    q = parse_select(
        """PREFIX ex: <http://ex.org/>
        SELECT $this ?c WHERE {
          $this ex:bal ?v . ?c ex:bal ?v . $this ex:flag ?f . ?c ex:flag ?f
        }"""
    )
    got = {tuple(r) for r in eval_select(t, q).collect()}
    # each subject only joins itself: the "5"s differ in datatype, so no
    # cross pair; ?f ("y" plain) is term-identical across both but ?v gates
    assert got == {("ex:a", "ex:a"), ("ex:b", "ex:b")}


def test_bgp_join_ordering_and_builtins(spark):
    """Transitively-connected patterns order themselves; datatype()/lang()
    builtins read the aux binding columns."""
    t = triples_from_turtle(spark, DATA)
    q = parse_select(
        """
        PREFIX ex: <http://ex.org/>
        SELECT $this ?n WHERE {
          ?c ex:name ?n .
          $this ex:bal ?v .
          ?c ex:bal ?v .
          FILTER(lang(?n) = "en" && datatype(?v) = <http://www.w3.org/2001/XMLSchema#integer>)
        }
        """
    )
    got = {tuple(r) for r in eval_select(t, q).collect()}
    assert got == {("http://ex.org/c1", "alice")}


def test_dir3_rule_as_sh_sparql_parity(spark):
    """The hand-written DIR3 profile rule (custom_rules.py — the bundled
    fast path) and its sh:sparql expression through the general compiler
    must flag the identical (focusNode, value) set on the synthetic
    DCAT-AP-ES catalog."""
    from shacl_validator_spark.shapes.custom_rules import (
        apply_custom_rules,
        dir3_organism_rule,
    )
    from shacl_validator_spark.sources.synthetic import nation_dcat_es_triples

    t = nation_dcat_es_triples(spark, "/root/testdata/sf0.001")
    want = {
        (r.focusNode, r.value)
        for r in apply_custom_rules(spark, t, [dir3_organism_rule()]).collect()
    }
    shapes = """
    @prefix sh:   <http://www.w3.org/ns/shacl#> .
    @prefix dcat: <http://www.w3.org/ns/dcat#> .
    @prefix dct:  <http://purl.org/dc/terms/> .
    @prefix ex:   <http://ex.org/> .
    ex:Dir3SparqlShape a sh:NodeShape ;
      sh:targetClass dcat:Dataset ;
      sh:sparql [
        sh:message "publisher must be a DIR3 organism IRI" ;
        sh:select \"\"\"
          PREFIX dct: <http://purl.org/dc/terms/>
          SELECT $this ?value WHERE {
            $this dct:publisher ?value .
            FILTER(!isIRI(?value) || !regex(str(?value),
              "^http://datos\\\\.gob\\\\.es/recurso/sector-publico/org/Organismo/"))
          }
        \"\"\" ;
      ] .
    """
    warnings: list[str] = []
    rows = compile_shapes(shapes, warnings)
    assert warnings == []
    got = {
        (r.focusNode, r.value)
        for r in validate(spark, t, rows).collect()
    }
    assert got == want and len(want) > 0


def test_rdfterm_equal_lang_literals(spark):
    """r3 ADVICE #1: FILTER(?v = "x") must not match "x"@en — plain vs
    lang-tagged literal comparison is a SPARQL type error (solution
    eliminated), for = and != alike; typed numerics still value-compare."""
    t = triples_from_turtle(
        spark,
        """
        @prefix ex: <http://ex.org/> .
        ex:s1 ex:p "x" .
        ex:s2 ex:p "x"@en .
        ex:s3 ex:p "y" .
        ex:n1 ex:q "05"^^<http://www.w3.org/2001/XMLSchema#integer> .
        ex:n2 ex:q "5.0"^^<http://www.w3.org/2001/XMLSchema#decimal> .
        """,
    )
    eq = parse_select('SELECT $this WHERE { $this <http://ex.org/p> ?v . FILTER(?v = "x") }')
    assert {r.this for r in eval_select(t, eq).collect()} == {"http://ex.org/s1"}
    # != is the mirror image: "x"@en is ELIMINATED, not matched
    ne = parse_select('SELECT $this WHERE { $this <http://ex.org/p> ?v . FILTER(?v != "x") }')
    assert {r.this for r in eval_select(t, ne).collect()} == {"http://ex.org/s3"}
    # cross-datatype numerics share the numeric comparison domain
    nq = parse_select(
        "SELECT $this WHERE { $this <http://ex.org/q> ?v . "
        'FILTER(?v = "5"^^<http://www.w3.org/2001/XMLSchema#integer>) }'
    )
    assert {r.this for r in eval_select(t, nq).collect()} == {
        "http://ex.org/n1", "http://ex.org/n2",
    }


def test_values_single_var(spark):
    t = triples_from_turtle(spark, DATA)
    q = parse_select(
        "SELECT $this ?value WHERE { $this <http://ex.org/bal> ?value . "
        'VALUES ?value { "-5"^^<http://www.w3.org/2001/XMLSchema#integer> '
        '"10"^^<http://www.w3.org/2001/XMLSchema#integer> } }'
    )
    got = {tuple(r) for r in eval_select(t, q).collect()}
    assert got == {("http://ex.org/c1", "-5"), ("http://ex.org/c2", "10")}


def test_values_multi_var_and_iris(spark):
    t = triples_from_turtle(spark, DATA)
    q = parse_select(
        "SELECT $this ?value WHERE { $this <http://ex.org/bal> ?value . "
        "VALUES ( ?this ?value ) { "
        '( <http://ex.org/c1> "-5"^^<http://www.w3.org/2001/XMLSchema#integer> ) '
        '( <http://ex.org/c2> "999"^^<http://www.w3.org/2001/XMLSchema#integer> ) } }'
    )
    got = {tuple(r) for r in eval_select(t, q).collect()}
    # c2's pair requires bal=999 which the data does not hold — only c1 row
    assert got == {("http://ex.org/c1", "-5")}


def test_values_lang_literal_term_identity(spark):
    t = triples_from_turtle(spark, DATA)
    q = parse_select(
        "SELECT $this ?n WHERE { $this <http://ex.org/name> ?n . "
        'VALUES ?n { "alice"@en "alice" } }'
    )
    got = {tuple(r) for r in eval_select(t, q).collect()}
    # data holds "alice"@en only; the plain "alice" VALUES term is a
    # DIFFERENT RDF term and must not double-match
    assert got == {("http://ex.org/c1", "alice")}


def test_values_binds_new_var(spark):
    t = triples_from_turtle(spark, DATA)
    q = parse_select(
        "SELECT $this ?label WHERE { $this <http://ex.org/bal> ?value . "
        "VALUES ( ?value ?label ) { "
        '( "-5"^^<http://www.w3.org/2001/XMLSchema#integer> "neg" ) '
        '( "10"^^<http://www.w3.org/2001/XMLSchema#integer> "pos" ) } }'
    )
    got = {tuple(r) for r in eval_select(t, q).collect()}
    assert got == {("http://ex.org/c1", "neg"), ("http://ex.org/c2", "pos")}


def test_minus_removes_shared_solutions(spark):
    t = triples_from_turtle(spark, DATA)
    q = parse_select(
        "SELECT $this WHERE { $this a <http://ex.org/Cust> . "
        "MINUS { $this <http://ex.org/bal> ?b } }"
    )
    got = {r.this for r in eval_select(t, q).collect()}
    # c1 and c2 have bal; only c3 survives
    assert got == {"http://ex.org/c3"}


def test_minus_with_filter_inside(spark):
    t = triples_from_turtle(spark, DATA)
    q = parse_select(
        "SELECT $this WHERE { $this <http://ex.org/bal> ?v . "
        "MINUS { $this <http://ex.org/bal> ?v . FILTER(?v < 0) } }"
    )
    # c1 (-5) and other (-9) are negative → removed; only c2 (10) survives
    got = {r.this for r in eval_select(t, q).collect()}
    assert got == {"http://ex.org/c2"}


def test_minus_disjoint_domain_is_noop(spark):
    t = triples_from_turtle(spark, DATA)
    q = parse_select(
        "SELECT $this WHERE { $this a <http://ex.org/Cust> . "
        "MINUS { ?x <http://ex.org/name> ?n } }"
    )
    # no shared variable: SPARQL Minus removes nothing
    got = {r.this for r in eval_select(t, q).collect()}
    assert got == {"http://ex.org/c1", "http://ex.org/c2", "http://ex.org/c3"}


def test_optional_outer_filter_var_surfaces(spark):
    """ADVICE r4: FILTER inside OPTIONAL referencing an outer-only
    variable must raise SparqlUnsupported at compile time, not a raw
    Spark unresolved-column error at evaluation time."""
    t = triples_from_turtle(spark, DATA)
    q = parse_select(
        "SELECT $this WHERE { $this <http://ex.org/bal> ?v . "
        "OPTIONAL { $this <http://ex.org/name> ?n . FILTER(?v < 0) } }"
    )
    with pytest.raises(SparqlUnsupported, match="outer variable"):
        eval_select(t, q)
