"""Pair and closed-world SHACL components: sh:equals, sh:disjoint,
sh:lessThanOrEquals, sh:closed (+ sh:ignoredProperties), sh:deactivated —
the round-3 completion of SHACL core §4.3-4.8 (the reference evaluates
these via shacl-engine, src/services/SHACLValidationService.ts:398-408)."""

from __future__ import annotations

from shacl_validator_spark.model import SH
from shacl_validator_spark.operators.validate import validate
from shacl_validator_spark.shapes import compile_shapes
from shacl_validator_spark.sources.rdf_io import triples_from_turtle

PREFIX = """
@prefix sh:   <http://www.w3.org/ns/shacl#> .
@prefix rdf:  <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix ex:   <http://example.org/s#> .
@prefix d:    <http://example.org/d#> .
@prefix xsd:  <http://www.w3.org/2001/XMLSchema#> .
"""

D = "http://example.org/d#"


def _by_comp(rows, comp):
    return [r for r in rows if r.sourceConstraintComponent == SH + comp + "ConstraintComponent"]


# --------------------------------------------------------------------------
# sh:equals — set equality, violations reported in BOTH directions
# --------------------------------------------------------------------------

EQUALS_SHAPE = PREFIX + """
ex:S a sh:NodeShape ; sh:targetClass ex:T ;
    sh:property [ sh:path ex:firstName ; sh:equals ex:givenName ] .
"""


def test_equals_both_directions(spark):
    warnings: list[str] = []
    shapes = compile_shapes(EQUALS_SHAPE, warnings)
    assert warnings == []
    data = PREFIX + """
    d:ok  a ex:T ; ex:firstName "Ann" ; ex:givenName "Ann" .
    d:bad a ex:T ; ex:firstName "Bob" ; ex:givenName "Robert" .
    d:missing a ex:T ; ex:givenName "Eve" .
    """
    rows = validate(spark, triples_from_turtle(spark, data), shapes).collect()
    eq = _by_comp(rows, "Equals")
    got = sorted((r.focusNode, r.value) for r in eq)
    assert got == [
        (D + "bad", "Bob"),       # path value missing from givenName
        (D + "bad", "Robert"),    # givenName value missing from path
        (D + "missing", "Eve"),   # sibling value, zero path values
    ]


def test_equals_term_identity_not_lexical(spark):
    """"1"^^xsd:integer and "1"^^xsd:string are DIFFERENT terms, so the
    sets are unequal and sh:equals fires — though the two directions share
    the lexical form "1", so they collapse to ONE result row under the
    (focus, path, value-string, component) result identity."""
    shapes = compile_shapes(EQUALS_SHAPE)
    data = PREFIX + """
    d:x a ex:T ; ex:firstName "1"^^xsd:integer ; ex:givenName "1" .
    """
    rows = validate(spark, triples_from_turtle(spark, data), shapes).collect()
    eq = _by_comp(rows, "Equals")
    assert [(r.focusNode, r.value) for r in eq] == [(D + "x", "1")]


# --------------------------------------------------------------------------
# sh:disjoint
# --------------------------------------------------------------------------


def test_disjoint(spark):
    shapes = compile_shapes(
        PREFIX
        + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
        sh:property [ sh:path ex:nick ; sh:disjoint ex:name ] .
    """
    )
    data = PREFIX + """
    d:ok  a ex:T ; ex:nick "Al" ; ex:name "Albert" .
    d:bad a ex:T ; ex:nick "Sam" ; ex:name "Sam" .
    """
    rows = validate(spark, triples_from_turtle(spark, data), shapes).collect()
    dj = _by_comp(rows, "Disjoint")
    assert [(r.focusNode, r.value) for r in dj] == [(D + "bad", "Sam")]


# --------------------------------------------------------------------------
# sh:lessThanOrEquals — typed comparison, non-strict
# --------------------------------------------------------------------------


def test_less_than_or_equals_dates(spark):
    """The startDate <= endDate idiom: equal dates conform, later violate."""
    shapes = compile_shapes(
        PREFIX
        + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
        sh:property [ sh:path ex:start ; sh:lessThanOrEquals ex:end ] .
    """
    )
    data = PREFIX + """
    d:same  a ex:T ; ex:start "2024-05-01"^^xsd:date ; ex:end "2024-05-01"^^xsd:date .
    d:early a ex:T ; ex:start "2024-01-01"^^xsd:date ; ex:end "2024-05-01"^^xsd:date .
    d:late  a ex:T ; ex:start "2024-09-01"^^xsd:date ; ex:end "2024-05-01"^^xsd:date .
    """
    rows = validate(spark, triples_from_turtle(spark, data), shapes).collect()
    lte = _by_comp(rows, "LessThanOrEquals")
    assert [(r.focusNode, r.value) for r in lte] == [(D + "late", "2024-09-01")]


def test_less_than_still_strict(spark):
    shapes = compile_shapes(
        PREFIX
        + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
        sh:property [ sh:path ex:start ; sh:lessThan ex:end ] .
    """
    )
    data = PREFIX + """
    d:same a ex:T ; ex:start "2024-05-01"^^xsd:date ; ex:end "2024-05-01"^^xsd:date .
    """
    rows = validate(spark, triples_from_turtle(spark, data), shapes).collect()
    assert len(_by_comp(rows, "LessThan")) == 1


# --------------------------------------------------------------------------
# sh:closed + sh:ignoredProperties
# --------------------------------------------------------------------------

CLOSED_SHAPE = PREFIX + """
ex:S a sh:NodeShape ; sh:targetClass ex:T ;
    sh:closed true ;
    sh:ignoredProperties ( rdf:type ) ;
    sh:property [ sh:path ex:name ; sh:minCount 1 ] .
"""


def test_closed_flags_unlisted_predicates(spark):
    warnings: list[str] = []
    shapes = compile_shapes(CLOSED_SHAPE, warnings)
    assert warnings == []
    closed = [r for r in shapes if r.get("closed")]
    assert len(closed) == 1
    assert closed[0]["closed_allowed"] == sorted(
        ["http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "http://example.org/s#name"]
    )
    data = PREFIX + """
    d:ok  a ex:T ; ex:name "fine" .
    d:bad a ex:T ; ex:name "fine" ; ex:extra "nope" .
    """
    rows = validate(spark, triples_from_turtle(spark, data), shapes).collect()
    cl = _by_comp(rows, "Closed")
    assert [(r.focusNode, r.resultPath, r.value) for r in cl] == [
        (D + "bad", "http://example.org/s#extra", "nope")
    ]


def test_closed_without_ignored_flags_rdf_type(spark):
    """rdf:type is NOT implicitly allowed (SHACL core §4.8.1)."""
    shapes = compile_shapes(
        PREFIX
        + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ; sh:closed true ;
        sh:property [ sh:path ex:name ; sh:minCount 1 ] .
    """
    )
    data = PREFIX + """
    d:x a ex:T ; ex:name "fine" .
    """
    rows = validate(spark, triples_from_turtle(spark, data), shapes).collect()
    cl = _by_comp(rows, "Closed")
    assert [r.resultPath for r in cl] == [
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    ]


# --------------------------------------------------------------------------
# node-shape-level constraints (facets on the node shape itself)
# --------------------------------------------------------------------------


def test_node_shape_level_constraint(spark):
    """sh:nodeKind directly on the node shape applies to the focus node
    (SHACL §2.1.3) — null resultPath, value = the focus node."""
    warnings: list[str] = []
    shapes = compile_shapes(
        PREFIX
        + """
    ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:name ; sh:nodeKind sh:IRI .
    """,
        warnings,
    )
    assert warnings == []
    assert len(shapes) == 1 and shapes[0]["path_steps"] == []
    data = PREFIX + """
    d:x a ex:T ; ex:name "iri subject" .
    _:b1 ex:name "bnode subject" .
    """
    rows = validate(spark, triples_from_turtle(spark, data), shapes).collect()
    nk = _by_comp(rows, "NodeKind")
    assert len(nk) == 1
    assert nk[0].resultPath is None
    assert nk[0].focusNode.startswith("_:")
    assert nk[0].value == nk[0].focusNode


def test_node_shape_level_not_emitted_when_facetless():
    shapes = compile_shapes(
        PREFIX
        + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
        sh:property [ sh:path ex:name ; sh:minCount 1 ] .
    """
    )
    assert len(shapes) == 1  # no no-op node-level row


# --------------------------------------------------------------------------
# implicit class targets (SHACL §2.1.3.1)
# --------------------------------------------------------------------------


def test_implicit_class_target(spark):
    """A node shape that is also an rdfs:Class targets its own instances."""
    shapes = compile_shapes(
        PREFIX
        + """
    @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
    ex:Person a sh:NodeShape, rdfs:Class ;
        sh:property [ sh:path ex:name ; sh:minCount 1 ] .
    """
    )
    assert len(shapes) == 1 and shapes[0]["target_class"] == (
        "http://example.org/s#Person"
    )
    data = PREFIX + """
    d:a a ex:Person ; ex:name "named" .
    d:b a ex:Person .
    """
    rows = validate(spark, triples_from_turtle(spark, data), shapes).collect()
    assert [r.focusNode for r in _by_comp(rows, "MinCount")] == [D + "b"]


# --------------------------------------------------------------------------
# rdfs:subClassOf entailment (SHACL-instance semantics, core §1.4.4)
# --------------------------------------------------------------------------

SUBCLASS_SHAPE = PREFIX + """
ex:S a sh:NodeShape ; sh:targetClass ex:Animal ;
    sh:property [ sh:path ex:name ; sh:minCount 1 ] .
"""

SUBCLASS_DATA = PREFIX + """
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
d:Dog rdfs:subClassOf d:Mammal . d:Mammal rdfs:subClassOf ex:Animal .
d:rex a d:Dog .
d:generic a ex:Animal .
"""


def test_target_class_sees_subclass_instances(spark):
    shapes = compile_shapes(SUBCLASS_SHAPE)
    rows = validate(spark, triples_from_turtle(spark, SUBCLASS_DATA), shapes).collect()
    mc = _by_comp(rows, "MinCount")
    # d:rex is an ex:Animal only through Dog ⊑ Mammal ⊑ Animal (two hops)
    assert sorted(r.focusNode for r in mc) == [D + "generic", D + "rex"]


def test_sh_class_sees_subclass_instances(spark):
    shapes = compile_shapes(
        PREFIX
        + """
    ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:pet ;
        sh:property [ sh:path ex:pet ; sh:class ex:Animal ] .
    """
    )
    data = SUBCLASS_DATA + """
    d:ann ex:pet d:rex .
    d:bob ex:pet d:rock .
    d:rock a d:Stone .
    """
    rows = validate(spark, triples_from_turtle(spark, data), shapes).collect()
    cls = _by_comp(rows, "Class")
    assert [(r.focusNode, r.value) for r in cls] == [(D + "bob", D + "rock")]


def test_entailment_none_disables_closure(spark):
    shapes = compile_shapes(SUBCLASS_SHAPE)
    rows = validate(
        spark,
        triples_from_turtle(spark, SUBCLASS_DATA),
        shapes,
        entailment="none",
    ).collect()
    assert sorted(r.focusNode for r in _by_comp(rows, "MinCount")) == [D + "generic"]


# --------------------------------------------------------------------------
# sh:deactivated
# --------------------------------------------------------------------------


def test_deactivated_node_shape_compiles_to_nothing():
    shapes = compile_shapes(
        PREFIX
        + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ; sh:deactivated true ;
        sh:property [ sh:path ex:name ; sh:minCount 1 ] .
    """
    )
    assert shapes == []


def test_deactivated_property_shape_skipped():
    shapes = compile_shapes(
        PREFIX
        + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
        sh:property [ sh:path ex:name ; sh:minCount 1 ; sh:deactivated true ] ;
        sh:property [ sh:path ex:age ; sh:minCount 1 ] .
    """
    )
    assert len(shapes) == 1
    assert shapes[0]["path"] == "http://example.org/s#age"


def test_lexical_validity_value_space(spark):
    """xsd:nonNegativeInteger excludes negatives; xsd:boolean's lexical
    space {true,false,0,1} is case-sensitive — both must flag sh:datatype."""
    from shacl_validator_spark.operators.validate import validate

    XSD = "http://www.w3.org/2001/XMLSchema#"
    RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    EX = "http://example.org/"
    from shacl_validator_spark.shapes.compiler import compile_shapes

    ttl = f"""
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <{EX}> .
    @prefix xsd: <{XSD.rstrip('#')}#> .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:property [ sh:path ex:n ; sh:datatype xsd:nonNegativeInteger ] ;
      sh:property [ sh:path ex:b ; sh:datatype xsd:boolean ] .
    """
    rows = compile_shapes(ttl)
    data = [
        ("ex:x", RDF_TYPE, EX + "T", "iri", None, None, "g"),
        ("ex:x", EX + "n", "5", "literal", XSD + "nonNegativeInteger", None, "g"),
        ("ex:x", EX + "b", "true", "literal", XSD + "boolean", None, "g"),
        ("ex:y", RDF_TYPE, EX + "T", "iri", None, None, "g"),
        ("ex:y", EX + "n", "-5", "literal", XSD + "nonNegativeInteger", None, "g"),
        ("ex:y", EX + "b", "TRUE", "literal", XSD + "boolean", None, "g"),
    ]
    t = spark.createDataFrame(
        data,
        "subject string, predicate string, object_value string, "
        "object_type string, object_datatype string, object_lang string, "
        "graph string",
    )
    got = {
        (r["focusNode"], r["value"])
        for r in validate(spark, t, rows).collect()
        if "Datatype" in r["sourceConstraintComponent"]
    }
    assert got == {("ex:y", "-5"), ("ex:y", "TRUE")}
