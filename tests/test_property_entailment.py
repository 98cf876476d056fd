"""Property-based differential test for rdfs:subClassOf ENTAILMENT.

Round 3 gave sh:targetClass / sh:class "SHACL instance of" semantics
(operators/validate.py ``_typed_with_entailment``): instances carry their
transitive ancestor classes, closed cycle-safely over the data graph's
subclass edges.  Hypothesis generates random subclass edge sets —
including CYCLES and diamonds — plus typing and value triples; a
pure-Python transitive-ancestor mirror must agree with the engine on

- entailed TARGET selection (``minCount 1`` fires per in-scope focus
  node without the path), and
- entailed sh:class value checks (a value conforms iff the checked class
  is among its asserted-or-ancestor classes).
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from shacl_validator_spark.model import RDF_TYPE
from shacl_validator_spark.operators.validate import validate

RDFS_SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"

SUBJECTS = ["s0", "s1"]
CLASSES = ["T", "C1", "C2", "C3"]
VALUE_NODES = ["n0", "n1"]


def ancestors(edges: set[tuple[str, str]], c: str) -> set[str]:
    """Transitive ancestors of ``c`` excluding ``c`` itself (the engine's
    cycle guard skips the start node even when a cycle reaches it)."""
    up: dict[str, set[str]] = {}
    for a, b in edges:
        if a != b:
            up.setdefault(a, set()).add(b)
    seen: set[str] = set()
    stack = list(up.get(c, ()))
    while stack:
        p = stack.pop()
        if p in seen or p == c:
            continue
        seen.add(p)
        stack.extend(up.get(p, ()))
    return seen


def entailed_types(triples: list[tuple]) -> dict[str, set[str]]:
    edges = {
        (s, v)
        for s, p, v, ot, dt, lg, g in triples
        if p == RDFS_SUBCLASS and ot != "literal" and s != v
    }
    typed: dict[str, set[str]] = {}
    for s, p, v, *_ in triples:
        if p == RDF_TYPE:
            typed.setdefault(s, set()).add(v)
    return {
        s: set().union(cls, *(ancestors(edges, c) for c in cls))
        for s, cls in typed.items()
    }


triple_st = st.one_of(
    # typing triples for subjects and value nodes
    st.tuples(
        st.sampled_from(SUBJECTS + VALUE_NODES),
        st.just(RDF_TYPE),
        st.sampled_from(CLASSES),
    ).map(lambda t: (t[0], t[1], t[2], "iri", None, None, "g1")),
    # subclass edges — cycles and diamonds allowed
    st.tuples(
        st.sampled_from(CLASSES),
        st.just(RDFS_SUBCLASS),
        st.sampled_from(CLASSES),
    ).map(lambda t: (t[0], t[1], t[2], "iri", None, None, "g1")),
    # value triples: IRI nodes and one literal
    st.tuples(
        st.sampled_from(SUBJECTS),
        st.just("p0"),
        st.sampled_from(
            [
                ("n0", "iri", None, None),
                ("n1", "iri", None, None),
                ("lit", "literal", None, None),
            ]
        ),
    ).map(lambda t: (t[0], t[1], *t[2], "g1")),
)


@given(triples=st.lists(triple_st, min_size=1, max_size=14))
@settings(
    max_examples=int(os.environ.get("PROP_EXAMPLES", "25")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_entailment_matches_reference(spark, triples):
    constraints = [
        {
            "constraint_id": 1,
            "shape_iri": "ex:S",
            "target_class": "T",
            "path": "p0",
            "path_steps": [["p0"]],
            "severity": "Violation",
            "class_iri": "C1",
            "min_count": 1,
        }
    ]
    df = spark.createDataFrame(
        triples,
        "subject string, predicate string, object_value string, object_type string, "
        "object_datatype string, object_lang string, graph string",
    )
    got = {
        (
            r.focusNode,
            r.value,
            r.sourceConstraintComponent.rsplit("#", 1)[-1].replace(
                "ConstraintComponent", ""
            ),
        )
        for r in validate(spark, df, constraints).collect()
    }
    typed = entailed_types(triples)
    expected: set[tuple] = set()
    for focus, cls in typed.items():
        if "T" not in cls:
            continue
        nodes = {
            (v, ot) for s, p, v, ot, *_ in triples if s == focus and p == "p0"
        }
        if not nodes:
            expected.add((focus, None, "MinCount"))
        for v, ot in nodes:
            if ot == "literal" or "C1" not in typed.get(v, set()):
                expected.add((focus, v, "Class"))
    assert got == expected, (
        f"\ntriples={triples}\n"
        f"only-spark={sorted(got - expected, key=str)}\n"
        f"only-ref={sorted(expected - got, key=str)}"
    )
