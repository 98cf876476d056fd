"""Property-based differential test for the PAIR components sh:equals /
sh:disjoint.

The value pool is built around RDF-term-identity collision cases the
golden fixtures (tests/test_pair_and_closed.py) pin only once each:

- a plain literal vs the same spelling typed xsd:string (EQUAL, RDF 1.1),
- the same spelling typed xsd:integer (NOT equal),
- language tags differing only in case ("en" vs "EN" — EQUAL, BCP47
  case-insensitive),
- an IRI vs a literal sharing the spelling (NOT equal),
- path == sibling predicate (sh:equals trivially satisfied; sh:disjoint
  flags every value).

An independent pure-Python evaluator mirrors the engine's normalized term
key (operators/validate.py ``_term_key``) and both emit directions.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from shacl_validator_spark.model import RDF_TYPE
from shacl_validator_spark.operators.validate import validate

XSD = "http://www.w3.org/2001/XMLSchema#"
LANGSTR = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

SUBJECTS = ["s0", "s1"]
PREDS = ["p0", "p1", "pc"]
VALUES = [
    ("5", "literal", None, None),            # plain ≡ xsd:string
    ("5", "literal", XSD + "string", None),  # ≡ the plain form above
    ("5", "literal", XSD + "integer", None), # distinct term, same spelling
    ("hello", "literal", None, "en"),
    ("hello", "literal", None, "EN"),        # ≡ "hello"@en (case-fold)
    ("hello", "literal", None, "es"),
    ("n0", "iri", None, None),
    ("n0", "literal", None, None),           # distinct term, same spelling
]


def term_key(v, ot, dt, lg):
    """Mirror of the engine's normalized RDF-term join key."""
    if ot == "literal":
        eff = LANGSTR if lg is not None else (dt or XSD + "string")
    else:
        eff = ""
    return (v, ot, eff if ot == "literal" else "", (lg or "").lower())


def ref_pairs(triples: list[tuple], constraints: list[dict]) -> set[tuple]:
    typed = {s for s, p, v, *_ in triples if p == RDF_TYPE and v == "T"}
    out: set[tuple] = set()
    for c in constraints:
        path, sev = c["path"], c["severity"]
        for focus in typed:
            path_terms = {
                term_key(v, ot, dt, lg): v
                for s, p, v, ot, dt, lg, g in triples
                if s == focus and p == path
            }
            sib_pred = c.get("equals") or c.get("disjoint")
            sib_terms = {
                term_key(v, ot, dt, lg): v
                for s, p, v, ot, dt, lg, g in triples
                if s == focus and p == sib_pred
            }
            if c.get("equals"):
                for k in set(path_terms) - set(sib_terms):
                    out.add((focus, path, path_terms[k], sev, "Equals"))
                for k in set(sib_terms) - set(path_terms):
                    out.add((focus, path, sib_terms[k], sev, "Equals"))
            if c.get("disjoint"):
                for k in set(path_terms) & set(sib_terms):
                    out.add((focus, path, path_terms[k], sev, "Disjoint"))
    return out


triple_st = st.one_of(
    st.tuples(st.sampled_from(SUBJECTS), st.just(RDF_TYPE), st.just("T")).map(
        lambda t: (t[0], t[1], t[2], "iri", None, None, "g1")
    ),
    st.tuples(
        st.sampled_from(SUBJECTS),
        st.sampled_from(PREDS),
        st.sampled_from(VALUES),
        st.sampled_from(["g1", "g2"]),
    ).map(lambda t: (t[0], t[1], *t[2], t[3])),
)

constraint_st = st.tuples(
    st.sampled_from(PREDS),
    st.sampled_from(["equals", "disjoint"]),
    st.sampled_from(PREDS),  # sibling — may equal the path predicate
)


@given(
    triples=st.lists(triple_st, min_size=1, max_size=12),
    raw=st.lists(constraint_st, min_size=1, max_size=3),
)
@settings(
    max_examples=int(os.environ.get("PROP_EXAMPLES", "25")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_pair_engine_matches_reference(spark, triples, raw):
    constraints = []
    for i, (path, kind, sibling) in enumerate(raw):
        constraints.append(
            {
                "constraint_id": i + 1,
                "shape_iri": "ex:S",
                "target_class": "T",
                "path": path,
                "path_steps": [[path]],
                "severity": "Violation",
                kind: sibling,
            }
        )
    df = spark.createDataFrame(
        triples,
        "subject string, predicate string, object_value string, object_type string, "
        "object_datatype string, object_lang string, graph string",
    )
    got = {
        (
            r.focusNode,
            r.resultPath,
            r.value,
            r.resultSeverity,
            r.sourceConstraintComponent.rsplit("#", 1)[-1].replace(
                "ConstraintComponent", ""
            ),
        )
        for r in validate(spark, df, constraints).collect()
    }
    expected = ref_pairs(triples, constraints)
    assert got == expected, (
        f"\ntriples={triples}\nconstraints={constraints}\n"
        f"only-spark={sorted(got - expected, key=str)}\n"
        f"only-ref={sorted(expected - got, key=str)}"
    )
