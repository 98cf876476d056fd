"""Property-based differential test for the DataFrame SHACL executor.

Hypothesis generates small random graphs + constraint sets; an INDEPENDENT
pure-Python reference evaluator implements the same SHACL-subset semantics
(set-of-value-nodes, targets-side zero-value detection, term-identity
dedup); the Spark engine must agree result-for-result.  This is the
engine's strongest correctness artifact beyond the per-component golden
fixtures: it explores facet interactions (several constraints on one path,
shared paths across shapes, multi-graph duplicate assertions) no
hand-written fixture covers.
"""

from __future__ import annotations

import os
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from shacl_validator_spark.model import RDF_TYPE
from shacl_validator_spark.operators.validate import validate

XSD = "http://www.w3.org/2001/XMLSchema#"
LANGSTR = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

SUBJECTS = ["s0", "s1", "s2"]
PREDS = ["p0", "p1"]
CMP_PRED = "pc"  # lessThan comparison property
CLASSES = ["T", "C1"]
# (value, object_type, datatype, lang) pools — literals carry int-ish and
# junk lexical forms, IRIs double as potential C1 instances
LITERALS = [
    ("5", "literal", XSD + "integer", None),
    ("17", "literal", XSD + "integer", None),
    ("x", "literal", XSD + "integer", None),
    ("hello", "literal", None, "en"),
    ("howdy", "literal", None, "en-US-x-priv"),
    ("gday", "literal", None, "EN-GB"),
    ("hola", "literal", None, "es"),
    ("servus", "literal", None, "de"),
    ("plain", "literal", None, None),
]
TEMPORALS = [
    ("2024-01-02", "literal", XSD + "date", None),
    ("2030-12-31", "literal", XSD + "dateTime", None),
    ("notadate", "literal", XSD + "dateTime", None),  # 'bad' comparison kind
]
IRIS = [("n0", "iri", None, None), ("n1", "iri", None, None)]
VALUES = LITERALS + TEMPORALS + IRIS


def _num(v: str) -> float | None:
    try:
        return float(v)
    except ValueError:
        return None


def _int_ok(v: str) -> bool:
    return re.fullmatch(r"[+-]?\d+", v) is not None


def _eff_dt(dt: str | None, lang: str | None) -> str:
    if lang is not None:
        return LANGSTR
    return dt if dt is not None else XSD + "string"


def _lex_ok(dt: str, v: str) -> bool:
    if dt == XSD + "integer":
        return _int_ok(v)
    return True


_CMP_NUMERIC_DT = {
    XSD + t
    for t in (
        "integer", "decimal", "double", "float", "long", "int", "short",
        "byte", "nonNegativeInteger", "nonPositiveInteger",
        "negativeInteger", "positiveInteger", "unsignedLong", "unsignedInt",
        "unsignedShort", "unsignedByte",
    )
}


def _cmp_kind(v, ot, dt, lg):
    """SPARQL-'<' comparison domain keyed by effective datatype (mirrors
    the engine's _lt_kind): ('num'|'str'|'bad', comparable value)."""
    if ot != "literal" or lg is not None:
        return ("bad", None)
    eff = dt if dt is not None else XSD + "string"
    if eff in _CMP_NUMERIC_DT:
        n = _num(v)
        return ("num", n) if n is not None else ("bad", None)
    if eff in (XSD + "dateTime", XSD + "date"):
        try:
            from datetime import datetime

            return ("ts", datetime.strptime(v, "%Y-%m-%d"))
        except ValueError:
            return ("bad", None)
    if eff == XSD + "string":
        return ("str", v)
    return ("bad", None)


def ref_validate(triples: list[tuple], constraints: list[dict]) -> set[tuple]:
    """Independent reference evaluation.  Key:
    (focusNode, path, value, severity, component-localname)."""
    out: set[tuple] = set()
    types: dict[str, set[str]] = {}
    for s, p, v, ot, dt, lg, g in triples:
        if p == RDF_TYPE:
            types.setdefault(s, set()).add(v)
    def targets_of(c):
        if c.get("target_subjects_of"):
            return sorted(
                {s for s, p, *_ in triples if p == c["target_subjects_of"]}
            )
        return [s for s, ts in types.items() if c.get("target_class") in ts]

    for c in constraints:
        targets = targets_of(c)
        path = c["path"]
        sev = c["severity"]

        def emit(focus, value, comp):
            out.add((focus, path, value, sev, comp))

        for focus in targets:
            # distinct value NODES (term identity) for the path
            nodes = {
                (v, ot, dt, lg)
                for s, p, v, ot, dt, lg, g in triples
                if s == focus and p == path
            }
            n = len(nodes)
            if c.get("min_count") is not None and n < c["min_count"]:
                emit(focus, None, "MinCount")
            if c.get("max_count") is not None and n > c["max_count"]:
                emit(focus, None, "MaxCount")
            if c.get("has_value") is not None and not any(
                v == c["has_value"] for v, *_ in nodes
            ):
                emit(focus, None, "HasValue")
            if c.get("unique_lang"):
                by_lang: dict[str, int] = {}
                for v, ot, dt, lg in nodes:
                    if lg is not None:
                        by_lang[lg.lower()] = by_lang.get(lg.lower(), 0) + 1
                for lang, cnt in by_lang.items():
                    if cnt > 1:
                        emit(focus, lang, "UniqueLang")
            # lessThan comparison set: SPARQL-'<' domains keyed by
            # effective datatype (mirrors the engine's _lt_kind)
            _pair_pred = c.get("less_than") or c.get("less_than_or_equals")
            cmp_nodes = {
                (v, ot, dt, lg)
                for s, p, v, ot, dt, lg, g in triples
                if s == focus and p == _pair_pred
            } if _pair_pred else set()
            cmp_kinds = {_cmp_kind(*nd)[0] for nd in cmp_nodes}
            cmp_min = min(
                (
                    _cmp_kind(*nd)[1]
                    for nd in cmp_nodes
                    if _cmp_kind(*nd)[0] not in ("bad",)
                ),
                default=None,
            ) if len(cmp_kinds) == 1 and "bad" not in cmp_kinds else None
            for v, ot, dt, lg in nodes:
                num = _num(v)
                if c.get("datatype") is not None and (
                    ot != "literal"
                    or _eff_dt(dt, lg) != c["datatype"]
                    or not _lex_ok(c["datatype"], v)
                ):
                    emit(focus, v, "Datatype")
                if c.get("datatype_in") is not None and not (
                    ot == "literal"
                    and any(
                        _eff_dt(dt, lg) == d and _lex_ok(d, v)
                        for d in c["datatype_in"]
                    )
                ):
                    emit(focus, v, "Or")
                if c.get("pattern") is not None and (
                    ot == "bnode" or not re.search(c["pattern"], v)
                ):
                    emit(focus, v, "Pattern")
                if c.get("node_kind") is not None:
                    allowed = {"IRI": {"iri"}, "Literal": {"literal"}}[c["node_kind"]]
                    if ot not in allowed:
                        emit(focus, v, "NodeKind")
                if c.get("in_list") is not None and v not in c["in_list"]:
                    emit(focus, v, "In")
                if c.get("min_inclusive") is not None and (
                    num is None or num < c["min_inclusive"]
                ):
                    emit(focus, v, "MinInclusive")
                if c.get("max_inclusive") is not None and (
                    num is None or num > c["max_inclusive"]
                ):
                    emit(focus, v, "MaxInclusive")
                if c.get("min_exclusive") is not None and (
                    num is None or num <= c["min_exclusive"]
                ):
                    emit(focus, v, "MinExclusive")
                if c.get("max_exclusive") is not None and (
                    num is None or num >= c["max_exclusive"]
                ):
                    emit(focus, v, "MaxExclusive")
                if c.get("less_than") is not None and cmp_nodes:
                    v_k, v_cmp = _cmp_kind(v, ot, dt, lg)
                    incomparable = (
                        len(cmp_kinds) > 1
                        or "bad" in cmp_kinds
                        or v_k == "bad"
                        or v_k not in cmp_kinds
                    )
                    if incomparable or (cmp_min is not None and v_cmp >= cmp_min):
                        emit(focus, v, "LessThan")
                if c.get("less_than_or_equals") is not None and cmp_nodes:
                    v_k, v_cmp = _cmp_kind(v, ot, dt, lg)
                    incomparable = (
                        len(cmp_kinds) > 1
                        or "bad" in cmp_kinds
                        or v_k == "bad"
                        or v_k not in cmp_kinds
                    )
                    if incomparable or (cmp_min is not None and v_cmp > cmp_min):
                        emit(focus, v, "LessThanOrEquals")
                if c.get("language_in") is not None and (
                    lg is None
                    # langMatches prefix semantics, mirroring the engine:
                    # equal, or extending the range at a subtag boundary
                    or not any(
                        lg.lower() == r or lg.lower().startswith(r + "-")
                        for r in c["language_in"]
                    )
                ):
                    emit(focus, v, "LanguageIn")
                if c.get("min_length") is not None and (
                    ot == "bnode" or len(v) < c["min_length"]
                ):
                    emit(focus, v, "MinLength")
                if c.get("max_length") is not None and (
                    ot == "bnode" or len(v) > c["max_length"]
                ):
                    emit(focus, v, "MaxLength")
    return out


# --- strategies -------------------------------------------------------------

triple_st = st.one_of(
    # typing triple
    st.tuples(
        st.sampled_from(SUBJECTS + [v for v, *_ in IRIS]),
        st.just(RDF_TYPE),
        st.sampled_from(CLASSES),
    ).map(lambda t: (t[0], t[1], t[2], "iri", None, None, "g1")),
    # property triple (random graph of two to exercise quad dedup)
    st.tuples(
        st.sampled_from(SUBJECTS),
        st.sampled_from(PREDS + [CMP_PRED]),
        st.sampled_from(VALUES),
        st.sampled_from(["g1", "g2"]),
    ).map(lambda t: (t[0], t[1], *t[2], t[3])),
)

facet_st = st.fixed_dictionaries(
    {},
    optional={
        "min_count": st.integers(0, 3),
        "max_count": st.integers(0, 2),
        "datatype": st.just(XSD + "integer"),
        "datatype_in": st.sampled_from(
            [[XSD + "integer"], [XSD + "integer", XSD + "string"]]
        ),
        "pattern": st.just("^[0-9]+$"),
        "node_kind": st.sampled_from(["IRI", "Literal"]),
        "in_list": st.just(["5", "hello", "n0"]),
        "class_iri": st.just("C1"),
        "min_inclusive": st.sampled_from([0.0, 6.0]),
        "max_inclusive": st.sampled_from([10.0]),
        "min_exclusive": st.sampled_from([5.0]),
        "max_exclusive": st.sampled_from([17.0]),
        "less_than": st.just(CMP_PRED),
        "less_than_or_equals": st.just(CMP_PRED),
        "unique_lang": st.just(True),
        "language_in": st.sampled_from([["en"], ["en", "es"], ["en-us"], ["en-gb", "es"]]),
        "has_value": st.sampled_from(["5", "n0"]),
        "min_length": st.integers(1, 3),
        "max_length": st.integers(2, 5),
    },
)

target_st = st.one_of(
    st.just(("target_class", "T")),
    st.sampled_from([("target_subjects_of", "p0"), ("target_subjects_of", CMP_PRED)]),
)

constraint_st = st.tuples(st.sampled_from(PREDS), target_st, facet_st)


def _mk_constraints(raw: list[tuple]) -> list[dict]:
    rows = []
    for i, (path, (tkind, tval), facets) in enumerate(raw):
        row = {
            "constraint_id": i + 1,
            "shape_iri": "ex:S",
            "target_class": tval if tkind == "target_class" else None,
            "target_subjects_of": tval if tkind == "target_subjects_of" else None,
            "target_objects_of": None,
            "target_node": None,
            "path": path,
            "path_steps": [[path]],
            "severity": "Violation",
            "messages": None,
            "foaf_page": None,
        }
        row.update(facets)
        # the compiler emits one sibling-pair facet per row (_slot); mirror
        # that input contract here
        if row.get("less_than") is not None and row.get("less_than_or_equals") is not None:
            row["less_than_or_equals"] = None
        rows.append(row)
    return rows


@given(
    triples=st.lists(triple_st, min_size=1, max_size=10),
    raw_constraints=st.lists(constraint_st, min_size=1, max_size=3),
)
@settings(
    max_examples=int(os.environ.get("PROP_EXAMPLES", "25")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_engine_matches_reference(spark, triples, raw_constraints):
    constraints = _mk_constraints(raw_constraints)
    # class_iri needs the reference too — mirror it (IRI value typed C1?)
    for c in constraints:
        c.setdefault("class_iri", None)
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
    expected = ref_validate(triples, constraints)
    # reference: add the Class component (needs the type index)
    typed: dict[str, set[str]] = {}
    for s, p, v, *_ in triples:
        if p == RDF_TYPE:
            typed.setdefault(s, set()).add(v)
    for c in constraints:
        if c.get("class_iri"):
            if c.get("target_subjects_of"):
                targets = sorted(
                    {s for s, p, *_ in triples if p == c["target_subjects_of"]}
                )
            else:
                targets = [s for s, ts in typed.items() if c.get("target_class") in ts]
            for focus in targets:
                nodes = {
                    (v, ot)
                    for s, p, v, ot, *_ in triples
                    if s == focus and p == c["path"]
                }
                for v, ot in nodes:
                    if ot == "literal" or (
                        ot in ("iri", "bnode") and c["class_iri"] not in typed.get(v, set())
                    ):
                        expected.add(
                            (focus, c["path"], v, c["severity"], "Class")
                        )
    assert got == expected, (
        f"\ntriples={triples}\nconstraints={constraints}\n"
        f"only-spark={sorted(got - expected)}\nonly-ref={sorted(expected - got)}"
    )
