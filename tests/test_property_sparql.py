"""Differential property test: the sh:sparql BGP/FILTER/NOT EXISTS engine
(shapes/sparql.py) vs an independent pure-Python solution-set evaluator.

The generator builds connected BGPs over a small term universe (IRIs,
typed/plain literals sharing lexical forms — the term-identity trap),
optional comparison FILTERs, and optional NOT EXISTS groups; the
reference evaluator implements SPARQL solution semantics directly
(full-term bindings, numeric-else-string comparison mirroring the
engine's '<' domain dispatch).  Engine and reference must agree
solution-for-solution."""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from shacl_validator_spark.shapes.sparql import eval_select, parse_select

XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
XSD_STR = "http://www.w3.org/2001/XMLSchema#string"

SUBJECTS = [f"http://d/s{i}" for i in range(4)]
PREDS = [f"http://d/p{i}" for i in range(3)]
# object terms: (value, type, datatype, lang) — deliberate lexical
# collisions across term kinds ("5" as integer, string, and IRI-ish)
OBJECTS = [
    ("5", "literal", XSD_INT, None),
    ("5", "literal", XSD_STR, None),
    ("7", "literal", XSD_INT, None),
    ("x", "literal", None, None),
    ("x", "literal", None, "en"),
    ("http://d/s1", "iri", None, None),
    ("http://d/s2", "iri", None, None),
]

triple_st = st.tuples(
    st.sampled_from(SUBJECTS), st.sampled_from(PREDS), st.sampled_from(range(len(OBJECTS)))
)

VARS = ["this", "v", "w"]

# each pattern: (s_var_or_const, pred, o_var_or_const); generation keeps
# the BGP connected by always reusing a previously-introduced variable
pattern_seed_st = st.lists(
    st.tuples(
        st.sampled_from([0, 1, 2]),   # subject: var index into chain
        st.sampled_from(PREDS),
        st.sampled_from(["var", "const"]),
        st.sampled_from(range(len(OBJECTS))),
    ),
    min_size=1,
    max_size=3,
)

filter_st = st.one_of(
    st.none(),
    st.tuples(st.sampled_from(["<", "<=", "=", "!=", ">"]), st.sampled_from(["3", "5", "x"])),
)


def _term_str(obj) -> str:
    v, t, dt, lang = obj
    if t == "iri":
        return f"<{v}>"
    if lang:
        return f'"{v}"@{lang}'
    if dt == XSD_INT:
        return v  # numeric literal syntax
    return f'"{v}"'


def _build_query(seed, filt, use_ne):
    """Connected BGP text + the structured form for the reference."""
    chain = ["this"]
    patterns = []
    for i, (s_idx, pred, o_kind, o_idx) in enumerate(seed):
        s_var = chain[s_idx % len(chain)]
        if o_kind == "var":
            o_var = VARS[min(i + 1, len(VARS) - 1)]
            if o_var not in chain and o_var != s_var:
                chain.append(o_var)
            patterns.append((("var", s_var), pred, ("var", o_var)))
        else:
            patterns.append((("var", s_var), pred, ("obj", o_idx)))
    text_pats = []
    for (sk, sv), pred, o in patterns:
        otxt = f"?{o[1]}" if o[0] == "var" else _term_str(OBJECTS[o[1]])
        stxt = "$this" if sv == "this" else f"?{sv}"
        text_pats.append(f"{stxt} <{pred}> {otxt} .")
    filters = []
    obj_vars = sorted({o[1] for _, _, o in patterns if o[0] == "var"})
    if filt is not None and obj_vars:
        op, const = filt
        rhs = const if const.isdigit() else f'"{const}"'
        text_pats.append(f"FILTER(?{obj_vars[0]} {op} {rhs})")
        filters.append((obj_vars[0], op, const))
    ne = None
    if use_ne:
        ne = (("var", "this"), PREDS[0], ("var", "__ne"))
        text_pats.append(f"FILTER NOT EXISTS {{ $this <{PREDS[0]}> ?__ne }}")
    proj = ["this"] + ([obj_vars[0]] if obj_vars else [])
    text = (
        "SELECT " + " ".join(("$" if v == "this" else "?") + v for v in proj)
        + " WHERE { " + " ".join(text_pats) + " }"
    )
    return text, patterns, filters, ne, proj


# --- independent reference evaluator ---------------------------------------


def _ref_solutions(rows, patterns, filters, ne, proj):
    """rows: list of (s, p, obj_idx).  Bindings map var → full term tuple:
    subjects bind as ('iri', s), objects as the 4-tuple."""

    def match(pat, binding):
        out = []
        (sk, sv), pred, o = pat
        for s, p, oi in rows:
            if p != pred:
                continue
            b = dict(binding)
            s_term = ("iri", s)
            if sv in b:
                if b[sv][0] == "literal" or b[sv][1] != s:
                    continue
                # an object-bound iri term unifies with a subject
            b[sv] = s_term if sv not in b else b[sv]
            obj = OBJECTS[oi]
            o_term = (
                ("literal", obj[0], obj[2], obj[3]) if obj[1] == "literal" else ("iri", obj[0])
            )
            if o[0] == "obj":
                want = OBJECTS[o[1]]
                want_term = (
                    ("literal", want[0], want[2], want[3])
                    if want[1] == "literal"
                    else ("iri", want[0])
                )
                if o_term != want_term:
                    continue
            else:
                ov = o[1]
                if ov in b:
                    prev = b[ov]
                    if prev[0] == "iri" and o_term[0] == "iri":
                        if prev[1] != o_term[1]:
                            continue
                    elif prev != o_term:
                        continue
                    # iri-vs-literal mix never unifies
                    if prev[0] != o_term[0]:
                        continue
                b = dict(b)
                b[ov] = o_term
            out.append(b)
        return out

    sols = [dict()]
    for pat in patterns:
        nxt = []
        for b in sols:
            nxt.extend(match(pat, b))
        sols = nxt

    def _eff_dt(term):
        # effective datatype of a bound term: lang-tagged → langString,
        # plain → xsd:string (mirrors _term_meta)
        if term[0] == "iri":
            return None
        _, _v, dt, lang = term
        if lang:
            return "langString"
        return dt or XSD_STR

    def cmp_ok(term, op, const):
        val = term[1]
        if op in ("=", "!="):
            # mirrors _rdf_eq (SPARQL RDFterm-equal, r4): a literal never
            # equals an IRI (plain False); two literals compare only when
            # value-comparable (shared numeric domain) or same-kind (equal
            # effective datatype + language tag) — otherwise TYPE ERROR,
            # which a FILTER eliminates for = and != alike
            cdt = XSD_INT if const.isdigit() else XSD_STR
            if term[0] == "iri":
                eq = False
            else:
                tdt = _eff_dt(term)
                if tdt == XSD_INT and cdt == XSD_INT:
                    eq = float(val) == float(const)
                elif tdt == cdt:  # same effective dt, no lang on consts
                    try:
                        eq = float(val) == float(const)
                    except ValueError:
                        eq = val == const
                else:
                    return False  # type error → solution eliminated
            return eq if op == "=" else not eq
        # ordering ops keep _cmp_dynamic's lenient dispatch: numeric when
        # BOTH sides cast, else string
        try:
            a, c = float(val), float(const)
        except ValueError:
            a, c = val, const
        return {"<": a < c, "<=": a <= c, ">": a > c}[op]

    for fv, op, const in filters:
        sols = [b for b in sols if fv in b and cmp_ok(b[fv], op, const)]
    if ne is not None:
        pred = ne[1]
        sols = [
            b
            for b in sols
            if not any(s == b["this"][1] and p == pred for s, p, _ in rows)
        ]
    return {tuple(b[v][1] if v in b else None for v in proj) for b in sols}


@given(
    triples=st.lists(triple_st, min_size=1, max_size=14, unique=True),
    seed=pattern_seed_st,
    filt=filter_st,
    use_ne=st.booleans(),
)
@settings(
    max_examples=int(os.environ.get("PROP_EXAMPLES", "20")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_sparql_engine_matches_reference(spark, triples, seed, filt, use_ne):
    text, patterns, filters, ne, proj = _build_query(seed, filt, use_ne)
    rows = [
        (s, p, OBJECTS[oi][0], OBJECTS[oi][1], OBJECTS[oi][2], OBJECTS[oi][3], None)
        for s, p, oi in triples
    ]
    df = spark.createDataFrame(
        rows,
        "subject string, predicate string, object_value string, object_type string, "
        "object_datatype string, object_lang string, graph string",
    )
    q = parse_select(text)
    got = {tuple(r) for r in eval_select(df, q).collect()}
    want = _ref_solutions(triples, patterns, filters, ne, proj)
    assert got == want, f"query: {text}\nengine: {sorted(got)}\nref: {sorted(want)}"
