"""SHACL rule executor: constraint table × triples table → violations table.

This replaces the reference's entire ``shacl-engine`` dependency
(reference src/services/SHACLValidationService.ts:398-408) with pure
DataFrame operations — the central design decision of SURVEY.md §2.10:
validation compiles to joins and aggregations, no per-row Python anywhere.

Scale notes (the plan that must survive 100 TB):
- the constraint table is always KBs → **every** join against it is an
  explicit ``F.broadcast`` (no shuffle of the big side on those joins);
- targeting (`sh:targetClass`) is one shuffle of the type sub-relation on
  ``(constraint_id, focusNode)``; value lookup is one broadcast join of the
  triples table on ``predicate`` (map-side); the single big-big shuffle is
  targets ⟕ values on ``(constraint_id, focusNode)`` — AQE skew-join
  handles hub focus nodes;
- minCount uses the **targets-side left join** so focus nodes with zero
  values are detected (the classic join-SHACL bug, SURVEY.md §7.3);
- counts use map-side partial aggregation (plain ``groupBy().agg``).

Violation rows reproduce the reference's ``sh:ValidationResult`` fields
(src/types.ts:27-39): focusNode, resultPath, value, message[],
resultSeverity, sourceConstraintComponent, sourceShape.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import (
    RDF_TYPE,
    SENTINEL_EMPTY_CONTENT,
    SENTINEL_NO_SHAPES,
    SEVERITY_VIOLATION,
    SH,
    VIOLATION_COLUMNS,
    VIOLATION_SCHEMA,
)

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

_NODE_KIND_SETS = {
    "IRI": ["iri"],
    "Literal": ["literal"],
    "BlankNode": ["bnode"],
    "BlankNodeOrIRI": ["bnode", "iri"],
    "BlankNodeOrLiteral": ["bnode", "literal"],
    "IRIOrLiteral": ["iri", "literal"],
}


def _component(name: str) -> str:
    return SH + name + "ConstraintComponent"


# facet columns attached to every value row / aggregate row, in order
FACET_FIELDS = [
    "path",
    "min_count",
    "max_count",
    "datatype",
    "datatype_in",
    "node_kind",
    "pattern",
    "in_list",
    "class_iri",
    "min_inclusive",
    "max_inclusive",
    "min_exclusive",
    "max_exclusive",
    "less_than",
    "unique_lang",
    "language_in",
    "has_value",
    "min_length",
    "max_length",
    "severity",
    "messages",
    "shape_iri",
    "foaf_page",
]

def _cid_map(mapping: dict[str, list[int]]) -> F.Column:
    """Literal map key → array<constraint_id>."""
    return F.create_map(
        *[
            x
            for k, cids in sorted(mapping.items())
            for x in (F.lit(k), F.array(*[F.lit(c).cast("long") for c in sorted(cids)]))
        ]
    )


def _facet_df(spark: SparkSession, constraint_rows: list[dict]) -> DataFrame:
    """Tiny facet lookup table (one row per constraint), attached to value
    streams via explicit broadcast join.

    Round 1 embedded this as a literal ``create_map`` of structs so Catalyst
    would constant-fold the lookup; measured at DCAT-AP-scale profiles the
    literal blows up plan construction and whole-stage codegen superlinearly
    (every stage inlines n_constraints × n_facets expressions), while a
    16-row broadcast hash join is effectively free and keeps the generated
    code constant-size.  The map-free lookups that stay literal (_cid_map)
    are one entry per predicate — small either way."""
    from pyspark.sql import types as T

    from ..model import CONSTRAINT_SCHEMA

    wanted = {"constraint_id", *FACET_FIELDS}
    schema = T.StructType([f for f in CONSTRAINT_SCHEMA.fields if f.name in wanted])
    rows = [
        {k: r.get(k) for k in schema.fieldNames()}
        for r in sorted(constraint_rows, key=lambda r: r["constraint_id"])
    ]
    return spark.createDataFrame(rows, schema)


def _attach_facets(df: DataFrame, facets: DataFrame) -> DataFrame:
    return df.join(F.broadcast(facets), "constraint_id")


def _message_col() -> F.Column:
    """Constraint messages, else the reference's default message —
    ``Validation issue at {path} with value {v}``
    (SHACLValidationService.ts:276-292)."""
    return F.when(
        F.col("messages").isNotNull() & (F.size("messages") > 0), F.col("messages")
    ).otherwise(
        F.array(
            F.struct(
                F.format_string(
                    "Validation issue at %s with value %s",
                    F.coalesce(F.col("path"), F.lit("(node)")),
                    F.coalesce(F.col("object_value"), F.lit("(none)")),
                ).alias("text"),
                F.lit("en").alias("lang"),
            )
        )
    )


def _as_violations(
    df: DataFrame, component: str | F.Column, value_col: F.Column
) -> DataFrame:
    """Project rule survivors into the sh:ValidationResult column set.

    foafPage rides along from the broadcast constraint table — the Spark
    form of the reference's violations ⟕ shapes foaf:page join (J4,
    SHACLValidationService.ts:249-269): the join already happened when the
    constraint table was broadcast, so no extra shuffle.
    """
    return df.select(
        F.col("focusNode"),
        F.col("path").alias("resultPath"),
        value_col.cast("string").alias("value"),
        _message_col().alias("message"),
        F.col("severity").alias("resultSeverity"),
        (component if isinstance(component, F.Column) else F.lit(component))
        .cast("string")
        .alias("sourceConstraintComponent"),
        F.col("shape_iri").alias("sourceShape"),
        F.col("foaf_page").alias("foafPage"),
    )


@dataclass
class ValidationReport:
    """Typed result mirroring the reference's SHACLReport (src/types.ts:41-50),
    with severity *partition* realized as one DataFrame + a severity column
    (SURVEY.md §1.3)."""

    conforms: bool
    results: DataFrame  # all severities; filter on resultSeverity
    total_violations: int


def _effective_datatype() -> F.Column:
    return F.when(F.col("object_lang").isNotNull(), F.lit(RDF_LANGSTRING)).otherwise(
        F.coalesce(F.col("object_datatype"), F.lit(XSD + "string"))
    )


def _lexically_valid(dt: F.Column | None = None) -> F.Column:
    """Lexical-form validity for common XSD types: the try_cast-null-out
    trick (SURVEY.md §2.8 DatatypeConstraintComponent).  ``try_*`` forms are
    required — Spark 4 runs ANSI mode by default, where a plain cast of an
    invalid lexical form throws instead of yielding NULL.  ``dt`` defaults
    to the constraint's single sh:datatype facet; the sh:or path passes the
    branch datatype (a lambda variable) instead."""
    if dt is None:
        dt = F.col("datatype")
    v = F.col("object_value")
    return (
        F.when(
            dt.isin(XSD + "integer", XSD + "int", XSD + "long", XSD + "nonNegativeInteger"),
            v.try_cast("long").isNotNull(),
        )
        .when(dt.isin(XSD + "decimal", XSD + "double", XSD + "float"), v.try_cast("double").isNotNull())
        .when(dt == XSD + "boolean", F.lower(v).isin("true", "false", "0", "1"))
        .when(dt == XSD + "dateTime", F.try_to_timestamp(v).isNotNull())
        .when(dt == XSD + "date", F.try_to_timestamp(v, F.lit("yyyy-MM-dd")).isNotNull())
        .otherwise(F.lit(True))
    )


# Above this many targeted focus nodes the validator stops broadcasting
# data-derived relations (targets, typed_set) and plans hint-free shuffle
# joins instead — AQE then picks broadcast/shuffle per runtime size and
# applies skew-join splitting on hub focus nodes.  Overridable per session
# via spark.conf "spark.kg.validate.broadcastRows" or per call.
DEFAULT_BROADCAST_ROWS = 4_000_000


def validate(
    spark: SparkSession,
    triples: DataFrame,
    constraint_rows: list[dict],
    broadcast_rows: int | None = None,
) -> DataFrame:
    """Run every compiled constraint against the triples table.

    Returns the violations DataFrame (VIOLATION_SCHEMA).  ``constraint_rows``
    is the driver-side output of ``shapes.compile_shapes`` — kept as rows so
    path-evaluation structure (number of steps) is known at plan-build time.

    ``broadcast_rows`` gates the two data-derived broadcasts: ``targets``
    (constraint × typed focus node) and ``typed_set`` (distinct node→class
    pairs) both GROW WITH THE CORPUS, so an unconditional broadcast dies at
    plan time past the 8 GB broadcast ceiling (~10^9 canonical entities).
    The gate probes ``targets`` with a bounded ``limit(K+1).count()`` (the
    probe short-circuits once K+1 rows exist — it never scans a big graph
    fully); at or below K the classic broadcast plan is kept, above K every
    data-derived join is left hint-free for AQE.  Pass ``0`` to force the
    shuffle path (used by tests), ``None`` to read the session conf.

    ``triples`` should be a materialized relation (parquet/Iceberg-backed,
    as the pipeline's scratch tables are): the target set is recomputed by
    its consumers as a pushed-down ``predicate == rdf:type`` scan instead of
    being pinned with localCheckpoint, which does not survive executor loss
    and measurably collapses under memory pressure on wide streams.
    """
    if not constraint_rows:
        return spark.createDataFrame([], VIOLATION_SCHEMA)

    # --- targeting: focus-node selection (J6) ------------------------------
    # three SHACL target kinds, each a literal-map lookup (compile-time
    # broadcast): sh:targetClass over the type sub-relation,
    # sh:targetSubjectsOf over the predicate column, sh:targetNode as
    # driver-side literal rows.  No join — one scan each, unioned.
    by_class: dict[str, list[int]] = {}
    by_subj_of: dict[str, list[int]] = {}
    by_obj_of: dict[str, list[int]] = {}
    by_node: dict[str, list[int]] = {}
    for r in constraint_rows:
        if r.get("target_class"):
            by_class.setdefault(r["target_class"], []).append(r["constraint_id"])
        if r.get("target_subjects_of"):
            by_subj_of.setdefault(r["target_subjects_of"], []).append(r["constraint_id"])
        if r.get("target_objects_of"):
            by_obj_of.setdefault(r["target_objects_of"], []).append(r["constraint_id"])
        if r.get("target_node"):
            by_node.setdefault(r["target_node"], []).append(r["constraint_id"])

    types = (
        triples.filter(F.col("predicate") == RDF_TYPE)
        .select(F.col("subject"), F.col("object_value").alias("cls"))
        .dropDuplicates()
    )
    target_parts: list[DataFrame] = []
    if by_class:
        target_parts.append(
            types.select(
                F.explode(_cid_map(by_class)[F.col("cls")]).alias("constraint_id"),
                F.col("subject").alias("focusNode"),
            )
        )
    if by_subj_of:
        target_parts.append(
            triples.select(
                F.explode(_cid_map(by_subj_of)[F.col("predicate")]).alias(
                    "constraint_id"
                ),
                F.col("subject").alias("focusNode"),
            )
        )
    if by_obj_of:
        # sh:targetObjectsOf: every object of the predicate is a focus node
        target_parts.append(
            triples.select(
                F.explode(_cid_map(by_obj_of)[F.col("predicate")]).alias(
                    "constraint_id"
                ),
                F.col("object_value").alias("focusNode"),
            )
        )
    if by_node:
        target_parts.append(
            spark.createDataFrame(
                [
                    (cid, node)
                    for node, cids in sorted(by_node.items())
                    for cid in sorted(cids)
                ],
                "constraint_id long, focusNode string",
            )
        )
    if target_parts:
        targets = target_parts[0]
        for part in target_parts[1:]:
            targets = targets.unionByName(part)
        targets = targets.dropDuplicates()
    else:
        targets = spark.createDataFrame([], "constraint_id long, focusNode string")

    # --- path value lookup ---------------------------------------------------
    # Fast path: single-step paths (the overwhelming majority) — one scan of
    # the triples table with a literal predicate → constraints map; rows
    # whose predicate no constraint watches explode to nothing.
    max_steps = max(len(r["path_steps"]) for r in constraint_rows)
    by_pred: dict[str, list[int]] = {}
    for r in constraint_rows:
        if len(r["path_steps"]) == 1:
            for p in r["path_steps"][0]:
                by_pred.setdefault(p, []).append(r["constraint_id"])
    vals_parts: list[DataFrame] = []
    if by_pred:
        pred_map = _cid_map(by_pred)
        vals_parts.append(
            triples.select(
                F.explode(pred_map[F.col("predicate")]).alias("constraint_id"),
                F.col("subject").alias("focusNode"),
                "object_value",
                "object_type",
                "object_datatype",
                "object_lang",
            )
        )

    # General path: sequence paths evaluated as successive joins from the
    # target frontier (reference renders them at
    # SHACLValidationService.ts:207-247; evaluation per SHACL property paths).
    for n_steps in range(2, max_steps + 1):
        ids = [r["constraint_id"] for r in constraint_rows if len(r["path_steps"]) == n_steps]
        if not ids:
            continue
        frontier = targets.filter(F.col("constraint_id").isin(ids)).select(
            "constraint_id", "focusNode", F.col("focusNode").alias("node")
        )
        for step_idx in range(n_steps):
            step_by_pred: dict[str, list[int]] = {}
            for r in constraint_rows:
                if len(r["path_steps"]) == n_steps:
                    for p in r["path_steps"][step_idx]:
                        step_by_pred.setdefault(p, []).append(r["constraint_id"])
            smap = _cid_map(step_by_pred)
            hop = triples.select(
                F.explode(smap[F.col("predicate")]).alias("cid"),
                F.col("subject").alias("hop_subject"),
                F.col("object_value").alias("hop_value"),
                F.col("object_type").alias("hop_type"),
                F.col("object_datatype").alias("hop_datatype"),
                F.col("object_lang").alias("hop_lang"),
            )
            # no broadcast hint: the frontier is (targeted focus nodes ×
            # constraints) and grows with the data and each hop's fan-out —
            # let AQE pick the strategy (it broadcasts small frontiers at
            # runtime and falls back to shuffle join on big ones)
            frontier = (
                frontier.join(
                    hop,
                    (frontier["constraint_id"] == hop["cid"])
                    & (frontier["node"] == hop["hop_subject"]),
                )
                .select(
                    "constraint_id",
                    "focusNode",
                    F.col("hop_value").alias("node"),
                    F.col("hop_type").alias("object_type"),
                    F.col("hop_datatype").alias("object_datatype"),
                    F.col("hop_lang").alias("object_lang"),
                )
            )
        vals_parts.append(
            frontier.select(
                "constraint_id",
                "focusNode",
                F.col("node").alias("object_value"),
                "object_type",
                "object_datatype",
                "object_lang",
            )
        )

    if vals_parts:
        vals = vals_parts[0]
        for part in vals_parts[1:]:
            vals = vals.unionByName(part)
    else:
        vals = spark.createDataFrame(
            [],
            "constraint_id long, focusNode string, object_value string, "
            "object_type string, object_datatype string, object_lang string",
        )

    facets = _facet_df(spark, constraint_rows)

    if broadcast_rows is None:
        broadcast_rows = int(
            spark.conf.get("spark.kg.validate.broadcastRows", str(DEFAULT_BROADCAST_ROWS))
        )
    # LIMIT takes an int32 — clamp; a threshold past 2^31 rows means
    # "always broadcast" anyway (no probe needed)
    probe_n = min(broadcast_rows + 1, 2**31 - 1) if broadcast_rows > 0 else 0
    small = broadcast_rows > 0 and (
        broadcast_rows >= 2**31 - 1
        or targets.limit(probe_n).count() <= broadcast_rows
    )

    def _gate(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small else df

    # =======================================================================
    # Single-scan rule evaluation.  The value stream (every value occurrence
    # × constraint) is the only big relation; everything it needs — targets,
    # facets, the distinct (node, class) type set — is broadcast onto it,
    # every per-row component contributes one nullable slot to a hit array,
    # and a two-level cascaded aggregation on (constraint, focus[, value])
    # produces BOTH the distinct-value counts for the cardinality rules AND
    # the deduplicated per-value hits.  Net plan: ONE pass over the stream +
    # one small shuffle whose map-side combine collapses per-graph
    # duplicates — this is what keeps validation scan-bound at 100 TB.
    # countDistinct-style semantics throughout: SHACL evaluates over the RDF
    # graph — a SET of (s,p,o) — so a value asserted by many source pages is
    # ONE value node; row-counting would false-positive every maxCount on
    # hub entities, and per-row results would duplicate per page.
    # =======================================================================
    values = _attach_facets(
        vals.join(_gate(targets), ["constraint_id", "focusNode"], "left_semi"),
        facets,
    )

    # sh:class needs a type lookup per IRI value: the distinct (node, class)
    # set rides the same size gate as targets (J6) — broadcast when small,
    # hint-free shuffle join on object_value (AQE skew-handled) when the
    # entity set outgrows broadcast range
    typed_set = _gate(
        types.select(F.col("subject").alias("t_node"), F.col("cls").alias("t_cls"))
    )
    values = values.join(
        typed_set,
        (values["object_value"] == typed_set["t_node"])
        & (values["class_iri"] == typed_set["t_cls"]),
        "left",
    )

    # sh:lessThan: every value v of the path must be strictly less than
    # every value w of the sibling property — v violates iff ∃w ¬(v<w)
    # ⟺ v >= min(w) (numeric; non-numeric on either side is a comparison
    # failure → violation, per SHACL).  The compare relation aggregates to
    # one row per (constraint, focus) — target-set-sized — and rides the
    # same broadcast gate as targets.
    lt_by_pred: dict[str, list[int]] = {}
    for r in constraint_rows:
        if r.get("less_than"):
            lt_by_pred.setdefault(r["less_than"], []).append(r["constraint_id"])
    if lt_by_pred:
        lt_map = _cid_map(lt_by_pred)
        lt_agg = (
            triples.select(
                F.explode(lt_map[F.col("predicate")]).alias("constraint_id"),
                F.col("subject").alias("focusNode"),
                F.col("object_value").try_cast("double").alias("_w"),
            )
            .groupBy("constraint_id", "focusNode")
            .agg(
                F.min("_w").alias("_lt_min"),
                F.max(F.col("_w").isNull().cast("int")).alias("_lt_bad"),
                F.count(F.lit(1)).alias("_lt_n"),
            )
        )
        values = values.join(_gate(lt_agg), ["constraint_id", "focusNode"], "left")
    else:
        values = values.select(
            "*",
            F.lit(None).cast("double").alias("_lt_min"),
            F.lit(None).cast("int").alias("_lt_bad"),
            F.lit(None).cast("long").alias("_lt_n"),
        )

    # try_cast: ANSI mode would throw on non-numeric values flowing through
    # rows whose constraint has no range facet
    num = F.col("object_value").try_cast("double")

    def _hit(cond: F.Column, comp: str) -> F.Column:
        return F.when(cond, F.lit(comp)).otherwise(F.lit(None).cast("string"))

    nk_allowed = F.create_map(
        *[
            x
            for kind, allowed in _NODE_KIND_SETS.items()
            for x in (F.lit(kind), F.lit(",".join(allowed)))
        ]
    )
    checks = F.array(
        _hit(
            F.col("datatype").isNotNull()
            & (
                (F.col("object_type") != "literal")
                | (_effective_datatype() != F.col("datatype"))
                | ~_lexically_valid()
            ),
            "Datatype",
        ),
        # sh:or of datatype branches: conforming iff the value is a literal
        # whose effective datatype matches SOME branch with a valid lexical
        # form; reported as sh:OrConstraintComponent
        _hit(
            F.col("datatype_in").isNotNull()
            & ~(
                (F.col("object_type") == "literal")
                & F.exists(
                    F.col("datatype_in"),
                    lambda d: (_effective_datatype() == d) & _lexically_valid(d),
                )
            ),
            "Or",
        ),
        _hit(
            F.col("pattern").isNotNull()
            & (
                (F.col("object_type") == "bnode")
                | ~F.regexp_like(F.col("object_value"), F.col("pattern"))
            ),
            "Pattern",
        ),
        _hit(
            F.col("node_kind").isNotNull()
            & ~F.array_contains(
                F.split(nk_allowed[F.col("node_kind")], ","), F.col("object_type")
            ),
            "NodeKind",
        ),
        # sh:in membership compares the LEXICAL form: profile vocabularies
        # are IRI lists, where lexical identity == term identity; a literal
        # sharing an IRI's spelling would conflate (documented
        # simplification vs full RDF-term comparison)
        _hit(
            F.col("in_list").isNotNull()
            & ~F.array_contains(F.col("in_list"), F.col("object_value")),
            "In",
        ),
        _hit(
            F.col("min_inclusive").isNotNull()
            & (num.isNull() | (num < F.col("min_inclusive"))),
            "MinInclusive",
        ),
        _hit(
            F.col("max_inclusive").isNotNull()
            & (num.isNull() | (num > F.col("max_inclusive"))),
            "MaxInclusive",
        ),
        _hit(
            F.col("min_exclusive").isNotNull()
            & (num.isNull() | (num <= F.col("min_exclusive"))),
            "MinExclusive",
        ),
        _hit(
            F.col("max_exclusive").isNotNull()
            & (num.isNull() | (num >= F.col("max_exclusive"))),
            "MaxExclusive",
        ),
        _hit(
            F.col("less_than").isNotNull()
            & F.col("_lt_n").isNotNull()
            & ((F.col("_lt_bad") > 0) | num.isNull() | (num >= F.col("_lt_min"))),
            "LessThan",
        ),
        # sh:languageIn: value must be a language-tagged literal whose tag
        # (or its BCP47 primary subtag) is in the list
        _hit(
            F.col("language_in").isNotNull()
            & (
                F.col("object_lang").isNull()
                | (
                    ~F.array_contains(
                        F.col("language_in"), F.lower(F.col("object_lang"))
                    )
                    & ~F.array_contains(
                        F.col("language_in"),
                        F.split(F.lower(F.col("object_lang")), "-")[0],
                    )
                )
            ),
            "LanguageIn",
        ),
        _hit(
            F.col("min_length").isNotNull()
            & (
                (F.col("object_type") == "bnode")
                | (F.length("object_value") < F.col("min_length"))
            ),
            "MinLength",
        ),
        _hit(
            F.col("max_length").isNotNull()
            & (
                (F.col("object_type") == "bnode")
                | (F.length("object_value") > F.col("max_length"))
            ),
            "MaxLength",
        ),
        # sh:class: a literal value can never satisfy it; an IRI/bnode value
        # satisfies it iff the broadcast type lookup matched (t_node present)
        _hit(
            F.col("class_iri").isNotNull()
            & (
                (F.col("object_type") == "literal")
                | (
                    F.col("object_type").isin("iri", "bnode")
                    & F.col("t_node").isNull()
                )
            ),
            "Class",
        ),
    )
    hit_structs = F.transform(
        F.filter(checks, lambda c: c.isNotNull()),
        lambda c: F.struct(c.alias("comp"), F.col("object_value").alias("v")),
    )

    # cascade level 1: per distinct value (graph-duplicate collapse happens
    # map-side here); hits are a deterministic function of the group key
    per_value = (
        values.select(
            "constraint_id",
            "focusNode",
            "object_value",
            "object_type",
            "object_datatype",
            "object_lang",
            hit_structs.alias("_hs"),
            # sh:hasValue satisfaction flag; deterministic per group key
            (
                F.col("has_value").isNotNull()
                & (F.col("object_value") == F.col("has_value"))
            ).alias("_hv"),
        )
        .groupBy(
            "constraint_id",
            "focusNode",
            "object_value",
            "object_type",
            "object_datatype",
            "object_lang",
        )
        .agg(F.first("_hs").alias("_hs"), F.first("_hv").alias("_hv"))
    )
    # cascade level 2: per focus node — value-node count + merged hits.
    # per_value is already distinct on FULL term identity (value, kind,
    # datatype, lang), so count(*) here counts distinct RDF value NODES —
    # SHACL's set-of-value-nodes semantics for min/maxCount; a bare
    # countDistinct(object_value) would collapse "1"^^xsd:int with
    # "1"^^xsd:string and undercount
    per_focus = per_value.groupBy("constraint_id", "focusNode").agg(
        F.count("*").alias("_n"),
        F.array_distinct(F.flatten(F.collect_list("_hs"))).alias("_hs"),
        F.max(F.col("_hv").cast("int")).alias("_hv_found"),
    )

    # targets-side LEFT join so zero-value focus nodes are seen (the classic
    # join-SHACL minCount bug, SURVEY.md §7.3); both sides are tiny here
    agg = _attach_facets(
        targets.join(per_focus, ["constraint_id", "focusNode"], "left").withColumn(
            "n_values", F.coalesce(F.col("_n"), F.lit(0))
        ),
        facets,
    )

    # ------------------------------------------------------------------
    # Single-pass output assembly: every per-focus component (MinCount,
    # MaxCount, HasValue) and every per-value hit already merged into _hs
    # become ONE violation-struct array per agg row, exploded ONCE.  Round 1
    # unioned four filter branches over the same agg subtree — correct, but
    # each branch re-traversed the relation and compiled its own codegen
    # stages; one pass is both the faster small-data plan and one scan
    # instead of four at 10^12 rows.
    # ------------------------------------------------------------------
    VS = "struct<comp:string,v:string>"

    def _vio(cond: F.Column, comp: str) -> F.Column:
        return F.when(
            cond,
            F.struct(
                F.lit(_component(comp)).alias("comp"),
                F.lit(None).cast("string").alias("v"),
            ),
        ).otherwise(F.lit(None).cast(VS))

    focus_checks = F.array(
        _vio(
            F.col("min_count").isNotNull() & (F.col("n_values") < F.col("min_count")),
            "MinCount",
        ),
        _vio(
            F.col("max_count").isNotNull() & (F.col("n_values") > F.col("max_count")),
            "MaxCount",
        ),
        # sh:hasValue: violated per focus node when no value node equals the
        # required value — including zero-value focus nodes (left join ⇒
        # _hv_found null ⇒ coalesce 0)
        _vio(
            F.col("has_value").isNotNull()
            & (F.coalesce(F.col("_hv_found"), F.lit(0)) == 0),
            "HasValue",
        ),
    )
    value_hits = F.transform(
        F.coalesce(F.col("_hs"), F.array().cast(f"array<{VS}>")),
        lambda h: F.struct(
            F.concat(F.lit(SH), h["comp"], F.lit("ConstraintComponent")).alias("comp"),
            h["v"].alias("v"),
        ),
    )
    all_vios = F.concat(F.filter(focus_checks, lambda x: x.isNotNull()), value_hits)
    exploded = agg.select(*agg.columns, F.explode(all_vios).alias("_vio")).withColumn(
        "object_value", F.col("_vio.v")
    )
    result = _as_violations(exploded, F.col("_vio.comp"), F.col("_vio.v"))

    # sh:uniqueLang stays a separate (rarely-built) branch: one violation per
    # (focus, duplicated language tag); per_value is distinct on term
    # identity so the count is over distinct value nodes sharing a tag
    ul_ids = [r["constraint_id"] for r in constraint_rows if r.get("unique_lang")]
    if ul_ids:
        dup_langs = (
            per_value.filter(
                F.col("constraint_id").isin(ul_ids) & F.col("object_lang").isNotNull()
            )
            .groupBy(
                "constraint_id", "focusNode", F.lower("object_lang").alias("_lang")
            )
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") > 1)
        )
        dup_langs = _attach_facets(dup_langs, facets).withColumn(
            "object_value", F.col("_lang")
        )
        result = result.unionByName(
            _as_violations(dup_langs, _component("UniqueLang"), F.col("_lang"))
        )

    # set semantics on results: one sh:ValidationResult per
    # (focus, path, value, component), matching the reference engine's
    # result identity; the input to this dedup is already tiny.
    return result.select(*VIOLATION_COLUMNS).dropDuplicates()


def _sentinel(spark: SparkSession, component: str, text: str) -> DataFrame:
    """Synthetic 1-violation report for degenerate inputs — exact sentinel
    component strings kept for report parity
    (reference SHACLValidationService.ts:359-396, AppRouter.tsx:46-59)."""
    row = (
        None,
        None,
        None,
        [{"text": text, "lang": "en"}],
        SEVERITY_VIOLATION,
        component,
        None,
        None,
    )
    return spark.createDataFrame([row], VIOLATION_SCHEMA)


def validate_report(
    spark: SparkSession,
    triples: DataFrame,
    constraint_rows: list[dict],
    custom_rules: list | None = None,
) -> ValidationReport:
    """Full report path: sentinels + rules + conforms flag.

    Mirrors ``SHACLValidationService.validateRDF``
    (reference SHACLValidationService.ts:339-424): empty-shapes and
    empty-data sentinels first, then engine run, then severity partition.
    ``conforms`` is true iff there are no Violation-severity results
    (SURVEY.md §2.4 A10).  ``custom_rules`` are profile-specific DataFrame
    rules (the SPARQLConstraintComponent surface, shapes/custom_rules.py).
    """
    if not constraint_rows:
        results = _sentinel(spark, SENTINEL_NO_SHAPES, "No SHACL shapes available")
        return ValidationReport(False, results, 1)
    if triples.isEmpty():
        results = _sentinel(spark, SENTINEL_EMPTY_CONTENT, "Empty RDF content")
        return ValidationReport(False, results, 1)
    results = validate(spark, triples, constraint_rows)
    if custom_rules:
        from ..shapes.custom_rules import apply_custom_rules

        results = results.unionByName(apply_custom_rules(spark, triples, custom_rules))
    n_viol = results.filter(F.col("resultSeverity") == SEVERITY_VIOLATION).count()
    return ValidationReport(n_viol == 0, results, n_viol)


def validate_turtle(
    spark: SparkSession,
    ttl: str,
    constraint_rows: list[dict],
    graph: str | None = None,
) -> ValidationReport:
    """Text entry point with the parse-error sentinel of the reference UI
    (AppRouter.tsx:46-59): malformed input yields a one-violation report
    with ``sourceConstraintComponent = system:ParseError``."""
    from ..model import SENTINEL_PARSE_ERROR
    from ..sources.rdf_io import triples_from_turtle

    try:
        triples = triples_from_turtle(spark, ttl, graph=graph)
    except ValueError as e:
        results = _sentinel(spark, SENTINEL_PARSE_ERROR, f"Parse error: {e}")
        return ValidationReport(False, results, 1)
    return validate_report(spark, triples, constraint_rows)
