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
    CONSTRAINT_SCHEMA,
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


def _lexically_valid() -> F.Column:
    """Lexical-form validity for common XSD types: the cast-null-out trick
    (SURVEY.md §2.8 DatatypeConstraintComponent)."""
    dt = F.col("datatype")
    v = F.col("object_value")
    return (
        F.when(
            dt.isin(XSD + "integer", XSD + "int", XSD + "long", XSD + "nonNegativeInteger"),
            v.cast("long").isNotNull(),
        )
        .when(dt.isin(XSD + "decimal", XSD + "double", XSD + "float"), v.cast("double").isNotNull())
        .when(dt == XSD + "boolean", F.lower(v).isin("true", "false", "0", "1"))
        .when(dt == XSD + "dateTime", F.to_timestamp(v).isNotNull())
        .when(dt == XSD + "date", F.to_date(v).isNotNull())
        .otherwise(F.lit(True))
    )


def validate(
    spark: SparkSession,
    triples: DataFrame,
    constraint_rows: list[dict],
) -> DataFrame:
    """Run every compiled constraint against the triples table.

    Returns the violations DataFrame (VIOLATION_SCHEMA).  ``constraint_rows``
    is the driver-side output of ``shapes.compile_shapes`` — kept as rows so
    path-evaluation structure (number of steps) is known at plan-build time.
    """
    if not constraint_rows:
        return spark.createDataFrame([], VIOLATION_SCHEMA)

    cons = F.broadcast(spark.createDataFrame(constraint_rows, schema=CONSTRAINT_SCHEMA))

    # --- targeting: sh:targetClass focus-node selection (J6) ---------------
    types = (
        triples.filter(F.col("predicate") == RDF_TYPE)
        .select(F.col("subject"), F.col("object_value").alias("cls"))
        .dropDuplicates()
    )
    target_classes = cons.select("constraint_id", "target_class").dropDuplicates()
    targets = (
        types.join(
            F.broadcast(target_classes),
            types["cls"] == target_classes["target_class"],
        )
        .select("constraint_id", F.col("subject").alias("focusNode"))
        .dropDuplicates()
    )

    # --- path value lookup ---------------------------------------------------
    # Fast path: single-step paths (the overwhelming majority) — one
    # broadcast join of the triples table on predicate, map-side only.
    max_steps = max(len(r["path_steps"]) for r in constraint_rows)
    step1 = [
        (r["constraint_id"], p)
        for r in constraint_rows
        if len(r["path_steps"]) == 1
        for p in r["path_steps"][0]
    ]
    vals_parts: list[DataFrame] = []
    if step1:
        s1 = F.broadcast(
            spark.createDataFrame(step1, schema="constraint_id long, step_pred string")
        )
        vals_parts.append(
            triples.join(s1, triples["predicate"] == s1["step_pred"]).select(
                "constraint_id",
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
            steps_rows = [
                (r["constraint_id"], p)
                for r in constraint_rows
                if len(r["path_steps"]) == n_steps
                for p in r["path_steps"][step_idx]
            ]
            sdf = F.broadcast(
                spark.createDataFrame(steps_rows, schema="cid long, step_pred string")
            )
            hop = triples.join(sdf, triples["predicate"] == sdf["step_pred"]).select(
                F.col("cid"),
                F.col("subject").alias("hop_subject"),
                F.col("object_value").alias("hop_value"),
                F.col("object_type").alias("hop_type"),
                F.col("object_datatype").alias("hop_datatype"),
                F.col("object_lang").alias("hop_lang"),
            )
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

    facet_cols = [
        "path",
        "min_count",
        "max_count",
        "datatype",
        "node_kind",
        "pattern",
        "in_list",
        "class_iri",
        "min_inclusive",
        "max_inclusive",
        "severity",
        "messages",
        "shape_iri",
        "foaf_page",
    ]
    facets = F.broadcast(cons.select("constraint_id", *facet_cols))

    # materialize targets once — it is consumed by three joins below and is
    # small (distinct typed focus nodes collapse massively after
    # canonicalization), so a localCheckpoint is cheap and lets Spark
    # broadcast it.  ``vals`` is deliberately NOT materialized: its three
    # consumers are each one broadcast-join scan of the (ideally
    # parquet-backed) triples table — rescanning columnar input beats paying
    # the row-object cache-build cost of a 10^7-row localCheckpoint, and at
    # cluster scale it would not fit executor storage anyway.
    targets = targets.localCheckpoint(eager=True)

    out: list[DataFrame] = []

    # --- cardinality rules (A9) -------------------------------------------
    # two-phase: per-(constraint, focus) counts partial-aggregate map-side
    # BEFORE touching targets (hub focus nodes never blow up a join, and the
    # shuffle after the map-side combine is only as big as the group count),
    # then a targets-side LEFT join so zero-value focus nodes are seen
    # (the classic join-SHACL minCount bug, SURVEY.md §7.3)
    val_counts = vals.groupBy("constraint_id", "focusNode").agg(
        F.count("object_value").alias("_n")
    )
    counts = (
        targets.join(val_counts, ["constraint_id", "focusNode"], "left")
        .withColumn("n_values", F.coalesce(F.col("_n"), F.lit(0)))
        .join(facets, "constraint_id")
        .filter(F.col("min_count").isNotNull() | F.col("max_count").isNotNull())
    )
    out.append(
        _as_violations(
            counts.filter(
                F.col("min_count").isNotNull() & (F.col("n_values") < F.col("min_count"))
            ).withColumn("object_value", F.lit(None).cast("string")),
            _component("MinCount"),
            F.lit(None),
        )
    )
    out.append(
        _as_violations(
            counts.filter(
                F.col("max_count").isNotNull() & (F.col("n_values") > F.col("max_count"))
            ).withColumn("object_value", F.lit(None).cast("string")),
            _component("MaxCount"),
            F.lit(None),
        )
    )

    # value rules: semi-join restriction to targeted focus nodes (targets is
    # broadcast — no shuffle of the value stream), then broadcast facets
    values = vals.join(
        F.broadcast(targets), ["constraint_id", "focusNode"], "left_semi"
    ).join(facets, "constraint_id")

    # --- all per-row value rules in ONE scan ---------------------------------
    # The value stream is the big side (every (value occurrence × constraint)
    # pair).  Evaluating each component as its own filter branch would rescan
    # it once per component; instead every per-row check contributes one
    # nullable slot to an array, and a single filter+explode emits the
    # violation hits — one whole-stage-codegen pass over the stream, which is
    # what keeps validation scan-bound (not rescan-bound) at 100 TB.
    num = F.col("object_value").cast("double")

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
        # sh:class on a literal value is always a violation (J6 fast half;
        # the IRI half needs the type anti-join below)
        _hit(
            F.col("class_iri").isNotNull() & (F.col("object_type") == "literal"),
            "Class",
        ),
    )
    hits = values.select(
        *values.columns,
        F.explode(F.filter(checks, lambda c: c.isNotNull())).alias("_comp"),
    )
    out.append(
        _as_violations(
            hits,
            F.concat(F.lit(SH), F.col("_comp"), F.lit("ConstraintComponent")),
            F.col("object_value"),
        )
    )

    # --- sh:class (IRI values): anti join value nodes vs type triples (J6) ---
    # ``types`` is distinct (subject, cls) — at KG scale the canonical entity
    # set is orders of magnitude smaller than the triple stream; an anti join
    # is insensitive to duplicate build rows, and AQE turns it into a
    # broadcast anti join when the type relation is small.
    cls_vals = values.filter(F.col("class_iri").isNotNull()).filter(
        F.col("object_type").isin("iri", "bnode")
    )
    typed = types.select(
        F.col("subject").alias("val_node"), F.col("cls").alias("val_cls")
    )
    cls_bad = cls_vals.join(
        typed,
        (cls_vals["object_value"] == typed["val_node"])
        & (cls_vals["class_iri"] == typed["val_cls"]),
        "left_anti",
    )
    out.append(_as_violations(cls_bad, _component("Class"), F.col("object_value")))

    result = out[0]
    for part in out[1:]:
        result = result.unionByName(part)
    return result.select(*VIOLATION_COLUMNS)


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
