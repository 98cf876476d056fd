"""Profile-specific custom rules — the SPARQLConstraintComponent surface.

The reference enables SPARQL-based constraints via ``shacl-engine/sparql``
(reference src/services/SHACLValidationService.ts:4,10-13,405); the DCAT-AP-ES
profile uses a handful (e.g. the DIR3 organism restriction hunted by the
debug helper at :38-52).  Per SURVEY.md §2.8 we do not build a SPARQL
engine: each profile rule is a hand-written DataFrame transform with the
same output contract as the compiled components — ``triples → violations``
rows with ``sourceConstraintComponent = sh:SPARQLConstraintComponent`` and
the rule IRI as ``sourceShape``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import SH, VIOLATION_COLUMNS

SPARQL_COMPONENT = SH + "SPARQLConstraintComponent"


@dataclass
class CustomRule:
    rule_iri: str
    severity: str
    message: str
    # triples → DataFrame with (focusNode, resultPath, value)
    fn: Callable[[DataFrame], DataFrame]


def apply_custom_rules(
    spark: SparkSession, triples: DataFrame, rules: list[CustomRule]
) -> DataFrame:
    """Run every custom rule; union results in the violations shape."""
    outs = []
    for rule in rules:
        hits = rule.fn(triples)
        outs.append(
            hits.select(
                F.col("focusNode"),
                F.col("resultPath"),
                F.col("value").cast("string").alias("value"),
                F.array(
                    F.struct(F.lit(rule.message).alias("text"), F.lit("en").alias("lang"))
                ).alias("message"),
                F.lit(rule.severity).alias("resultSeverity"),
                F.lit(SPARQL_COMPONENT).alias("sourceConstraintComponent"),
                F.lit(rule.rule_iri).alias("sourceShape"),
                F.lit(None).cast("string").alias("foafPage"),
            )
        )
    if not outs:
        from ..model import VIOLATION_SCHEMA

        return spark.createDataFrame([], VIOLATION_SCHEMA)
    out = outs[0]
    for part in outs[1:]:
        out = out.unionByName(part)
    return out.select(*VIOLATION_COLUMNS)


def dir3_organism_rule(publisher_prefix: str = "http://datos.gob.es/recurso/sector-publico/org/Organismo/") -> CustomRule:
    """DCAT-AP-ES-style DIR3 restriction: a dct:publisher of a dcat:Dataset
    must be an IRI under the DIR3 organism registry prefix (the rule the
    reference's debug helper targets, SHACLValidationService.ts:38-52)."""
    DCT_PUBLISHER = "http://purl.org/dc/terms/publisher"
    RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    DCAT_DATASET = "http://www.w3.org/ns/dcat#Dataset"

    def fn(triples: DataFrame) -> DataFrame:
        datasets = (
            triples.filter(
                (F.col("predicate") == RDF_TYPE)
                & (F.col("object_value") == DCAT_DATASET)
            )
            .select(F.col("subject").alias("ds"))
            .dropDuplicates()
        )
        pubs = triples.filter(F.col("predicate") == DCT_PUBLISHER)
        return (
            pubs.join(datasets, pubs["subject"] == datasets["ds"], "left_semi")
            .filter(
                (F.col("object_type") != "iri")
                | ~F.col("object_value").startswith(publisher_prefix)
            )
            .select(
                F.col("subject").alias("focusNode"),
                F.lit(DCT_PUBLISHER).alias("resultPath"),
                F.col("object_value").alias("value"),
            )
            # one result per distinct (focus, value): the same bad publisher
            # asserted from several source pages is one violation
            .dropDuplicates()
        )

    return CustomRule(
        rule_iri="http://example.org/rules#DIR3OrganismRestriction",
        severity="Violation",
        message="dct:publisher must be a DIR3 organism IRI",
        fn=fn,
    )


_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_DCAT_DATASET = "http://www.w3.org/ns/dcat#Dataset"
_DCATAP = "http://data.europa.eu/r5r/"
_HVD_ELI = "http://data.europa.eu/eli/reg_impl/2023/138/oj"


def hvd_legislation_rule() -> CustomRule:
    """DCAT-AP-ES HVD cross-property rule: a dataset carrying a
    dcatap:hvdCategory MUST also reference the HVD implementing regulation
    via dcatap:applicableLegislation — a dependency between two properties
    that single-property shapes cannot express (the shacl-engine evaluates
    it via SPARQL, reference SHACLValidationService.ts:405)."""

    def fn(triples: DataFrame) -> DataFrame:
        flagged = (
            triples.filter(F.col("predicate") == _DCATAP + "hvdCategory")
            .select(F.col("subject").alias("ds"))
            .dropDuplicates()
        )
        has_eli = (
            triples.filter(
                (F.col("predicate") == _DCATAP + "applicableLegislation")
                & (F.col("object_value") == _HVD_ELI)
            )
            .select(F.col("subject").alias("ds"))
            .dropDuplicates()
        )
        return flagged.join(has_eli, "ds", "left_anti").select(
            F.col("ds").alias("focusNode"),
            F.lit(_DCATAP + "applicableLegislation").alias("resultPath"),
            F.lit(None).cast("string").alias("value"),
        )

    return CustomRule(
        rule_iri="http://example.org/rules#HVDLegislationRequired",
        severity="Violation",
        message="hvdCategory requires applicableLegislation = HVD regulation 2023/138",
        fn=fn,
    )


def duplicate_identifier_rule() -> CustomRule:
    """DCAT-AP-ES catalog-level rule: dct:identifier must be unique across
    datasets — a cross-focus-node aggregate no nodeShape can express.  One
    violation per dataset whose identifier another dataset also claims."""
    DCT_IDENTIFIER = "http://purl.org/dc/terms/identifier"

    def fn(triples: DataFrame) -> DataFrame:
        datasets = (
            triples.filter(
                (F.col("predicate") == _RDF_TYPE)
                & (F.col("object_value") == _DCAT_DATASET)
            )
            .select(F.col("subject").alias("ds"))
            .dropDuplicates()
        )
        idents = (
            triples.filter(F.col("predicate") == DCT_IDENTIFIER)
            .join(datasets, triples["subject"] == datasets["ds"], "left_semi")
            .select("subject", "object_value")
            .dropDuplicates()
        )
        dup_ids = (
            idents.groupBy("object_value")
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") > 1)
            .select("object_value")
        )
        return idents.join(F.broadcast(dup_ids), "object_value", "left_semi").select(
            F.col("subject").alias("focusNode"),
            F.lit(DCT_IDENTIFIER).alias("resultPath"),
            F.col("object_value").alias("value"),
        )

    return CustomRule(
        rule_iri="http://example.org/rules#UniqueDatasetIdentifier",
        severity="Violation",
        message="dct:identifier must be unique across datasets",
        fn=fn,
    )


def temporal_order_rule() -> CustomRule:
    """dct:PeriodOfTime sanity: dcat:startDate must not exceed dcat:endDate
    — a two-property comparison on the same node (SPARQL territory)."""
    START = "http://www.w3.org/ns/dcat#startDate"
    END = "http://www.w3.org/ns/dcat#endDate"

    def fn(triples: DataFrame) -> DataFrame:
        # distinct VALUES per node: graph is part of quad identity, so the
        # same start date asserted by two source pages is one value node —
        # without the dedups a multi-graph corpus (or multi-valued node)
        # would double-count the violation
        starts = (
            triples.filter(F.col("predicate") == START)
            .select("subject", F.col("object_value").alias("_start"))
            .dropDuplicates()
        )
        ends = (
            triples.filter(F.col("predicate") == END)
            .select("subject", F.col("object_value").alias("_end"))
            .dropDuplicates()
        )
        # ISO dates compare correctly as strings; try_to_date guards junk
        return (
            starts.join(ends, "subject")
            .filter(
                F.try_to_timestamp(F.col("_start"), F.lit("yyyy-MM-dd")).isNotNull()
                & F.try_to_timestamp(F.col("_end"), F.lit("yyyy-MM-dd")).isNotNull()
                & (F.col("_start") > F.col("_end"))
            )
            .select(
                F.col("subject").alias("focusNode"),
                F.lit(START).alias("resultPath"),
                F.col("_start").alias("value"),
            )
            .dropDuplicates()
        )

    return CustomRule(
        rule_iri="http://example.org/rules#TemporalOrder",
        severity="Warning",
        message="dcat:startDate must not be after dcat:endDate",
        fn=fn,
    )


def profile_custom_rules(profile: str) -> list[CustomRule]:
    """Custom-rule bundle per profile — the analog of the reference's
    sparqlValidations wiring per shapes graph."""
    if profile in ("dcat_ap_es", "nti_risp"):
        return [dir3_organism_rule(), duplicate_identifier_rule(), temporal_order_rule()]
    if profile == "dcat_ap_es_hvd":
        return [
            dir3_organism_rule(),
            duplicate_identifier_rule(),
            temporal_order_rule(),
            hvd_legislation_rule(),
        ]
    return []
