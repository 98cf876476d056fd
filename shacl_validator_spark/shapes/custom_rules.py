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
        )

    return CustomRule(
        rule_iri="http://example.org/rules#DIR3OrganismRestriction",
        severity="Violation",
        message="dct:publisher must be a DIR3 organism IRI",
        fn=fn,
    )
