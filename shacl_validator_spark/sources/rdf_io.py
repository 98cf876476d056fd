"""RDF ingestion helpers (driver-side fixtures path).

The reference parses whole catalogs in the browser
(src/services/RDFService.ts:42-69).  In the rebuilt pipeline the hot path
never parses RDF text — triples are *emitted* by the extraction UDFs — so
Turtle parsing is only needed for shape files and test fixtures, both
driver-side and tiny (SURVEY.md §2.1 S1-S3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..model import TRIPLE_SCHEMA
from ..shapes.compiler import parse_turtle


def triples_from_turtle(
    spark: SparkSession, ttl: str, graph: str | None = None
) -> DataFrame:
    """Parse fixture Turtle into a triples DataFrame (set semantics — the
    reference's ``dataset.add`` collapses duplicate quads,
    SHACLValidationService.ts:133,174-176)."""
    g = parse_turtle(ttl)
    rows = []
    for s, p, o in g.triples:
        rows.append(
            (
                s,
                p,
                o.value,
                o.kind,
                o.datatype,
                (o.lang.lower().split("-")[0] if o.lang else None),
                graph,
            )
        )
    df = spark.createDataFrame(rows, schema=TRIPLE_SCHEMA) if rows else spark.createDataFrame([], TRIPLE_SCHEMA)
    return df.dropDuplicates()


def detect_format(content: str, url: str | None = None, content_type: str | None = None) -> str:
    """Format sniffing by content-type, URL extension, then content prefix —
    reference src/services/RDFService.ts:125-157 (S4)."""
    ct = (content_type or "").lower()
    for mime in ("text/turtle", "application/rdf+xml", "application/ld+json",
                 "application/n-triples", "application/n-quads"):
        if mime in ct:
            return mime
    ext_map = {
        ".ttl": "text/turtle",
        ".n3": "text/turtle",
        ".nt": "application/n-triples",
        ".rdf": "application/rdf+xml",
        ".xml": "application/rdf+xml",
        ".jsonld": "application/ld+json",
        ".json": "application/ld+json",
    }
    if url:
        low = url.lower().split("?")[0]
        for ext, mime in ext_map.items():
            if low.endswith(ext):
                return mime
    head = content.lstrip()[:256].lower()
    if head.startswith("<?xml") or "<rdf:rdf" in head:
        return "application/rdf+xml"
    if head.startswith("{") or head.startswith("["):
        return "application/ld+json"
    return "text/turtle"
