"""Fixture-path RDF sources: RDF/XML (S2) and JSON-LD (S3) subsets produce
the same triples as the Turtle parser for equivalent content."""

from __future__ import annotations

from shacl_validator_spark.sources.rdf_io import (
    triples_from_jsonld,
    triples_from_rdfxml,
    triples_from_turtle,
)

TTL = """
@prefix rdf:  <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix dcat: <http://www.w3.org/ns/dcat#> .
@prefix dct:  <http://purl.org/dc/terms/> .
@prefix ex:   <http://example.org/data#> .

ex:ds1 a dcat:Dataset ;
    dct:title "Population"@en ;
    dct:issued "2024-01-01T00:00:00Z"^^<http://www.w3.org/2001/XMLSchema#dateTime> ;
    dct:publisher ex:agency .
"""

XML = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:dcat="http://www.w3.org/ns/dcat#"
         xmlns:dct="http://purl.org/dc/terms/"
         xml:base="http://example.org/data#">
  <dcat:Dataset rdf:about="http://example.org/data#ds1">
    <dct:title xml:lang="en">Population</dct:title>
    <dct:issued rdf:datatype="http://www.w3.org/2001/XMLSchema#dateTime">2024-01-01T00:00:00Z</dct:issued>
    <dct:publisher rdf:resource="http://example.org/data#agency"/>
  </dcat:Dataset>
</rdf:RDF>
"""

JSONLD = {
    "@id": "http://example.org/data#ds1",
    "@type": "http://www.w3.org/ns/dcat#Dataset",
    "http://purl.org/dc/terms/title": [{"@value": "Population", "@language": "en"}],
    "http://purl.org/dc/terms/issued": [
        {
            "@value": "2024-01-01T00:00:00Z",
            "@type": "http://www.w3.org/2001/XMLSchema#dateTime",
        }
    ],
    "http://purl.org/dc/terms/publisher": [{"@id": "http://example.org/data#agency"}],
}


def _key_set(df):
    return {
        (r.subject, r.predicate, r.object_value, r.object_type, r.object_datatype, r.object_lang)
        for r in df.collect()
    }


def test_three_formats_agree(spark):
    ttl = _key_set(triples_from_turtle(spark, TTL))
    xml = _key_set(triples_from_rdfxml(spark, XML))
    jld = _key_set(triples_from_jsonld(spark, JSONLD))
    assert ttl == xml == jld
    assert len(ttl) == 4
