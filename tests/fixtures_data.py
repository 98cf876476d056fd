"""Conforming / violating data fixtures (FIXTURES.md §4).

One conforming graph plus one mutation per constraint component, mirroring
the reference guide's worked golden example
(reference src/components/Guide/EducationalContent.tsx:65-91).
"""

PREFIXES = """
@prefix rdf:  <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix dcat: <http://www.w3.org/ns/dcat#> .
@prefix dct:  <http://purl.org/dc/terms/> .
@prefix foaf: <http://xmlns.com/foaf/0.1/> .
@prefix xsd:  <http://www.w3.org/2001/XMLSchema#> .
@prefix ex:   <http://example.org/data#> .
"""

OK_CATALOG = PREFIXES + """
ex:catalog a dcat:Catalog ;
    dcat:dataset ex:ds1 .

ex:ds1 a dcat:Dataset ;
    dct:title "Population data"@en ;
    dcat:identifier "12345" ;
    dct:publisher ex:agency ;
    dct:issued "2024-01-01T00:00:00Z"^^xsd:dateTime ;
    dcat:theme <http://publications.europa.eu/resource/authority/data-theme/ECON> ;
    dcat:distribution ex:dist1 .

ex:agency a foaf:Agent ;
    foaf:name "Stats Agency"@en .

ex:dist1 a dcat:Distribution ;
    dcat:accessURL <https://data.example.org/pop.csv> ;
    dcat:byteSize "1024"^^xsd:decimal .
"""

# catalog with no dcat:dataset → MinCount violation (golden example)
MISSING_DATASET = PREFIXES + """
ex:catalog a dcat:Catalog ;
    dct:title "Empty catalog"@en .
"""

TOO_MANY_TITLES = PREFIXES + """
ex:ds1 a dcat:Dataset ;
    dct:title "One"@en ;
    dct:title "Two"@en ;
    dct:title "Three"@en ;
    dcat:identifier "1" ;
    dct:publisher ex:agency ;
    dct:issued "2024-01-01T00:00:00Z"^^xsd:dateTime .
ex:agency a foaf:Agent .
"""

# identifier "ABC-123" → Pattern warning (golden example values)
BAD_IDENTIFIER = PREFIXES + """
ex:ds1 a dcat:Dataset ;
    dct:title "Ok"@en ;
    dcat:identifier "ABC-123" ;
    dct:publisher ex:agency ;
    dct:issued "2024-01-01T00:00:00Z"^^xsd:dateTime .
ex:agency a foaf:Agent .
"""

WRONG_DATATYPE = PREFIXES + """
ex:ds1 a dcat:Dataset ;
    dct:title "Ok"@en ;
    dcat:identifier "1" ;
    dct:publisher ex:agency ;
    dct:issued "yesterday" .
ex:agency a foaf:Agent .
"""

PUBLISHER_UNTYPED = PREFIXES + """
ex:ds1 a dcat:Dataset ;
    dct:title "Ok"@en ;
    dcat:identifier "1" ;
    dct:publisher ex:mystery ;
    dct:issued "2024-01-01T00:00:00Z"^^xsd:dateTime .
"""

LITERAL_ACCESS_URL = PREFIXES + """
ex:dist1 a dcat:Distribution ;
    dcat:accessURL "https://not-an-iri.example.org" .
"""

THEME_NOT_IN_VOCAB = PREFIXES + """
ex:ds1 a dcat:Dataset ;
    dct:title "Ok"@en ;
    dcat:identifier "1" ;
    dct:publisher ex:agency ;
    dct:issued "2024-01-01T00:00:00Z"^^xsd:dateTime ;
    dcat:theme <http://example.org/not-a-theme> .
ex:agency a foaf:Agent .
"""

NEGATIVE_BYTESIZE = PREFIXES + """
ex:dist1 a dcat:Distribution ;
    dcat:accessURL <https://data.example.org/x.csv> ;
    dcat:byteSize "-5"^^xsd:decimal .
"""
