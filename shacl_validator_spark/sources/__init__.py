from .rdf_io import (  # noqa: F401
    detect_format,
    triples_from_jsonld,
    triples_from_rdfxml,
    triples_from_turtle,
)
