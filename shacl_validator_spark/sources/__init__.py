from .rdf_io import detect_format, triples_from_turtle  # noqa: F401
