"""Vendored profile shapes (mini DCAT-AP), mirroring the reference's
profile mechanism.

The reference ships four profiles, each a list of remote SHACL shape files
fetched + unioned at runtime (reference src/config/mqa-config.json:38-140,
src/services/SHACLValidationService.ts:101-138).  Remote fetching is a
non-goal (SURVEY.md §7.4); the profiles here are vendored Turtle strings
covering every constraint component the profiles exercise — the worked
golden example of the reference guide is reproduced exactly
(src/components/Guide/EducationalContent.tsx:65-91: MinCount on
dcat:dataset, Pattern ``^[0-9]+$`` warning on dcat:identifier).
"""

from __future__ import annotations

# Mini DCAT-AP shapes graph — FIXTURES.md §3.
MINI_DCAT_AP_TTL = """
@prefix sh:   <http://www.w3.org/ns/shacl#> .
@prefix dcat: <http://www.w3.org/ns/dcat#> .
@prefix dct:  <http://purl.org/dc/terms/> .
@prefix foaf: <http://xmlns.com/foaf/0.1/> .
@prefix xsd:  <http://www.w3.org/2001/XMLSchema#> .
@prefix ex:   <http://example.org/shapes#> .

ex:CatalogShape a sh:NodeShape ;
    sh:targetClass dcat:Catalog ;
    foaf:page <https://www.w3.org/TR/vocab-dcat-2/#Class:Catalog> ;
    sh:property [
        sh:path dcat:dataset ;
        sh:minCount 1 ;
        sh:severity sh:Violation ;
        sh:message "Less than 1 values on dcat:dataset"@en ;
    ] .

ex:DatasetShape a sh:NodeShape ;
    sh:targetClass dcat:Dataset ;
    foaf:page <https://www.w3.org/TR/vocab-dcat-2/#Class:Dataset> ;
    sh:property [
        sh:path dct:title ;
        sh:minCount 1 ;
        sh:maxCount 2 ;
        sh:severity sh:Violation ;
        sh:message "Dataset must have 1-2 titles"@en ;
        sh:message "El dataset debe tener 1-2 titulos"@es ;
    ] ;
    sh:property [
        sh:path dcat:identifier ;
        sh:pattern "^[0-9]+$" ;
        sh:severity sh:Warning ;
        sh:message "Value does not match pattern ^[0-9]+$"@en ;
    ] ;
    sh:property [
        sh:path dct:publisher ;
        sh:class foaf:Agent ;
        sh:severity sh:Violation ;
    ] ;
    sh:property [
        sh:path dct:issued ;
        sh:datatype xsd:dateTime ;
        sh:severity sh:Violation ;
    ] ;
    sh:property [
        sh:path dcat:theme ;
        sh:in (
            <http://publications.europa.eu/resource/authority/data-theme/ECON>
            <http://publications.europa.eu/resource/authority/data-theme/ENVI>
            <http://publications.europa.eu/resource/authority/data-theme/TECH>
        ) ;
        sh:severity sh:Info ;
        sh:message "Theme should come from the EU data-theme vocabulary"@en ;
    ] .

ex:DistributionShape a sh:NodeShape ;
    sh:targetClass dcat:Distribution ;
    sh:property [
        sh:path dcat:accessURL ;
        sh:nodeKind sh:IRI ;
        sh:minCount 1 ;
        sh:severity sh:Violation ;
    ] ;
    sh:property [
        sh:path dcat:byteSize ;
        sh:minInclusive 0 ;
        sh:severity sh:Warning ;
    ] .
"""

# KG-extraction shapes: the constraint set applied to OpenIE-emitted triples
# on the hot path (BASELINE.json north_star: minCount, datatype, sh:pattern,
# class-target constraints over extracted entities).
KG_EXTRACTION_TTL = """
@prefix sh:  <http://www.w3.org/ns/shacl#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix kg:  <http://example.org/kg#> .

kg:OrganizationShape a sh:NodeShape ;
    sh:targetClass kg:Organization ;
    sh:property [
        sh:path kg:name ;
        sh:minCount 1 ;
        sh:severity sh:Violation ;
        sh:message "organization must have a name"@en ;
    ] ;
    sh:property [
        sh:path kg:locatedIn ;
        sh:class kg:Place ;
        sh:severity sh:Violation ;
    ] ;
    sh:property [
        sh:path kg:founded ;
        sh:datatype xsd:integer ;
        sh:pattern "^[0-9]{4}$" ;
        sh:severity sh:Warning ;
    ] .

kg:PlaceShape a sh:NodeShape ;
    sh:targetClass kg:Place ;
    sh:property [
        sh:path kg:name ;
        sh:minCount 1 ;
        sh:maxCount 3 ;
        sh:severity sh:Violation ;
    ] .

kg:DatasetShape a sh:NodeShape ;
    sh:targetClass kg:Dataset ;
    sh:property [
        sh:path kg:name ;
        sh:minCount 1 ;
        sh:severity sh:Violation ;
    ] ;
    sh:property [
        sh:path kg:publishedBy ;
        sh:class kg:Organization ;
        sh:minCount 1 ;
        sh:severity sh:Violation ;
    ] .
"""

# Profile registry — same shape as the reference's ValidationProfile union
# (src/types.ts:1).  The four real profile names carry their FULL vendored
# suites (shapes/suites.py, file-per-concern like the mqa-config lists);
# the two mini profiles remain for focused fixtures and the KG hot path.
from .suites import SUITE_FILES, suite_ttls  # noqa: E402

PROFILES: dict[str, str] = {
    "mini_dcat_ap": MINI_DCAT_AP_TTL,
    "kg_extraction": KG_EXTRACTION_TTL,
    **{name: "\n".join(suite_ttls(name)) for name in SUITE_FILES},
}

_shapes_cache: dict[str, list[dict]] = {}


def profile_shapes_ttl(profile: str) -> str:
    """Shape Turtle for a named profile (cache key parity with the
    reference's per-(profile,branch) shapes cache,
    SHACLValidationService.ts:35,114-138)."""
    if profile not in PROFILES:
        raise KeyError(f"unknown profile {profile!r}; known: {sorted(PROFILES)}")
    return PROFILES[profile]


def compiled_profile(profile: str, branch: str = "main") -> list[dict]:
    """Compiled constraint rows for a profile, cached per (profile, branch)
    — the Spark analog of the reference's shaclShapesCache, which keys on
    both dimensions (SHACLValidationService.ts:115 ``cacheKey =
    `${profile}_${branch}```).  The vendored suites carry a single revision,
    so every branch resolves to the same TTLs today; the cache dimension
    exists so a second vendored revision slots in without invalidating the
    other branch's compiled rows."""
    key = f"{profile}_{branch}"
    rows = _shapes_cache.get(key)
    if rows is None:
        from .compiler import compile_shape_files

        if profile in SUITE_FILES:
            rows = compile_shape_files(suite_ttls(profile))
        else:
            rows = compile_shape_files([PROFILES[profile]])
        _shapes_cache[key] = rows
    return rows
