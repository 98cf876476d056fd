"""Deterministic synthetic derivations of the driver test tables.

These builders turn the TPC-H-ish parquet tables into the engine's domain
tables (violations, triples) with *pure column expressions*, so the exact
same derivation is expressible in the DuckDB oracle SQL of
``__spark_entry__.py`` — generator and oracle cannot drift (FIXTURES.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import RDF_TYPE

EX = "ex:"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def synthetic_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → a violations-shaped table (FIXTURES.md §7): severity from
    event_type, shapes/paths/components spread deterministically."""
    ev = load(spark, sf_dir, "events")
    sev = (
        F.when(F.col("event_type") == "error", "Violation")
        .when(F.col("event_type").isin("click", "purchase"), "Warning")
        .otherwise("Info")
    )
    return ev.select(
        F.format_string("https://ex.org/dataset/%d", F.col("user_id")).alias("focusNode"),
        F.format_string("ex:path%d", F.col("event_id") % 8).alias("resultPath"),
        F.col("event_type").alias("value"),
        F.lit(None)
        .cast("array<struct<text:string,lang:string>>")
        .alias("message"),
        sev.alias("resultSeverity"),
        F.format_string("sh:C%dConstraintComponent", F.col("event_id") % 3).alias(
            "sourceConstraintComponent"
        ),
        F.format_string("ex:Shape%d", F.col("user_id") % 5).alias("sourceShape"),
    )


# SQL fragment equivalent of synthetic_violations for the DuckDB oracle.
SYNTHETIC_VIOLATIONS_SQL = """
SELECT
  'https://ex.org/dataset/' || CAST(user_id AS VARCHAR)         AS focusNode,
  'ex:path' || CAST(event_id % 8 AS VARCHAR)                    AS resultPath,
  event_type                                                    AS value,
  CASE WHEN event_type = 'error' THEN 'Violation'
       WHEN event_type IN ('click','purchase') THEN 'Warning'
       ELSE 'Info' END                                          AS resultSeverity,
  'sh:C' || CAST(event_id % 3 AS VARCHAR) || 'ConstraintComponent' AS sourceConstraintComponent,
  'ex:Shape' || CAST(user_id % 5 AS VARCHAR)                    AS sourceShape
FROM events
"""


def customer_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer/nation → long-format triples with engineered gaps so every
    constraint component fires on real data:

    - rdf:type ex:Customer for every customer (targeting)
    - ex:goodbal only when c_acctbal >= 0           → minCount misses
    - ex:name always                                → pattern checks
    - ex:segment always                             → in-list checks
    - ex:acctbal always (decimal literal)           → range checks
    - ex:nation edge always; nation node typed ex:Nation only for
      n_nationkey < 15                              → class misses
    """
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    supplier = load(spark, sf_dir, "supplier")
    subj = F.format_string("cust:%d", F.col("c_custkey"))
    ssubj = F.format_string("sup:%d", F.col("s_suppkey"))

    def lit_triple(pred: str, value, dtype: str = "http://www.w3.org/2001/XMLSchema#string"):
        return cust.select(
            subj.alias("subject"),
            F.lit(pred).alias("predicate"),
            value.cast("string").alias("object_value"),
            F.lit("literal").alias("object_type"),
            F.lit(dtype).alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
            F.lit("synthetic").alias("graph"),
        )

    parts = [
        cust.select(
            subj.alias("subject"),
            F.lit(RDF_TYPE).alias("predicate"),
            F.lit(EX + "Customer").alias("object_value"),
            F.lit("iri").alias("object_type"),
            F.lit(None).cast("string").alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
            F.lit("synthetic").alias("graph"),
        ),
        lit_triple(EX + "name", F.col("c_name")),
        lit_triple(EX + "segment", F.col("c_mktsegment")),
        lit_triple(
            EX + "acctbal",
            # decimal-cast before stringifying: double→string rendering
            # differs across engines, decimal(12,2)→string does not
            F.col("c_acctbal").cast("decimal(12,2)"),
            "http://www.w3.org/2001/XMLSchema#decimal",
        ),
        cust.filter(F.col("c_acctbal") >= 0).select(
            subj.alias("subject"),
            F.lit(EX + "goodbal").alias("predicate"),
            F.col("c_acctbal").cast("decimal(12,2)").cast("string").alias("object_value"),
            F.lit("literal").alias("object_type"),
            F.lit("http://www.w3.org/2001/XMLSchema#string").alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
            F.lit("synthetic").alias("graph"),
        ),
        cust.select(
            subj.alias("subject"),
            F.lit(EX + "nation").alias("predicate"),
            F.format_string("nation:%d", F.col("c_nationkey")).alias("object_value"),
            F.lit("iri").alias("object_type"),
            F.lit(None).cast("string").alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
            F.lit("synthetic").alias("graph"),
        ),
        nation.filter(F.col("n_nationkey") < 15).select(
            F.format_string("nation:%d", F.col("n_nationkey")).alias("subject"),
            F.lit(RDF_TYPE).alias("predicate"),
            F.lit(EX + "Nation").alias("object_value"),
            F.lit("iri").alias("object_type"),
            F.lit(None).cast("string").alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
            F.lit("synthetic").alias("graph"),
        ),
        # ex:alias — every customer has one value; c_custkey % 5 == 0 gets a
        # second distinct value → maxCount 1 fires for exactly those
        lit_triple(EX + "alias", F.col("c_name")),
        cust.filter(F.col("c_custkey") % 5 == 0).select(
            subj.alias("subject"),
            F.lit(EX + "alias").alias("predicate"),
            F.lower(F.col("c_name")).alias("object_value"),
            F.lit("literal").alias("object_type"),
            F.lit("http://www.w3.org/2001/XMLSchema#string").alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
            F.lit("synthetic").alias("graph"),
        ),
        # ex:regdate — xsd:date literal; % 3 == 0 carries a lexically invalid
        # form → DatatypeConstraintComponent fires
        lit_triple(
            EX + "regdate",
            F.when(F.col("c_custkey") % 3 == 0, F.lit("not-a-date")).otherwise(
                F.lit("2024-01-15")
            ),
            "http://www.w3.org/2001/XMLSchema#date",
        ),
        # ex:balcap — constant numeric cap; ex:acctbal sh:lessThan ex:balcap
        # fires for customers at or above the cap
        lit_triple(
            EX + "balcap",
            F.lit(5000),
            "http://www.w3.org/2001/XMLSchema#integer",
        ),
        # ex:label — language-tagged literals: every customer has an @en
        # label; % 4 == 0 carries a second distinct @en value → uniqueLang
        # fires; % 6 == 0 carries a @de value → languageIn(en, es) fires
        cust.select(
            subj.alias("subject"),
            F.lit(EX + "label").alias("predicate"),
            F.col("c_name").alias("object_value"),
            F.lit("literal").alias("object_type"),
            F.lit(None).cast("string").alias("object_datatype"),
            F.lit("en").alias("object_lang"),
            F.lit("synthetic").alias("graph"),
        ),
        cust.filter(F.col("c_custkey") % 4 == 0).select(
            subj.alias("subject"),
            F.lit(EX + "label").alias("predicate"),
            F.concat(F.lit("dup "), F.col("c_name")).alias("object_value"),
            F.lit("literal").alias("object_type"),
            F.lit(None).cast("string").alias("object_datatype"),
            F.lit("en").alias("object_lang"),
            F.lit("synthetic").alias("graph"),
        ),
        cust.filter(F.col("c_custkey") % 6 == 0).select(
            subj.alias("subject"),
            F.lit(EX + "label").alias("predicate"),
            F.concat(F.lit("de "), F.col("c_name")).alias("object_value"),
            F.lit("literal").alias("object_type"),
            F.lit(None).cast("string").alias("object_datatype"),
            F.lit("de").alias("object_lang"),
            F.lit("synthetic").alias("graph"),
        ),
        # nation detail triples for the nested/path constraint fixtures:
        # ex:iso only on even nations → sh:node(NationShape{ex:iso minCount 1})
        # fires per customer of an odd nation; ex:partof edges (even nations
        # → region) feed the ex:nation/ex:partof* zeroOrMore path
        nation.filter(F.col("n_nationkey") % 2 == 0).select(
            F.format_string("nation:%d", F.col("n_nationkey")).alias("subject"),
            F.lit(EX + "iso").alias("predicate"),
            F.upper(F.substring(F.col("n_name"), 1, 3)).alias("object_value"),
            F.lit("literal").alias("object_type"),
            F.lit("http://www.w3.org/2001/XMLSchema#string").alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
            F.lit("synthetic").alias("graph"),
        ),
        nation.filter(F.col("n_nationkey") % 2 == 0).select(
            F.format_string("nation:%d", F.col("n_nationkey")).alias("subject"),
            F.lit(EX + "partof").alias("predicate"),
            F.format_string("region:%d", F.col("n_nationkey") % 5).alias(
                "object_value"
            ),
            F.lit("iri").alias("object_type"),
            F.lit(None).cast("string").alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
            F.lit("synthetic").alias("graph"),
        ),
        # ex:prefname — equals/disjoint fixture: matches ex:name except
        # % 9 == 0 which carries 'alt <name>' instead → sh:equals(ex:name,
        # ex:prefname) fires both directions on those; sh:disjoint(
        # ex:prefname, ex:name) fires on everyone else
        lit_triple(
            EX + "prefname",
            F.when(
                F.col("c_custkey") % 9 == 0,
                F.concat(F.lit("alt "), F.col("c_name")),
            ).otherwise(F.col("c_name")),
        ),
        # supplier triples — the rdfs:subClassOf entailment fixture: even
        # suppliers are typed ex:Supplier directly; odd suppliers only
        # ex:LocalSupplier, which the schema edge below declares a subclass
        # of ex:Supplier — they are targeted by SupplierShape ONLY through
        # the subclass closure.  ex:saddr exists only on even suppliers, so
        # minCount(ex:saddr) fires exactly on the odd (entailed) ones.
        supplier.select(
            ssubj.alias("subject"),
            F.lit(RDF_TYPE).alias("predicate"),
            F.when(F.col("s_suppkey") % 2 == 0, EX + "Supplier")
            .otherwise(EX + "LocalSupplier")
            .alias("object_value"),
            F.lit("iri").alias("object_type"),
            F.lit(None).cast("string").alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
            F.lit("synthetic").alias("graph"),
        ),
        supplier.filter(F.col("s_suppkey") % 2 == 0).select(
            ssubj.alias("subject"),
            F.lit(EX + "saddr").alias("predicate"),
            F.col("s_name").alias("object_value"),
            F.lit("literal").alias("object_type"),
            F.lit("http://www.w3.org/2001/XMLSchema#string").alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
            F.lit("synthetic").alias("graph"),
        ),
        # the one schema triple: ex:LocalSupplier ⊑ ex:Supplier
        supplier.limit(1).select(
            F.lit(EX + "LocalSupplier").alias("subject"),
            F.lit("http://www.w3.org/2000/01/rdf-schema#subClassOf").alias(
                "predicate"
            ),
            F.lit(EX + "Supplier").alias("object_value"),
            F.lit("iri").alias("object_type"),
            F.lit(None).cast("string").alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
            F.lit("synthetic").alias("graph"),
        ),
        # ex:homepage — IRI except % 7 == 0 which is a literal → nodeKind IRI
        cust.select(
            subj.alias("subject"),
            F.lit(EX + "homepage").alias("predicate"),
            F.format_string("https://cust.example/%d", F.col("c_custkey")).alias(
                "object_value"
            ),
            F.when(F.col("c_custkey") % 7 == 0, "literal")
            .otherwise("iri")
            .alias("object_type"),
            F.when(
                F.col("c_custkey") % 7 == 0,
                "http://www.w3.org/2001/XMLSchema#string",
            )
            .otherwise(F.lit(None).cast("string"))
            .alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
            F.lit("synthetic").alias("graph"),
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def nation_dcat_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation/region → a mini DCAT catalog in triples form, with engineered
    gaps covering every branch of the discovery title coalesce
    (dct:title ?? foaf:name ?? 'Unnamed Dataset' — SURVEY.md §2.2 P4):

    - every nation is a dcat:Dataset
    - dct:title = n_name when n_nationkey % 3 != 0
    - foaf:name = lower(n_name) when n_nationkey % 6 == 0
    - (nationkey % 3 == 0 and % 6 != 0 → Unnamed Dataset)
    - dct:publisher = region ref; dcat:keyword = n_name and 'key<region>'
    """
    nation = load(spark, sf_dir, "nation")
    subj = F.format_string("n:%d", F.col("n_nationkey"))
    DCAT = "http://www.w3.org/ns/dcat#"
    DCT = "http://purl.org/dc/terms/"
    FOAF = "http://xmlns.com/foaf/0.1/"
    RDFS = "http://www.w3.org/2000/01/rdf-schema#"

    def t(df, pred, value, otype="literal"):
        return df.select(
            subj.alias("subject"),
            F.lit(pred).alias("predicate"),
            value.cast("string").alias("object_value"),
            F.lit(otype).alias("object_type"),
            F.lit(None).cast("string").alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
            F.lit("synthetic").alias("graph"),
        )

    parts = [
        t(nation, RDF_TYPE, F.lit(DCAT + "Dataset"), "iri"),
        t(nation.filter(F.col("n_nationkey") % 3 != 0), DCT + "title", F.col("n_name")),
        t(nation.filter(F.col("n_nationkey") % 6 == 0), FOAF + "name", F.lower("n_name")),
        t(nation, DCT + "publisher", F.format_string("r:%d", F.col("n_regionkey")), "iri"),
        t(nation, DCAT + "keyword", F.col("n_name")),
        t(nation, DCAT + "keyword", F.format_string("key%d", F.col("n_regionkey"))),
        # distributions (J2): two per dataset; _1 is a csv with accessURL,
        # _2 carries a dct:IMT format node (J3 resolution path)
        t(nation, DCAT + "distribution", F.format_string("d:%d_1", F.col("n_nationkey")), "iri"),
        t(nation, DCAT + "distribution", F.format_string("d:%d_2", F.col("n_nationkey")), "iri"),
        # data services for even keys — exercises the third RdfStats count
        # (reference ValidatorInput.tsx:163-186 counts dataServices too)
        nation.filter(F.col("n_nationkey") % 2 == 0).select(
            F.format_string("svc:%d", F.col("n_nationkey")).alias("subject"),
            F.lit(RDF_TYPE).alias("predicate"),
            F.lit(DCAT + "DataService").alias("object_value"),
            F.lit("iri").alias("object_type"),
            F.lit(None).cast("string").alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
            F.lit("synthetic").alias("graph"),
        ),
    ]

    def dist(suffix: str, pred: str, value, otype="literal"):
        return nation.select(
            F.format_string(f"d:%d_{suffix}", F.col("n_nationkey")).alias("subject"),
            F.lit(pred).alias("predicate"),
            value.cast("string").alias("object_value"),
            F.lit(otype).alias("object_type"),
            F.lit(None).cast("string").alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
            F.lit("synthetic").alias("graph"),
        )

    parts += [
        dist("1", RDF_TYPE, F.lit(DCAT + "Distribution"), "iri"),
        dist("2", RDF_TYPE, F.lit(DCAT + "Distribution"), "iri"),
        dist("1", DCT + "format", F.lit("text/csv")),
        dist(
            "1",
            DCAT + "accessURL",
            F.format_string("https://data.example.org/%d.csv", F.col("n_nationkey")),
            "iri",
        ),
        dist("1", DCAT + "byteSize", (F.col("n_nationkey") * 1000 + 24)),
        dist("2", DCT + "format", F.format_string("f:%d", F.col("n_nationkey")), "iri"),
        # IMT format nodes: typed dct:IMT with rdf:value (preferred) for even
        # keys, only rdfs:label for odd keys
        nation.select(
            F.format_string("f:%d", F.col("n_nationkey")).alias("subject"),
            F.lit(RDF_TYPE).alias("predicate"),
            F.lit(DCT + "IMT").alias("object_value"),
            F.lit("iri").alias("object_type"),
            F.lit(None).cast("string").alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
            F.lit("synthetic").alias("graph"),
        ),
        nation.filter(F.col("n_nationkey") % 2 == 0).select(
            F.format_string("f:%d", F.col("n_nationkey")).alias("subject"),
            F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#value").alias("predicate"),
            F.lit("application/json").alias("object_value"),
            F.lit("literal").alias("object_type"),
            F.lit(None).cast("string").alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
            F.lit("synthetic").alias("graph"),
        ),
        nation.select(
            F.format_string("f:%d", F.col("n_nationkey")).alias("subject"),
            F.lit(RDFS + "label").alias("predicate"),
            F.lit("JSON").alias("object_value"),
            F.lit("literal").alias("object_type"),
            F.lit(None).cast("string").alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
            F.lit("synthetic").alias("graph"),
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def nation_dcat_es_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → a DCAT-AP-ES catalog (Catalog + Agents + 25 Datasets +
    Distributions + DataServices) with engineered gaps against the FULL
    vendored dcat_ap_es suite (shapes/suites.py).  Every gap is a pure
    column predicate on ``n_nationkey`` so the DuckDB oracle can enumerate
    the expected report exactly:

    - k%5==0  → dataset missing dct:description        (MinCount, Violation)
    - k%6==0  → second @es dct:title                   (UniqueLang, Violation)
    - k%3==0  → dcat:theme outside the EU authority    (In, Warning)
    - k%4==0  → publisher not a DIR3 organism IRI      (SPARQL rule, Violation)
    - k%7==0  → dct:issued lexically invalid xsd:date  (Datatype, Warning)
    - k%8==0  → distribution missing dcat:accessURL    (MinCount, Violation)
    - k%9==0  → negative dcat:byteSize                 (MinInclusive, Warning)
    - k%10==0 ∧ k%2==0 → service missing endpointURL   (MinCount, Violation)

    Everything else satisfies the suite (typed publishers, language from
    the EU table, valid dates, IRIs where required).
    """
    nation = load(spark, sf_dir, "nation")
    DCAT = "http://www.w3.org/ns/dcat#"
    DCT = "http://purl.org/dc/terms/"
    FOAF = "http://xmlns.com/foaf/0.1/"
    XSD = "http://www.w3.org/2001/XMLSchema#"
    CAT = "https://datos.gob.es/catalogo"
    ORG_OK = "http://datos.gob.es/recurso/sector-publico/org/Organismo/E00000001"
    ORG_BAD = "https://example.org/org/bad"
    # dangling publisher: DIR3-patterned IRI with NO type and NO foaf:name —
    # trips the dataset shape's sh:class foaf:Agent AND the published-form
    # sh:node es:AgentNodeShape (nameless agent), while passing the DIR3
    # SPARQL rule (prefix matches) so its count stays k%4-only
    ORG_NONAME = "http://datos.gob.es/recurso/sector-publico/org/Organismo/E00000099"
    THEME_OK = "http://publications.europa.eu/resource/authority/data-theme/ECON"
    THEME_BAD = "https://example.org/theme/bad"
    LANG_SPA = "http://publications.europa.eu/resource/authority/language/SPA"
    k = F.col("n_nationkey")
    ds = F.format_string(CAT + "/dataset-%d", k)
    dist = F.format_string(CAT + "/dist-%d", k)
    svc = F.format_string(CAT + "/svc-%d", k)

    def t(df, subj, pred, value, otype="literal", dtype=None, lang=None):
        lang_col = F.lit(lang).cast("string") if lang is not None else F.lit(None).cast("string")
        return df.select(
            (subj if not isinstance(subj, str) else F.lit(subj)).alias("subject"),
            F.lit(pred).alias("predicate"),
            (value if not isinstance(value, str) else F.lit(value))
            .cast("string")
            .alias("object_value"),
            F.lit(otype).alias("object_type"),
            F.lit(dtype).cast("string").alias("object_datatype"),
            lang_col.alias("object_lang"),
            F.lit("synthetic").alias("graph"),
        )

    one = nation.limit(1)
    parts = [
        # catalog + agents (constants — emitted once via a 1-row slice)
        t(one, CAT, RDF_TYPE, DCAT + "Catalog", "iri"),
        t(one, CAT, DCT + "title", "Catalogo de Datos Abiertos", lang="es"),
        t(one, CAT, DCT + "description", "Catalogo nacional de datos abiertos", lang="es"),
        t(one, CAT, DCT + "publisher", ORG_OK, "iri"),
        t(one, CAT, FOAF + "homepage", "https://datos.gob.es", "iri"),
        t(one, CAT, DCT + "language", LANG_SPA, "iri"),
        t(one, CAT, DCT + "issued", "2024-01-01", dtype=XSD + "date"),
        t(one, ORG_OK, RDF_TYPE, FOAF + "Agent", "iri"),
        t(one, ORG_OK, FOAF + "name", "Organismo DIR3"),
        t(one, ORG_BAD, RDF_TYPE, FOAF + "Agent", "iri"),
        t(one, ORG_BAD, FOAF + "name", "Organismo externo"),
        # datasets
        t(nation, CAT, DCAT + "dataset", ds, "iri"),
        t(nation, ds, RDF_TYPE, DCAT + "Dataset", "iri"),
        t(nation, ds, DCT + "title", F.col("n_name"), lang="es"),
        t(
            nation.filter(k % 6 == 0),
            ds,
            DCT + "title",
            F.concat(F.lit("dup "), F.col("n_name")),
            lang="es",
        ),
        t(
            nation.filter(k % 5 != 0),
            ds,
            DCT + "description",
            F.concat(F.lit("desc "), F.col("n_name")),
            lang="es",
        ),
        t(
            nation,
            ds,
            DCAT + "theme",
            F.when(k % 3 == 0, THEME_BAD).otherwise(THEME_OK),
            "iri",
        ),
        t(
            nation,
            ds,
            DCT + "publisher",
            F.when(k % 4 == 0, ORG_BAD)
            .when(k % 11 == 0, ORG_NONAME)
            .otherwise(ORG_OK),
            "iri",
        ),
        t(nation, ds, DCAT + "distribution", dist, "iri"),
        t(
            nation,
            ds,
            DCT + "issued",
            F.when(k % 7 == 0, "not-a-date").otherwise(F.lit("2024-01-15")),
            dtype=XSD + "date",
        ),
        # distributions
        t(nation, dist, RDF_TYPE, DCAT + "Distribution", "iri"),
        t(
            nation.filter(k % 8 != 0),
            dist,
            DCAT + "accessURL",
            F.format_string("https://datos.gob.es/data/%d.csv", k),
            "iri",
        ),
        t(
            nation,
            dist,
            DCAT + "byteSize",
            F.when(k % 9 == 0, F.lit(-5)).otherwise(k * 1000 + 100),
            dtype=XSD + "nonNegativeInteger",
        ),
        t(nation, dist, DCT + "license", "https://creativecommons.org/licenses/by/4.0/", "iri"),
        t(nation, dist, DCT + "format", "text/csv"),
        # data services (even keys only)
        t(nation.filter(k % 2 == 0), svc, RDF_TYPE, DCAT + "DataService", "iri"),
        t(
            nation.filter(k % 2 == 0),
            svc,
            DCT + "title",
            F.concat(F.lit("svc "), F.col("n_name")),
            lang="es",
        ),
        t(
            nation.filter((k % 2 == 0) & (k % 10 != 0)),
            svc,
            DCAT + "endpointURL",
            F.format_string("https://api.datos.gob.es/%d", k),
            "iri",
        ),
        t(nation.filter(k % 2 == 0), svc, DCAT + "servesDataset", ds, "iri"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def customer_constraints() -> list[dict]:
    """Constraint rows matching ``customer_triples`` (compiled form, no
    Turtle needed — this is the plugin surface of SURVEY.md §2.10)."""

    def row(cid, **kw):
        base = {
            "constraint_id": cid,
            "shape_iri": EX + "CustomerShape",
            "target_class": EX + "Customer",
            "target_subjects_of": None,
            "target_objects_of": None,
            "target_node": None,
            "path": None,
            "path_steps": None,
            "min_count": None,
            "max_count": None,
            "datatype": None,
            "node_kind": None,
            "pattern": None,
            "flags": None,
            "in_list": None,
            "class_iri": None,
            "datatype_in": None,
            "min_inclusive": None,
            "max_inclusive": None,
            "min_exclusive": None,
            "max_exclusive": None,
            "min_inclusive_ts": None,
            "max_inclusive_ts": None,
            "min_exclusive_ts": None,
            "max_exclusive_ts": None,
            "less_than": None,
            "less_than_or_equals": None,
            "equals": None,
            "disjoint": None,
            "closed": None,
            "closed_allowed": None,
            "unique_lang": None,
            "language_in": None,
            "has_value": None,
            "min_length": None,
            "max_length": None,
            "node_branch": None,
            "or_branches": None,
            "and_branches": None,
            "xone_branches": None,
            "not_branch": None,
            "qvs_branch": None,
            "q_min_count": None,
            "q_max_count": None,
            "qvs_disjoint": None,
            "qvs_sibling_branches": None,
            "nested_under": None,
            "severity": "Violation",
            "messages": None,
            "foaf_page": None,
        }
        base.update(kw)
        return base

    def branch(**kw):
        b = {
            "datatype": None,
            "node_kind": None,
            "class_iri": None,
            "pattern": None,
            "min_length": None,
            "max_length": None,
            "node_ref": None,
        }
        b.update(kw)
        return b

    return [
        row(1, path=EX + "goodbal", path_steps=[[EX + "goodbal"]], min_count=1),
        row(
            2,
            path=EX + "name",
            path_steps=[[EX + "name"]],
            pattern="^Customer#000000[0-9]{3}$",
            severity="Warning",
        ),
        row(
            3,
            path=EX + "segment",
            path_steps=[[EX + "segment"]],
            in_list=["BUILDING", "MACHINERY", "AUTOMOBILE"],
            severity="Info",
        ),
        row(4, path=EX + "acctbal", path_steps=[[EX + "acctbal"]], min_inclusive=0.0),
        row(5, path=EX + "nation", path_steps=[[EX + "nation"]], class_iri=EX + "Nation"),
        row(6, path=EX + "alias", path_steps=[[EX + "alias"]], max_count=1),
        row(
            7,
            path=EX + "regdate",
            path_steps=[[EX + "regdate"]],
            datatype="http://www.w3.org/2001/XMLSchema#date",
        ),
        row(
            8,
            path=EX + "homepage",
            path_steps=[[EX + "homepage"]],
            node_kind="IRI",
            severity="Warning",
        ),
        row(
            9,
            path=EX + "acctbal",
            path_steps=[[EX + "acctbal"]],
            max_inclusive=9000.0,
            severity="Info",
        ),
        row(
            10,
            path=EX + "acctbal",
            path_steps=[[EX + "acctbal"]],
            min_exclusive=0.0,
            severity="Warning",
        ),
        row(
            11,
            path=EX + "acctbal",
            path_steps=[[EX + "acctbal"]],
            max_exclusive=9000.0,
            severity="Info",
        ),
        row(
            12,
            path=EX + "acctbal",
            path_steps=[[EX + "acctbal"]],
            less_than=EX + "balcap",
        ),
        row(
            13,
            path=EX + "label",
            path_steps=[[EX + "label"]],
            unique_lang=True,
            severity="Warning",
        ),
        row(
            14,
            path=EX + "label",
            path_steps=[[EX + "label"]],
            language_in=["en", "es"],
            severity="Info",
        ),
        row(
            15,
            path=EX + "segment",
            path_steps=[[EX + "segment"]],
            max_length=8,
            severity="Info",
        ),
        row(
            16,
            path=EX + "segment",
            path_steps=[[EX + "segment"]],
            has_value="BUILDING",
            severity="Warning",
        ),
        # sh:or(date | dateTime) — fires where the lexical form satisfies
        # neither branch (the same %3 rows the plain datatype rule catches)
        row(
            17,
            path=EX + "regdate",
            path_steps=[[EX + "regdate"]],
            datatype_in=[
                "http://www.w3.org/2001/XMLSchema#date",
                "http://www.w3.org/2001/XMLSchema#dateTime",
            ],
            severity="Info",
        ),
        # general sh:or over non-datatype branches: acctbal must match the
        # unsigned-decimal pattern OR be a blank node — fires for negatives
        row(
            18,
            path=EX + "acctbal",
            path_steps=[[EX + "acctbal"]],
            or_branches=[
                branch(pattern="^[0-9]+\\.[0-9][0-9]$"),
                branch(node_kind="BlankNode"),
            ],
            severity="Warning",
        ),
        # sh:node → nested NationShape requiring ex:iso (present only on
        # even nations) — fires per customer of an odd nation
        row(
            19,
            path=EX + "nation",
            path_steps=[[EX + "nation"]],
            node_branch=branch(node_ref=EX + "NationShape"),
        ),
        # sh:qualifiedValueShape(pattern '^dup ') qualifiedMinCount 1 on
        # ex:label — fires for customers without a second 'dup ' label
        row(
            20,
            path=EX + "label",
            path_steps=[[EX + "label"]],
            qvs_branch=branch(pattern="^dup "),
            q_min_count=1,
            severity="Info",
        ),
        # sh:not(pattern '^de ') on ex:label — the @de labels conform to the
        # inner shape, so exactly those values violate
        row(
            21,
            path=EX + "label",
            path_steps=[[EX + "label"]],
            not_branch=branch(pattern="^de "),
            severity="Warning",
        ),
        # sh:and(minLength 9, pattern uppercase) on ex:segment — BUILDING
        # (8 chars) fails the first operand
        row(
            22,
            path=EX + "segment",
            path_steps=[[EX + "segment"]],
            and_branches=[branch(min_length=9), branch(pattern="^[A-Z]+$")],
            severity="Info",
        ),
        # sh:xone(pattern '^2024', maxLength 4) on ex:regdate — valid dates
        # match exactly the pattern branch; 'not-a-date' matches neither
        row(
            23,
            path=EX + "regdate",
            path_steps=[[EX + "regdate"]],
            xone_branches=[branch(pattern="^2024"), branch(max_length=4)],
            severity="Warning",
        ),
        # inverse path: nations (typed, k<15) with too many in-linking
        # customers — path ^ex:nation, maxCount 18
        row(
            24,
            shape_iri=EX + "NationInvShape",
            target_class=EX + "Nation",
            path="^" + EX + "nation",
            path_steps=[["^" + EX + "nation"]],
            max_count=18,
            severity="Info",
        ),
        # zeroOrMore path: ex:nation/ex:partof* must reach region:0 —
        # holds only for customers whose nation is even AND ≡0 (mod 5)
        row(
            25,
            path=EX + "nation/" + EX + "partof*",
            path_steps=[[EX + "nation"], ["*" + EX + "partof"]],
            has_value="region:0",
            severity="Info",
        ),
        # nested NationShape definition (no targets; referenced by row 19)
        row(
            26,
            shape_iri=EX + "NationShape",
            target_class=None,
            nested_under=EX + "NationShape",
            path=EX + "iso",
            path_steps=[[EX + "iso"]],
            min_count=1,
        ),
        # sh:equals — ex:name's value set must equal ex:prefname's; the
        # % 9 == 0 customers carry 'alt <name>' as prefname, so both
        # directions fire for exactly those (value = the odd one out)
        row(
            27,
            path=EX + "name",
            path_steps=[[EX + "name"]],
            equals=EX + "prefname",
        ),
        # sh:disjoint — ex:prefname must share no value with ex:name; fires
        # for every customer EXCEPT the % 9 == 0 ones (whose prefname is
        # the non-overlapping 'alt <name>')
        row(
            28,
            path=EX + "prefname",
            path_steps=[[EX + "prefname"]],
            disjoint=EX + "name",
            severity="Warning",
        ),
        # sh:lessThanOrEquals — acctbal must be <= balcap (5000); fires
        # strictly above the cap (the strict lessThan row 12 fires at >=)
        row(
            29,
            path=EX + "acctbal",
            path_steps=[[EX + "acctbal"]],
            less_than_or_equals=EX + "balcap",
            severity="Warning",
        ),
        # sh:closed on ex:Nation — only ex:iso and rdf:type are allowed, so
        # the ex:partof edges on typed even nations each violate
        row(
            30,
            shape_iri=EX + "NationClosedShape",
            target_class=EX + "Nation",
            closed=True,
            closed_allowed=[RDF_TYPE, EX + "iso"],
            severity="Info",
        ),
        # node-shape-level constraint (empty path — the focus node is its
        # own value node): nation IRIs must end in an even digit, so the
        # odd typed nations violate with a null resultPath
        row(
            31,
            shape_iri=EX + "NationSelfShape",
            target_class=EX + "Nation",
            path=None,
            path_steps=[],
            pattern="^nation:.*[02468]$",
        ),
        # rdfs:subClassOf entailment: targets instances of ex:Supplier AND
        # its subclasses; odd suppliers (typed only ex:LocalSupplier, no
        # ex:saddr) violate — they are reached ONLY through the closure
        row(
            32,
            shape_iri=EX + "SupplierShape",
            target_class=EX + "Supplier",
            path=EX + "saddr",
            path_steps=[[EX + "saddr"]],
            min_count=1,
            severity="Info",
        ),
        # sh:oneOrMorePath: ex:partof+ over typed nations with maxCount 0 —
        # `+` excludes the zero-length hop, so odd nations (no ex:partof
        # edge) have ZERO values and conform while even nations reach their
        # region and violate; under `*` every nation would fire (the focus
        # itself counts), making the +/* distinction directly observable
        row(
            34,
            shape_iri=EX + "NationOneOrMoreShape",
            target_class=EX + "Nation",
            path=EX + "partof+",
            path_steps=[["+" + EX + "partof"]],
            max_count=0,
            severity="Warning",
        ),
        # sh:qualifiedValueShape(pattern '^dup ') qualifiedMaxCount 0 on
        # ex:label — fires for exactly the customers that DO carry a second
        # 'dup ' label (the complement of the qualifiedMinCount row 20)
        row(
            35,
            path=EX + "label",
            path_steps=[[EX + "label"]],
            qvs_branch=branch(pattern="^dup "),
            q_max_count=0,
            severity="Warning",
        ),
        # sh:qualifiedValueShapesDisjoint (SHACL \u00a74.5.3): every segment
        # conforms to the qualified shape (uppercase), but segments starting
        # with 'B' ALSO conform to the sibling shape and so count toward
        # NEITHER \u2014 qualifiedMinCount 1 fires for exactly the BUILDING-
        # segment customers
        row(
            36,
            path=EX + "segment",
            path_steps=[[EX + "segment"]],
            qvs_branch=branch(pattern="^[A-Z]+$"),
            q_min_count=1,
            qvs_disjoint=True,
            qvs_sibling_branches=[branch(pattern="^B")],
            severity="Info",
        ),
        # sh:zeroOrOnePath: ex:partof? over typed nations with maxCount 1 —
        # the zero-length hop makes the focus its own value node, so EVEN
        # nations (which also have the one-hop ex:partof region) count 2 and
        # violate; without the zero-hop nothing would fire, making the `?`
        # semantics directly observable
        row(
            33,
            shape_iri=EX + "NationZeroOneShape",
            target_class=EX + "Nation",
            path=EX + "partof?",
            path_steps=[["?" + EX + "partof"]],
            max_count=1,
            severity="Info",
        ),
    ]
