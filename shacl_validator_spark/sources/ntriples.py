r"""Distributed N-Triples / N-Quads source and sink (S5/S6 scale path).

The reference ingests RDF text in the browser: remote catalogs are fetched
with ``fetchRDFContent`` (reference src/services/RDFService.ts:105-122) and
large local files stream through a 256 KB chunked ``FileReader``
(reference src/components/ValidatorInput.tsx:338-381).  Both are
single-threaded text paths bounded by one machine's memory.  The Spark-first
re-expression of "chunked reading" is the line-based N-Triples/N-Quads
family: the grammar is one statement per line, so ``spark.read.text`` gives
HDFS-block-sized splits for free and every executor parses its split
independently — a 100 TB dump parses with zero driver involvement and zero
Python on executors (the whole parse is JVM-side ``regexp_extract`` /
``regexp_replace`` column expressions inside WholeStageCodegen).

Turtle/RDF-XML/JSON-LD stay driver-side (``rdf_io.py``) by design: those
grammars are stateful (prefixes, nesting) and the reference only ever uses
them for catalog-sized inputs; N-Triples/N-Quads is the interchange format
actually used for web-scale dumps (Wikidata, DBpedia, LOD crawls).

Escape handling: the RDF 1.1 N-Triples string escapes ``\\`` ``\"`` ``\n``
``\r`` ``\t`` are decoded/encoded exactly; ``\uXXXX`` / ``\UXXXXXXXX``
numeric escapes are NOT decoded (the spec allows but does not require them
— UTF-8 encoded dumps emit code points directly; strict mode surfaces any
line this parser cannot round-trip rather than corrupting it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import TRIPLE_COLUMNS, TRIPLE_SCHEMA, XSD

XSD_STRING = XSD + "string"

# One statement per line: subject predicate object [graph] '.'
# Groups: 1 subject, 2 predicate, 3 object term, 4 optional graph label.
_STMT_RE = (
    r"^[ \t]*(<[^<>\"{}|^`\\ ]*>|_:\S+)"
    r"[ \t]+(<[^<>\"{}|^`\\ ]*>)"
    r"[ \t]+(<[^<>\"{}|^`\\ ]*>|_:\S+|\"(?:[^\"\\]|\\.)*\""
    r"(?:@[A-Za-z][A-Za-z0-9]*(?:-[A-Za-z0-9]+)*|\^\^<[^<>\"{}|^`\\ ]*>)?)"
    r"(?:[ \t]+(<[^<>\"{}|^`\\ ]*>|_:\S+))?"
    r"[ \t]*\.[ \t]*$"
)

def _unescape(col: Column) -> Column:
    r"""Decode the five N-Triples string escapes, JVM-side and
    collision-free: split on ``\\`` (the escaped backslash) first, decode
    the four single-char escapes inside each segment — where no ``\\``
    can remain, so ``\\n`` correctly decodes to backslash + 'n', not a
    newline — and rejoin with a literal backslash.  No in-band sentinel:
    any code point, including U+0000, round-trips."""

    def _seg(seg: Column) -> Column:
        s = F.replace(seg, F.lit('\\"'), F.lit('"'))
        s = F.replace(s, F.lit("\\n"), F.lit("\n"))
        s = F.replace(s, F.lit("\\r"), F.lit("\r"))
        return F.replace(s, F.lit("\\t"), F.lit("\t"))

    # regex '\\\\\\\\' = two literal backslashes; limit -1 keeps trailing
    # empty segments so a terminal escaped backslash survives the rejoin
    return F.array_join(F.transform(F.split(col, "\\\\\\\\", -1), _seg), "\\")


def _escape(col: Column) -> Column:
    """Encode a literal's lexical form for serialization (inverse of
    ``_unescape``; backslash first so later escapes are not doubled)."""
    c = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    return F.replace(c, F.lit("\t"), F.lit("\\t"))


def _strip_angle(col: Column) -> Column:
    return F.substring(col, 2, F.length(col) - 2)


def read_ntriples(
    spark: SparkSession,
    path: str,
    graph: str | None = None,
    strict: bool = True,
    distinct: bool = True,
) -> DataFrame:
    """Parse an N-Triples or N-Quads file (or directory of part files) into
    the TRIPLE_SCHEMA relation, fully distributed.

    - ``spark.read.text`` splits on HDFS block boundaries; because every
      statement is one line, no cross-split state exists (the Spark-first
      answer to the reference's chunked ``FileReader``,
      ValidatorInput.tsx:338-381 — chunking is the file source's job).
    - The parse is a single regex match per line plus per-field decodes —
      all ``pyspark.sql.functions``, no UDFs, whole-stage-codegen'd.
    - N-Quads graph labels land in ``graph``; ``graph=`` (e.g. the source
      url, matching the pipeline's convention) fills triple-lines only —
      an explicit quad label wins.
    - ``strict=True`` plants a lazy ``raise_error`` on any non-blank,
      non-comment line the grammar does not match: the failure surfaces
      when (and where) the data is actually scanned — no extra validation
      job, no silent drop.  ``strict=False`` filters bad lines instead.
    - ``distinct=True`` applies RDF dataset set-semantics (the reference's
      ``dataset.add`` collapses duplicate quads,
      SHACLValidationService.ts:174-176) — one hash-shuffle; pass False
      when a downstream stage dedups anyway (e.g. the pipeline MERGE).
    """
    return parse_ntriples(
        spark.read.text(path), graph=graph, strict=strict, distinct=distinct
    )


def parse_ntriples(
    lines: DataFrame,
    graph: str | None = None,
    strict: bool = True,
    distinct: bool = True,
) -> DataFrame:
    """Grammar core shared by the batch reader and the streaming source:
    a single-string-column relation (``value``) → TRIPLE_SCHEMA.  Pure
    column expressions, so it lifts to a ``readStream.text`` input
    unchanged (streaming/stream.py:ntriples_stream)."""
    content = lines.filter(~F.col("value").rlike(r"^[ \t]*(#.*)?$"))

    s = F.regexp_extract("value", _STMT_RE, 1)
    p = F.regexp_extract("value", _STMT_RE, 2)
    o = F.regexp_extract("value", _STMT_RE, 3)
    g = F.regexp_extract("value", _STMT_RE, 4)
    matched = s != ""

    if strict:
        content = content.withColumn(
            "value",
            F.when(matched, F.col("value")).otherwise(
                F.raise_error(
                    F.concat(F.lit("ntriples: unparseable line: "), F.col("value"))
                )
            ),
        )
    else:
        content = content.filter(matched)

    is_lit = o.startswith('"')
    is_iri = o.startswith("<")
    # lexical form: between the opening quote and the LAST closing quote
    # before the optional suffix — the regex guarantees the shape, so a
    # greedy extract is unambiguous
    lex = F.regexp_extract(o, r'^"((?:[^"\\]|\\.)*)"', 1)
    lang = F.regexp_extract(o, r'"@([A-Za-z0-9-]+)$', 1)
    dtype = F.regexp_extract(o, r"\^\^<([^<>]*)>$", 1)

    parsed = content.select(
        F.when(s.startswith("<"), _strip_angle(s)).otherwise(s).alias("subject"),
        _strip_angle(p).alias("predicate"),
        F.when(is_iri, _strip_angle(o))
        .when(is_lit, _unescape(lex))
        .otherwise(o)
        .alias("object_value"),
        F.when(is_iri, F.lit("iri"))
        .when(is_lit, F.lit("literal"))
        .otherwise(F.lit("bnode"))
        .alias("object_type"),
        F.when(
            is_lit & (dtype != ""), dtype
        )
        .when(is_lit & (lang == ""), F.lit(XSD_STRING))
        .otherwise(F.lit(None).cast("string"))
        .alias("object_datatype"),
        # full BCP47 tag, lowercased (RDF 1.1 canonical form — same
        # convention as triples_from_turtle)
        F.when(is_lit & (lang != ""), F.lower(lang))
        .otherwise(F.lit(None).cast("string"))
        .alias("object_lang"),
        F.when(g.startswith("<"), _strip_angle(g))
        .when(g != "", g)
        .otherwise(F.lit(graph).cast("string"))
        .alias("graph"),
    )
    return parsed.dropDuplicates() if distinct else parsed


def ntriples_lines(df: DataFrame, quads: bool = False) -> DataFrame:
    """Render a TRIPLE_SCHEMA relation to one N-Triples/N-Quads statement
    per row (single ``value`` string column, ready for ``.write.text``).

    Pure column expressions — serialization of a 100 TB triple table is an
    embarrassingly parallel map over partitions.  ``quads=True`` appends
    the ``graph`` column as the quad label (rows with a null graph stay
    triple-form, which N-Quads permits: the default graph)."""
    subj = F.when(
        F.col("subject").startswith("_:"), F.col("subject")
    ).otherwise(F.concat(F.lit("<"), F.col("subject"), F.lit(">")))
    pred = F.concat(F.lit("<"), F.col("predicate"), F.lit(">"))
    lit_suffix = (
        F.when(
            F.col("object_lang").isNotNull(),
            F.concat(F.lit("@"), F.col("object_lang")),
        )
        .when(
            F.col("object_datatype").isNotNull()
            & (F.col("object_datatype") != XSD_STRING),
            F.concat(F.lit("^^<"), F.col("object_datatype"), F.lit(">")),
        )
        .otherwise(F.lit(""))
    )
    obj = (
        F.when(
            F.col("object_type") == "literal",
            F.concat(F.lit('"'), _escape(F.col("object_value")), F.lit('"'), lit_suffix),
        )
        .when(F.col("object_type") == "bnode", F.col("object_value"))
        .otherwise(F.concat(F.lit("<"), F.col("object_value"), F.lit(">")))
    )
    parts = [subj, F.lit(" "), pred, F.lit(" "), obj]
    if quads:
        parts.append(
            F.when(
                F.col("graph").isNotNull(),
                F.concat(F.lit(" <"), F.col("graph"), F.lit(">")),
            ).otherwise(F.lit(""))
        )
    parts.append(F.lit(" ."))
    return df.select(F.concat(*parts).alias("value"))


def write_ntriples(df: DataFrame, path: str, quads: bool = False, mode: str = "error") -> None:
    """Serialize a triples relation to an N-Triples/N-Quads directory.

    Each task writes its own part file — the distributed counterpart of the
    reference's driver-side Turtle report export (report_io.py keeps that
    path for catalog-sized reports)."""
    ntriples_lines(df, quads=quads).write.mode(mode).text(path)


__all__ = ["read_ntriples", "parse_ntriples", "ntriples_lines", "write_ntriples"]
