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

Escape handling: the full RDF 1.1 N-Triples escape surface decodes
JVM-side — the ECHAR set ``\t \b \n \r \f \" \' \\`` by literal replaces
and the numeric ``\uXXXX`` / ``\UXXXXXXXX`` UCHARs by hex→UTF-16BE
decoding with surrogate-pair math (Virtuoso/Blazegraph-style dumps
\u-escape non-ASCII).  The decode is collision-free (no in-band
sentinel): every code point, including U+0000 and the pack separator
U+001F, round-trips bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import TRIPLE_COLUMNS, XSD

XSD_STRING = XSD + "string"

# field separator for the one-regex-execution pack (see parse_ntriples):
# raw U+001F (unit separator) is legal only INSIDE literals (and then
# rare); a branch-free pre-replace rewrites it to its backslash-u001F escape, which
# the escape decoder later restores — so every spec-valid line parses
# bit-exactly and the separator can never be forged
_SEP = "\x1f"

# One statement per line: subject predicate object [graph] '.' [# comment]
# Groups: 1 subject, 2 predicate, 3 object term, 4 optional graph label.
# A trailing comment after the terminating dot is valid N-Triples (the W3C
# positive-syntax suite includes it).
_STMT_RE = (
    r"^[ \t]*(<[^<>\"{}|^`\\ ]*>|_:\S+)"
    r"[ \t]+(<[^<>\"{}|^`\\ ]*>)"
    r"[ \t]+(<[^<>\"{}|^`\\ ]*>|_:\S+|\"(?:[^\"\\]|\\.)*\""
    r"(?:@[A-Za-z][A-Za-z0-9]*(?:-[A-Za-z0-9]+)*|\^\^<[^<>\"{}|^`\\ ]*>)?)"
    r"(?:[ \t]+(<[^<>\"{}|^`\\ ]*>|_:\S+))?"
    r"[ \t]*\.[ \t]*(?:#.*)?$"
)

def _decode_uchar_piece(piece: Column) -> Column:
    r"""Decode a leading ``\uXXXX`` / ``\UXXXXXXXX`` numeric escape (the
    piece is produced by a lookahead split, so the escape — if present —
    is at position 0 and fully hex-valid).  Pure built-ins: the code point
    becomes UTF-16BE bytes (surrogate-pair math for astral points, since
    Spark's ``decode`` charset whitelist has UTF-16BE but not UTF-32) and
    ``decode(unhex(...))`` turns them into the character."""
    is_u4 = piece.rlike(r"^\\u[0-9A-Fa-f]{4}")
    is_u8 = piece.rlike(r"^\\U[0-9A-Fa-f]{8}")
    hex4 = F.substring(piece, 3, 4)
    n8 = F.conv(F.substring(piece, 3, 8), 16, 10).cast("long")
    m = n8 - F.lit(0x10000)
    hi = F.lit(0xD800) + F.shiftright(m, 10)
    lo = F.lit(0xDC00) + m.bitwiseAND(F.lit(0x3FF))
    pair_hex = F.when(n8 <= 0xFFFF, F.lpad(F.hex(n8), 4, "0")).otherwise(
        F.concat(F.lpad(F.hex(hi), 4, "0"), F.lpad(F.hex(lo), 4, "0"))
    )
    return (
        F.when(
            is_u4,
            F.concat(F.decode(F.unhex(hex4), "UTF-16BE"), F.substr(piece, F.lit(7))),
        )
        .when(
            is_u8,
            F.concat(F.decode(F.unhex(pair_hex), "UTF-16BE"), F.substr(piece, F.lit(11))),
        )
        .otherwise(piece)
    )


_UCHAR_SPLIT = r"(?=\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})"


def _unescape(col: Column) -> Column:
    r"""Decode the N-Triples string escapes (full ECHAR set ``\t \b \n \r
    \f \" \' \\`` plus UCHAR ``\uXXXX`` / ``\UXXXXXXXX``), JVM-side and
    collision-free: split on ``\\`` (the escaped backslash) first — inside
    a segment no ``\\`` can remain, so ``\\n`` correctly decodes to
    backslash + 'n', not a newline — decode ECHARs by literal replace and
    UCHARs by a lookahead split + hex→UTF-16BE decode, then rejoin with a
    literal backslash.  No in-band sentinel: any code point, including
    U+0000, round-trips.  An invalid escape (e.g. ``\z``, ``\uZZ``)
    passes through as written rather than corrupting neighbours.

    The whole decode is gated on ``contains('\\')`` — the overwhelmingly
    common escape-free literal pays one scan, not the split machinery."""

    def _seg(seg: Column) -> Column:
        s = F.replace(seg, F.lit('\\"'), F.lit('"'))
        s = F.replace(s, F.lit("\\'"), F.lit("'"))
        s = F.replace(s, F.lit("\\n"), F.lit("\n"))
        s = F.replace(s, F.lit("\\r"), F.lit("\r"))
        s = F.replace(s, F.lit("\\t"), F.lit("\t"))
        s = F.replace(s, F.lit("\\b"), F.lit("\b"))
        s = F.replace(s, F.lit("\\f"), F.lit("\f"))
        # ECHAR patterns are disjoint from the \u/\U prefixes, so the
        # numeric pass sees exactly the original UCHAR sequences
        return F.array_join(
            F.transform(F.split(s, _UCHAR_SPLIT, -1), _decode_uchar_piece), ""
        )

    # regex '\\\\\\\\' = two literal backslashes; limit -1 keeps trailing
    # empty segments so a terminal escaped backslash survives the rejoin
    decoded = F.array_join(F.transform(F.split(col, "\\\\\\\\", -1), _seg), "\\")
    return F.when(col.contains("\\"), decoded).otherwise(col)


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
      ``.nt.gz`` decompresses by extension, but gzip is NOT splittable —
      one task per file; publish dumps as many medium parts (or zstd/bzip2)
      for parallel reads.
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
    unchanged (streaming/stream.py:ntriples_stream).

    Hot-path shape: the master regex executes per line as a single
    ``regexp_replace`` that rewrites the matched line into a
    U+001F-separated 4-field pack, which a literal ``split`` then indexes
    (four separate ``regexp_extract`` calls re-run the same match per
    group — measured ~2.7× the parse cost at dump scale).  The pack is
    made EXACT without any per-row branch (a conditional — whether per
    field or as one struct — defeats whole-stage-codegen subexpression
    elimination; both forms measured 35-75 % slower): a raw U+001F, which
    is spec-legal only inside literals (STRING_LITERAL_QUOTE excludes
    only ``"`` ``\\`` LF CR), is first rewritten to its ``\\u001F``
    numeric escape by a cheap non-regex replace — the escape decoder
    later in this very pipeline turns it back into the identical code
    point, so the literal round-trips bit-exactly, while a U+001F
    OUTSIDE a literal (truly ill-formed) makes the grammar fail to match
    and reports unparseable.  After the rewrite no line contains the
    separator, so ``size(parts) == 4 ⇔ matched`` with no counterexample.
    """
    content = lines.filter(~F.col("value").rlike(r"^[ \t]*(#.*)?$")).select(
        F.replace(F.col("value"), F.lit(_SEP), F.lit("\\u001F")).alias("value")
    )

    packed = F.regexp_replace(
        "value", _STMT_RE, _SEP.join(f"${i}" for i in range(1, 5))
    )
    parts = F.split(packed, _SEP, -1)
    matched = F.size(parts) == 4

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

    def _field(i: int) -> Column:
        return F.get(parts, i - 1)

    s, p, o, g = _field(1), _field(2), _field(3), _field(4)

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
    parsed = parsed.select(*TRIPLE_COLUMNS)  # canonical column order
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
        # bnode graph labels serialize bare (angle brackets would launder
        # the label into an IRI named graph)
        parts.append(
            F.when(
                F.col("graph").startswith("_:"),
                F.concat(F.lit(" "), F.col("graph")),
            )
            .when(
                F.col("graph").isNotNull(),
                F.concat(F.lit(" <"), F.col("graph"), F.lit(">")),
            )
            .otherwise(F.lit(""))
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
