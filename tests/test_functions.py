"""Scalar function tests: compaction, local names, language-ID, quality,
tokens, fingerprints, severity mapping."""

from __future__ import annotations

from pyspark.sql import functions as F

from shacl_validator_spark.functions.text import (
    compact_iri,
    doc_fingerprint,
    language_id,
    local_name,
    normalize_lang,
    quality_score,
    severity_from_iri,
    token_count,
)


def _one(spark, col, value):
    return spark.createDataFrame([(value,)], "v string").select(col(F.col("v")).alias("r")).collect()[0].r


def test_compact_iri(spark):
    assert _one(spark, compact_iri, "http://www.w3.org/ns/dcat#Dataset") == "dcat:Dataset"
    assert _one(spark, compact_iri, "http://purl.org/dc/terms/title") == "dct:title"
    assert _one(spark, compact_iri, "http://unknown.org/ns#Thing") == "Thing"
    assert _one(spark, compact_iri, "http://unknown.org/ns/path/Leaf") == "Leaf"


def test_local_name(spark):
    assert _one(spark, local_name, "http://x.org/a#b") == "b"
    assert _one(spark, local_name, "http://x.org/a/b/c") == "c"


def test_normalize_lang(spark):
    assert _one(spark, normalize_lang, "ES-es") == "es"
    assert _one(spark, normalize_lang, "en") == "en"


def test_severity_from_iri(spark):
    assert _one(spark, severity_from_iri, "http://www.w3.org/ns/shacl#Warning") == "Warning"
    assert _one(spark, severity_from_iri, "http://www.w3.org/ns/shacl#Info") == "Info"
    assert _one(spark, severity_from_iri, "http://www.w3.org/ns/shacl#Violation") == "Violation"
    assert _one(spark, severity_from_iri, "anything-else") == "Violation"


def test_language_id(spark):
    assert _one(spark, language_id, "the cat and the dog is in the house") == "en"
    assert _one(spark, language_id, "el gato es de la casa que es grande") == "es"
    assert _one(spark, language_id, "der Hund und die Katze ist ein Tier") == "de"
    assert _one(spark, language_id, "xyzzy plugh") == "und"


def test_token_count(spark):
    assert _one(spark, token_count, "hello world it's fine") == 4
    assert _one(spark, token_count, "") == 0


def test_quality_score_bounds(spark):
    good = "the quick brown fox jumps over the lazy dog and runs to the house in town"
    bad = "!!! ??? ### $$$"
    q_good = _one(spark, quality_score, good)
    q_bad = _one(spark, quality_score, bad)
    assert 0.0 <= q_bad < q_good <= 1.0


def test_fingerprint_whitespace_invariant(spark):
    a = _one(spark, doc_fingerprint, "Hello   World\n")
    b = _one(spark, doc_fingerprint, "  hello world ")
    c = _one(spark, doc_fingerprint, "hello worlds")
    assert a == b
    assert a != c


def test_preprocess_markdown_reference_behavior(spark):
    """F9 — ValidationResults.tsx:131-149: tables untouched, pipe-less
    untouched, pipes → bullets + URL links (angle brackets dropped)."""
    from pyspark.sql import functions as F

    from shacl_validator_spark.functions.text import preprocess_markdown

    table = "| a | b |\n|---|---|\n| 1 | 2 |"
    plain = "no separators here https://x.org/p"
    piped = "Fix the title | see <https://example.org/doc> | then revalidate"
    df = spark.createDataFrame(
        [(1, table), (2, plain), (3, piped)], ["i", "t"]
    ).select("i", preprocess_markdown(F.col("t")).alias("p"))
    got = {r["i"]: r["p"] for r in df.collect()}
    assert got[1] == table
    assert got[2] == plain
    assert got[3] == (
        "Fix the title\n- see [https://example.org/doc](https://example.org/doc)\n- then revalidate"
    )


def test_file_size_and_time_estimate(spark):
    """F14 — ValidatorInput.tsx:192-202 formatting + 0.4 min/MB estimate."""
    from pyspark.sql import functions as F

    from shacl_validator_spark.functions.text import (
        estimate_validation_minutes,
        format_file_size,
    )

    cases = [
        (512, "512 B", 1),
        (1023, "1023 B", 1),
        (1280, "1.3 KB", 1),  # 1.25 KB rounds half away from zero, JS toFixed
        (10 * 1024, "10.0 KB", 1),
        (1024 * 1024, "1.0 MB", 1),
        (int(2.5 * 1024 * 1024), "2.5 MB", 1),
        (10 * 1024 * 1024, "10.0 MB", 4),  # ceil(10 MB * 0.4) = 4 min
    ]
    df = spark.createDataFrame([(b,) for b, _, _ in cases], ["n"]).select(
        "n",
        format_file_size(F.col("n")).alias("s"),
        estimate_validation_minutes(F.col("n")).alias("m"),
    )
    got = {r["n"]: (r["s"], r["m"]) for r in df.collect()}
    for b, s, m in cases:
        assert got[b] == (s, m), b
