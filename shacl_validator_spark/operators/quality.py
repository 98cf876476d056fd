"""Corpus-quality signals beyond the length/punct/stopword score in
``functions/text.py``: word-repetition profiling (the Gopher-style
"fraction of words in the top word / distinct-word ratio" filters) and
PII scrubbing (email / IPv4 detection + redaction) — both standard gates
in a pre-training data pipeline.

Everything here is pure column expressions over built-in functions —
explode/groupBy for the word profile, regexp_count/regexp_replace for the
scrub — so the whole pass stays inside whole-stage codegen with no Python
in the executor path.

Scale notes (100 TB):
- ``repetition_profile`` shuffles twice, both times keyed by ``id_col``
  ((doc, word) then doc) — the second aggregation reuses the first's
  hash partitioning on the leading key, and word counts combine map-side,
  so the wide intermediate (one row per distinct (doc, word)) never
  concentrates: a pathological doc repeating one word a billion times is
  ONE row after the map-side combine.
- ``pii_scrub`` is a narrow map — no shuffle at all; it composes with any
  downstream filter/write without a stage break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Deliberately simple, RE2-and-Java-compatible patterns (no backrefs, no
# lookaround) so the same literal runs identically in Spark's JVM regex,
# DuckDB's RE2 (the correctness oracle), and any downstream audit tooling.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def repetition_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document word-repetition metrics: ``n_words``, ``n_distinct``,
    ``top_freq`` (occurrences of the most frequent word), plus the derived
    ``distinct_ratio`` and ``top_frac`` used as quality-filter thresholds
    (e.g. drop docs with top_frac > 0.2 — boilerplate/keyword-stuffing).

    Tokenization is lowercased whitespace splitting — the same contract as
    ``functions.text.token_count`` — so the two signals are comparable.
    """
    extra = list(extra_cols or [])
    words = docs.select(
        id_col,
        *extra,
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("_w"),
    ).filter(F.col("_w") != "")
    per_word = words.groupBy(id_col, *extra, "_w").agg(F.count(F.lit(1)).alias("_c"))
    per_doc = per_word.groupBy(id_col, *extra).agg(
        F.sum("_c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("_c").alias("top_freq"),
    )
    return per_doc.select(
        id_col,
        *extra,
        "n_words",
        "n_distinct",
        "top_freq",
        (F.col("n_distinct") / F.col("n_words")).alias("distinct_ratio"),
        (F.col("top_freq") / F.col("n_words")).alias("top_frac"),
    )


def pii_scrub(
    docs: DataFrame,
    text_col: str = "text",
    email_token: str = "<EMAIL>",
    ip_token: str = "<IP>",
) -> DataFrame:
    """Detect and redact email addresses and IPv4 literals in ``text_col``.

    Adds ``n_emails``, ``n_ips``, ``redacted`` (the scrubbed text) and
    ``chars_removed`` (original length − redacted length; negative when the
    replacement token is longer than the match).  Redaction order is
    emails first, then IPs — an IP can never contain an email match, so
    the order is observationally irrelevant, but fixing it keeps the
    output byte-deterministic.
    """
    t = F.col(text_col)
    red = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, email_token), IPV4_RE, ip_token
    )
    return docs.select(
        "*",
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(IPV4_RE)).alias("n_ips"),
        red.alias("redacted"),
        (F.length(t) - F.length(red)).alias("chars_removed"),
    )
