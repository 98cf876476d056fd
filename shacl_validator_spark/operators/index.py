"""Retrieval-index construction: inverted index + term-salience top-K.

Building a search index over the corpus is the other half of a web-scale
data platform (the reference's discovery search, P7, is the query side;
this is the indexing side a 10^12-document corpus needs for it to work).
Both operators tokenize with the same ``TOKEN_PATTERN`` contract as
``functions.text.token_count`` / ``quality.vocab_top_k`` so every token
table in the engine is comparable.

Determinism contract (same stance as ``graph.pagerank``): ``tfidf_topk``
scores with a FIXED-POINT RATIONAL idf — ``(N * SCALE) div df`` in bigint
— instead of the float ``ln(N/df)``.  The ranking it induces is the
classic rare-term-salience order (idf is monotone-decreasing in df either
way) while every score is an exact integer, bit-identical across
partitionings and engines; a float-log variant can differ in the last ulp
between reduction orders and flip a rounded tie.  The variant is
documented here precisely because it is a deliberate semantics choice,
not an approximation bug.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from shacl_validator_spark.functions.text import TOKEN_PATTERN

# 1e6 fixed-point units per 1.0 of idf: tf * idf for a corpus of 10^12
# docs with tf up to 10^6 stays far under bigint range.
IDF_SCALE = 10**6


def doc_terms(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct ``(doc, term)`` pairs plus per-doc term frequency ``tf``.

    One tokenizer scan per document (explode), one map-side-combined
    aggregation keyed by (doc, term) — the shuffle carries one row per
    distinct term per doc, not one per occurrence.
    """
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0)
        ).alias("term"),
    )
    return toks.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))


def inverted_index(
    docs: DataFrame,
    max_postings: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(term, df, postings)`` — document frequency plus the first
    ``max_postings`` doc ids (ascending) per term.

    Scale notes (100 TB): the groupBy(term) shuffle carries (doc, term)
    pairs — Zipf-heavy terms are hot keys, but the aggregation buffer per
    term is bounded by ``max_postings`` ONLY after the collect; to bound
    the in-flight array a production run shards hot terms first (the
    salted_count pattern).  Here df is exact (count, map-side combined)
    while postings are explicitly truncated — the standard impact-ordered
    index layout keeps tiers, not full lists, for stop-terms.
    """
    dt = doc_terms(docs, id_col, text_col)
    return dt.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.slice(F.sort_array(F.collect_list("doc")), 1, max_postings).alias("postings"),
    )


def tfidf_topk(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` salient terms per document: ``(doc, term, score, rank)``
    with ``score = tf * ((N * IDF_SCALE) div df)`` as an exact bigint (see
    module docstring for the fixed-point idf contract).

    Ties break deterministically by term (ascending) at equal score.
    Plan shape: the tf table reuses ``doc_terms``; df is one term-keyed
    aggregation; N is a driver scalar (metadata-cheap count); the top-K is
    a doc-partitioned window — row_number over (score desc, term asc) —
    which shuffles once on doc and never builds a global sort.
    """
    n_docs = docs.select(id_col).count()
    dt = doc_terms(docs, id_col, text_col)
    df_tbl = dt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = dt.join(df_tbl, "term").select(
        "doc",
        "term",
        (F.col("tf") * F.expr(f"{n_docs}L * {IDF_SCALE}L div df")).cast("long").alias(
            "score"
        ),
    )
    w = Window.partitionBy("doc").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc", "term", "score", "rank")
    )


def bm25_rank(
    docs: DataFrame,
    query: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Ranked retrieval: top-``k`` documents for a bag-of-words ``query``
    under Okapi BM25 with the Lucene idf form,

        score(d) = Σ_t ln(1 + (N − df + 0.5)/(df + 0.5))
                       · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    summed over the query terms present in ``d`` (a term repeated in the
    query counts once per occurrence).  This is the scored
    upgrade of the reference's substring search
    (DataDiscoveryService.ts:41-47, P7): same entry point — terms in, docs
    out — but ranked, so a 10^12-document corpus returns the k best rows
    instead of the first k matches.  Output: ``(id_col, score, rank)``,
    score rounded to 6 decimals (the cross-engine float contract), ties
    broken by doc id ascending.

    Scale notes (100 TB): the (doc, term) stream is filtered to the query
    terms BEFORE its aggregation, so the only corpus-sized work is the
    tokenizer scan; df/N/avgdl are query-sized and one-row relations,
    broadcast onto the survivors; the top-k is an orderBy+limit —
    TakeOrderedAndProject, never a global sort.  For repeated query loads
    the same formula runs against the materialized ``inverted_index``
    postings instead of re-scanning text.
    """
    if not query:
        raise ValueError("query must be non-empty")
    terms = [t.lower() for t in query]
    # bag-of-words: a term repeated in the query contributes its component
    # once per occurrence (query-side tf as a weight)
    qw_counts: dict[str, int] = {}
    for t in terms:
        qw_counts[t] = qw_counts.get(t, 0) + 1
    qweights = docs.sparkSession.createDataFrame(
        [(t, float(c)) for t, c in sorted(qw_counts.items())],
        "term string, qw double",
    )
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0)
        ).alias("term"),
    )
    # per-doc length and the corpus stats (one-row relation, broadcast)
    dl = docs.select(
        F.col(id_col).alias("doc"),
        F.regexp_count(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN))
        .cast("long")
        .alias("dl"),
    )
    stats = dl.select(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    qtf = (
        toks.filter(F.col("term").isin(terms))
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_tbl = qtf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        qtf.join(F.broadcast(df_tbl), "term")
        .join(F.broadcast(qweights), "term")
        .join(dl, "doc")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc",
            (
                F.col("qw")
                * F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("_s"),
        )
        .groupBy("doc")
        .agg(F.round(F.sum("_s"), 6).alias("score"))
    )
    out = scored.orderBy(F.desc("score"), F.asc("doc")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc"))
    return out.withColumn("rank", F.row_number().over(w)).select(
        F.col("doc").alias(id_col), "score", "rank"
    )
