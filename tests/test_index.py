"""Retrieval-index operators: inverted index and fixed-point tf-idf."""

from __future__ import annotations

from shacl_validator_spark.operators.index import (
    IDF_SCALE,
    doc_terms,
    inverted_index,
    tfidf_topk,
)


def _docs(spark):
    rows = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "apple cherry cherry date"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_terms_tf(spark):
    got = {(r["doc"], r["term"]): r["tf"] for r in doc_terms(_docs(spark)).collect()}
    assert got[(1, "apple")] == 2
    assert got[(3, "cherry")] == 2
    assert got[(2, "banana")] == 1


def test_inverted_index_df_and_postings(spark):
    got = {r["term"]: (r["df"], r["postings"]) for r in inverted_index(_docs(spark)).collect()}
    assert got["apple"] == (2, [1, 3])
    assert got["banana"] == (2, [1, 2])
    assert got["cherry"] == (2, [2, 3])
    assert got["date"] == (1, [3])


def test_inverted_index_postings_cap(spark):
    rows = [(i, "shared") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = inverted_index(df, max_postings=5).collect()[0]
    assert got["df"] == 20
    assert got["postings"] == [0, 1, 2, 3, 4]


def test_tfidf_scores_exact_and_tie_break(spark):
    # N=3 docs; doc 1: apple tf=2 df=2, banana tf=1 df=2
    got = tfidf_topk(_docs(spark), k=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc"], []).append((r["rank"], r["term"], r["score"]))
    idf2 = (3 * IDF_SCALE) // 2  # df=2
    idf1 = (3 * IDF_SCALE) // 1  # df=1
    assert sorted(by_doc[1]) == [(1, "apple", 2 * idf2), (2, "banana", 1 * idf2)]
    # doc 3: date (tf=1, df=1) outranks cherry (tf=2, df=2)? 2*idf2 = 3e6,
    # idf1 = 3e6 — equal scores, tie breaks on term asc: cherry first
    assert sorted(by_doc[3]) == [(1, "cherry", 2 * idf2), (2, "date", idf1)]
    assert 2 * idf2 == idf1  # the tie the test exercises is real
