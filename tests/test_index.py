"""Retrieval-index operators: inverted index and fixed-point tf-idf."""

from __future__ import annotations

import pytest

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


def test_bm25_rank_hand_math(spark):
    """BM25 against a hand-computed reference on a 4-doc fixture."""
    import math

    from shacl_validator_spark.operators.index import bm25_rank

    docs = [
        (1, "hash join hash join hash"),      # tf(hash)=3 tf(join)=2 dl=5
        (2, "window sort window"),            # tf(window)=2 dl=3
        (3, "hash scan filter scan"),         # tf(hash)=1 dl=4
        (4, "merge sort group"),              # no query terms, dl=3
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    query, k1, b = ["hash", "join", "window"], 1.2, 0.75
    n, avgdl = 4, (5 + 3 + 4 + 3) / 4.0

    def idf(dfreq):
        return math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))

    def part(tf, dl):
        return tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    want = {
        1: round(idf(2) * part(3, 5) + idf(1) * part(2, 5), 6),
        2: round(idf(1) * part(2, 3), 6),
        3: round(idf(2) * part(1, 4), 6),
    }
    got = {r["doc_id"]: (r["score"], r["rank"]) for r in bm25_rank(df, query, k=10).collect()}
    assert set(got) == {1, 2, 3}  # doc 4 matches nothing
    for d in want:
        assert got[d][0] == pytest.approx(want[d], abs=2e-6), d
    # ranking order: doc 1 carries two matching terms incl. a rarer one
    assert [d for d, (s, r) in sorted(got.items(), key=lambda kv: kv[1][1])] == sorted(
        want, key=lambda d: (-want[d], d)
    )
    # k truncates
    assert bm25_rank(df, query, k=1).count() == 1
    with pytest.raises(ValueError):
        bm25_rank(df, [], k=1)


def test_bm25_rank_query_term_multiplicity(spark):
    """A term repeated in the query weights its component once per
    occurrence (bag-of-words), so ['hash','hash','join'] doubles the
    hash component — not identical to ['hash','join']."""
    import math

    from shacl_validator_spark.operators.index import bm25_rank

    docs = [
        (1, "hash join hash join hash"),
        (2, "window sort window"),
        (3, "hash scan filter scan"),
        (4, "merge sort group"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    k1, b = 1.2, 0.75
    n, avgdl = 4, (5 + 3 + 4 + 3) / 4.0

    def idf(dfreq):
        return math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))

    def part(tf, dl):
        return tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    got = {
        r["doc_id"]: r["score"]
        for r in bm25_rank(df, ["hash", "hash", "join"], k=10).collect()
    }
    want = {
        1: round(2 * idf(2) * part(3, 5) + idf(1) * part(2, 5), 6),
        3: round(2 * idf(2) * part(1, 4), 6),
    }
    assert set(got) == {1, 3}
    for d, w in want.items():
        assert got[d] == pytest.approx(w, abs=2e-6), d
    single = {
        r["doc_id"]: r["score"]
        for r in bm25_rank(df, ["hash", "join"], k=10).collect()
    }
    assert got[3] != single[3]  # multiplicity actually changes the score
