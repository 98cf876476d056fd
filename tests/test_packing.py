"""Sequence packing (operators/packing.py): offsets are a dense exact
prefix over each shard stream and window spans are consistent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shacl_validator_spark.operators.packing import pack_windows


def test_pack_windows_offsets_and_spans(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (i % 7))) for i in range(200)],  # incl. empty docs
        "doc_id long, text string",
    )
    p = pack_windows(docs, window_tokens=10, buckets=4).collect()
    assert len(p) == 200
    by_bucket: dict[int, list] = {}
    for r in p:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert set(by_bucket) == {0, 1, 2, 3}
    for b, rows in by_bucket.items():
        rows.sort(key=lambda r: r["start_offset"])
        cum = 0
        for r in rows:
            # offsets are an exact dense prefix sum: no gaps, no overlaps
            assert r["start_offset"] == cum
            cum += r["n_tokens"]
            assert r["first_window"] == r["start_offset"] // 10
            span_end = r["start_offset"] + max(r["n_tokens"], 1) - 1
            assert r["last_window"] == span_end // 10
            assert r["first_window"] <= r["last_window"]
    # determinism across runs
    p2 = pack_windows(docs, window_tokens=10, buckets=4).collect()
    assert sorted(map(tuple, p)) == sorted(map(tuple, p2))
    with pytest.raises(ValueError):
        pack_windows(docs, window_tokens=0)


def test_chunk_sliding_covers_every_word_once_per_window(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),  # 10 words
            (2, "only"),                 # 1 word -> one 1-word chunk
            (3, "   "),                  # whitespace-only -> no chunks
            (4, ""),                     # empty -> no chunks
        ],
        "doc_id long, text string",
    )
    from shacl_validator_spark.operators.packing import chunk_sliding

    rows = chunk_sliding(docs, window_words=4, stride=3).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2}
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    # starts 0,3,6,9; window 4 -> last chunk is the single trailing word
    assert [r["start_word"] for r in c1] == [0, 3, 6, 9]
    assert [r["n_words"] for r in c1] == [4, 4, 4, 1]
    assert c1[0]["chunk"] == "a b c" " d"
    assert c1[-1]["chunk"] == "j"
    # overlap property: consecutive full chunks share window-stride words
    assert c1[0]["chunk"].split()[3:] == c1[1]["chunk"].split()[:1]
    # every word index is covered by at least one chunk
    covered = set()
    for r in c1:
        covered.update(range(r["start_word"], r["start_word"] + r["n_words"]))
    assert covered == set(range(10))
    assert by_doc[2][0]["chunk"] == "only" and by_doc[2][0]["n_words"] == 1


def test_chunk_sliding_rejects_bad_params(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    from shacl_validator_spark.operators.packing import chunk_sliding

    with pytest.raises(ValueError):
        chunk_sliding(docs, 0, 3)
    with pytest.raises(ValueError):
        chunk_sliding(docs, 4, 0)
