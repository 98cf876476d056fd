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
