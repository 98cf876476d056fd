"""Streaming near-dup gate: per-row MinHash signature (aggregation-free)
must equal the batch signature, and signature-identical re-crawls are
dropped within the watermark while distinct docs pass."""

from __future__ import annotations

from pyspark.sql import functions as F

from shacl_validator_spark.operators.dedup import minhash_signatures
from shacl_validator_spark.streaming.dedup import (
    near_dedup_stream,
    streaming_minhash_sig,
)


def test_streaming_sig_equals_batch_sig(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    batch = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures(docs, num_perm=16, shingle_n=3).collect()
    }
    row = {
        r["doc_id"]: list(r["sig"])
        for r in docs.select(
            "doc_id",
            streaming_minhash_sig(F.col("text"), 16, 3).alias("sig"),
        ).collect()
    }
    assert row == batch


def test_near_dedup_stream_drops_signature_dups(spark, tmp_path):
    # doc 2 repeats doc 1's template: SAME shingle set (so same signature)
    # but different bytes — dedup_stream would keep it, the near-dup gate
    # must drop it.  doc 3 is genuinely different and must pass.
    rows = [
        (1, "alpha beta gamma alpha beta gamma", "2024-01-01 00:00:01"),
        (2, "alpha beta gamma alpha beta gamma alpha beta gamma", "2024-01-01 00:00:02"),
        (3, "delta epsilon zeta eta theta", "2024-01-01 00:00:03"),
    ]
    src = str(tmp_path / "docs_src")
    out = str(tmp_path / "neardup_out")
    spark.createDataFrame(rows, "doc_id long, text string, ts_s string").select(
        "doc_id", "text", F.col("ts_s").cast("timestamp").alias("ts")
    ).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("doc_id long, text string, ts timestamp").parquet(src)
    q = (
        near_dedup_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out).collect()
    assert len(got) == 2
    ids = {r["doc_id"] for r in got}
    assert 3 in ids and len(ids & {1, 2}) == 1
    assert len({r["sig_key"] for r in got}) == 2
