"""Structured-Streaming skin smoke: the foreachBatch wrapper runs the same
validate+MERGE per micro-batch with exactly-once via MERGE idempotence
(SURVEY.md §2.9/§7.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from shacl_validator_spark.model import PAGES_SCHEMA
from shacl_validator_spark.sources.pages import synthesize_pages
from shacl_validator_spark.streaming import validated_stream_writer


def test_stream_foreachbatch(spark, tmp_path):
    src = str(tmp_path / "pages_src")
    out = str(tmp_path / "kg_out")
    ckpt = str(tmp_path / "ckpt")
    synthesize_pages(spark, 60).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(src)
    q = (
        validated_stream_writer(spark, stream, out, checkpoint_dir=ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    merged = spark.read.parquet(f"{out}/triples")
    n1 = merged.count()
    assert n1 > 0

    # restart over the same source: offsets consumed, nothing re-inserted
    q2 = (
        validated_stream_writer(spark, stream, out, checkpoint_dir=ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(f"{out}/triples").count() == n1
