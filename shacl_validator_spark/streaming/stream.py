"""Structured-Streaming skin over the per-batch validate+merge function.

The reference is strictly batch (SURVEY.md §2.9 — one validation per
click, no incremental evaluation), and the north rule's "resumable from
checkpoint" is satisfied by the batch pipeline's checkpoint manifests.
This module is the optional streaming entry noted in SURVEY.md §7.4: a
``foreachBatch`` wrapper that reuses the exact same extract → validate →
idempotent-MERGE function per micro-batch, so exactly-once carries over
from MERGE idempotence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.pipeline import run_pipeline


def validated_stream_writer(
    spark: SparkSession,
    pages_stream: DataFrame,
    out_dir: str,
    profile: str = "kg_extraction",
    checkpoint_dir: str | None = None,
):
    """``pages_stream.writeStream.foreachBatch(...)`` runner.

    Each micro-batch goes through the full batch pipeline (n_groups=1 —
    the stream's own micro-batching replaces partition groups); Spark's
    streaming checkpoint tracks offsets while the MERGE keys guarantee
    replayed batches insert nothing.
    """

    def per_batch(batch_df: DataFrame, epoch_id: int) -> None:
        run_pipeline(
            spark,
            batch_df,
            out_dir,
            profile=profile,
            n_groups=1,
            resume=False,
        )

    writer = pages_stream.writeStream.foreachBatch(per_batch).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer
