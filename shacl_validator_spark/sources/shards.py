"""Training-shard export: the hand-off from the data pipeline to the
trainer.

Published pre-training recipes consume the corpus as N fixed shards of
JSONL (or equivalent), each with an auditable manifest — doc counts,
token counts, a content checksum — so the trainer (and anyone re-running
the pipeline) can verify the delivery without re-reading the data.  The
reference app's analogue is its downloadable report export
(SHACLValidationService.ts:426-583): a self-describing artifact handed
across a system boundary.

Design:

- ``shard_assign`` — deterministic shard id from md5(id) (the same
  engine-portable hash family as ``sampling.hash_sample`` and
  ``packing.pack_windows``): same doc → same shard, forever, in every
  engine.  Narrow map, no shuffle.
- ``shard_manifest`` — one row per shard: ``n_docs``, ``n_tokens``
  (``TOKEN_PATTERN`` contract), ``text_bytes``, and ``content_xor`` — the
  bit-XOR of each doc's 60-bit md5-prefix.  XOR is order-insensitive and
  overflow-free, so the aggregate is reproducible across engines and
  partitionings; by construction it cannot distinguish a shard from one
  where the SAME multiset of texts appears twice more (duplicates cancel
  in pairs) — acceptable for a delivery checksum whose threat model is
  corruption/truncation, not an adversary.
- ``write_training_shards`` — writes ``shard=K/`` JSONL partitions plus a
  ``_manifest.json`` (one line per shard + a params header).  The
  manifest is computed from the SAME DataFrame that was written, and the
  collect is bounded by ``n_shards`` rows.

Scale notes (100 TB): shard assignment and the JSONL encode are narrow;
``partitionBy("shard")`` writes each task's rows into its shard directory
WITHOUT a shuffle (files per shard = upstream partitions that hold rows
of that shard — at scale you want many files per shard anyway; pass
``one_file_per_shard=True`` only for small exports where single-file
shards are worth one repartition shuffle).  The manifest aggregation is
one map-side-combined groupBy on the shard id (n_shards output rows).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import token_count
from ..operators.sampling import md5_prefix32


def shard_assign(df: DataFrame, n_shards: int, id_col: str = "doc_id") -> DataFrame:
    """Add a deterministic ``shard`` column in ``[0, n_shards)``."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    h = md5_prefix32(F.col(id_col).cast("string"))
    return df.withColumn("shard", (h % F.lit(n_shards)).cast("int"))


def shard_manifest(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-shard delivery manifest: ``(shard, n_docs, n_tokens,
    text_bytes, content_xor)``.  Empty shards are absent (a delivery with
    0 docs has nothing to verify); callers that need a dense spine join
    against ``spark.range(n_shards)``."""
    return _manifest_agg(shard_assign(df, n_shards, id_col), text_col)


def _manifest_agg(sharded: DataFrame, text_col: str) -> DataFrame:
    """The manifest aggregation over a relation that already carries a
    ``shard`` column (freshly assigned, or read back from ``shard=K/``
    partition directories)."""
    doc_sig = F.conv(
        F.substring(F.md5(F.col(text_col)), 1, 15), 16, 10
    ).cast("bigint")
    return sharded.groupBy(F.col("shard").cast("int").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col(text_col))).alias("n_tokens"),
        F.sum(F.octet_length(F.col(text_col)).cast("bigint")).alias("text_bytes"),
        F.bit_xor(doc_sig).alias("content_xor"),
    )


def write_training_shards(
    docs: DataFrame,
    out_dir: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    one_file_per_shard: bool = False,
) -> list[dict]:
    """Write the corpus as ``shard=K/`` JSONL partitions under ``out_dir``
    plus ``out_dir/_manifest.json``; returns the manifest rows (ordered by
    shard) so callers can assert on the delivery.

    The manifest is computed by READING BACK the JSONL that was written —
    not by re-executing the input lineage — so it describes the delivered
    bytes even when ``docs`` has a non-deterministic upstream (a sample,
    a source overwritten between actions).  Cost: one scan of the written
    files, which is exactly the audit a consumer would run anyway."""
    s = shard_assign(docs, n_shards, id_col)
    if one_file_per_shard:
        s = s.repartition(n_shards, "shard")
    data_dir = os.path.join(out_dir, "data")
    s.write.mode("overwrite").partitionBy("shard").json(data_dir)
    # explicit schema: skips the inference pass and keeps an all-empty
    # delivery readable (schema inference fails on zero files)
    written = docs.sparkSession.read.schema(s.schema).json(data_dir)
    rows = _manifest_agg(written, text_col).orderBy("shard").collect()
    manifest = [r.asDict() for r in rows]
    header = {
        "n_shards": n_shards,
        "id_col": id_col,
        "text_col": text_col,
        "total_docs": int(sum(m["n_docs"] for m in manifest)),
        "total_tokens": int(sum(m["n_tokens"] for m in manifest)),
    }
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        f.write(json.dumps(header) + "\n")
        for m in manifest:
            f.write(json.dumps(m) + "\n")
    return manifest
