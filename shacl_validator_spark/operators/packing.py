"""Sequence packing for training-batch preparation.

The standard LLM data-prep step after cleaning/dedup: documents are laid
end-to-end into a token stream and the stream is cut into fixed-size
windows (GPT-style "concatenate and chunk" — documents straddle window
boundaries rather than leaving padding).  ``pack_windows`` computes, for
every document, where it lands: its shard (bucket), its start offset in
the shard's token stream, and the first/last window it touches.

Spark-first design: a global concatenation order would serialize on one
task, so the corpus is split into ``buckets`` independent shards by
md5(id) — exactly how multi-file training shards are built — and the
offset is an EXCLUSIVE prefix sum per shard (one window function over one
shuffle).  The order within a shard is (md5(id), id): deterministic,
engine-reproducible, and identical to the order ``sampling.hash_sample``
ranks by, so a sampled corpus packs into a prefix of the full corpus's
order.  Token counts use ``functions.text.token_count`` (the same
tokenizer contract as token_stats/decontamination).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import token_count


def pack_windows(
    docs: DataFrame,
    window_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 8,
) -> DataFrame:
    """Assign every document its place in bucketed fixed-window packing.

    Returns the input ids plus: ``bucket`` (shard), ``n_tokens``,
    ``start_offset`` (tokens before this doc in its shard stream),
    ``first_window``/``last_window`` (window indices the doc spans, where
    windows hold ``window_tokens`` tokens each; empty docs occupy a single
    point at their offset).
    """
    if window_tokens <= 0:
        raise ValueError(f"window_tokens must be positive, got {window_tokens}")
    key = F.md5(F.col(id_col).cast("string"))
    bucket = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("decimal(20,0)") % buckets
    ).cast("long")
    d = docs.select(
        F.col(id_col),
        bucket.alias("bucket"),
        key.alias("_k"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("_k", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return d.select(
        id_col,
        "bucket",
        "n_tokens",
        start.alias("start_offset"),
        F.floor(start / window_tokens).alias("first_window"),
        F.floor(
            (start + F.greatest(F.col("n_tokens"), F.lit(1)) - 1) / window_tokens
        ).alias("last_window"),
    )
