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
from .sampling import md5_prefix32


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
    bucket = (md5_prefix32(F.col(id_col).cast("string")) % buckets).cast("long")
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


def chunk_sliding(
    docs: DataFrame,
    window_words: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping sliding-window chunks of each document — the RAG /
    long-context complement to ``pack_windows`` (that op concatenates and
    cuts ACROSS documents; this one cuts WITHIN a document, preserving
    overlap so no span is lost at a window boundary).

    Words are non-empty whitespace splits of the trimmed text; windows
    start at 0, stride, 2·stride, … strictly below the word count, each
    covering ``window_words`` words (the final windows are naturally
    shorter).  Output: ``(id, chunk_idx, start_word, n_words, chunk)``.
    Empty documents emit no chunks.

    Scale shape: a narrow map with a bounded explode — fan-out per row is
    ceil(n_words / stride), no shuffle, composes with any downstream
    embed/dedup stage.  The word array is bound once as a lambda variable
    (single-element-array transform) so the tokenizer split is not re-run
    per window by lambda inlining, the same Catalyst-CSE workaround as
    ``quality.word_ngrams``.
    """
    if window_words <= 0 or stride <= 0:
        raise ValueError(
            f"window_words and stride must be positive, got {window_words}, {stride}"
        )
    words = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    chunks = F.element_at(
        F.transform(
            F.array(words),
            lambda ws: F.when(
                F.size(ws) > 0,
                F.transform(
                    F.sequence(F.lit(0), F.size(ws) - 1, F.lit(stride)),
                    lambda st: F.struct(
                        st.alias("start_word"),
                        F.least(F.size(ws) - st, F.lit(window_words)).alias(
                            "n_words"
                        ),
                        F.concat_ws(" ", F.slice(ws, st + 1, window_words)).alias(
                            "chunk"
                        ),
                    ),
                ),
            ).otherwise(F.array().cast(
                "array<struct<start_word:int,n_words:int,chunk:string>>"
            )),
        ),
        1,
    )
    return docs.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "_c")
    ).select(
        id_col,
        "chunk_idx",
        F.col("_c.start_word").alias("start_word"),
        F.col("_c.n_words").alias("n_words"),
        F.col("_c.chunk").alias("chunk"),
    )
