"""Bucketed table writes — the storage-side half of shuffle elimination.

At 100 TB the dominant cost of repeated joins/aggregations on the same key
(doc_id, entity IRI, user_id) is re-shuffling the fact table every query.
Bucketing pays that shuffle ONCE at write time: `bucketBy(n, key)` hashes
rows into a fixed number of files per partition, and every subsequent
equi-join or group-by on the key between two tables bucketed the same way
runs with ZERO exchanges (Spark trusts the on-disk hash distribution;
`sortBy` additionally pre-sorts within buckets so sort-merge joins skip
their sort).  tests/test_bucketing.py asserts the no-Exchange plan.

Bucketed tables must go through the catalog (`saveAsTable`) — a plain
`parquet(path)` write drops the bucket metadata.  Pass ``path`` to keep
the data at an explicit location (external table) rather than under
spark.sql.warehouse.dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    key_cols: list[str],
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (optionally bucket-sorted) parquet table
    registered in the session catalog."""
    w = df.write.mode(mode).format("parquet").bucketBy(buckets, *key_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)
