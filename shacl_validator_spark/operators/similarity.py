"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline, plus an LSH-bucketed
variant as the 100 TB scale path — random-hyperplane (SimHash) signatures
bucket the vectors so each probe joins only its bucket, trading recall for
a ~buckets× reduction in compared pairs.

Dot products/norms are `F.aggregate`/`F.zip_with` column expressions —
JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_double(a):
    """float[] → double[]: keeps accumulation in double on both engines so
    results are comparable bit-for-bit with the DuckDB oracle."""
    return F.transform(a, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: cross-join queries × vectors, window top-k.

    Correct at any scale only when ``queries`` is small (it is broadcast);
    the vectors side streams through without a shuffle until the final
    per-query top-k (TakeOrdered per partition then merge).
    Returns (query_id, vec_id, cos) with rank ≤ k.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("_qid"), as_double(F.col(vec_col)).alias("_qvec")
        )
    )
    scored = vectors.select(
        F.col(id_col), as_double(F.col(vec_col)).alias(vec_col)
    ).join(q).withColumn(
        "cos",
        F.round(_dot(F.col(vec_col), F.col("_qvec")) / (_norm(F.col(vec_col)) * _norm(F.col("_qvec"))), 6),
    )
    w = Window.partitionBy("_qid").orderBy(F.desc("cos"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id_col),
            F.col(id_col),
            F.col("cos"),
            F.col("rank"),
        )
    )


def cosine_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 64,
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cos ≥ threshold).

    Default path blocks candidates by random-hyperplane signature (only
    same-bucket pairs are scored — the 10^12-row scale path; high-cosine
    pairs collide with probability (1 - θ/π)^planes).  ``exact=True``
    scores all pairs (O(n²), small corpora / oracle checks only).
    """
    v = vectors.select(F.col(id_col).alias("_id"), as_double(F.col(vec_col)).alias("_v"))
    if not exact:
        v = v.withColumn("sig", _hyperplane_sig(F.col("_v"), n_planes, dim))
        join_cond = ["sig"]
        pairs = v.alias("a").join(v.alias("b"), join_cond).filter(
            F.col("a._id") < F.col("b._id")
        )
    else:
        pairs = v.alias("a").join(v.alias("b"), F.col("a._id") < F.col("b._id"))
    return (
        pairs.withColumn(
            "cos",
            F.round(
                _dot(F.col("a._v"), F.col("b._v"))
                / (_norm(F.col("a._v")) * _norm(F.col("b._v"))),
                6,
            ),
        )
        .filter(F.col("cos") >= threshold)
        .select(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"), F.col("cos")
        )
    )


def _hyperplane_sig(vec, n_planes: int, dim: int) -> F.Column:
    """Random-hyperplane signature: plane p's normal components are
    deterministic pseudo-randoms sin(xxhash64(p, i)) — reproducible with no
    RNG state; sign of <v, plane> gives bit p."""
    def plane_dot(p):
        return F.aggregate(
            F.zip_with(
                vec,
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda i: F.sin(F.xxhash64(F.lit(p), i).cast("double") / 1e9),
                ),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        sig = sig + F.when(plane_dot(p) > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane bucket join.

    Probe joins only its signature bucket (equi-join on sig) → each query
    touches ~n/2^planes vectors. Recall is tunable via n_planes; the scale
    path for ANN at 10^12 rows (bucket-partitioned, co-located join).
    """
    v = vectors.select(F.col(id_col), as_double(F.col(vec_col)).alias(vec_col)).withColumn(
        "sig", _hyperplane_sig(F.col(vec_col), n_planes, dim)
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("_qid"), as_double(F.col(vec_col)).alias("_qvec")
        ).withColumn("sig", _hyperplane_sig(F.col("_qvec"), n_planes, dim))
    )
    scored = v.join(q, "sig").withColumn(
        "cos",
        F.round(_dot(F.col(vec_col), F.col("_qvec")) / (_norm(F.col(vec_col)) * _norm(F.col("_qvec"))), 6),
    )
    w = Window.partitionBy("_qid").orderBy(F.desc("cos"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_qid").alias(query_id_col), F.col(id_col), F.col("cos"), F.col("rank"))
    )
