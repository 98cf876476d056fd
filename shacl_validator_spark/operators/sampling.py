"""Deterministic corpus sampling for training-data mix construction.

Pre-training mixes are built by re-weighting sources/languages (domain
balancing, upsampling rare languages): the primitives are (a) a
reproducible keep/drop decision per document at a target rate and (b) an
exact per-stratum quota.  Both are implemented so the SAME decision is
reproducible in any engine (md5 of the id, not an RNG): re-running the
job, resuming a partition, or auditing a sample in DuckDB all see the
identical row set — the property a pipeline needs for exactly-once
semantics across retries.

Scale notes (100 TB):
- ``hash_sample`` is a narrow map (one md5 + compare per row, no state,
  no shuffle) — it composes with scans and pushes work to the source
  stage; this is the preferred primitive at scale.
- ``stratified_sample`` needs a total order per stratum, i.e. one shuffle
  keyed by the strata columns.  A hot stratum (half the corpus in 'en')
  concentrates on one task; when k ≪ stratum size, pre-thin with
  ``hash_sample`` at a rate that keeps ≥ k rows per stratum with
  overwhelming probability (e.g. 10·k/min_stratum_size), then rank the
  survivors — the window then runs over a k-proportional relation.  The
  ranking key is md5(id), so pre-thinning by md5-prefix keeps EXACTLY the
  rows the full ranking would have chosen (both orderings are the same
  hash order), making the two-phase plan output-identical, not
  approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hash_key(id_col: str) -> F.Column:
    return F.md5(F.col(id_col).cast("string"))


def hash_sample(df: DataFrame, fraction: float, id_col: str = "doc_id") -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose md5(id) falls
    below the threshold.  Same id → same decision, forever, in every
    engine (the first 8 hex chars are compared as a uniform 32-bit value).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    threshold = int(fraction * 0x100000000)
    bucket = F.conv(F.substring(_hash_key(id_col), 1, 8), 16, 10).cast("decimal(20,0)")
    return df.filter(bucket < F.lit(threshold))


def mix_weights(
    df: DataFrame,
    group_col: str,
    target: dict[str, float],
    weight_cap: float | None = None,
) -> DataFrame:
    """Per-group sampling weights that turn the corpus's natural group mix
    into a ``target`` mix — the domain-reweighting step of training-mix
    construction (e.g. upweight books, downweight boilerplate-heavy web).

    For each group g with n_g rows out of N total and target fraction t_g,
    ``weight = t_g / (n_g / N)``: the expected-repetition factor per row
    (< 1 ⇒ subsample at that rate via ``hash_sample``; > 1 ⇒ repeat docs
    ~weight times, the standard epoch-fraction bookkeeping).  Groups absent
    from ``target`` get weight 0 (dropped from the mix).  ``weight_cap``
    bounds upsampling (repetition hurts past ~4 epochs in published
    scaling studies); capped groups are flagged so the caller can renorm.

    One aggregation keyed by ``group_col`` (map-side combined; group
    cardinality is sources/languages — tiny), then the scalar total is
    broadcast back onto the per-group rows: no unpartitioned window, no
    second shuffle, no driver collect of data rows.
    """
    if not target:
        raise ValueError("target mix must be non-empty")
    tmap = F.create_map(
        *[F.lit(x) for kv in target.items() for x in (kv[0], float(kv[1]))]
    )
    per = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_rows"))
    tot = per.agg(F.sum("n_rows").alias("_tot"))
    out = per.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_rows",
        (F.col("n_rows") / F.col("_tot")).alias("natural_frac"),
        F.coalesce(tmap[F.col(group_col)], F.lit(0.0)).alias("target_frac"),
    ).withColumn(
        "raw_weight",
        F.when(F.col("n_rows") > 0, F.col("target_frac") / F.col("natural_frac")),
    )
    if weight_cap is not None:
        out = out.withColumn(
            "weight", F.least(F.col("raw_weight"), F.lit(float(weight_cap)))
        ).withColumn("capped", F.col("raw_weight") > F.lit(float(weight_cap)))
    else:
        out = out.withColumn("weight", F.col("raw_weight")).withColumn(
            "capped", F.lit(False)
        )
    return out.drop("raw_weight")


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact ``k`` rows per stratum, chosen deterministically: rank by
    md5(id) within each stratum (id as tiebreak) and keep rank ≤ k.
    Strata smaller than k are kept whole.
    """
    w = Window.partitionBy(*strata_cols).orderBy(_hash_key(id_col), F.col(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
