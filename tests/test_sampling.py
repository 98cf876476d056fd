"""Deterministic sampling primitives (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shacl_validator_spark.operators.sampling import hash_sample, stratified_sample


def _corpus(spark, n=900):
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
    )


def test_stratified_sample_exact_k_and_deterministic(spark):
    df = _corpus(spark)
    s1 = stratified_sample(df, ["lang"], 10)
    counts = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"0": 10, "1": 10, "2": 10}
    # same decision on re-run — no RNG anywhere
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    ids2 = sorted(r["doc_id"] for r in stratified_sample(df, ["lang"], 10).collect())
    assert ids1 == ids2
    # strata smaller than k are kept whole
    tiny = df.filter((F.col("lang") != "2") | (F.col("doc_id") < 9))
    got = {r["lang"]: r["n"] for r in stratified_sample(tiny, ["lang"], 10).groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got["2"] == 3


def test_hash_sample_bounds_and_composition(spark):
    df = _corpus(spark)
    assert hash_sample(df, 0.0).count() == 0
    assert hash_sample(df, 1.0).count() == 900
    half = hash_sample(df, 0.5)
    n = half.count()
    assert 350 < n < 550  # uniform hash, generous tolerance
    # deterministic: identical row set on re-run
    assert sorted(r["doc_id"] for r in half.collect()) == sorted(
        r["doc_id"] for r in hash_sample(df, 0.5).collect()
    )
    with pytest.raises(ValueError):
        hash_sample(df, 1.5)
    # two-phase equivalence (the scale path documented in the module):
    # pre-thinning by md5 keeps exactly the rows the full ranking picks,
    # because both use the SAME hash order — so stratified(k) over a
    # pre-thinned corpus equals stratified(k) over the full corpus
    # whenever every stratum keeps >= k survivors
    pre = hash_sample(df, 0.5)
    assert pre.groupBy("lang").count().agg(F.min("count")).collect()[0][0] >= 10
    full_pick = sorted(r["doc_id"] for r in stratified_sample(df, ["lang"], 10).collect())
    thin_pick = sorted(r["doc_id"] for r in stratified_sample(pre, ["lang"], 10).collect())
    assert full_pick == thin_pick


def test_mix_weights_math_cap_and_absent_group(spark):
    from shacl_validator_spark.operators.sampling import mix_weights

    # 600/200/100 rows of a/b/c: natural mix 2/3, 2/9, 1/9
    df = spark.range(0, 900).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 600, "a").when(F.col("id") < 800, "b").otherwise("c").alias("src"),
    )
    w = {r["src"]: r for r in mix_weights(df, "src", {"a": 0.5, "c": 0.5}, weight_cap=3.0).collect()}
    assert w["a"]["n_rows"] == 600 and abs(w["a"]["weight"] - 0.75) < 1e-12
    # b absent from the target -> dropped (weight 0), never capped
    assert w["b"]["target_frac"] == 0.0 and w["b"]["weight"] == 0.0 and not w["b"]["capped"]
    # c wants 4.5x upsampling -> capped at 3.0 and flagged
    assert abs(w["c"]["weight"] - 3.0) < 1e-12 and w["c"]["capped"]
    # uncapped run reports the raw 4.5x
    raw = {r["src"]: r["weight"] for r in mix_weights(df, "src", {"a": 0.5, "c": 0.5}).collect()}
    assert abs(raw["c"] - 4.5) < 1e-12
    import pytest as _pt

    with _pt.raises(ValueError):
        mix_weights(df, "src", {})
