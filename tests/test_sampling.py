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


def _py_dsir(raw, tgt, n_buckets, smoothing=1.0):
    """Pure-Python DSIR reference over (id, text) tuples."""
    import hashlib
    import math
    import re

    pat = re.compile(r"[A-Za-z0-9]+(?:'[a-z]+)?")

    def grams(text):
        toks = pat.findall(text.lower())
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets

    tc = [0] * n_buckets
    rc = [0] * n_buckets
    for _, text in tgt:
        for g in grams(text):
            tc[bucket(g)] += 1
    for _, text in raw:
        for g in grams(text):
            rc[bucket(g)] += 1
    T, R = sum(tc), sum(rc)
    s = smoothing
    lr = [
        math.log((tc[b] + s) / (T + s * n_buckets))
        - math.log((rc[b] + s) / (R + s * n_buckets))
        for b in range(n_buckets)
    ]
    out = {}
    for did, text in raw:
        gs = grams(text)
        if gs:
            out[did] = (len(gs), round(sum(lr[bucket(g)] for g in gs), 6))
    return out


def test_dsir_weights_differential(spark):
    from shacl_validator_spark.operators.sampling import dsir_weights

    raw = [
        (1, "the cat sat on the mat"),
        (2, "stock market prices rose sharply today"),
        (3, "the dog sat on the log"),
        (4, "buy cheap pills online now cheap pills"),
        (5, ""),  # zero-feature doc: must be absent from the output
        (6, "the cat and the dog sat"),
    ]
    tgt = [
        (101, "the cat sat quietly"),
        (102, "a dog sat on a mat"),
    ]
    n_buckets = 64
    raw_df = spark.createDataFrame(raw, ["doc_id", "text"])
    tgt_df = spark.createDataFrame(tgt, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_feats"], r["log_weight"])
        for r in dsir_weights(raw_df, tgt_df, n_buckets=n_buckets).collect()
    }
    want = _py_dsir(raw, tgt, n_buckets)
    assert set(got) == set(want)  # doc 5 absent from both
    for did in want:
        assert got[did][0] == want[did][0], did
        assert got[did][1] == pytest.approx(want[did][1], abs=2e-6), did
    # documents that look like the target score higher than off-target ones
    assert got[1][1] > got[2][1]
    assert got[3][1] > got[4][1]


def test_dsir_weights_target_shift_moves_scores(spark):
    """Re-fitting with a different target must re-rank: the finance doc
    wins under a finance target corpus."""
    from shacl_validator_spark.operators.sampling import dsir_weights

    raw = [
        (1, "the cat sat on the mat"),
        (2, "stock market prices rose sharply today"),
    ]
    raw_df = spark.createDataFrame(raw, ["doc_id", "text"])
    fin = spark.createDataFrame(
        [(201, "stock prices and market indexes rose")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_weights(raw_df, fin, n_buckets=64).collect()
    }
    assert got[2] > got[1]


def test_temperature_weights_math_and_limits(spark):
    from shacl_validator_spark.operators.sampling import temperature_weights

    # 3 groups with shares 0.6 / 0.3 / 0.1
    rows = [("en",)] * 60 + [("es",)] * 30 + [("sw",)] * 10
    df = spark.createDataFrame(rows, ["lang"])
    got = {r["lang"]: r for r in temperature_weights(df, "lang", tau=2.0).collect()}
    import math

    ps = [0.6, 0.3, 0.1]
    z = sum(p ** 0.5 for p in ps)
    for lang, p in zip(["en", "es", "sw"], ps):
        q = p ** 0.5 / z
        assert got[lang]["natural_frac"] == pytest.approx(p)
        assert got[lang]["sampled_frac"] == pytest.approx(q)
        assert got[lang]["weight"] == pytest.approx(q / p)
    # rare group upsampled, dominant group downsampled
    assert got["sw"]["weight"] > 1.0 > got["en"]["weight"]
    # tau = 1 keeps the natural mix exactly (all weights 1)
    for r in temperature_weights(df, "lang", tau=1.0).collect():
        assert r["weight"] == pytest.approx(1.0)
        assert r["sampled_frac"] == pytest.approx(r["natural_frac"])
    # expected corpus size is preserved: Σ n_g · w_g = N
    tot = sum(got[l]["n_rows"] * got[l]["weight"] for l in got)
    assert tot == pytest.approx(100.0)
    with pytest.raises(ValueError):
        temperature_weights(df, "lang", tau=0.0)


def test_apply_mix_deterministic_realization(spark):
    """apply_mix realizes fractional weights as exact floor copies plus a
    deterministic md5-fraction extra — differential vs pure Python."""
    import hashlib

    from shacl_validator_spark.operators.sampling import apply_mix

    df = _corpus(spark, 300)  # langs 0/1/2, 100 docs each
    weights = spark.createDataFrame(
        [("0", 2.3), ("1", 0.4), ("2", 0.0)], ["lang", "weight"]
    )
    rows = apply_mix(df, weights, "lang").collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(r["copy_idx"])

    def frac(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) / 2**32

    for did in range(300):
        lang = did % 3
        w = {0: 2.3, 1: 0.4, 2: 0.0}[lang]
        n = int(w) + (1 if frac(did) < w - int(w) else 0)
        if n == 0:
            assert did not in got, did
        else:
            assert sorted(got[did]) == list(range(n)), did
    # expected sizes realized: lang 0 ≈ 230, lang 1 ≈ 40, lang 2 = 0
    n0 = sum(len(v) for d, v in got.items() if d % 3 == 0)
    n1 = sum(len(v) for d, v in got.items() if d % 3 == 1)
    assert 200 <= n0 <= 260 and 25 <= n1 <= 55
    assert not any(d % 3 == 2 for d in got)
