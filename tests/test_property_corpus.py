"""Property-based differential tests for the round-3 corpus operators:
``chunk_dedup`` and ``unigram_logprob`` vs independent pure-Python
references on randomized corpora (tiny alphabet so chunk/token collisions
actually occur)."""

from __future__ import annotations

import math
import os
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from shacl_validator_spark.functions.text import TOKEN_PATTERN
from shacl_validator_spark.operators.dedup import chunk_dedup
from shacl_validator_spark.operators.quality import unigram_logprob

word_st = st.sampled_from(["aa", "bb", "cc", "dd", "Aa", "BB"])
text_st = st.lists(word_st, min_size=1, max_size=9).map(" ".join)
corpus_st = st.lists(text_st, min_size=1, max_size=6)


def ref_chunk_dedup(texts: list[str], window: int, max_docs: int):
    # chunk CONTENT case-preserving, frequency KEY lowercased — the
    # operator's contract
    chunks_per_doc = []
    for t in texts:
        toks = re.sub(r"\s+", " ", t).strip().split(" ")
        chunks_per_doc.append(
            [
                " ".join(toks[i * window : (i + 1) * window])
                for i in range((len(toks) - 1) // window + 1)
            ]
        )
    ndocs: dict[str, set[int]] = {}
    for d, chunks in enumerate(chunks_per_doc):
        for c in chunks:
            ndocs.setdefault(c.lower(), set()).add(d)
    out = {}
    for d, chunks in enumerate(chunks_per_doc):
        kept = [c for c in chunks if len(ndocs[c.lower()]) < max_docs]
        out[d] = (len(chunks), len(kept), " ".join(kept))
    return out


@given(corpus=corpus_st, window=st.integers(1, 3), max_docs=st.integers(2, 3))
@settings(
    max_examples=int(os.environ.get("PROP_EXAMPLES", "25")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_chunk_dedup_matches_reference(spark, corpus, window, max_docs):
    docs = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["clean_text"])
        for r in chunk_dedup(docs, window=window, max_docs=max_docs).collect()
    }
    assert got == ref_chunk_dedup(corpus, window, max_docs)


def ref_unigram_logprob(texts: list[str]):
    tok_re = re.compile(TOKEN_PATTERN)
    doc_toks = [tok_re.findall(t.lower()) for t in texts]
    freq: dict[str, int] = {}
    for toks in doc_toks:
        for t in toks:
            freq[t] = freq.get(t, 0) + 1
    total = sum(freq.values())
    out = {}
    for d, toks in enumerate(doc_toks):
        if not toks:
            continue  # no token rows -> doc absent from the aggregation
        lp = sum(math.log(freq[t] / total) for t in toks) / len(toks)
        out[d] = (len(toks), round(lp, 6))
    return out


@given(corpus=corpus_st)
@settings(
    max_examples=int(os.environ.get("PROP_EXAMPLES", "25")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_unigram_logprob_matches_reference(spark, corpus):
    docs = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], round(r["logprob"], 6))
        for r in unigram_logprob(docs).collect()
    }
    exp = ref_unigram_logprob(corpus)
    assert set(got) == set(exp)
    for d in exp:
        assert got[d][0] == exp[d][0]
        assert math.isclose(got[d][1], exp[d][1], abs_tol=2e-6)


# --- round-3 late additions: bpe_encode and dsir_weights -----------------

merge_st = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "aa", "ab", "ba", "bb"]),
        st.sampled_from(["a", "b", "aa", "ab", "ba", "bb"]),
    ),
    min_size=1,
    max_size=5,
)
bpe_word_st = st.text(alphabet="ab", min_size=1, max_size=6)
bpe_text_st = st.lists(bpe_word_st, min_size=0, max_size=6).map(" ".join)
bpe_corpus_st = st.lists(bpe_text_st, min_size=1, max_size=4)


def ref_bpe_encode(text: str, merges):
    toks = re.findall(TOKEN_PATTERN, text.lower())
    out = []
    for w in toks:
        syms = list(w)
        for lhs, rhs in merges:
            acc = []
            for x in syms:
                if acc and acc[-1] == lhs and x == rhs:
                    acc[-1] = lhs + rhs
                else:
                    acc.append(x)
            syms = acc
        out += syms
    return out


@given(corpus=bpe_corpus_st, merges=merge_st, batch=st.sampled_from([None, 1, 2]))
@settings(
    max_examples=int(os.environ.get("PROP_EXAMPLES", "15")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_bpe_encode_matches_reference(spark, tmp_path_factory, corpus, merges, batch):
    from shacl_validator_spark.operators.quality import bpe_encode

    docs = spark.createDataFrame(list(enumerate(corpus)), "doc_id long, text string")
    scratch = (
        str(tmp_path_factory.mktemp("bpe_prop")) if batch is not None else None
    )
    got = {
        r["doc_id"]: r["pieces"]
        for r in bpe_encode(
            docs, merges, batch_size=batch, scratch_dir=scratch
        ).collect()
    }
    assert got == {d: ref_bpe_encode(t, merges) for d, t in enumerate(corpus)}


def ref_dsir(raw, tgt, n_buckets, smoothing=1.0):
    import hashlib

    def grams(text):
        toks = re.findall(TOKEN_PATTERN, text.lower())
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets

    tc = [0] * n_buckets
    rc = [0] * n_buckets
    for t in tgt:
        for g in grams(t):
            tc[bucket(g)] += 1
    for _, t in raw:
        for g in grams(t):
            rc[bucket(g)] += 1
    T, R, s = sum(tc), sum(rc), smoothing
    lr = [
        math.log((tc[b] + s) / (T + s * n_buckets))
        - math.log((rc[b] + s) / (R + s * n_buckets))
        for b in range(n_buckets)
    ]
    return {
        d: (len(grams(t)), sum(lr[bucket(g)] for g in grams(t)))
        for d, t in raw
        if grams(t)
    }


@given(
    raw=st.lists(text_st, min_size=1, max_size=5),
    tgt=st.lists(text_st, min_size=1, max_size=3),
)
@settings(
    max_examples=int(os.environ.get("PROP_EXAMPLES", "15")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_dsir_weights_matches_reference(spark, raw, tgt):
    from shacl_validator_spark.operators.sampling import dsir_weights

    raw_rows = list(enumerate(raw))
    raw_df = spark.createDataFrame(raw_rows, "doc_id long, text string")
    tgt_df = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(tgt)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_feats"], r["log_weight"])
        for r in dsir_weights(raw_df, tgt_df, n_buckets=32).collect()
    }
    want = ref_dsir(raw_rows, tgt, 32)
    assert set(got) == set(want)
    for d, (n, lw) in want.items():
        assert got[d][0] == n
        assert abs(got[d][1] - round(lw, 6)) <= 2e-6
