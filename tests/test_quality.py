"""Word-repetition profiling, PII scrubbing, and near-dup cluster
consolidation (operators/quality.py, operators/dedup.py::near_dup_clusters)."""

from __future__ import annotations

from pyspark.sql import functions as F

from shacl_validator_spark.operators.dedup import near_dup_clusters
from shacl_validator_spark.operators.quality import (
    pii_scrub,
    repetition_profile,
)


def test_repetition_profile_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "the the the cat"),  # 4 words, 2 distinct, top 'the' ×3
            (2, "a b c d"),  # all distinct
            (3, "  Spaced   out  TEXT text "),  # fold case + multi-space
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_profile(docs).collect()}
    assert rows[1]["n_words"] == 4
    assert rows[1]["n_distinct"] == 2
    assert rows[1]["top_freq"] == 3
    assert abs(rows[1]["top_frac"] - 0.75) < 1e-9
    assert rows[2]["n_distinct"] == 4 and rows[2]["top_freq"] == 1
    assert abs(rows[2]["distinct_ratio"] - 1.0) < 1e-9
    # lowercased: TEXT ≡ text; leading/trailing/multi whitespace ignored
    assert rows[3]["n_words"] == 4
    assert rows[3]["n_distinct"] == 3
    assert rows[3]["top_freq"] == 2


def test_pii_scrub_detects_and_redacts(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail alice@example.org and 192.168.0.1 now"),
            (2, "nothing sensitive here"),
            (3, "two mails a@b.co c@d.io one ip 10.0.0.255"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert rows[1]["n_emails"] == 1 and rows[1]["n_ips"] == 1
    assert rows[1]["redacted"] == "mail <EMAIL> and <IP> now"
    assert rows[1]["chars_removed"] == len(rows[1]["text"]) - len(
        rows[1]["redacted"]
    )
    assert rows[2]["n_emails"] == 0 and rows[2]["n_ips"] == 0
    assert rows[2]["redacted"] == rows[2]["text"]
    assert rows[3]["n_emails"] == 2 and rows[3]["n_ips"] == 1


def test_near_dup_clusters_transitive_and_pad_safe(spark):
    # ids straddle a digit-length boundary: a lexicographic (unpadded) min
    # would pick 1000005 over 999 — the operator must return the numeric min
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6
    docs = spark.createDataFrame(
        [(999, base), (1000005, base), (2000005, base), (7, "totally unrelated words here " * 8)],
        "doc_id long, text string",
    )
    out = near_dup_clusters(docs, jaccard_threshold=0.999).collect()
    assert len(out) == 1  # the singleton doc 7 is implicitly kept, not listed
    row = out[0]
    assert row["cluster_id"] == 999
    assert row["n_members"] == 3
    assert row["members"] == [999, 1000005, 2000005]


def test_quality_ops_match_python_reference(spark):
    """Seeded differential test: repetition_profile and pii_scrub vs a
    pure-Python reference implementation on a randomized corpus (one Spark
    job each — the batched counterpart of the hypothesis engine test)."""
    import random
    import re

    rng = random.Random(20260818)
    vocab = ["alpha", "Beta", "gamma", "x1", "x1", "the", "THE", "zz-top"]
    pii_bits = [
        "",
        " a.b-c@d-e.org",
        " 1.2.3.4",
        " not@an@email",
        " 999.1.2.3",
        " u@v.io 10.20.30.40",
    ]
    docs = []
    for i in range(200):
        words = [rng.choice(vocab) for _ in range(rng.randint(1, 30))]
        docs.append((i, " ".join(words) + rng.choice(pii_bits)))

    from shacl_validator_spark.operators.quality import EMAIL_RE, IPV4_RE

    exp_rep, exp_pii = {}, {}
    for i, text in docs:
        toks = [w for w in text.lower().strip().split() if w]
        counts: dict[str, int] = {}
        for w in toks:
            counts[w] = counts.get(w, 0) + 1
        exp_rep[i] = (len(toks), len(counts), max(counts.values()))
        red = re.sub(EMAIL_RE, "<EMAIL>", text)
        red = re.sub(IPV4_RE, "<IP>", red)
        exp_pii[i] = (
            len(re.findall(EMAIL_RE, text)),
            len(re.findall(IPV4_RE, text)),
            red,
        )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got_rep = {
        r["doc_id"]: (r["n_words"], r["n_distinct"], r["top_freq"])
        for r in repetition_profile(df).collect()
    }
    assert got_rep == exp_rep
    got_pii = {
        r["doc_id"]: (r["n_emails"], r["n_ips"], r["redacted"])
        for r in pii_scrub(df).collect()
    }
    assert got_pii == exp_pii


def test_ngram_decontaminate_semantics_and_plan(spark):
    from shacl_validator_spark.operators.quality import ngram_decontaminate

    docs = spark.createDataFrame(
        [
            (1, "x q w e y"),          # contains the probe 3-gram once
            (2, "q w x e"),            # tokens interleaved: no 3-gram match
            (3, "q w"),                # shorter than n: no n-grams at all
            (4, "q w e z q w e"),      # probe gram twice -> still 1 DISTINCT hit
            (5, "Q W E"),              # case-folded match
        ],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame([("q w e",)], "text string")
    out = ngram_decontaminate(docs, probes, n=3)
    got = {r["doc_id"]: r["n_contaminated"] for r in out.collect()}
    assert got == {1: 1, 2: 0, 3: 0, 4: 1, 5: 1}
    # every input row survives with its columns intact
    assert set(out.columns) == {"doc_id", "text", "n_contaminated"}
    # the probe set must reach the corpus as a broadcast (no corpus shuffle
    # on the semi-join side)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_normalize_unicode_forms_and_errors(spark):
    import unicodedata

    from shacl_validator_spark.operators.quality import normalize_unicode

    decomposed = "cafe\u0301 A\u030A \ufb01ne"  # e+acute, A+ring, fi-ligature — escapes, not precomposed literals
    docs = spark.createDataFrame(
        [(1, decomposed), (2, "plain ascii"), (3, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["normalized"] for r in normalize_unicode(docs).collect()}
    assert got[1] == unicodedata.normalize("NFC", decomposed)
    assert "caf\u00e9" in got[1] and "\ufb01" in got[1]  # NFC precomposes, keeps ligatures
    assert got[2] == "plain ascii"
    assert got[3] is None
    nfkc = {r["doc_id"]: r["normalized"] for r in normalize_unicode(docs, form="NFKC").collect()}
    assert "fine" in nfkc[1]  # NFKC folds the ligature

    import pytest as _pytest

    with _pytest.raises(ValueError):
        normalize_unicode(docs, form="NFX")
    with _pytest.raises(ValueError):
        normalize_unicode(docs, out_col="text")


def test_vocab_top_k_order_ties_and_min_count(spark):
    from shacl_validator_spark.operators.quality import vocab_top_k

    docs = spark.createDataFrame(
        [(0, "b b b A a c"), (1, "a b c'd C'D")], "doc_id long, text string"
    )
    rows = vocab_top_k(docs, k=3).collect()
    # b:4, a:3 (case-folded), c'd:2 beats c:1 -- apostrophe token contract
    assert [(r["token"], r["n"]) for r in rows] == [("b", 4), ("a", 3), ("c'd", 2)]
    # deterministic tie-break: equal counts order by token asc
    tied = spark.createDataFrame([(0, "x y x y z")], "doc_id long, text string")
    got = [(r["token"], r["n"]) for r in vocab_top_k(tied, k=2).collect()]
    assert got == [("x", 2), ("y", 2)]
    # min_count floor drops the tail
    assert {r["token"] for r in vocab_top_k(docs, k=10, min_count=2).collect()} == {
        "b", "a", "c'd"
    }


def test_quantile_thresholds_exact_on_unit_bins(spark):
    """bin_width=1 degrades to the exact integer quantile: threshold is the
    smallest v with |{x <= v}| >= ceil(p% * n), and the gate keeps at least
    (100-p)% of every stratum."""
    from shacl_validator_spark.operators.quality import (
        quantile_gate,
        quantile_thresholds,
    )

    rows = [("a", v) for v in range(1, 101)] + [("b", v * 10) for v in range(1, 11)]
    df = spark.createDataFrame(rows, "lang string, v long")
    thr = {
        r["lang"]: r
        for r in quantile_thresholds(df, "v", 25, ["lang"], bin_width=1).collect()
    }
    # stratum a: 1..100, ceil(25) = 25th value = 25
    assert thr["a"]["threshold"] == 25 and thr["a"]["n_rows"] == 100
    # stratum b: 10..100 step 10, ceil(2.5) = 3rd value = 30
    assert thr["b"]["threshold"] == 30 and thr["b"]["n_rows"] == 10
    kept = quantile_gate(df, "v", 25, ["lang"], bin_width=1)
    counts = {r["lang"]: r["n"] for r in
              kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["a"] == 76  # 25..100 inclusive
    assert counts["b"] == 8   # 30..100
    for lang, n_total in (("a", 100), ("b", 10)):
        assert counts[lang] >= 0.75 * n_total


def test_quantile_thresholds_validates_params(spark):
    from shacl_validator_spark.operators.quality import quantile_thresholds

    df = spark.createDataFrame([("a", 1)], "lang string, v long")
    import pytest

    with pytest.raises(ValueError):
        quantile_thresholds(df, "v", 0, ["lang"])
    with pytest.raises(ValueError):
        quantile_thresholds(df, "v", 50, ["lang"], bin_width=0)


# --- BPE training ------------------------------------------------------------

_BPE_TEXTS = [
    "the cat sat on the mat",
    "the cat sat",
    "aaa abab banana bandana",
    "low lower lowest newer newest",   # the classic Sennrich example shape
    "it's the cat's mat",              # apostrophe tokens
    "Mixed CASE case MIXED 123 12 3",  # folding + digit tokens
]


def _ref_bpe(texts, num_merges):
    """Pure-Python sequential BPE with the operator's tie-break —
    the independent reference for the differential assertions."""
    import collections
    import re

    from shacl_validator_spark.functions.text import TOKEN_PATTERN

    vocab = collections.Counter()
    for t in texts:
        for w in re.findall(TOKEN_PATTERN, t.lower()):
            vocab[w] += 1
    syms = {w: list(w) for w in vocab}
    merges = []
    for rank in range(1, num_merges + 1):
        stats = collections.Counter()
        for w, c in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                stats[(s[i], s[i + 1])] += c
        if not stats:
            break
        (l, r), n = min(stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, l, r, n))
        for w, s in syms.items():
            ns = []
            for x in s:
                if ns and ns[-1] == l and x == r:
                    ns[-1] = l + r
                else:
                    ns.append(x)
            syms[w] = ns
    return merges, syms


def test_bpe_pair_counts_match_reference(spark):
    from shacl_validator_spark.operators.quality import bpe_pair_counts

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_BPE_TEXTS)], "doc_id long, text string"
    )
    got = {(r["lhs"], r["rhs"]): r["n"] for r in bpe_pair_counts(docs).collect()}
    merges, _ = _ref_bpe(_BPE_TEXTS, 0)
    import collections
    import re

    from shacl_validator_spark.functions.text import TOKEN_PATTERN

    vocab = collections.Counter()
    for t in _BPE_TEXTS:
        for w in re.findall(TOKEN_PATTERN, t.lower()):
            vocab[w] += 1
    want = collections.Counter()
    for w, c in vocab.items():
        for i in range(len(w) - 1):
            want[(w[i], w[i + 1])] += c
    assert got == dict(want)


def test_bpe_train_differential_and_segment(spark):
    """bpe_train matches the sequential reference merge-for-merge
    (including counts), and bpe_segment reproduces the reference's final
    symbol sequences when applying those merges."""
    from shacl_validator_spark.operators.quality import bpe_segment, bpe_train

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_BPE_TEXTS)], "doc_id long, text string"
    )
    got = bpe_train(docs, 10)
    want, ref_syms = _ref_bpe(_BPE_TEXTS, 10)
    assert got == want

    words = sorted(ref_syms)
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    seg = {
        r["word"]: r["s"]
        for r in wdf.select(
            "word", bpe_segment(F.col("word"), [(l, r) for _, l, r, _ in got]).alias("s")
        ).collect()
    }
    assert seg == ref_syms


def test_bpe_train_exhausts_and_overlap_semantics(spark):
    """Merges stop when every word is one symbol; overlapping pairs merge
    left-to-right non-overlapping ('aaaa' + (a,a) -> [aa, aa])."""
    from shacl_validator_spark.operators.quality import bpe_segment, bpe_train

    docs = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id long, text string")
    merges = bpe_train(docs, 50)  # far more than possible merges
    want, ref_syms = _ref_bpe(["aaaa aaaa"], 50)
    assert merges == want
    assert len(merges) < 50  # exhausted, loop broke early
    seg = (
        docs.select(bpe_segment(F.lit("aaa"), [(l, r) for _, l, r, _ in merges[:1]]).alias("s"))
        .first()["s"]
    )
    assert seg == ["aa", "a"]


def _py_bpe_encode(text, merges):
    import re

    toks = re.findall(r"[A-Za-z0-9]+(?:'[a-z]+)?", text.lower())
    out = []
    for w in toks:
        syms = list(w)
        for l, r in merges:
            acc = []
            for x in syms:
                if acc and acc[-1] == l and x == r:
                    acc[-1] = l + r
                else:
                    acc.append(x)
            syms = acc
        out += syms
    return out


def test_bpe_encode_differential(spark):
    from shacl_validator_spark.operators.quality import bpe_encode

    merges = [("t", "h"), ("th", "e"), ("a", "a"), ("e", "r")]
    docs = [
        (1, "the weather there"),
        (2, "aaa aaaa baaab"),  # odd-run greedy non-overlap cases
        (3, "Thermal THEORY the"),  # case folding
        (4, ""),  # token-less doc keeps an empty pieces row
        (5, "ether other bother"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r["pieces"] for r in bpe_encode(df, merges).collect()}
    for did, text in docs:
        assert got[did] == _py_bpe_encode(text, merges), did
    # rank order matters: ("th","e") must see the output of ("t","h")
    assert "the" in got[1]


def test_bpe_encode_batched_equals_single_plan(spark, tmp_path):
    """batch_size re-materializes the word relation between fold batches;
    the output must be identical to the single-expression-tree plan."""
    from shacl_validator_spark.operators.quality import bpe_encode

    merges = [("t", "h"), ("th", "e"), ("a", "a"), ("e", "r"), ("o", "n"), ("i", "n")]
    docs = [
        (1, "the weather there in london"),
        (2, "aaa aaaa baaab bonbon"),
        (3, "Thermal THEORY the inn"),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    single = {r["doc_id"]: r["pieces"] for r in bpe_encode(df, merges).collect()}
    batched = {
        r["doc_id"]: r["pieces"]
        for r in bpe_encode(
            df, merges, batch_size=2, scratch_dir=str(tmp_path / "s")
        ).collect()
    }
    assert batched == single
    for did, text in docs:
        assert batched[did] == _py_bpe_encode(text, merges), did
    import pytest

    with pytest.raises(ValueError):
        bpe_encode(df, merges, batch_size=-1)


def test_corpus_datasheet_hand_math(spark):
    """Datasheet columns vs hand-computed truth on a fixture with an
    exact dup (whitespace-normalized), two langs, and a known token/byte
    census per source."""
    from shacl_validator_spark.operators.quality import corpus_datasheet

    docs = [
        # source A: 3 docs, one dup pair under \s+ -> ' ' + lower + trim
        (1, "Hello   world", "en", "A"),
        (2, " hello world ", "en", "A"),
        (3, "tres tristes tigres", "es", "A"),
        # source B: 1 doc
        (4, "one two three four", "en", "B"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text", "lang", "source"])
    rows = {r["source"]: r for r in corpus_datasheet(df).collect()}
    a, b = rows["A"], rows["B"]
    assert (a["n_docs"], a["n_tokens"], a["n_langs"]) == (3, 7, 2)
    assert a["text_bytes"] == 13 + 13 + 19
    assert a["n_unique_texts"] == 2 and a["dup_docs"] == 1
    assert (b["n_docs"], b["n_tokens"], b["n_langs"]) == (1, 4, 1)
    assert b["n_unique_texts"] == 1 and b["dup_docs"] == 0
    # quality_sum matches per-doc quality_score sum, rounded to 4
    from shacl_validator_spark.functions.text import quality_score
    from pyspark.sql import functions as F

    per = df.select("source", quality_score(F.col("text")).alias("q")).collect()
    import collections

    want = collections.defaultdict(float)
    for r in per:
        want[r["source"]] += r["q"]
    assert a["quality_sum"] == round(want["A"], 4)
    assert b["quality_sum"] == round(want["B"], 4)


def test_quantile_gate_negative_values_keep_guarantee(spark):
    """Signals that go negative (log-probs) clamp into bin 0 on BOTH the
    histogram and the gate side, so the >=(100-p)% pass guarantee holds."""
    from shacl_validator_spark.operators.quality import quantile_gate

    rows = [(i, "g", v) for i, v in enumerate([-5, -5, -5, 100])]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    kept = quantile_gate(df, "v", 20, ["g"], bin_width=64).collect()
    # threshold lands at bin 0 -> everything passes (>= 80% guaranteed)
    assert len(kept) == 4


def test_repetition_profile_null_extra_col(spark):
    """A NULL value in an extra_col must not orphan the doc's real counts
    (the spine join keys on the id alone)."""
    from shacl_validator_spark.operators.quality import repetition_profile

    docs = spark.createDataFrame(
        [(1, "spam spam spam", None), (2, "a b c", "en")],
        "doc_id long, text string, lang string",
    )
    out = {r["doc_id"]: r for r in repetition_profile(docs, extra_cols=["lang"]).collect()}
    assert out[1]["n_words"] == 3 and out[1]["top_freq"] == 3
    assert out[1]["lang"] is None
    assert out[2]["n_words"] == 3 and out[2]["n_distinct"] == 3


def test_key_skew_profile_hand_math(spark):
    from shacl_validator_spark.operators.quality import key_skew_profile

    rows = [(i, "hot") for i in range(6)] + [(10, "a"), (11, "a"), (12, "b")]
    df = spark.createDataFrame(rows, "id long, k string")
    out = {r["rank"]: r for r in key_skew_profile(df, "k", k=2).collect()}
    assert out[1]["k"] == "hot" and out[1]["n"] == 6
    assert out[1]["frac"] == round(6 / 9, 6)
    assert out[2]["k"] == "a" and out[2]["n"] == 2
    assert out[1]["n_keys"] == 3 and out[1]["n_rows"] == 9
    import pytest

    with pytest.raises(ValueError):
        key_skew_profile(df, "k", k=0)
