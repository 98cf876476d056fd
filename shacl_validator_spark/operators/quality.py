"""Corpus-quality signals beyond the length/punct/stopword score in
``functions/text.py``: word-repetition profiling (the Gopher-style
"fraction of words in the top word / distinct-word ratio" filters) and
PII scrubbing (email / IPv4 detection + redaction) — both standard gates
in a pre-training data pipeline.

Everything here is pure column expressions over built-in functions —
explode/groupBy for the word profile, regexp_count/regexp_replace for the
scrub — so the whole pass stays inside whole-stage codegen with no Python
in the executor path.

Scale notes (100 TB):
- ``repetition_profile`` shuffles twice, both times keyed by ``id_col``
  ((doc, word) then doc) — the second aggregation reuses the first's
  hash partitioning on the leading key, and word counts combine map-side,
  so the wide intermediate (one row per distinct (doc, word)) never
  concentrates: a pathological doc repeating one word a billion times is
  ONE row after the map-side combine.
- ``pii_scrub`` is a narrow map — no shuffle at all; it composes with any
  downstream filter/write without a stage break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import TOKEN_PATTERN

# Deliberately simple, RE2-and-Java-compatible patterns (no backrefs, no
# lookaround) so the same literal runs identically in Spark's JVM regex,
# DuckDB's RE2 (the correctness oracle), and any downstream audit tooling.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def repetition_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document word-repetition metrics: ``n_words``, ``n_distinct``,
    ``top_freq`` (occurrences of the most frequent word), plus the derived
    ``distinct_ratio`` and ``top_frac`` used as quality-filter thresholds
    (e.g. drop docs with top_frac > 0.2 — boilerplate/keyword-stuffing).

    Tokenization is lowercased whitespace splitting — the same contract as
    ``functions.text.token_count`` — so the two signals are comparable.

    EVERY input document gets a row: empty/whitespace-only (or NULL) text
    reports ``n_words = n_distinct = top_freq = 0`` with NULL ratios
    (0/0 is undefined) — without the spine join, such docs would vanish
    from the profile and bypass any repetition gate keyed on it.
    """
    extra = list(extra_cols or [])
    words = docs.select(
        id_col,
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("_w"),
    ).filter(F.col("_w") != "")
    per_word = words.groupBy(id_col, "_w").agg(F.count(F.lit(1)).alias("_c"))
    per_doc = per_word.groupBy(id_col).agg(
        F.sum("_c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("_c").alias("top_freq"),
    )
    # extras come from the spine ONLY (they are functionally dependent on
    # the doc id), and the join keys on the id alone — joining on the
    # extras too would need null-safe equality (a NULL lang would orphan
    # its doc's real counts)
    spine = docs.select(id_col, *extra).dropDuplicates([id_col])
    return spine.join(per_doc, [id_col], "left").select(
        id_col,
        *extra,
        F.coalesce("n_words", F.lit(0).cast("long")).alias("n_words"),
        F.coalesce("n_distinct", F.lit(0).cast("long")).alias("n_distinct"),
        F.coalesce("top_freq", F.lit(0).cast("long")).alias("top_freq"),
        (F.col("n_distinct") / F.col("n_words")).alias("distinct_ratio"),
        (F.col("top_freq") / F.col("n_words")).alias("top_frac"),
    )


def pii_scrub(
    docs: DataFrame,
    text_col: str = "text",
    email_token: str = "<EMAIL>",
    ip_token: str = "<IP>",
) -> DataFrame:
    """Detect and redact email addresses and IPv4 literals in ``text_col``.

    Adds ``n_emails``, ``n_ips``, ``redacted`` (the scrubbed text) and
    ``chars_removed`` (original length − redacted length; negative when the
    replacement token is longer than the match).  Redaction order is
    emails first, then IPs — an IP can never contain an email match, so
    the order is observationally irrelevant, but fixing it keeps the
    output byte-deterministic.
    """
    t = F.col(text_col)
    red = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, email_token), IPV4_RE, ip_token
    )
    return docs.select(
        "*",
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(IPV4_RE)).alias("n_ips"),
        red.alias("redacted"),
        (F.length(t) - F.length(red)).alias("chars_removed"),
    )


def normalize_unicode(
    docs: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    out_col: str = "normalized",
) -> DataFrame:
    """Unicode normalization (NFC/NFKC/NFD/NFKD) of a text column — the
    first step of every web-corpus cleaning recipe (decomposed accents,
    ligatures, and width variants otherwise defeat dedup hashing and
    tokenization).

    Spark has no built-in unicode-normalize expression, so this is one of
    the few legitimately-Python operators in the engine: an Arrow-batched
    ``mapInPandas`` whose per-batch loop calls CPython's C-implemented
    ``unicodedata.normalize`` — no row-at-a-time Python UDF, no shuffle,
    and the batch shape composes with any downstream filter.  DuckDB's
    native ``nfc_normalize`` serves as the correctness oracle.
    """
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"form must be NFC|NFKC|NFD|NFKD, got {form}")
    from pyspark.sql.types import StringType, StructField, StructType

    if out_col in docs.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    schema = StructType(list(docs.schema.fields) + [StructField(out_col, StringType())])

    def fn(batches):
        import unicodedata

        for pdf in batches:
            pdf[out_col] = [
                unicodedata.normalize(form, s) if isinstance(s, str) else s
                for s in pdf[text_col]
            ]
            yield pdf

    return docs.mapInPandas(fn, schema)


def word_ngrams(text, n: int) -> F.Column:
    """Word n-gram array of normalized text (lowercase, ``TOKEN_PATTERN``
    tokens, space-joined) — EMPTY when the text has fewer than ``n``
    tokens (a 5-word document cannot contain an 8-gram; contrast with
    ``dedup.shingles``, whose whole-text fallback exists so every doc gets
    a MinHash signature).

    The token array is bound as a lambda variable (single-element-array
    transform) for the same reason as ``dedup.shingles``: Catalyst does
    not CSE through higher-order lambdas, so a free-variable reference
    would re-run the tokenizer regex once per n-gram per row.
    """
    toks = F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PATTERN), 0)
    return F.element_at(
        F.transform(
            F.array(toks),
            lambda t: F.when(
                F.size(t) >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size(t) - n),
                    lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
                ),
            ).otherwise(F.array().cast("array<string>")),
        ),
        1,
    )


def vocab_top_k(
    docs: DataFrame,
    k: int = 1000,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Corpus-wide token frequencies, top ``k`` — the counting pass of
    tokenizer-vocabulary construction (BPE/unigram trainers start from
    exactly this table) and the input to stopword/anomaly audits.

    Tokens are ``TOKEN_PATTERN`` matches over lowercased text, the same
    contract as ``functions.text.token_count`` so vocabulary rows are
    comparable with the per-doc token totals.  Output: ``(token, n)``
    ordered by count desc then token asc (deterministic ties).

    Scale notes (100 TB): explode → hash-aggregate combines map-side, so
    the shuffle carries one row per distinct token per task (vocabulary-
    sized, not corpus-sized — Zipf means the heavy tokens compress best);
    ``orderBy().limit(k)`` plans as TakeOrderedAndProject, never a global
    sort.  No skew handling needed: a hyper-frequent token ("the") is one
    row per map task after partial aggregation.
    """
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0)
        ).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    if min_count > 1:
        counts = counts.filter(F.col("n") >= min_count)
    return counts.orderBy(F.desc("n"), F.asc("token")).limit(k)


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style language-model quality proxy: the average per-token log
    probability of each document under a unigram model fitted on the corpus
    itself (the cheap stand-in for the KenLM perplexity gate every published
    web-corpus recipe applies — documents whose tokens are corpus-typical
    score high, keyword-stuffed or garbled ones score low).

    Tokens are ``TOKEN_PATTERN`` matches over lowercased text (the same
    contract as ``vocab_top_k`` / ``functions.text.token_count``).  Output:
    ``(id_col, n_tokens, logprob)`` where ``logprob`` = Σ c(d,t)·ln(n(t)/N)
    / Σ c(d,t), rounded to 6 decimals so the value is comparable across
    engines regardless of summation order.

    Scale notes (100 TB): the per-(doc, token) count combines map-side, so
    the first shuffle carries one row per distinct (doc, token); the
    vocabulary aggregation reuses those rows keyed by token (Zipf: heavy
    tokens collapse to one row per map task).  The count-attach join is
    token-keyed and left to AQE — a web-scale vocabulary (10^7-10^8 rows)
    broadcast-joins only when it fits, otherwise both sides are already
    token-partitioned from the vocab agg.  The corpus total N is a one-row
    aggregate, broadcast via cross-join.  No Python anywhere.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0)
        ).alias("_t"),
    )
    per_doc_tok = toks.groupBy(id_col, "_t").agg(F.count(F.lit(1)).alias("_c"))
    # vocab/total share per_doc_tok's lineage — explicit dataframe aliases
    # keep the self-join column references unambiguous
    vocab = per_doc_tok.groupBy("_t").agg(F.sum("_c").alias("_n"))
    total = vocab.select(F.sum("_n").alias("_tot"))
    return (
        per_doc_tok.alias("L")
        .join(vocab.alias("R"), F.col("L._t") == F.col("R._t"))
        .select("L.*", "R._n")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("_c").alias("n_tokens"),
            F.round(
                F.sum(F.col("_c") * F.log(F.col("_n") / F.col("_tot")))
                / F.sum("_c"),
                6,
            ).alias("logprob"),
        )
    )


def ngram_decontaminate(
    docs: DataFrame,
    probes: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word ``n``-gram with a probe set (eval/benchmark texts), the standard
    train-test-overlap gate in a pre-training pipeline (n-gram overlap at
    n≈8-13 is the published GPT-3/Llama recipe).

    Adds ``n_contaminated`` (count of DISTINCT probe n-grams found in the
    document) to every input row; ``filter(n_contaminated == 0)`` is the
    decontaminated corpus, and the nonzero rows are the audit trail.

    Scale notes (100 TB corpus, MB-scale probe set): the probe n-gram set
    is distinct-ed and BROADCAST — benchmarks are a few MB, so the
    broadcast is KB-to-MB sized — and the corpus side is a narrow
    generate-then-broadcast-hash-semi-join: the corpus itself never
    shuffles; only the matched (doc, n-gram) rows (a vanishing fraction)
    enter the per-doc count aggregation, which combines map-side.  The
    final attach join's build side is one row per CONTAMINATED doc, left
    to AQE (not force-broadcast: adversarial probe sets can contaminate
    a large doc fraction).  At cluster scale, hash both sides' n-grams to
    8-byte longs (xxhash64) to shrink the broadcast; kept as strings here
    so the DuckDB oracle can reproduce the join byte-for-byte.
    """
    probe_ngrams = probes.select(
        F.explode(word_ngrams(F.col(probe_text_col), n)).alias("_ng")
    ).distinct()
    doc_ngrams = docs.select(
        F.col(id_col).alias("_did"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("_ng"),
    )
    hits = (
        doc_ngrams.join(F.broadcast(probe_ngrams), "_ng")
        .groupBy("_did")
        .agg(F.count_distinct("_ng").alias("n_contaminated"))
    )
    return (
        docs.join(hits, docs[id_col] == hits["_did"], "left")
        .drop("_did")
        .withColumn("n_contaminated", F.coalesce("n_contaminated", F.lit(0)))
    )


def quantile_thresholds(
    df: DataFrame,
    value_col: str,
    p_pct: int,
    strata: list[str],
    bin_width: int = 64,
) -> DataFrame:
    """Per-stratum histogram-quantile thresholds over an integer signal.

    Returns one row per stratum: ``n_rows``, ``thr_bin`` (the smallest
    histogram bin whose cumulative count reaches ``ceil(p_pct% · n)``) and
    ``threshold`` (that bin's lower edge, ``thr_bin · bin_width``).  A row
    "passes the gate" iff ``value >= threshold``, so by construction at
    least ``(100 - p_pct)%`` of each stratum passes — the standard
    "drop the bottom p% by length/score within each language" corpus gate.

    Design for 10^12 rows: EXACT quantiles (``F.percentile``) buffer every
    value of a group in one aggregation state — a billion-document language
    group would OOM the executor — and ``percentile_approx``'s
    Greenwald-Khanna sketch is merge-order dependent, so its output is not
    reproducible across partitionings (it would break both the oracle and
    MERGE idempotence).  A fixed-width histogram sidesteps both: the only
    corpus-wide pass is one hash aggregation on (stratum, bin) that
    combines map-side to at most strata × bins rows, the cumulative-sum
    window runs on that tiny relation, and every step is integer
    arithmetic — bit-identical on any engine, any partitioning.  The
    trade-off is threshold resolution = ``bin_width``, explicit and
    caller-tunable.

    Negative values clamp to bin 0 (the histogram's floor); the gate
    applies the SAME clamp before comparing, so the pass-fraction
    guarantee holds for signals that go negative (log-probs, z-scores) —
    a negative value passes exactly when its stratum's threshold is 0.
    """
    if not 0 < p_pct < 100:
        raise ValueError(f"p_pct must be in (0, 100), got {p_pct}")
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    hist = (
        df.select(*strata, F.expr(f"greatest({value_col}, 0) div {bin_width}").alias("_bin"))
        .groupBy(*strata, "_bin")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = (
        Window.partitionBy(*strata)
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select(
        *strata,
        "_bin",
        F.sum("_c").over(w).alias("_cum"),
        F.sum("_c").over(Window.partitionBy(*strata)).alias("n_rows"),
    )
    # target rank: ceil(p_pct · n / 100) in pure integer math
    reached = cum.filter(F.col("_cum") * 100 >= F.col("n_rows") * p_pct)
    return (
        reached.groupBy(*strata)
        .agg(F.min("_bin").alias("thr_bin"), F.max("n_rows").alias("n_rows"))
        .select(
            *strata,
            "n_rows",
            "thr_bin",
            (F.col("thr_bin") * bin_width).alias("threshold"),
        )
    )


def quantile_gate(
    df: DataFrame,
    value_col: str,
    p_pct: int,
    strata: list[str],
    bin_width: int = 64,
) -> DataFrame:
    """Keep rows whose ``value_col`` clears their stratum's histogram-
    quantile threshold (see ``quantile_thresholds``).  The threshold
    relation is strata-sized, so the gate join broadcasts — the corpus
    stream itself is filtered in place with no shuffle.
    """
    thr = quantile_thresholds(df, value_col, p_pct, strata, bin_width)
    # same clamp as the histogram (negatives live in bin 0): comparing the
    # RAW value would reject negative rows below a threshold of 0 and
    # break the >=(100-p)% pass guarantee
    clamped = F.greatest(F.col(value_col).cast("long"), F.lit(0))
    return df.join(
        F.broadcast(thr.select(*strata, "threshold")), strata, "inner"
    ).filter(clamped >= F.col("threshold"))


# --- distributed BPE tokenizer training -------------------------------------
#
# The counting side of byte-pair-encoding training is a textbook Spark
# workload: ONE corpus-sized pass builds the word vocabulary (map-side
# combined, Zipf-compressed), and every merge iteration after that touches
# only the VOCABULARY table — web-scale corpora train tokenizers over
# billions of pages but only ~10^7 distinct words.  The merge rule itself
# (replace the highest-count adjacent symbol pair) is a pure column fold,
# so no Python ever sees a symbol sequence.


def _word_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, n) — ``TOKEN_PATTERN`` matches over lowercased text, the same
    token contract as ``vocab_top_k`` / ``functions.text.token_count``."""
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _char_symbols(word) -> F.Column:
    """Initial BPE symbol sequence: the word's characters (tokens are ASCII
    by the ``TOKEN_PATTERN`` contract, so character == byte semantics)."""
    return F.when(
        F.length(word) > 0,
        F.transform(F.sequence(F.lit(1), F.length(word)), lambda i: word.substr(i, F.lit(1))),
    ).otherwise(F.array().cast("array<string>"))


def _pair_stats(vocab_syms: DataFrame) -> DataFrame:
    """(lhs, rhs, n) adjacent-symbol pair counts over a (syms, n) vocabulary
    — every adjacent occurrence counts (``aaa`` contributes (a,a) twice),
    weighted by the word count: the Sennrich ``get_stats`` contract."""
    return (
        vocab_syms.filter(F.size("syms") >= 2)
        .select(
            F.col("n").alias("_n"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("syms"), i).alias("lhs"),
                        F.element_at(F.col("syms"), i + 1).alias("rhs"),
                    ),
                )
            ).alias("_p"),
        )
        .groupBy(F.col("_p.lhs").alias("lhs"), F.col("_p.rhs").alias("rhs"))
        .agg(F.sum("_n").alias("n"))
    )


def _merge_fold(syms, lhs: str, rhs: str) -> F.Column:
    """Apply ONE merge rule to a symbol array: left-to-right, non-
    overlapping (after ``aa`` merges in ``aaa``, the third ``a`` starts
    fresh) — exactly the reference BPE merge semantics, as an array fold
    with no Python."""
    merged = F.lit(lhs + rhs)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(lhs))
            & (x == F.lit(rhs)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_pair_counts(
    docs: DataFrame,
    text_col: str = "text",
    k: int | None = None,
) -> DataFrame:
    """Adjacent character-pair statistics of the corpus vocabulary —
    iteration zero of BPE training, and a corpus-audit signal in its own
    right (dominant bigrams expose boilerplate and encoding damage).

    Output ``(lhs, rhs, n)``; with ``k``, the top-k by (n desc, lhs, rhs) —
    a TakeOrderedAndProject, never a global sort.

    Scale notes (100 TB): the only corpus-sized pass is the word-count
    aggregation (map-side combined; the shuffle carries one row per
    distinct word per task).  Pair extraction explodes VOCABULARY rows —
    ~10^7 at web scale — so its cost is independent of corpus size.
    """
    vocab = _word_vocab(docs, text_col).select(
        _char_symbols(F.col("word")).alias("syms"), "n"
    )
    stats = _pair_stats(vocab)
    if k is not None:
        stats = stats.orderBy(F.desc("n"), F.asc("lhs"), F.asc("rhs")).limit(k)
    return stats


def bpe_train(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    scratch_dir: str | None = None,
) -> list[tuple[int, str, str, int]]:
    """Train ``num_merges`` BPE merge rules on the corpus; returns
    ``[(rank, lhs, rhs, pair_count), ...]`` in merge order.  Semantics are
    the exact sequential Sennrich algorithm (recount after every merge;
    ties broken deterministically by (count desc, lhs asc, rhs asc) so the
    result is engine-reproducible — reference trainers break ties by dict
    order, which is not).

    Scale shape: the corpus is touched ONCE (``_word_vocab``); every
    iteration after that runs two vocabulary-sized jobs — a pair-stats
    aggregation whose argmax is a ``limit(1)`` TakeOrdered (one row to the
    driver), and a column-fold merge apply.  The vocabulary is
    re-materialized to scratch parquet each iteration, keeping plan depth
    and lineage O(1) across iterations instead of stacking ``num_merges``
    folds into one plan (the same truncation discipline as the pipeline's
    scratch tables).  Production trainers run ~30k merges; at that scale
    batch top-B non-interacting merges per iteration — a standard
    approximation this operator deliberately does NOT apply, so its output
    is the exact-algorithm reference a batched trainer can be validated
    against.
    """
    import shutil
    import tempfile

    spark = docs.sparkSession
    own_scratch = scratch_dir is None
    scratch = scratch_dir or tempfile.mkdtemp(prefix="bpe_train_")
    merges: list[tuple[int, str, str, int]] = []
    try:
        vocab = _word_vocab(docs, text_col).select(
            _char_symbols(F.col("word")).alias("syms"), "n"
        )
        vocab.write.mode("overwrite").parquet(f"{scratch}/it0")
        vocab = spark.read.parquet(f"{scratch}/it0")
        for rank in range(1, num_merges + 1):
            top = (
                _pair_stats(vocab)
                .orderBy(F.desc("n"), F.asc("lhs"), F.asc("rhs"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            lhs, rhs, n = top[0]["lhs"], top[0]["rhs"], int(top[0]["n"])
            merges.append((rank, lhs, rhs, n))
            vocab = vocab.select(_merge_fold(F.col("syms"), lhs, rhs).alias("syms"), "n")
            vocab.write.mode("overwrite").parquet(f"{scratch}/it{rank % 2}")
            vocab = spark.read.parquet(f"{scratch}/it{rank % 2}")
    finally:
        if own_scratch:
            shutil.rmtree(scratch, ignore_errors=True)
    return merges


def bpe_segment(word, merges: list[tuple[str, str]]) -> F.Column:
    """Segment a word column with a learned merge list: character symbols,
    then each merge applied in rank order — the APPLY side of ``bpe_train``
    (chained folds, one per merge; no Python).  For tokenizing a corpus
    with a large merge table, apply to the DISTINCT word relation and join
    back — the same vocabulary-not-corpus cost argument as training."""
    syms = _char_symbols(word)
    for lhs, rhs in merges:
        syms = _merge_fold(syms, lhs, rhs)
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int | None = None,
    scratch_dir: str | None = None,
) -> DataFrame:
    """Tokenize the corpus with a PINNED merge list — the production shape
    of tokenization, where the tokenizer is a versioned artifact trained
    once (``bpe_train``) and applied to every snapshot thereafter.

    Output: ``(id_col, pieces)`` where ``pieces`` is the doc's BPE symbol
    sequence in text order (empty array for token-less docs).

    Scale notes (100 TB): segmentation runs on the DISTINCT word relation
    (vocabulary-sized — the same cost argument as ``bpe_train``), then
    joins back onto the (doc, position, word) stream; reassembly is ONE
    doc-keyed shuffle (collect_list of (position, pieces) structs,
    array_sort on the struct's leading field, flatten — the
    ``chunk_dedup`` reassembly pattern).

    Plan depth: the merge list compiles to ``len(merges)`` chained array
    folds — fine for few-hundred-merge domain tokenizers, but a 32k-merge
    production vocabulary must not stack into one expression tree.
    ``batch_size`` applies the folds in batches over the distinct-word
    relation, re-materializing it to scratch parquet between batches (the
    ``bpe_train`` alternating-scratch pattern) so plan depth stays
    O(batch_size) regardless of vocabulary size; output is provably
    identical — the fold chain is associative in application order, only
    where the plan is truncated changes.  The scratch outlives this call
    (the returned DataFrame reads from it); an own-tempdir is cleaned at
    process exit.
    """
    toks = docs.select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0
            )
        ).alias("_p", "_w"),
    )
    words = toks.select("_w").distinct()
    if batch_size is None or len(merges) <= batch_size:
        seg = words.select("_w", bpe_segment(F.col("_w"), merges).alias("_pieces"))
    else:
        if batch_size <= 0:
            raise ValueError(f"batch_size must be positive, got {batch_size}")
        import atexit
        import shutil
        import tempfile

        spark = docs.sparkSession
        if scratch_dir is None:
            scratch_dir = tempfile.mkdtemp(prefix="bpe_encode_")
            atexit.register(shutil.rmtree, scratch_dir, ignore_errors=True)
        seg = words.select("_w", _char_symbols(F.col("_w")).alias("_pieces"))
        starts = list(range(0, len(merges), batch_size))
        for step, i in enumerate(starts):
            syms = F.col("_pieces")
            for lhs, rhs in merges[i : i + batch_size]:
                syms = _merge_fold(syms, lhs, rhs)
            seg = seg.select("_w", syms.alias("_pieces"))
            # the FINAL batch stays lazy on top of the previous scratch
            # read — plan depth is already bounded, and materializing it
            # would pay one extra write+read of the word relation
            if step < len(starts) - 1:
                path = f"{scratch_dir}/seg{step % 2}"
                seg.write.mode("overwrite").parquet(path)
                seg = spark.read.parquet(path)
    per = (
        toks.join(seg, "_w")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_p", "_pieces"))),
                    lambda s: s["_pieces"],
                )
            ).alias("pieces")
        )
    )
    return (
        docs.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("pieces", F.array().cast("array<string>")).alias("pieces"),
        )
    )


def corpus_datasheet(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-``group_col`` corpus datasheet — the summary table a delivery
    ships alongside its shards (the "Datasheets for Datasets" practice):
    for every source, how much is there (docs, tokens, bytes), how varied
    it is (distinct languages), how redundant it is (exact-dup docs under
    the ``exact_duplicates`` normalization contract), and how good it is
    (``quality_score`` mass).

    Output: ``(group_col, n_docs, n_tokens, text_bytes, n_langs,
    n_unique_texts, quality_sum, dup_docs)`` where
    ``dup_docs = n_docs − n_unique_texts`` and ``quality_sum`` is rounded
    to 4 decimals (the ``quality_by_lang`` cross-engine float contract).

    Scale notes (100 TB): ONE corpus scan; token/byte/quality terms are
    codegen'd column expressions folded map-side.  The two distinct
    aggregates (lang, content hash) make Catalyst plan an Expand +
    two-phase hash aggregate: the corpus stream carries 2 extra SKINNY
    rows per doc (group + one distinct key each, other columns null), and
    partial aggregation collapses per-task repeats before the shuffle —
    so shuffled rows are O(distinct keys per task), never a second scan.
    Group cardinality is source-count-sized: the result is a dimension
    relation, safe to collect or broadcast.
    """
    from ..functions.text import quality_score, token_count
    from .dedup import _normalized

    norm_hash = F.md5(_normalized(F.col(text_col)))
    return (
        docs.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(F.col(text_col))).alias("n_tokens"),
            F.sum(F.octet_length(F.col(text_col)).cast("bigint")).alias(
                "text_bytes"
            ),
            F.countDistinct(F.col(lang_col)).alias("n_langs"),
            F.countDistinct(norm_hash).alias("n_unique_texts"),
            F.round(F.sum(quality_score(F.col(text_col))), 4).alias(
                "quality_sum"
            ),
        )
        .withColumn(
            "dup_docs", (F.col("n_docs") - F.col("n_unique_texts")).cast("long")
        )
    )


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    k: int = 10,
) -> DataFrame:
    """Heavy-hitter skew report for a prospective shuffle/join key: the
    top-``k`` hottest key values with their row counts, global share, and
    rank, plus the relation-wide ``n_keys``/``n_rows`` context on every
    row.  THE diagnostic to run before shuffling 100 TB on a key — a
    ``max_frac`` near 1/parallelism means the hot key alone caps the
    stage, and the answer is salting (``linking.salted_count``), AQE
    skew-join splitting, or a broadcast reformulation.

    Output: ``(key_col, n, frac, rank, n_keys, n_rows)``, rank by count
    desc then key asc (deterministic), ``frac`` rounded to 6 decimals.

    Scale notes (100 TB): ONE hash aggregation on the key (map-side
    combined — the hot key is one row per task before the shuffle); the
    totals are a one-row aggregate of the key-count relation broadcast
    back (BroadcastNestedLoopJoin of 1 row); the top-k is
    orderBy+limit — TakeOrderedAndProject, never a global sort.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    counts = df.groupBy(F.col(key_col)).agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(
        F.count(F.lit(1)).alias("n_keys"), F.sum("n").alias("n_rows")
    )
    top = (
        counts.crossJoin(F.broadcast(totals))
        .orderBy(F.desc("n"), F.col(key_col).asc())
        .limit(k)
    )
    w = Window.orderBy(F.desc("n"), F.col(key_col).asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        key_col,
        "n",
        F.round(F.col("n") / F.col("n_rows"), 6).alias("frac"),
        "rank",
        "n_keys",
        "n_rows",
    )
