"""Round-3 corpus operators: chunk-level boilerplate dedup, unigram-LM
quality scoring, and kNN-graph construction (exact baseline)."""

from __future__ import annotations

import math

import pytest

from shacl_validator_spark.operators.dedup import chunk_dedup
from shacl_validator_spark.operators.quality import unigram_logprob
from shacl_validator_spark.operators.similarity import knn_graph


def test_chunk_dedup_drops_shared_chunks(spark):
    # window=2: docs a/b share the chunk "nav bar" at position 0; doc c is
    # unique; doc d is PURE boilerplate (both its chunks shared with e)
    rows = [
        (1, "nav bar alpha beta"),
        (2, "nav bar gamma delta"),
        (3, "unique text entirely here"),
        (4, "foot er legal text"),
        (5, "foot er legal text extra"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in chunk_dedup(docs, window=2, max_docs=2).collect()
    }
    assert len(out) == 5  # every input doc has an output row
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["clean_text"] == "alpha beta"
    assert out[2]["clean_text"] == "gamma delta"
    # unique doc untouched
    assert out[3]["n_kept"] == out[3]["n_chunks"] == 2
    assert out[3]["clean_text"] == "unique text entirely here"
    # doc 4 loses both chunks (shared with doc 5) -> empty survivor
    assert out[4]["n_kept"] == 0 and out[4]["clean_text"] == ""
    # doc 5's trailing PARTIAL chunk "extra" is unique and survives
    assert out[5]["n_kept"] == 1 and out[5]["clean_text"] == "extra"


def test_chunk_dedup_reassembles_in_order(spark):
    # shared chunk sits in the MIDDLE; survivors must rejoin in position order
    rows = [
        (1, "aa bb shared one cc dd"),
        (2, "xx yy shared one zz ww"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in chunk_dedup(docs, window=2, max_docs=2).collect()}
    assert out[1]["clean_text"] == "aa bb cc dd"
    assert out[2]["clean_text"] == "xx yy zz ww"


def test_unigram_logprob_hand_computed(spark):
    # corpus: "a a b" + "b c" -> counts a=2 b=2 c=1, N=5
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    lp = lambda n: math.log(n / 5)  # noqa: E731
    exp1 = (2 * lp(2) + 1 * lp(2)) / 3
    exp2 = (lp(2) + lp(1)) / 2
    assert out[1]["n_tokens"] == 3
    assert out[1]["logprob"] == pytest.approx(exp1, abs=1e-6)
    assert out[2]["n_tokens"] == 2
    assert out[2]["logprob"] == pytest.approx(exp2, abs=1e-6)
    # typical doc (common tokens) scores HIGHER than rare-token doc
    assert out[1]["logprob"] > out[2]["logprob"]


def test_knn_graph_neighbors_and_mutual(spark):
    # 2-d toy: v0/v1 nearly parallel (mutual rank-1), v2 orthogonal-ish
    vecs = [
        (0, [1.0, 0.0]),
        (1, [0.99, 0.1]),
        (2, [0.0, 1.0]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    edges = {(r["src"], r["dst"]): r for r in knn_graph(emb, k=1).collect()}
    assert set(edges) == {(0, 1), (1, 0), (2, 1)}
    assert edges[(0, 1)]["mutual"] == 1 and edges[(1, 0)]["mutual"] == 1
    assert edges[(2, 1)]["mutual"] == 0
    assert edges[(0, 1)]["rank"] == 1


def test_knn_graph_blocked_exhaustive_equals_exact(spark):
    """nprobe == nlist probes every cell, so the blocked plan must produce
    the exact graph bit-for-bit."""
    from shacl_validator_spark.operators.similarity import knn_graph_blocked

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .orderBy("vec_id")
        .limit(60)
    )
    exact = {tuple(r) for r in knn_graph(emb, k=3).collect()}
    blocked = {
        tuple(r)
        for r in knn_graph_blocked(emb, k=3, nlist=4, nprobe=4, iters=1).collect()
    }
    assert blocked == exact


def test_knn_graph_blocked_recall(spark):
    """nprobe < nlist still recovers almost all true edges on clustered
    data (cell-boundary misses only)."""
    import math

    from shacl_validator_spark.operators.similarity import knn_graph_blocked

    # 4 tight angular clusters of 8 vectors each
    vecs = []
    for c in range(4):
        for j in range(8):
            a = math.radians(c * 90 + j)
            vecs.append((c * 8 + j, [math.cos(a), math.sin(a)]))
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    exact = {(r["src"], r["dst"]) for r in knn_graph(emb, k=3).collect()}
    blocked = {
        (r["src"], r["dst"])
        for r in knn_graph_blocked(emb, k=3, nlist=4, nprobe=2, iters=2).collect()
    }
    recall = len(blocked & exact) / len(exact)
    assert recall >= 0.9


def test_knn_topk_arrow_equals_exact(spark):
    """The BLAS kernel must reproduce the JVM-expression graph exactly
    (same rounding contract, same tie-break)."""
    from shacl_validator_spark.operators.similarity import knn_topk_arrow

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {tuple(r) for r in knn_graph(emb, k=4).collect()}
    arrow = {tuple(r) for r in knn_topk_arrow(emb, k=4).collect()}
    assert arrow == exact


def test_knn_topk_arrow_block_gate(spark):
    from shacl_validator_spark.operators.similarity import knn_topk_arrow

    import pytest as _pytest

    emb = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(10)], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(ValueError, match="max_block"):
        knn_topk_arrow(emb, k=2, max_block=5)


def test_semantic_dedup_transitive_chain(spark):
    """A≈B and B≈C cluster together even though cos(A,C) < threshold —
    the closure is transitive, not pairwise."""
    import math

    from shacl_validator_spark.operators.similarity import semantic_dedup

    def unit(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    # τ = 0.966 ≈ cos 15°: A-B (14°) and B-C (14°) pass, A-C (28°) fails
    vecs = [(0, unit(0.0)), (1, unit(14.0)), (2, unit(28.0)), (3, unit(90.0))]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = semantic_dedup(emb, threshold=0.966, k=3).collect()
    assert len(out) == 1
    row = out[0]
    assert row["cluster_id"] == 0
    assert row["n_members"] == 3 and row["members"] == [0, 1, 2]


def test_knn_graph_rank_bound_and_degree(spark):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    rows = knn_graph(emb, k=3).collect()
    assert all(1 <= r["rank"] <= 3 for r in rows)
    from collections import Counter

    deg = Counter(r["src"] for r in rows)
    assert all(v == 3 for v in deg.values()) and len(deg) == 6


# --- cross-corpus (incremental) dedup ----------------------------------------


def _snapshot_fixture(spark):
    """Reference corpus + a 'new snapshot' holding exact copies, near
    variants, and novel documents — every expected label is derivable by
    hand."""
    ref = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "pack my box with five dozen liquor jugs for the annual county fair"),
            (3, "how vexingly quick daft zebras jump across the frozen tundra plains"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            # exact after normalization (case + whitespace)
            (101, "The  QUICK brown fox jumps over the lazy dog near the river bank"),
            # near: one word appended to ref 2
            (102, "pack my box with five dozen liquor jugs for the annual county fair today"),
            # novel
            (103, "completely unrelated sentence about spark catalyst optimizer internals"),
            # near of ref 3: truncated tail
            (104, "how vexingly quick daft zebras jump across the frozen"),
        ],
        "doc_id long, text string",
    )
    return ref, new


def test_dedup_against_labels_all_methods(spark):
    from shacl_validator_spark.operators.dedup import dedup_against

    ref, new = _snapshot_fixture(spark)
    want = {101: "exact", 102: "near", 103: None, 104: "near"}
    for method in ("jaccard", "lsh"):
        got = {
            r["doc_id"]: r["drop_reason"]
            for r in dedup_against(new, ref, method=method, jaccard_threshold=0.5).collect()
        }
        assert got == want, method
    got_exact = {
        r["doc_id"]: r["drop_reason"]
        for r in dedup_against(new, ref, method="exact").collect()
    }
    assert got_exact == {101: "exact", 102: None, 103: None, 104: None}


def test_dedup_against_lsh_subset_of_jaccard(spark):
    """LSH labels are a subset of the exhaustive-candidate labels: every
    'near' the banded path finds, the posting path finds too (LSH can only
    MISS candidates, never invent them), and 'exact' labels agree always."""
    from shacl_validator_spark.operators.dedup import dedup_against

    # 30 docs: 10 bases, 10 light edits, 10 novel
    base = [
        f"document number {i} talks about topic {i % 3} in several plain words "
        f"plus shared boilerplate header text" for i in range(10)
    ]
    rows = [(i, t) for i, t in enumerate(base)]
    new_rows = (
        [(100 + i, t + " appended tail") for i, t in enumerate(base)]
        + [(200 + i, f"novel text {i} with fully distinct vocabulary item{i} thing{i} widget{i}")
           for i in range(10)]
    )
    ref = spark.createDataFrame(rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    jac = {
        r["doc_id"]: r["drop_reason"]
        for r in dedup_against(new, ref, method="jaccard", jaccard_threshold=0.5).collect()
    }
    lsh = {
        r["doc_id"]: r["drop_reason"]
        for r in dedup_against(new, ref, method="lsh", jaccard_threshold=0.5).collect()
    }
    assert set(jac) == set(lsh) == {r[0] for r in new_rows}
    for k, v in lsh.items():
        if v == "exact":
            assert jac[k] == "exact"
        elif v == "near":
            assert jac[k] == "near"  # lsh near ⊆ jaccard near
    # and on this fixture recall is actually total
    assert lsh == jac


def test_dedup_against_empty_sides(spark):
    from shacl_validator_spark.operators.dedup import dedup_against

    ref, new = _snapshot_fixture(spark)
    empty = spark.createDataFrame([], "doc_id long, text string")
    # empty snapshot -> empty result
    assert dedup_against(empty, ref, method="lsh").count() == 0
    # empty reference -> everything kept
    got = {
        r["doc_id"]: r["drop_reason"]
        for r in dedup_against(new, empty, method="jaccard").collect()
    }
    assert got == {101: None, 102: None, 103: None, 104: None}


def test_chunk_dedup_preserves_case_and_null_text(spark):
    """The boilerplate gate must not lowercase the surviving text, must
    match shared chunks case-INsensitively, and must emit a row for
    NULL-text docs (one empty chunk) instead of dropping them."""
    rows = [
        (1, "NAV BAR Alpha Beta"),
        (2, "nav bar Gamma Delta"),   # shares chunk 'nav bar' modulo case
        (3, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in chunk_dedup(docs, window=2, max_docs=2).collect()}
    assert len(out) == 3
    assert out[1]["clean_text"] == "Alpha Beta"   # casing intact
    assert out[2]["clean_text"] == "Gamma Delta"
    assert out[1]["n_kept"] == 1 and out[2]["n_kept"] == 1  # shared chunk dropped
    assert out[3]["n_chunks"] == 1 and out[3]["clean_text"] == ""
