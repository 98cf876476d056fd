"""Training-shard export (sources/shards.py)."""

from __future__ import annotations

import glob
import hashlib
import json
import os
import re

import pytest

from shacl_validator_spark.sources.shards import (
    shard_assign,
    shard_manifest,
    write_training_shards,
)

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "stock market prices rose sharply today"),
    (3, "the dog sat on the log"),
    (4, "buy cheap pills online now cheap pills"),
    (5, ""),
    (6, "the cat and the dog sat"),
    (7, "unicode snowman ☃ costs three bytes"),
]

TOKEN_RE = re.compile(r"[A-Za-z0-9]+(?:'[a-z]+)?")


def _py_shard(doc_id, n):
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % n


def _py_manifest(docs, n):
    out = {}
    for did, text in docs:
        s = _py_shard(did, n)
        m = out.setdefault(s, {"n_docs": 0, "n_tokens": 0, "text_bytes": 0, "content_xor": 0})
        m["n_docs"] += 1
        m["n_tokens"] += len(TOKEN_RE.findall(text))
        m["text_bytes"] += len(text.encode("utf-8"))
        m["content_xor"] ^= int(hashlib.md5(text.encode()).hexdigest()[:15], 16)
    return out


def test_shard_manifest_differential(spark):
    n = 4
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {r["shard"]: r.asDict() for r in shard_manifest(df, n).collect()}
    want = _py_manifest(DOCS, n)
    assert set(got) == set(want)
    for s in want:
        for k in ("n_docs", "n_tokens", "text_bytes", "content_xor"):
            assert got[s][k] == want[s][k], (s, k)
    # assignment is deterministic and total
    a = {r["doc_id"]: r["shard"] for r in shard_assign(df, n).collect()}
    b = {r["doc_id"]: r["shard"] for r in shard_assign(df, n).collect()}
    assert a == b and len(a) == len(DOCS)
    assert all(0 <= v < n for v in a.values())
    with pytest.raises(ValueError):
        shard_assign(df, 0)


def test_write_training_shards_roundtrip(spark, tmp_path):
    n = 3
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = str(tmp_path / "delivery")
    manifest = write_training_shards(df, out, n, one_file_per_shard=True)

    # manifest file: header + one line per non-empty shard
    lines = [json.loads(l) for l in open(os.path.join(out, "_manifest.json"))]
    header, rows = lines[0], lines[1:]
    assert header["n_shards"] == n
    assert header["total_docs"] == len(DOCS)
    assert [r["shard"] for r in rows] == sorted(r["shard"] for r in rows)
    assert rows == [dict(m) for m in manifest]

    # one JSONL file per shard directory when requested
    for r in rows:
        files = glob.glob(os.path.join(out, "data", f"shard={r['shard']}", "part-*"))
        assert len(files) == 1, r

    # round-trip: re-reading the delivery reproduces the corpus exactly
    back = spark.read.json(os.path.join(out, "data"))
    got = {(r["doc_id"], r["text"] if r["text"] is not None else "") for r in back.collect()}
    assert got == set(DOCS)
    # and the manifest checks out against the re-read data
    re_manifest = {
        r["shard"]: r.asDict()
        for r in shard_manifest(
            back.select("doc_id", F_coalesce_text(back)), n
        ).collect()
    }
    for m in manifest:
        assert re_manifest[m["shard"]]["content_xor"] == m["content_xor"]
        assert re_manifest[m["shard"]]["n_tokens"] == m["n_tokens"]


def F_coalesce_text(df):
    from pyspark.sql import functions as F

    return F.coalesce(df["text"], F.lit("")).alias("text")


def test_build_corpus_cli_smoke(tmp_path):
    """The end-to-end corpus CLI delivers a verifiable shard set at
    sf0.001: summary JSON parses, manifest totals agree with the summary,
    and the delivery is deterministic (same manifest on a re-run)."""
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out1, out2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    summaries = []
    for out in (out1, out2):
        proc = subprocess.run(
            [
                _sys.executable,
                os.path.join(repo, "tools", "build_corpus.py"),
                "/root/testdata/sf0.001",
                out,
                "--cpus",
                "4",
            ],
            capture_output=True,
            text=True,
            timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        summaries.append(json.loads(proc.stdout.strip().splitlines()[-1]))
    s1, s2 = summaries
    assert s1 == {**s2, "out_dir": s1["out_dir"]}  # identical modulo path
    assert 0 < s1["delivered_docs"] <= s1["input_docs"]
    m1 = [json.loads(l) for l in open(os.path.join(out1, "_manifest.json"))]
    m2 = [json.loads(l) for l in open(os.path.join(out2, "_manifest.json"))]
    assert [r.get("content_xor") for r in m1] == [r.get("content_xor") for r in m2]
    assert m1[0]["total_docs"] == s1["delivered_docs"]
