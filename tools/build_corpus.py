"""End-to-end training-corpus construction CLI — the data-pipeline
counterpart to tools/validate_catalog.py (which replays the reference's
validate workflow).  Chains the repo's tested operators into the standard
published web-corpus recipe, documents → trainer-ready shards:

  1. hygiene gate        clean_corpus: exact-dedup keepers ∩ quality
                         floor ∩ (optional) language allowlist — one job
  2. boilerplate removal chunk_dedup: drop 16-token windows shared by
                         ≥ max_docs documents, reassemble survivors
  3. PII scrub           pii_scrub: email/IPv4 detect + redact
  4. data selection      dsir_weights: hashed-n-gram importance scores
                         against the --target-lang subset (attached as a
                         column for downstream curricula/filters)
  5. mix flattening      temperature_weights: per-language resampling at
                         --tau, applied as a deterministic md5-threshold
                         keep (same decision on every retry/engine)
  6. delivery            write_training_shards: shard=K/ JSONL + manifest
                         (doc/token/byte counts, content-XOR checksum)

Every stage is a DataFrame→DataFrame pure function already covered by the
oracle suite or a pytest differential; this driver only composes them and
prints ONE JSON summary line (stage survivor counts + manifest totals).
Driver-side data: stage counts and the n_shards manifest rows — nothing
row-scale is ever collected.

Usage:
  python tools/build_corpus.py [sf_dir] [out_dir] [--shards N] [--tau T]
      [--keep-frac F] [--min-quality Q] [--target-lang L] [--cpus N]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from shacl_validator_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    ap.add_argument("out_dir", nargs="?", default="/tmp/corpus_delivery")
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--tau", type=float, default=2.0)
    ap.add_argument("--keep-frac", type=float, default=0.8)
    ap.add_argument("--min-quality", type=float, default=0.4)
    ap.add_argument("--target-lang", default="en")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from shacl_validator_spark.operators.dedup import chunk_dedup, clean_corpus
    from shacl_validator_spark.operators.quality import pii_scrub
    from shacl_validator_spark.operators.sampling import (
        dsir_weights,
        md5_prefix32,
        temperature_weights,
    )
    from shacl_validator_spark.sources.shards import write_training_shards

    spark = get_spark(master=f"local[{args.cpus}]", shuffle_partitions=args.cpus)
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    n_in = docs.count()

    # 1. hygiene gate (dedup keepers ∩ quality floor; language predicted,
    #    not filtered — the mix step below handles language balance)
    kept = clean_corpus(docs, min_quality=args.min_quality).select(
        "doc_id", "text", "pred_lang", "quality"
    )

    # 2. sub-document boilerplate removal; drop docs that were pure
    #    boilerplate (clean_text = '')
    chunked = (
        chunk_dedup(kept, window=16, max_docs=2)
        .filter(F.col("n_kept") > 0)
        .join(kept.select("doc_id", "pred_lang", "quality"), "doc_id")
        .select("doc_id", F.col("clean_text").alias("text"), "pred_lang", "quality")
    )

    # 3. PII scrub
    scrubbed = pii_scrub(chunked).select(
        "doc_id", F.col("redacted").alias("text"), "pred_lang", "quality"
    )
    # the downstream stages reuse this relation several times (DSIR fit +
    # score, mix fit, shard write): materialize once, scratch-style
    scrubbed = scrubbed.localCheckpoint(eager=False)
    n_scrubbed = scrubbed.count()

    # 4. DSIR importance scores vs the target-language subset
    weights = dsir_weights(
        scrubbed,
        scrubbed.filter(F.col("pred_lang") == args.target_lang),
        n_buckets=256,
    )
    scored = scrubbed.join(weights, "doc_id", "left")

    # 5. temperature-flattened language mix, applied as a deterministic
    #    md5-threshold keep at rate min(1, keep_frac · weight_g)
    mix = temperature_weights(scrubbed, "pred_lang", tau=args.tau).select(
        "pred_lang",
        F.least(F.lit(1.0), F.lit(args.keep_frac) * F.col("weight")).alias("_rate"),
    )
    hash32 = md5_prefix32(F.col("doc_id").cast("string"))
    final = (
        scored.join(F.broadcast(mix), "pred_lang")
        .filter(hash32 < F.col("_rate") * F.lit(float(0x100000000)))
        .select("doc_id", "text", "pred_lang", "quality", "log_weight")
    )

    # 6. shard + manifest delivery
    manifest = write_training_shards(
        final, args.out_dir, args.shards, one_file_per_shard=True
    )

    summary = {
        "input_docs": n_in,
        "after_hygiene_and_boilerplate_and_scrub": n_scrubbed,
        "delivered_docs": int(sum(m["n_docs"] for m in manifest)),
        "delivered_tokens": int(sum(m["n_tokens"] for m in manifest)),
        "n_shards": args.shards,
        "out_dir": args.out_dir,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
