"""End-to-end KG-construction pipeline (the flagship path, SURVEY.md §3.1).

pages → extract_text (pandas UDF) → extract_raw_triples (Arrow batches) →
link mentions (broadcast alias dict + MinHash-LSH) → canonicalize
(connected components) → typed triples → SHACL validate (constraint-table
joins) → conformant-only idempotent MERGE + lineage + checkpoint manifest.

This is the Spark rebuild of the reference's click-to-report lifecycle
(reference src/components/Validator/ValidatorInput.tsx:221-292 →
AppRouter.tsx:22-63 → SHACLValidationService.ts:339-424), re-topologized
for a 1000-executor cluster:

- the only Python on executors is the two vectorized extraction UDFs;
- linking/canonicalization operate on the distinct-surface set and return
  broadcast maps — the triple stream is never shuffled for linking;
- batches are processed per input partition-group with a checkpoint
  manifest; a restart skips completed groups and the idempotent MERGE makes
  replays of in-flight groups exactly-once (BASELINE.json north_rule).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import RDF_TYPE, SEVERITY_VIOLATION
from ..operators.components import connected_components
from ..operators.linking import alias_dict_df, link_mentions
from ..operators.validate import validate
from ..shapes import compile_shapes, profile_shapes_ttl
from ..sources.extract import (
    ENTITY,
    KG,
    PREDICATE_CLASSES,
    XSD_INTEGER,
    extract_raw_triples,
    mentions_from_raw,
)
from ..sources.pages import alias_rows
from .merge import merge_triples


@dataclass
class PipelineResult:
    triples_in: int
    triples_valid: int
    violations: int
    merged: int
    entities: DataFrame  # (canonical_id, surface_forms, ent_class)
    violations_df: DataFrame
    stage_seconds: dict[str, float] = field(default_factory=dict)


def canonicalize(
    spark: SparkSession, linked: DataFrame, max_iter: int = 6
) -> DataFrame:
    """Merge surfaces that share a canonical id (or are chained by LSH)
    into components; canonical id := min member id.

    Edges: surface ↔ linked canonical id.  Returns the final broadcastable
    (surface, canonical_id, ent_class) map.
    """
    edges = linked.select(
        F.concat(F.lit("s|"), F.col("surface")).alias("src"),
        F.concat(F.lit("c|"), F.col("canonical_id")).alias("dst"),
    )
    comps = connected_components(edges, max_iter=max_iter)
    # component label is min over 'c|...' and 's|...' — 'c|' sorts before 's|',
    # so canonical ids win whenever one is in the component
    surf = (
        comps.filter(F.col("node").startswith("s|"))
        .select(
            F.expr("substring(node, 3)").alias("surface"),
            F.expr("substring(component, 3)").alias("canonical_id"),
        )
    )
    return (
        linked.select("surface", "ent_class")
        .join(surf, "surface", "left")
        .select(
            "surface",
            "ent_class",
            F.coalesce(F.col("canonical_id"), F.concat(F.lit("surface:"), F.lower("surface"))).alias(
                "canonical_id"
            ),
        )
    )


def typed_triples(raw: DataFrame, surface_map: DataFrame) -> DataFrame:
    """Surface triples + broadcast surface→canonical map → TRIPLE_SCHEMA rows.

    Emits relation triples plus the rdf:type support triples implied by
    relation slots (needed by sh:class checks, SURVEY.md §2.8).

    Scale design — dedup without a wide shuffle: a triple's duplicates can
    only come from the same source page, because ``graph`` (the source url)
    is part of the RDF-set identity (SURVEY.md §2.6 U4).  When ``raw`` is
    hash-partitioned by ``src_url`` (the pipeline repartitions once at the
    extract boundary, 5 narrow columns), every branch below preserves that
    partitioning through broadcast joins and projections, and since the
    partitioning key is a subset of each branch's dedup key set Catalyst
    plans the per-branch ``dropDuplicates`` as a partition-local hash
    aggregate — **no exchange**.  Branches are predicate-disjoint, so the
    union of per-branch dedups equals a global dedup at a fraction of the
    shuffle cost (the big win at 10^12 rows).
    """
    smap = F.broadcast(surface_map.select("surface", "canonical_id").dropDuplicates(["surface"]))
    sm_s = smap.withColumnRenamed("surface", "s_surf").withColumnRenamed(
        "canonical_id", "s_id"
    )
    sm_o = smap.withColumnRenamed("surface", "o_surf").withColumnRenamed(
        "canonical_id", "o_id"
    )
    resolved = (
        raw.join(sm_s, raw["subj_surface"] == sm_s["s_surf"], "left")
        .join(
            sm_o,
            (raw["obj_surface"] == sm_o["o_surf"]) & (raw["obj_kind"] == ENTITY),
            "left",
        )
        .select(
            F.coalesce(F.col("s_id"), F.concat(F.lit("surface:"), F.lower("subj_surface"))).alias(
                "subject"
            ),
            F.col("predicate"),
            F.when(F.col("obj_kind") == ENTITY,
                   F.coalesce(F.col("o_id"), F.concat(F.lit("surface:"), F.lower("obj_surface"))))
            .otherwise(F.col("obj_surface"))
            .alias("object_value"),
            F.when(F.col("obj_kind") == ENTITY, F.lit("iri"))
            .otherwise(F.lit("literal"))
            .alias("object_type"),
            F.when(F.col("obj_kind") != ENTITY, F.lit(XSD_INTEGER))
            .cast("string")
            .alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
            F.col("src_url").alias("graph"),
        )
    )

    # inverse edges: publishes ⇒ publishedBy (satisfies the Dataset shape's
    # minCount/class on kg:publishedBy)
    inverse_rows = resolved.filter(F.col("predicate") == KG + "publishes").select(
        F.col("object_value").alias("subject"),
        F.lit(KG + "publishedBy").alias("predicate"),
        F.col("subject").alias("object_value"),
        F.lit("iri").alias("object_type"),
        F.lit(None).cast("string").alias("object_datatype"),
        F.lit(None).cast("string").alias("object_lang"),
        "graph",
    )

    # rdf:type support triples from relation-slot classes.
    # Built as explode-of-array from ONE scan of resolved (a union of two
    # scans would erase the src_url partitioning and force the dedup below
    # back into a shuffle).
    cls_map = [(p, s, o) for p, (s, o) in PREDICATE_CLASSES.items()]
    subj_cls = F.create_map(*[x for p, s, _ in cls_map for x in (F.lit(p), F.lit(s))])
    obj_cls = F.create_map(
        *[x for p, _, o in cls_map if o is not None for x in (F.lit(p), F.lit(o))]
    )
    node_cls_pairs = F.array(
        F.struct(F.col("subject").alias("node"), subj_cls[F.col("predicate")].alias("cls")),
        F.struct(
            F.when(F.col("object_type") == "iri", F.col("object_value")).alias("node"),
            obj_cls[F.col("predicate")].alias("cls"),
        ),
    )
    type_rows = (
        resolved.select(
            F.explode(
                F.filter(
                    node_cls_pairs,
                    lambda x: x["node"].isNotNull() & x["cls"].isNotNull(),
                )
            ).alias("nc"),
            "graph",
        )
        .select(
            F.col("nc.node").alias("subject"),
            F.lit(RDF_TYPE).alias("predicate"),
            F.col("nc.cls").alias("object_value"),
            F.lit("iri").alias("object_type"),
            F.lit(None).cast("string").alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
            "graph",
        )
    )
    # kg:name triples so minCount(name) holds for every linked entity —
    # same explode-not-union shape to keep the src_url partitioning
    name_rows = (
        raw.select(
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.array(
                            F.col("subj_surface"),
                            F.when(F.col("obj_kind") == ENTITY, F.col("obj_surface")),
                        ),
                        lambda s: s.isNotNull(),
                    )
                )
            ).alias("surface"),
            F.col("src_url").alias("graph"),
        )
        .join(smap, "surface")
        .select(
            F.col("canonical_id").alias("subject"),
            F.lit(KG + "name").alias("predicate"),
            F.col("surface").alias("object_value"),
            F.lit("literal").alias("object_type"),
            F.lit("http://www.w3.org/2001/XMLSchema#string").alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
            "graph",
        )
    )
    # per-branch dedup: partition-local when raw is src_url-partitioned;
    # branches are predicate-disjoint so this equals a global dropDuplicates
    return (
        resolved.dropDuplicates()
        .unionByName(inverse_rows.dropDuplicates())
        .unionByName(type_rows.dropDuplicates())
        .unionByName(name_rows.dropDuplicates())
    )


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    profile: str = "kg_extraction",
    n_groups: int = 4,
    n_buckets: int = 32,
    resume: bool = True,
    extra_alias_rows: list[tuple[str, str]] | None = None,
) -> PipelineResult:
    """Run extract → link → canonicalize → validate → MERGE over ``pages``.

    ``n_groups`` splits the input into checkpointable partition groups
    (grouped by url hash); each group is validated and merged independently
    with a lineage row + manifest entry, so a killed job resumes where it
    stopped (FIXTURES.md §8).
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "checkpoint_manifest.json")
    lineage_path = os.path.join(out_dir, "lineage.jsonl")
    table_path = os.path.join(out_dir, "triples")

    done: set[str] = set()
    if resume and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            done = {k for k, v in json.load(f).items() if v == "done"}

    shapes = compile_shapes(profile_shapes_ttl(profile))
    adict = alias_dict_df(spark, alias_rows() + (extra_alias_rows or []))

    totals = {"triples_in": 0, "triples_valid": 0, "violations": 0, "merged": 0}
    stage_seconds: dict[str, float] = {}
    entities = None
    viol_all = None

    pages_g = pages.withColumn("_grp", F.pmod(F.xxhash64(F.col("url")), n_groups))
    grp_sizes = {
        r["_grp"]: r["n"]
        for r in pages_g.groupBy("_grp").agg(F.count("*").alias("n")).collect()
    }
    for grp in range(n_groups):
        key = f"grp={grp}"
        if key in done:
            continue
        started = "deterministic"  # timestamps recorded as opaque markers in tests
        batch_pages = pages_g.filter(F.col("_grp") == grp).drop("_grp")
        # eager stage-boundary materialization: extraction runs once, the
        # linking map and typed triples are computed once, and the
        # multi-branch validation plan reads materialized inputs (on a real
        # cluster these become reliable checkpoints / intermediate tables)
        t0 = time.time()
        # one narrow shuffle on src_url here buys shuffle-FREE dedup of the
        # (much wider, 4x larger) typed-triple stream downstream: every
        # typed_triples branch keeps this hash partitioning, and graph ∈
        # every dedup key, so Catalyst plans those dedups partition-local.
        # The checkpoint must execute with AQE off — AdaptiveSparkPlanExec
        # reports UnknownPartitioning into the LogicalRDD, which would force
        # the downstream dedups back into full-width shuffles.
        aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            raw = (
                extract_raw_triples(batch_pages)
                .repartition(F.col("src_url"))
                .localCheckpoint(eager=True)
            )
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        stage_seconds["extract"] = stage_seconds.get("extract", 0.0) + time.time() - t0

        t0 = time.time()
        # the distinct-surface set is tiny after dedup — materialize it so
        # the exact-link/LSH/CC consumers never rescan the mention stream
        mentions = mentions_from_raw(raw).localCheckpoint(eager=True)
        linked = link_mentions(spark, mentions, adict)
        surface_map = canonicalize(spark, linked, max_iter=3).localCheckpoint(eager=True)
        stage_seconds["link_canon"] = (
            stage_seconds.get("link_canon", 0.0) + time.time() - t0
        )

        t0 = time.time()
        # materialize the wide typed-triple stream through scratch parquet,
        # NOT localCheckpoint: columnar write+reread is ~10x cheaper than
        # caching 10^7 deserialized row objects, survives executor loss on a
        # real cluster, and downstream scans get column pruning for free.
        scratch = os.path.join(out_dir, "_scratch", key)
        typed_triples(raw, surface_map).write.mode("overwrite").parquet(
            os.path.join(scratch, "typed")
        )
        triples = spark.read.parquet(os.path.join(scratch, "typed"))
        stage_seconds["typed_triples"] = (
            stage_seconds.get("typed_triples", 0.0) + time.time() - t0
        )

        t0 = time.time()
        validate(spark, triples, shapes).write.mode("overwrite").parquet(
            os.path.join(scratch, "violations")
        )
        violations = spark.read.parquet(os.path.join(scratch, "violations"))
        stage_seconds["validate"] = stage_seconds.get("validate", 0.0) + time.time() - t0
        # violating focus nodes are a tiny distinct set → broadcast the anti
        # join so the conformant filter never shuffles the triple stream
        bad_focus = F.broadcast(
            violations.filter(F.col("resultSeverity") == SEVERITY_VIOLATION)
            .select(F.col("focusNode").alias("subject"))
            .dropDuplicates()
        )
        conformant = triples.join(bad_focus, "subject", "left_anti")

        t0 = time.time()
        n_in = triples.count()
        n_viol = violations.count()
        # typed_triples already emitted a deduplicated stream → merge skips
        # its own dropDuplicates shuffle
        merged = merge_triples(
            spark, table_path, conformant, n_buckets=n_buckets, assume_unique=True
        )
        n_valid = conformant.count()
        stage_seconds["merge"] = stage_seconds.get("merge", 0.0) + time.time() - t0

        ent = surface_map.groupBy("canonical_id").agg(
            F.sort_array(F.collect_set("surface")).alias("surface_forms"),
            F.min("ent_class").alias("ent_class"),
        ).localCheckpoint(eager=True)
        entities = ent if entities is None else entities.unionByName(ent)
        viol_all = violations if viol_all is None else viol_all.unionByName(violations)

        totals["triples_in"] += n_in
        totals["triples_valid"] += n_valid
        totals["violations"] += n_viol
        totals["merged"] += merged

        with open(lineage_path, "a") as f:
            f.write(
                json.dumps(
                    {
                        "partition_key": key,
                        "src_url_count": int(grp_sizes.get(grp, 0)),
                        "triples_in": n_in,
                        "triples_valid": n_valid,
                        "violations": n_viol,
                        "started_at": started,
                        "finished_at": "deterministic",
                    }
                )
                + "\n"
            )
        done.add(key)
        with open(manifest_path, "w") as f:
            json.dump({k: "done" for k in sorted(done)}, f)

    if entities is None:
        entities = spark.createDataFrame(
            [], "canonical_id string, surface_forms array<string>, ent_class string"
        )
        from ..model import VIOLATION_SCHEMA

        viol_all = spark.createDataFrame([], VIOLATION_SCHEMA)
    entities = entities.dropDuplicates(["canonical_id"])
    entities.write.mode("overwrite").parquet(os.path.join(out_dir, "entities"))

    return PipelineResult(
        triples_in=totals["triples_in"],
        triples_valid=totals["triples_valid"],
        violations=totals["violations"],
        merged=totals["merged"],
        entities=entities,
        violations_df=viol_all,
        stage_seconds={k: round(v, 3) for k, v in stage_seconds.items()},
    )
