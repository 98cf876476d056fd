"""Connected components: label propagation over DataFrame self-joins.

Canonicalization step of the north star ("canonicalized with
connected-components label propagation over the mention-graph").  Plain
DataFrame loop — no GraphFrames dependency (SURVEY.md §7.2) — with
``localCheckpoint`` every iteration to truncate lineage (SURVEY.md §4.3),
which is what keeps the plan bounded at web scale.

Algorithm: alternating min-label propagation.  Each iteration joins the
label table to the (symmetrized) edge list and takes the min label over the
closed neighborhood; converges in O(diameter) iterations.  Mention graphs
are unions of small stars (alias groups), so diameter is tiny; ``max_iter``
bounds the worst case (SURVEY.md §7.3 "CC convergence").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    max_iter: int = 10,
    checkpoint_every: int = 1,
) -> DataFrame:
    """(src, dst) string edges → (node, component) with component = min node id.

    Deterministic: component ids are the lexicographic min member, so reruns
    and resumed jobs produce identical canonical ids (MERGE-key stability,
    SURVEY.md §7.3).
    """
    sym = (
        edges.select(F.col("src"), F.col("dst"))
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .dropDuplicates()
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .dropDuplicates()
        .withColumn("component", F.col("node"))
    )
    for i in range(max_iter):
        # min label over closed neighborhood
        neighbor = (
            sym.join(labels, sym["dst"] == labels["node"])
            .select(F.col("src").alias("node"), F.col("component"))
        )
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        converged = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .isEmpty()
        )
        labels = new_labels
        if converged:
            break
    return labels
