"""Connected components over near-dup candidate pairs (SURVEY §2C X02:
"connected components via iterative self-join").

After LSH emits candidate pairs, dedup groups are the connected components
of the pair graph: keep one doc per component.  Algorithm: iterative
min-label propagation (a.k.a. hash-to-min) — every vertex repeatedly adopts
the smallest label among itself and its neighbors.  Converges in
O(log(diameter)) rounds; each round is one join + one aggregate, both plain
shuffles on doc_id, so the pattern runs unchanged on a 1000-executor
cluster.  Deterministic (labels are doc_ids; no RNG).

The loop is driver-side but each iteration is fully distributed; the only
driver-visible value per round is the convergence count.  For graphs with
huge diameter (rare for dedup: near-dup clusters are dense and shallow),
swap in the alternating large/small-star algorithm — same join shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, max_iter: int = 20
) -> DataFrame:
    """(da, db) undirected edges -> (doc_id, component) with component =
    min doc_id reachable.  Isolated vertices are absent (a doc with no
    near-dup pair is its own trivial component)."""
    edges = (
        pairs.select(F.col("da").alias("src"), F.col("db").alias("dst"))
        .union(pairs.select(F.col("db").alias("src"), F.col("da").alias("dst")))
        .distinct()
    )
    # initial label: min neighbor (or self if smaller)
    labels = edges.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("comp")
    ).select(F.col("src").alias("doc_id"), "comp")

    for _ in range(max_iter):
        # propagate: my new label = min(my label, labels of my neighbors)
        neighbor_labels = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("comp").alias("ncomp"))
        )
        new_labels = (
            labels.join(neighbor_labels, labels.doc_id == neighbor_labels.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))
                ).alias("comp"),
            )
        )
        # materialize FIRST (lineage cut), then count convergence against
        # the old labels — counting the un-checkpointed frame would compute
        # the whole propagation join twice per round
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_keep_list(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Final near-dup dedup decision: for every doc, keep=True unless it is
    a non-representative member of a component (representative = min doc_id)."""
    comps = connected_components(pairs)
    drop = comps.filter(F.col("doc_id") != F.col("comp")).select("doc_id")
    return docs.join(drop, "doc_id", "left_anti")
