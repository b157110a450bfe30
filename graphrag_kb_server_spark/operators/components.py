"""G3 — connected components via iterative hash-join label propagation.

Reference semantics: ``nx.connected_components`` sorted by size
(/root/reference/graphrag_kb_server/service/lightrag/lightrag_graph_support.py:151-164;
also the LCC step inside clustering at lightrag_clustering.py:236-247).
networkx is driver-bound; at web scale we use the alternating
large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14) — each iteration is two hash
joins + aggregations, converging in O(log^2 n) rounds.

Implementation notes for Spark:
- labels start as each node's own id (min-string semantics: component
  id = lexicographically smallest member — deterministic, matching the
  "stable ordering" the reference imposes on its clustering inputs).
- every iteration ends in ``localCheckpoint(eager=True)`` to cut the
  lineage chain (iterative DataFrame plans otherwise grow exponentially
  in optimizer time and break at ~20 rounds).
- convergence check is an aggregate (sum of label changes), one action
  per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "tgt",
    max_iterations: int = 50,
) -> DataFrame:
    """edges(src, tgt) → (node STRING, component STRING).

    component = min node id (string order) in the component. Isolated
    nodes only appear if present as self-edges or in the node set of
    ``edges``; callers union in singletons if needed.
    """
    # symmetrize once; dedup to keep the iteration input minimal
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
    )
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.localCheckpoint(eager=True)

    # label(node) = min neighbor-or-self, iterated to fixpoint.
    # This is the simple "min-label propagation" formulation: each round
    # label_new(v) = min(label(v), min over neighbors u of label(u)).
    # Rounds = graph diameter; for the short-diameter similarity graphs
    # of entity linking this beats the constant-factor-heavier
    # large-star/small-star; both are provided (see _large_small_star).
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iterations):
        neigh = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        stepped = labels.join(neigh, "node", "left").select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
            ).alias("label"),
            (
                F.col("nlabel").isNotNull() & (F.col("nlabel") < F.col("label"))
            ).cast("int").alias("changed"),
        )
        # pointer jumping (label(v) <- label(label(v)) halves remaining
        # depth) folded into the SAME round plan — one checkpoint and
        # one action per iteration, not two
        jump = stepped.select(
            F.col("node").alias("label"), F.col("label").alias("jlabel")
        )
        new_labels = (
            stepped.join(jump, "label", "left")
            .select(
                "node",
                F.coalesce("jlabel", "label").alias("label"),
                "changed",
            )
            .localCheckpoint(eager=True)
        )
        n_changed = new_labels.agg(F.sum("changed")).first()[0] or 0
        labels = new_labels.drop("changed")
        if n_changed == 0:
            break

    return labels.select("node", F.col("label").alias("component"))


def component_sizes(components: DataFrame) -> DataFrame:
    """Components ranked by size desc (reference sorts by size,
    lightrag_graph_support.py:151-164)."""
    return (
        components.groupBy("component")
        .agg(F.count(F.lit(1)).alias("size"))
        .orderBy(F.desc("size"), "component")
    )
