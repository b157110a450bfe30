"""G2 — hierarchical community detection.

Reference semantics: graspologic ``hierarchical_leiden(max_cluster_size,
seed=42)`` over the largest connected component with stabilized node/edge
ordering, yielding (level, cluster, parent_cluster, node) rows
(/root/reference/graphrag_kb_server/service/lightrag/lightrag_clustering.py:168-233,
LCC + stabilization :236-292).

Scale deviation (documented, SURVEY.md §7 hard-part i): Leiden has no
distributed Spark analogue; we implement **seeded label propagation**
(synchronous LPA with deterministic tie-breaks) as the flat clustering,
then reproduce the *hierarchical max-cluster-size* contract by
recursively splitting oversize clusters: an oversize cluster's subgraph
is re-clustered with a level-salted seed, its children get new cluster
ids and ``parent_cluster`` set — the same output schema and the same
"no cluster exceeds max_cluster_size unless indivisible" guarantee.

Determinism: label updates take the min label among the
maximum-weight neighbor labels (explicit ordering, no RNG);
iteration count bounds termination (LPA oscillation guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .components import connected_components


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "tgt",
    weight: str | None = "weight",
    max_iterations: int = 10,
) -> DataFrame:
    """edges → (node, label): synchronous weighted LPA, deterministic."""
    w = F.col(weight) if weight else F.lit(1.0)
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"), w.alias("w"))
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
    ).localCheckpoint(eager=True)

    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).localCheckpoint(eager=True)

    # Round-latency control: each round is ONE Spark action, not two —
    # the checkpoint is lazy and the convergence aggregate's job
    # materializes it — and rounds run in pairs between convergence
    # checks (check_every=2). A converged labeling is a fixpoint of the
    # update rule, so the at-most-one extra round a batched check runs
    # is the identity — results are unchanged, actions are ~4x fewer.
    check_every = 2
    it = 0
    while it < max_iterations:
        group = min(check_every, max_iterations - it)
        for _ in range(group):
            neigh = (
                sym.join(labels.withColumnRenamed("node", "b"), "b")
                .groupBy(F.col("a").alias("node"), "label")
                .agg(F.sum("w").alias("wsum"))
            )
            pick_w = Window.partitionBy("node").orderBy(F.desc("wsum"), "label")
            best = (
                neigh.withColumn("_rk", F.row_number().over(pick_w))
                .where(F.col("_rk") == 1)
                .select("node", F.col("label").alias("new_label"))
            )
            updated = labels.join(best, "node", "left").select(
                "node",
                F.coalesce("new_label", "label").alias("label"),
                (F.coalesce("new_label", "label") != F.col("label")).cast("int").alias("chg"),
            )
            labels = updated.drop("chg")
            it += 1
        ck = updated.localCheckpoint(eager=False)
        changed = ck.agg(F.sum("chg")).first()[0] or 0
        labels = ck.drop("chg")
        if changed == 0:
            break
    return labels


def hierarchical_communities(
    edges: DataFrame,
    max_cluster_size: int = 10,
    max_levels: int = 4,
    lpa_iterations: int = 10,
    use_lcc: bool = True,
) -> DataFrame:
    """→ (node, level INT, cluster STRING, parent_cluster STRING|NULL).

    ``use_lcc=True`` (the reference's behavior): clustering runs over
    the LARGEST CONNECTED COMPONENT only — the reference extracts the
    LCC with stabilized ordering before hierarchical_leiden
    (lightrag_clustering.py:236-247); nodes outside the LCC get no
    community assignment.

    Level 0 = LPA over the (LCC-gated) graph; oversize clusters are
    split recursively (subgraph LPA with min-label components as
    fallback when LPA cannot split — then a deterministic
    hash-partition guarantees progress, mirroring graspologic's forced
    splitting of indivisible oversize clusters).
    """
    if use_lcc:
        lcc = largest_connected_component(edges).localCheckpoint(eager=True)
        edges = (
            edges.join(lcc.withColumnRenamed("node", "src"), "src")
            .join(lcc.withColumnRenamed("node", "tgt"), "tgt")
        )
    assignments: list[DataFrame] = []
    lvl0 = label_propagation(edges, max_iterations=lpa_iterations).select(
        "node", F.lit(0).alias("level"), F.col("label").alias("cluster"),
        F.lit(None).cast("string").alias("parent_cluster"),
    ).localCheckpoint(eager=True)
    assignments.append(lvl0)
    current = lvl0

    for level in range(1, max_levels + 1):
        sizes = current.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
        oversize = sizes.where(F.col("n") > max_cluster_size).select("cluster")
        if oversize.isEmpty():
            break
        members = current.join(oversize, "cluster").select("node", "cluster")
        sub_edges = (
            edges.join(members.withColumnRenamed("node", "src"), "src")
            .withColumnRenamed("cluster", "_c1")
            .join(members.withColumnRenamed("node", "tgt"), "tgt")
            .where(F.col("_c1") == F.col("cluster"))
            .select("src", "tgt", "weight", F.col("cluster").alias("parent"))
        )
        # salt edge weights per level to perturb ties → different split
        sub = label_propagation(
            sub_edges.withColumn(
                "weight",
                F.col("weight")
                + F.pmod(F.xxhash64(F.concat(F.lit(str(level)), "src", "tgt")), F.lit(7))
                / F.lit(100.0),
            ),
            max_iterations=lpa_iterations,
        )
        parent_of = members.withColumnRenamed("cluster", "parent")
        child = (
            sub.join(parent_of, "node")
            .select(
                "node",
                F.lit(level).alias("level"),
                F.concat(F.lit(f"L{level}:"), "parent", F.lit("/"), "label").alias("cluster"),
                F.col("parent").alias("parent_cluster"),
            )
        )
        # forced progress: if a child cluster == whole parent and still
        # oversize, hash-split it into ceil(n/max) buckets
        csize_w = Window.partitionBy("cluster")
        child = child.withColumn("_n", F.count(F.lit(1)).over(csize_w))
        child = child.withColumn(
            "cluster",
            F.when(
                F.col("_n") > max_cluster_size,
                F.concat(
                    "cluster",
                    F.lit("#"),
                    F.pmod(
                        F.xxhash64("node"),
                        F.ceil(F.col("_n") / F.lit(max_cluster_size)).cast("long"),
                    ).cast("string"),
                ),
            ).otherwise(F.col("cluster")),
        ).drop("_n").localCheckpoint(eager=True)
        assignments.append(child)
        current = child

    out = assignments[0]
    for a in assignments[1:]:
        out = out.unionByName(a)
    return out


def largest_connected_component(edges: DataFrame) -> DataFrame:
    """The reference clusters over the LCC (lightrag_clustering.py:236-247):
    returns the node set of the largest component."""
    comp = connected_components(edges)
    top = (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "component")
        .limit(1)
        .select("component")
    )
    return comp.join(F.broadcast(top), "component").select("node")


def community_table(assignments: DataFrame, nodes: DataFrame) -> DataFrame:
    """G9 — the communities output table (legacy GraphRAG shape:
    community/level/parent/children/entity_ids/size, SURVEY.md §1.2)."""
    per_cluster = assignments.groupBy("level", "cluster", "parent_cluster").agg(
        F.array_sort(F.collect_set("node")).alias("entity_ids"),
        F.count(F.lit(1)).alias("size"),
    )
    children = (
        per_cluster.where(F.col("parent_cluster").isNotNull())
        .groupBy("parent_cluster")
        .agg(F.array_sort(F.collect_set("cluster")).alias("_kids"))
        .withColumnRenamed("parent_cluster", "cluster")
    )
    return (
        per_cluster.join(children, "cluster", "left")
        .select(
            "cluster", "level", "parent_cluster",
            F.coalesce("_kids", F.array().cast("array<string>")).alias("children"),
            "entity_ids", "size",
        )
        .orderBy("level", F.desc("size"), "cluster")
    )
