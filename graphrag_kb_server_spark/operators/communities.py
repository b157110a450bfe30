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


#: semi-synchronous update stride: round r updates only nodes whose
#: md5-hash parity equals r % stride (see label_propagation docstring)
LPA_STRIDE = 3


def _lpa_parity(node_col) -> F.Column:
    """Deterministic node parity in [0, LPA_STRIDE): first 8 hex chars
    of md5, mod stride (DuckDB-mirrorable, unlike xxhash64)."""
    return F.pmod(
        F.conv(F.substring(F.md5(node_col), 1, 8), 16, 10).cast("bigint"),
        F.lit(LPA_STRIDE),
    )


def _label_propagation_driver(sym: DataFrame, max_iterations: int) -> DataFrame:
    """Driver-side twin of the distributed semi-synchronous rounds:
    same parity mask, same (wsum desc, label asc) adoption, same
    full-sweep convergence check — collected once, returned as a
    DataFrame with the caller's string schema."""
    import hashlib
    from collections import defaultdict

    adj: dict[str, list] = defaultdict(list)
    for r in sym.collect():
        adj[r["a"]].append((r["b"], r["w"]))
    for lst in adj.values():
        lst.sort()  # deterministic accumulation order
    nodes = sorted(adj)
    par = {
        n: int(hashlib.md5(n.encode("utf-8")).hexdigest()[:8], 16) % LPA_STRIDE
        for n in nodes
    }
    labels = {n: n for n in nodes}
    it = 0
    while it < max_iterations:
        group = min(LPA_STRIDE, max_iterations - it)
        changed = 0
        for _ in range(group):
            active = it % LPA_STRIDE
            new = dict(labels)
            for n in nodes:
                if par[n] != active:
                    continue
                votes: dict[str, float] = defaultdict(float)
                for nb, w in adj[n]:
                    votes[labels[nb]] += w
                bw = max(votes.values())
                cands = [l for l, v in votes.items() if v == bw]
                # prefer the current label on ties (stability: without
                # it, all-tie neighborhoods like cliques rotate labels
                # across parity classes forever), then lexicographic min
                pick = labels[n] if labels[n] in cands else min(cands)
                if pick != labels[n]:
                    changed += 1
                new[n] = pick
            labels = new
            it += 1
        if changed == 0:
            break
    dt = sym.schema["a"].dataType
    from pyspark.sql import types as T

    return sym.sparkSession.createDataFrame(
        [(n, labels[n]) for n in nodes],
        T.StructType(
            [T.StructField("node", dt), T.StructField("label", dt)]
        ),
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "tgt",
    weight: str | None = "weight",
    max_iterations: int = 12,
    small_graph_threshold: int = 100_000,
) -> DataFrame:
    """edges → (node, label): SEMI-synchronous weighted LPA,
    deterministic.

    Fully synchronous LPA oscillates on bipartite-ish structure — on
    the reference's shipped onepoint graph (793 edges) it lands on a
    DEGENERATE partition (modularity −0.10 vs Leiden's 0.54). The
    standard deterministic fix (Cordasco & Gargano, semi-synchronous
    LPA) updates one hash-parity class of nodes per round, which
    provably breaks two-cycles: round r updates only nodes with
    md5-parity r % LPA_STRIDE. With stride 3 the same graph reaches
    modularity 0.47 (87% of Leiden; see tests/test_ref_communities.py
    for the measured bound). Ties prefer the node's current label, then
    the lexicographic minimum — both deterministic.

    Round-latency control: rounds run in groups of LPA_STRIDE (one full
    sweep) between convergence checks; each group ends in ONE action (a
    lazy checkpoint materialized by the convergence aggregate). A
    change-flag column is OR-accumulated through the group, so "no node
    changed across a full sweep" — a true global fixpoint of the
    semi-sync rule — is what terminates the loop.
    """
    w = F.col(weight) if weight else F.lit(1.0)
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"), w.alias("w"))
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
    ).localCheckpoint(eager=True)

    # Size-adaptive execution (same rationale + threshold as
    # connected_components): a distributed iterative loop over a few
    # thousand edges pays seconds of per-round scheduling for
    # microseconds of work. Below the threshold the EXACT same
    # semi-synchronous rounds run as a driver loop over the collected
    # edges — identical deterministic output, one collect instead of
    # rounds of shuffles. String ids only (the md5 parity must hash the
    # same bytes both paths); larger or non-string graphs stay
    # distributed.
    if (
        sym.schema["a"].dataType.simpleString() == "string"
        and sym.count() <= small_graph_threshold
    ):
        return _label_propagation_driver(sym, max_iterations)

    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).localCheckpoint(eager=True)

    it = 0
    while it < max_iterations:
        group = min(LPA_STRIDE, max_iterations - it)
        acc = labels.withColumn("_any", F.lit(0))
        for _ in range(group):
            # only the active parity class votes this round — the
            # aggregation and rank run over a third of the nodes
            neigh = (
                sym.where(_lpa_parity(F.col("a")) == F.lit(it % LPA_STRIDE))
                .join(
                    acc.select("node", "label").withColumnRenamed("node", "b"),
                    "b",
                )
                .groupBy(F.col("a").alias("node"), "label")
                .agg(F.sum("w").alias("wsum"))
            )
            # tie-break prefers the node's CURRENT label (stability on
            # all-tie neighborhoods — cliques rotate forever without
            # it), then the lexicographic minimum; the cur join shares
            # the rank window's hash partitioning on node
            cur = acc.select("node", F.col("label").alias("_cur"))
            pick_w = Window.partitionBy("node").orderBy(
                F.desc("wsum"),
                (F.col("label") == F.col("_cur")).cast("int").desc(),
                "label",
            )
            best = (
                neigh.join(cur, "node")
                .withColumn("_rk", F.row_number().over(pick_w))
                .where(F.col("_rk") == 1)
                .select("node", F.col("label").alias("new_label"))
            )
            stepped = F.coalesce("new_label", F.col("label"))
            acc = acc.join(best, "node", "left").select(
                "node",
                stepped.alias("label"),
                F.greatest(
                    "_any", (stepped != F.col("label")).cast("int")
                ).alias("_any"),
            )
            # lazy per-round checkpoint: acc feeds both the next
            # round's vote join and its update join — truncating
            # lineage here keeps the group plan linear instead of
            # replaying each earlier round 2^k times; materialization
            # rides the group-end aggregate's job (one action/sweep).
            acc = acc.localCheckpoint(eager=False)
            it += 1
        changed = acc.agg(F.sum("_any")).first()[0] or 0
        labels = acc.drop("_any")
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
