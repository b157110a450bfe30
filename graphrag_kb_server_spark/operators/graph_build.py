"""T4/T5/T7 — entity merge, relation merge, graph finalize (degrees).

Reference semantics (artifact-pinned, SURVEY.md §2.2):
- T4: group extracted entity mentions by canonical name; union source
  chunk ids; concat distinct descriptions with ``<SEP>``; keep a type
  (graphml node attrs in
  /root/reference/docs/dummy_projects/lightrag/dwell1/lightrag/graph_chunk_entity_relation.graphml).
- T5: group relations by the undirected pair ``sorted((src, tgt))``
  (dedup-key precedent at
  /root/reference/graphrag_kb_server/service/lightrag/lightrag_search.py:1078-1082);
  SUM the per-mention weights; union keywords/descriptions/chunk ids.
- T7: node degree and edge combined_degree (legacy schema
  ``entities.degree``, ``relationships.combined_degree`` in
  /root/reference/data/onepoint/output/*.parquet).

Scale design: mention counts per entity are Zipfian (hub entities appear
in a large fraction of pages), so a naive ``groupBy(name)`` puts one hub
key in one reducer task. We aggregate in TWO phases: a map-side-style
partial aggregate keyed by ``(name, salt)`` (salt = hash(chunk_id) % S
spreads a hub key over S reducers), then a final aggregate by ``name``
over the ≤S partial rows per key. All aggregation states are algebraic
(collect_set/sum/count merge associatively), so the result is exact.
AQE skew-join handling is ON as a second line of defense for the joins.

Determinism: every array output is ``array_sort``-ed and every "pick
one" is an explicit ``min``/``max`` — no implicit row-order dependence
(distributed row order is nondeterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import GRAPH_FIELD_SEP

DEFAULT_SALT_BUCKETS = 16


def _salted_two_phase(
    df: DataFrame,
    key_cols: list[str],
    salt_source: str,
    partial_aggs: list,
    final_aggs: list,
    salt_buckets: int,
) -> DataFrame:
    """Generic exact two-phase aggregation with key salting.

    partial_aggs/final_aggs are lists of Column aggregates; the final
    aggregates must consume the partial outputs by alias.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_source)), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*final_aggs)


def build_nodes(mentions: DataFrame, salt_buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """mentions → nodes(name, type, description, source_chunk_ids, mention_count).

    T4 entity merge. Each mention contributes its subj and obj; type is
    resolved by majority-free deterministic rule (min of distinct types —
    explicit, order-independent); descriptions joined with <SEP> in
    sorted order, mirroring the reference's <SEP>-joined provenance.
    """
    sides = mentions.select(
        F.col("subj").alias("name"),
        F.col("subj_type").alias("type"),
        F.col("description"),
        F.col("chunk_id"),
        F.col("weight"),
    ).unionByName(
        mentions.select(
            F.col("obj").alias("name"),
            F.col("obj_type").alias("type"),
            F.col("description"),
            F.col("chunk_id"),
            F.col("weight"),
        )
    )
    partial_aggs = [
        F.collect_set("type").alias("p_types"),
        F.collect_set("description").alias("p_descs"),
        F.collect_set("chunk_id").alias("p_chunks"),
        F.count(F.lit(1)).alias("p_cnt"),
    ]
    final_aggs = [
        F.array_min(F.flatten(F.collect_set("p_types"))).alias("type"),
        F.concat_ws(
            GRAPH_FIELD_SEP,
            F.array_sort(F.array_distinct(F.flatten(F.collect_set("p_descs")))),
        ).alias("description"),
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_set("p_chunks")))
        ).alias("source_chunk_ids"),
        F.sum("p_cnt").alias("mention_count"),
    ]
    return _salted_two_phase(
        sides, ["name"], "chunk_id", partial_aggs, final_aggs, salt_buckets
    )


def build_edges(mentions: DataFrame, salt_buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """mentions → edges(src, tgt, weight, keywords, description, source_chunk_ids).

    T5 relation merge: undirected key = (least, greatest); weight =
    SUM of mention weights (reference sums LLM scores); keywords =
    sorted distinct predicates joined with <SEP>.
    """
    undirected = mentions.select(
        F.least("subj", "obj").alias("src"),
        F.greatest("subj", "obj").alias("tgt"),
        F.col("pred"),
        F.col("description"),
        F.col("chunk_id"),
        F.col("weight"),
    )
    partial_aggs = [
        F.sum("weight").alias("p_weight"),
        F.collect_set("pred").alias("p_preds"),
        F.collect_set("description").alias("p_descs"),
        F.collect_set("chunk_id").alias("p_chunks"),
    ]
    final_aggs = [
        F.sum("p_weight").alias("weight"),
        F.concat_ws(
            GRAPH_FIELD_SEP,
            F.array_sort(F.array_distinct(F.flatten(F.collect_set("p_preds")))),
        ).alias("keywords"),
        F.concat_ws(
            GRAPH_FIELD_SEP,
            F.array_sort(F.array_distinct(F.flatten(F.collect_set("p_descs")))),
        ).alias("description"),
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_set("p_chunks")))
        ).alias("source_chunk_ids"),
    ]
    return _salted_two_phase(
        undirected, ["src", "tgt"], "chunk_id", partial_aggs, final_aggs, salt_buckets
    )


def node_degrees(edges: DataFrame) -> DataFrame:
    """T7: degree per node from the undirected edge list."""
    return (
        edges.select(F.explode(F.array("src", "tgt")).alias("name"))
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def finalize_graph(nodes: DataFrame, edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Attach degree to nodes and combined_degree to edges.

    degrees is tiny relative to mentions (one row per entity) but can
    still be large at web scale — Spark picks broadcast vs shuffle join
    by size (autoBroadcastJoinThreshold + AQE); we don't force it.
    """
    deg = node_degrees(edges)
    nodes_out = nodes.join(deg, "name", "left").withColumn(
        "degree", F.coalesce(F.col("degree"), F.lit(0)).cast("int")
    )
    d_src = deg.select(F.col("name").alias("src"), F.col("degree").alias("_sd"))
    d_tgt = deg.select(F.col("name").alias("tgt"), F.col("degree").alias("_td"))
    edges_out = (
        edges.join(d_src, "src", "left")
        .join(d_tgt, "tgt", "left")
        .withColumn(
            "combined_degree",
            (F.coalesce("_sd", F.lit(0)) + F.coalesce("_td", F.lit(0))).cast("bigint"),
        )
        .drop("_sd", "_td")
    )
    return nodes_out, edges_out
