"""Small graph-support operators.

- G7 entity-type histogram
  (/root/reference/graphrag_kb_server/service/lightrag/lightrag_graph_support.py:48-52)
- G9 community lookup by id (project_server.py:1873-1962)
- P3 abbreviation detection feeds linking (see operators/linking.py)
- P5 group-by-type bucketing (service/search/matching.py:88-95)
- P8 topics projection from the centrality table
  (service/topic_generation.py:48-66)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def entity_type_histogram(nodes: DataFrame) -> DataFrame:
    return (
        nodes.groupBy(F.col("type").alias("entity_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "entity_type")
    )


def community_lookup(communities: DataFrame, cluster_id: str) -> DataFrame:
    return communities.where(F.col("cluster") == cluster_id)


def group_entities_by_type(entities: DataFrame, name_col: str = "name") -> DataFrame:
    """P5 — {entity_type: [entities]} as (type, entities ARRAY) rows."""
    return entities.groupBy("type").agg(
        F.array_sort(F.collect_set(name_col)).alias("entities")
    )


def topics(
    centrality_table: DataFrame,
    entity_types: list[str] | None = None,
    limit: int = 100,
) -> DataFrame:
    """P1/P8 — centrality-ranked topic candidates: the SAME selection
    as personalization.candidate_entities (one implementation — the two
    surfaces must not drift on tie-breaks), re-projected to the topics
    shape."""
    from .personalization import candidate_entities

    return candidate_entities(centrality_table, entity_types, limit).select(
        F.col("entity_id").alias("name"), "description", F.col("entity_type").alias("type")
    )
