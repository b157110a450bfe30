"""HITS hubs & authorities (Kleinberg 1999) — the link-analysis twin
of :func:`~graphrag_kb_server_spark.operators.centrality.pagerank`.

A hub points at good authorities; an authority is pointed at by good
hubs: per iteration ``a ← Aᵀh`` then ``h ← A·a`` with L2
renormalization of each vector. The reference has no HITS surface; on
a crawled corpus the pair complements PageRank for seed selection
(authorities) and crawl frontier scoring (hubs).

Spark shape — each half-step is ONE key-partitioned aggregation:

- authority update: edge frame joined to the hub scores on the SOURCE,
  summed keyed on the destination (map-side partial combine absorbs
  in-degree hubs);
- hub update: the mirror join/sum keyed on the source;
- each L2 norm is a 1-row aggregate broadcast back via crossJoin (no
  driver round-trip inside the loop); lazy localCheckpoints per round
  keep the logical plan linear, one driver action per stride (the
  pagerank/LPA schedule).

Size-adaptive like pagerank: at or below ``driver_edge_threshold``
normalized edges the rounds are scheduling-bound and run driver-side
over one Arrow collect — same float64 update rule; callers compare on
6-dp-rounded scores where summation-order ULPs vanish.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "tgt",
    weight: str | None = None,
    iterations: int = 20,
    driver_edge_threshold: int = 200_000,
) -> DataFrame:
    """Returns ``(name, hub, authority)`` for every edge endpoint,
    L2-normalized per vector and rounded to 6 dp, sorted by authority
    desc. Fixed iteration count for determinism."""
    w = (
        F.col(weight).cast("double") if weight is not None else F.lit(1.0)
    )
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_t"), w.alias("_w")
    ).localCheckpoint(eager=True)
    all_nodes = (
        e.select(F.col("_s").alias("name"))
        .unionByName(e.select(F.col("_t").alias("name")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    if e.count() <= driver_edge_threshold:
        return _hits_driver(edges.sparkSession, all_nodes, e, iterations)

    scores = all_nodes.select(
        "name", F.lit(1.0).alias("hub"), F.lit(1.0).alias("authority")
    ).localCheckpoint(eager=False)

    _STRIDE = 5
    for it in range(iterations):
        a_raw = (
            scores.select(F.col("name").alias("_s"), "hub")
            .join(e, "_s")
            .groupBy(F.col("_t").alias("name"))
            .agg(F.sum(F.col("hub") * F.col("_w")).alias("_ar"))
        )
        a_full = all_nodes.join(a_raw, "name", "left").select(
            "name", F.coalesce("_ar", F.lit(0.0)).alias("_ar")
        )
        a_norm = a_full.groupBy().agg(
            F.sqrt(F.sum(F.col("_ar") * F.col("_ar"))).alias("_na")
        )
        auth = a_full.crossJoin(F.broadcast(a_norm)).select(
            "name",
            F.when(F.col("_na") == 0.0, F.lit(0.0))
            .otherwise(F.col("_ar") / F.col("_na"))
            .alias("authority"),
        )
        h_raw = (
            auth.select(F.col("name").alias("_t"), "authority")
            .join(e, "_t")
            .groupBy(F.col("_s").alias("name"))
            .agg(F.sum(F.col("authority") * F.col("_w")).alias("_hr"))
        )
        h_full = all_nodes.join(h_raw, "name", "left").select(
            "name", F.coalesce("_hr", F.lit(0.0)).alias("_hr")
        )
        h_norm = h_full.groupBy().agg(
            F.sqrt(F.sum(F.col("_hr") * F.col("_hr"))).alias("_nh")
        )
        hub = h_full.crossJoin(F.broadcast(h_norm)).select(
            "name",
            F.when(F.col("_nh") == 0.0, F.lit(0.0))
            .otherwise(F.col("_hr") / F.col("_nh"))
            .alias("hub"),
        )
        scores = hub.join(auth, "name").localCheckpoint(eager=False)
        if (it + 1) % _STRIDE == 0 and it + 1 < iterations:
            scores.count()  # materialize the lazy-checkpoint group

    return scores.select(
        "name", F.round("hub", 6).alias("hub"),
        F.round("authority", 6).alias("authority"),
    ).orderBy(F.desc("authority"), "name")


def _hits_driver(
    spark, all_nodes: DataFrame, e: DataFrame, iterations: int
) -> DataFrame:
    """Same update rule over one Arrow collect — scheduling-bound small
    graphs (the pagerank/LPA guard). Preserves the caller's name dtype
    via the nodes frame's own schema."""
    import numpy as np
    from pyspark.sql import types as T

    nodes_pd = all_nodes.toPandas().sort_values("name").reset_index(drop=True)
    ix = {v: i for i, v in enumerate(nodes_pd["name"])}
    epd = e.toPandas()
    s = np.fromiter((ix[v] for v in epd["_s"]), dtype=np.int64,
                    count=len(epd))
    t = np.fromiter((ix[v] for v in epd["_t"]), dtype=np.int64,
                    count=len(epd))
    w = epd["_w"].to_numpy(dtype=np.float64)
    n = len(nodes_pd)
    hub = np.ones(n)
    auth = np.ones(n)
    for _ in range(iterations):
        a_raw = np.zeros(n)
        np.add.at(a_raw, t, hub[s] * w)
        na = np.sqrt((a_raw * a_raw).sum())
        auth = a_raw / na if na > 0 else a_raw
        h_raw = np.zeros(n)
        np.add.at(h_raw, s, auth[t] * w)
        nh = np.sqrt((h_raw * h_raw).sum())
        hub = h_raw / nh if nh > 0 else h_raw
    # HALF_UP like the distributed path's F.round (np.round is
    # binary half-even — divergence at decimal-half boundaries)
    from decimal import ROUND_HALF_UP, Decimal

    def _r6(x: float) -> float:
        return float(
            Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP)
        )

    nodes_pd["hub"] = [_r6(v) for v in hub]
    nodes_pd["authority"] = [_r6(v) for v in auth]
    schema = T.StructType(
        list(all_nodes.schema.fields)
        + [
            T.StructField("hub", T.DoubleType(), False),
            T.StructField("authority", T.DoubleType(), False),
        ]
    )
    return spark.createDataFrame(nodes_pd, schema=schema).orderBy(
        F.desc("authority"), "name"
    )
