"""Round-6 optimization parity pins: every size-adaptive driver path
added/vectorized this round must be bit-identical to its distributed
(or pre-existing) twin on graphs that exercise the tie-break rules.

- canonical_map: new driver path (LSH → cosine → components in-process)
  vs the distributed operator composition (small_vocab_threshold=0).
- label_propagation / modularity_refine: numpy-vectorized driver loops
  vs the distributed rounds (small_graph_threshold=0) — integer weights
  (the documented bit-parity contract).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from graphrag_kb_server_spark.session import get_spark

    return get_spark("test_r06_parity", cpus=4, shuffle_partitions=4)


def test_canonical_map_driver_matches_distributed(spark):
    from graphrag_kb_server_spark.operators.linking import canonical_map

    names = [
        # similar-name cluster (shared 3-grams, cosine >= 0.8)
        "Quantum Analytics Systems", "Quantum Analytic Systems",
        "Quantum Analytics System",
        # abbreviation channel
        "AI", "Artificial Intelligence",
        "KG", "Knowledge Graph",
        # singletons
        "Zebra", "Wombat Industries", "Data Mesh",
        # single-char + near-identical short names
        "Xx", "Xy",
    ] + [f"Node {i} Alpha" for i in range(30)]
    nodes = spark.createDataFrame([(n,) for n in names], "name string")
    drv = sorted(
        (r["name"], r["canonical_name"])
        for r in canonical_map(nodes).collect()
    )
    dist = sorted(
        (r["name"], r["canonical_name"])
        for r in canonical_map(nodes, small_vocab_threshold=0).collect()
    )
    assert drv == dist
    # sanity: the abbreviation collapses onto the expansion
    m = dict(drv)
    assert m["AI"] == "Artificial Intelligence"


def test_canonical_map_driver_skips_non_ascii(spark):
    from graphrag_kb_server_spark.operators.linking import canonical_map

    nodes = spark.createDataFrame(
        [("Café",), ("Cafe",), ("Plain",)], "name string"
    )
    # must not crash and must match the distributed path (non-ASCII
    # vocabularies bypass the driver shortcut entirely)
    drv = sorted(
        (r["name"], r["canonical_name"])
        for r in canonical_map(nodes).collect()
    )
    dist = sorted(
        (r["name"], r["canonical_name"])
        for r in canonical_map(nodes, small_vocab_threshold=0).collect()
    )
    assert drv == dist


def _random_edges(seed: int, n_nodes: int = 40, n_edges: int = 90):
    rnd = random.Random(seed)
    seen, rows = set(), []
    while len(rows) < n_edges:
        a, b = rnd.sample(range(n_nodes), 2)
        key = (min(a, b), max(a, b))
        if key in seen:
            continue
        seen.add(key)
        rows.append((f"n{key[0]}", f"n{key[1]}", float(rnd.randint(1, 9))))
    return rows


@pytest.mark.parametrize("seed", [1, 2])
def test_lpa_vectorized_driver_matches_distributed(spark, seed):
    from graphrag_kb_server_spark.operators.communities import (
        label_propagation,
    )

    edf = spark.createDataFrame(
        _random_edges(seed), "src string, tgt string, weight double"
    )
    drv = sorted(
        (r["node"], r["label"])
        for r in label_propagation(edf, max_iterations=6).collect()
    )
    dist = sorted(
        (r["node"], r["label"])
        for r in label_propagation(
            edf, max_iterations=6, small_graph_threshold=0
        ).collect()
    )
    assert drv == dist


@pytest.mark.parametrize("seed", [3])
def test_refine_vectorized_driver_matches_distributed(spark, seed):
    from graphrag_kb_server_spark.operators.communities import (
        label_propagation,
        modularity_refine,
    )

    edf = spark.createDataFrame(
        _random_edges(seed), "src string, tgt string, weight double"
    )
    lab = label_propagation(edf, max_iterations=6)
    kw = dict(outer_rounds=1, max_merge_passes=4, local_rounds=3)
    drv = sorted(
        (r["node"], r["label"])
        for r in modularity_refine(edf, lab, **kw).collect()
    )
    dist = sorted(
        (r["node"], r["label"])
        for r in modularity_refine(
            edf, lab, small_graph_threshold=0, **kw
        ).collect()
    )
    assert drv == dist


@pytest.mark.parametrize("num_sources", [None, 8])
def test_betweenness_driver_matches_distributed(spark, num_sources):
    from graphrag_kb_server_spark.operators.centrality import (
        approx_betweenness,
    )

    edf = spark.createDataFrame(
        [(a, b) for a, b, _ in _random_edges(7, n_nodes=25, n_edges=45)],
        "src string, tgt string",
    )
    drv = {
        r["name"]: round(r["centrality"], 4)
        for r in approx_betweenness(edf, num_sources=num_sources).collect()
    }
    dist = {
        r["name"]: round(r["centrality"], 4)
        for r in approx_betweenness(
            edf, num_sources=num_sources, small_graph_threshold=0
        ).collect()
    }
    assert drv == dist


def test_kmeans_empty_input_raises(spark):
    from graphrag_kb_server_spark.operators.clustering import kmeans

    empty = spark.createDataFrame([], "id string, v array<float>")
    with pytest.raises(ValueError, match="empty"):
        kmeans(empty, "id", "v", k=3, iters=1)
