"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit": "sec", "queries": {...}, "sf": ...}.

Headline #1 is the north-rule metric: end-to-end KG indexing throughput
(docs/sec) over the deterministic synthetic web_pages corpus
(chunk → extract → merge → degree, all stages evaluated). The corpus
size scales with the sf dir (sf0.1 → 5000 docs, BENCH_DOCS env
overrides). Remaining queries are the oracle-checked operator suite
over the driver tables, each forced through a full evaluation with the
noop sink (no driver collect).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from graphrag_kb_server_spark import corpus as corpus_mod
from graphrag_kb_server_spark.functions import text as TXT
from graphrag_kb_server_spark.operators.chunking import chunk_documents
from graphrag_kb_server_spark.operators.extraction import extract_mentions
from graphrag_kb_server_spark.operators.graph_build import (
    build_edges,
    build_nodes,
    finalize_graph,
)
from graphrag_kb_server_spark.session import get_spark

BENCH_QUERIES = [
    "t4_entity_merge",
    "t5_edge_merge",
    "q2_cosine_topk",
    "ann_batch_topk",
    "dedup_minhash_signature",
    "dedup_jaccard_pairs",
    "dedup_embedding_pairs",
    "text_quality",
    "text_lang_id",
    "s_windowed_events",
    "s_sessionize",
    "g1_degree_centrality",
]


def _noop_write(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _ensure_corpus(spark, n_docs: int, sent_lo: int = 24, sent_hi: int = 72) -> str:
    """Bench corpus: Common-Crawl-realistic page sizes (~4 KB of text),
    same deterministic generator as the fixtures. Written once, reused
    across runs/parallelism levels (identical input for scaling)."""
    path = (
        f"{Path(__file__).resolve().parent}/.data/"
        f"bench_corpus_{n_docs}_{sent_lo}_{sent_hi}"
    )
    if not os.path.exists(f"{path}/_SUCCESS"):
        corpus_mod.generate(
            spark, n_docs, n_partitions=64, sent_range=(sent_lo, sent_hi)
        ).write.mode("overwrite").parquet(path)
    return path


def bench_kg_index(spark, n_docs: int) -> tuple[float, float]:
    """End-to-end KG construction (the north-rule chain: extract text →
    chunk → triple-extract → merge → link → canonicalize → degrees),
    evaluated via the noop sink. mentions is checkpointed ONCE — the
    same staged materialization run_index does with its parquet stage
    boundaries — so the nodes and edges branches don't recompute the
    Python extraction chain. Returns (seconds, docs_per_sec)."""
    from graphrag_kb_server_spark.operators.linking import (
        canonical_map,
        canonicalize_graph,
    )

    from graphrag_kb_server_spark.plans.index_pipeline import ensure_parallelism

    corpus_path = _ensure_corpus(spark, n_docs)
    pages = ensure_parallelism(spark.read.parquet(corpus_path))
    t0 = time.time()
    docs = pages.select(
        "url", TXT.extract_text(F.col("text"), F.col("url")).alias("content")
    ).withColumn("doc_id", TXT.doc_id(F.col("content"))).withColumn(
        "file_path", F.col("url")
    )
    chunks = chunk_documents(docs).localCheckpoint(eager=True)
    mentions = extract_mentions(chunks).localCheckpoint(eager=True)
    nodes_raw = build_nodes(mentions).localCheckpoint(eager=True)
    edges_raw = build_edges(mentions).localCheckpoint(eager=True)
    mapping = canonical_map(nodes_raw).localCheckpoint(eager=True)
    nodes_c, edges_c = canonicalize_graph(nodes_raw, edges_raw, mapping)
    nodes, edges = finalize_graph(nodes_c, edges_c.localCheckpoint(eager=True))
    _noop_write(nodes)
    _noop_write(edges)
    secs = time.time() - t0
    return secs, n_docs / secs


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    n_docs = int(os.environ.get("BENCH_DOCS", "5000" if sf >= 0.1 else "1000"))

    spark = get_spark("bench", cpus=cpus, shuffle_partitions=max(cpus, 8))

    timings: dict[str, float] = {}

    t0 = time.time()
    idx_secs, docs_per_sec = bench_kg_index(spark, n_docs)
    timings["kg_index_e2e"] = round(idx_secs, 3)

    qs = entrymod.queries()
    for name in BENCH_QUERIES:
        t1 = time.time()
        _noop_write(qs[name](spark, sf_dir))
        timings[name] = round(time.time() - t1, 3)

    total = round(time.time() - t0, 3)
    print(
        json.dumps(
            {
                "metric": "bench_total_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "index_docs": n_docs,
                "index_docs_per_sec": round(docs_per_sec, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
