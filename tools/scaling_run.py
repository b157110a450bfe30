"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency ≥ 0.8 between N and 4N executors).

No real cluster exists in this sandbox, so — per BASELINE.md — the
SAME job runs on the SAME input at local[8] and local[32] and we report
throughput at both plus efficiency = T_8 / (4 · T_32).

Two regimes are measured and reported (BENCH_SCALING.md):

1. ``raw``  — the engine-only pipeline with the deterministic stand-in
   extractor (~0.5 ms/doc of Python). At sandbox scale this job is
   dominated by fixed per-job scheduling, so it characterizes engine
   overhead, not scaling.
2. ``slot`` — the same pipeline with a calibrated fixed-FLOPs burn in
   the extraction batch hook, emulating the per-chunk inference cost a
   production extractor has (the reference spends 55% of its indexing
   wall time inside LLM extraction — stats.json, BASELINE.md). This is
   the regime the engine is designed for, and where the ≥0.8 target is
   meaningfully testable.

Each level runs in its own subprocess (fresh JVM); the job runs twice
per process and the SECOND (warm) time is reported — Python-worker
spawn + JIT warm-up amortize away on any long-lived cluster.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, sys, time
sys.path.insert(0, "@REPO@")
import numpy as np
from pyspark.sql import functions as F
from graphrag_kb_server_spark.session import get_spark
from graphrag_kb_server_spark.functions import text as TXT
from graphrag_kb_server_spark.functions.embedding import embed_udf
from graphrag_kb_server_spark.operators.chunking import chunk_documents
from graphrag_kb_server_spark.operators.extraction import extract_mentions
from graphrag_kb_server_spark.operators.graph_build import build_nodes, build_edges, finalize_graph
from graphrag_kb_server_spark.operators.linking import canonical_map, canonicalize_graph

cpus = int(sys.argv[1])
corpus = sys.argv[2]
slot_matmuls = int(sys.argv[3])
n_docs = int(sys.argv[4])

spark = get_spark("scaling", cpus=cpus, shuffle_partitions=cpus)
pages = spark.read.parquet(corpus)

def make_hook(k):
    if k <= 0:
        return None
    def hook(pdf):
        # calibrated fixed-work inference simulation: k 128x128 matmuls
        # per chunk row (CPU-bound, SMT-scalable, deterministic work)
        a = np.ones((128, 128))
        for _ in range(k * len(pdf)):
            a = a @ a * 0.0 + 1.0
    return hook

def run_once():
    docs = pages.select(
        "url", TXT.extract_text(F.col("text"), F.col("url")).alias("content")
    ).withColumn("doc_id", TXT.doc_id(F.col("content"))).withColumn(
        "file_path", F.col("url"))
    chunks = chunk_documents(docs)
    mentions = extract_mentions(chunks, batch_hook=make_hook(slot_matmuls)).localCheckpoint(eager=True)
    nodes_raw = build_nodes(mentions).localCheckpoint(eager=True)
    edges_raw = build_edges(mentions).localCheckpoint(eager=True)
    mapping = canonical_map(nodes_raw).localCheckpoint(eager=True)
    nodes_c, edges_c = canonicalize_graph(nodes_raw, edges_raw, mapping)
    nodes, edges = finalize_graph(nodes_c, edges_c.localCheckpoint(eager=True))
    emb = chunks.select("chunk_id", embed_udf(F.col("content")).alias("e"))
    for df in (nodes, edges, emb):
        df.write.format("noop").mode("overwrite").save()

run_once()  # warm-up: JIT + python workers + page cache
t0 = time.time()
run_once()
secs = time.time() - t0
print(json.dumps({"cpus": cpus, "seconds": round(secs, 2),
                  "docs_per_sec": round(n_docs / secs, 2)}))
"""


def ensure_corpus(n_docs: int) -> str:
    script = f"""
import sys; sys.path.insert(0, {str(REPO)!r})
from graphrag_kb_server_spark.session import get_spark
from bench import _ensure_corpus
spark = get_spark("gen", cpus=32, shuffle_partitions=32)
print(_ensure_corpus(spark, {n_docs}))
"""
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, cwd=REPO
    )
    return out.stdout.strip().splitlines()[-1]


def run_level(cpus: int, corpus: str, slot: int, n_docs: int) -> dict:
    env = dict(os.environ)
    # pin BLAS to one thread per python worker — a multithreaded BLAS
    # inside each task would invalidate the parallelism measurement
    env.update(
        OMP_NUM_THREADS="1", OPENBLAS_NUM_THREADS="1", MKL_NUM_THREADS="1"
    )
    out = subprocess.run(
        [sys.executable, "-c", CHILD.replace("@REPO@", str(REPO)),
         str(cpus), corpus, str(slot), str(n_docs)],
        capture_output=True, text=True, cwd=REPO, env=env,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_docs = int(os.environ.get("SCALING_DOCS", "100000"))
    slot = int(os.environ.get("SCALING_SLOT_MATMULS", "40"))
    corpus = ensure_corpus(n_docs)
    print(f"corpus: {corpus}", file=sys.stderr)

    results = {}
    for regime, k in (("raw", 0), ("slot", slot)):
        per_level = {}
        for cpus in (8, 32):
            r = run_level(cpus, corpus, k, n_docs)
            per_level[cpus] = r
            print(f"{regime} local[{cpus}]: {r}", file=sys.stderr)
        eff = per_level[8]["seconds"] / (4 * per_level[32]["seconds"])
        results[regime] = {
            "local8": per_level[8],
            "local32": per_level[32],
            "scaling_efficiency": round(eff, 3),
        }
    results["n_docs"] = n_docs
    results["slot_matmuls_per_chunk"] = slot
    print(json.dumps(results))


if __name__ == "__main__":
    main()
