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
noop sink (no driver collect), plus the ONLINE query path (kg_query
hybrid/mix + answer_query — the reference's primary serving surface,
lightrag_search.py:330-597) over a persisted index of the same corpus.

Variance control (VERDICT r2): every timing is the MIN of
$BENCH_REPEATS runs (default 2) — the hypervisor on this box shows
0-55%% CPU steal, so single-shot numbers are not comparable across
rounds; the JSON records every repeat plus the run-level host steal%%
so regressions can be told apart from noise.

Idle gate (VERDICT r4): the r4 artifact pinned t4_entity_merge at
22.7s purely because leftover Spark JVMs from a prior run kept
loadavg at 5+. Before timing anything, bench now (a) refuses to start
while any OTHER SparkSubmit JVM is alive, (b) spins until 1-min
loadavg drops below $BENCH_IDLE_LOAD (default 1.5, ~5-min timeout,
then proceeds with a recorded violation), and (c) records the loadavg
observed at the start of every repeat next to the timing, so a noisy
repeat is attributable from the artifact alone. Volatile entries
(kg_index_e2e, t4_entity_merge) always run max(repeats, 3) times.
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
    "g1_betweenness_s16",
    "g2_lpa_communities",
    # training-data curation family (r5)
    "sample_stratified",
    "text_domain_stats",
    "sample_domain_cap",
    "text_lm_perplexity",
    "cluster_kmeans",
    "g6_triangles",
    "text_pmi_collocations",
    "text_bm25_topk",
    "text_trigram_backoff",
]

# entries whose r3→r4 history showed >3x run-to-run spread on this
# box; they always get >=3 repeats so min-of-N converges on warm cost
VOLATILE_QUERIES = {"t4_entity_merge", "g2_lpa_communities"}


def _noop_write(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _loadavg1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def _foreign_spark_jvms() -> list[int]:
    """PIDs of SparkSubmit JVMs that do NOT belong to this process tree
    (a leftover JVM competing for cores invalidates every timing)."""
    me = os.getpid()
    pids = []
    for p in os.listdir("/proc"):
        if not p.isdigit() or int(p) == me:
            continue
        try:
            with open(f"/proc/{p}/cmdline", "rb") as f:
                cmd = f.read().decode("utf-8", "replace")
        except OSError:
            continue
        if "SparkSubmit" in cmd or "spark-submit" in cmd:
            # skip our own child JVM: walk the parent chain to me
            try:
                pp = int(p)
                mine = False
                for _ in range(10):
                    with open(f"/proc/{pp}/stat") as f:
                        pp = int(f.read().split()[3])
                    if pp == me:
                        mine = True
                        break
                    if pp <= 1:
                        break
                if not mine:
                    pids.append(int(p))
            except (OSError, ValueError):
                pids.append(int(p))
    return pids


def idle_gate(max_load: float, timeout_s: float = 300.0) -> dict:
    """Block until the box is quiet; returns evidence for the artifact.

    Hard-fails only on foreign Spark JVMs that persist the whole
    timeout (those never go away by waiting and make numbers
    meaningless); a merely-high loadavg times out soft with
    violated=True so unattended driver runs still produce an artifact
    — but one that SAYS it was measured on a loaded box.
    """
    t0 = time.time()
    while True:
        load = _loadavg1()
        jvms = _foreign_spark_jvms()
        if load < max_load and not jvms:
            return {
                "gated_seconds": round(time.time() - t0, 1),
                "start_loadavg1": load,
                "violated": False,
            }
        if time.time() - t0 > timeout_s:
            if jvms:
                print(
                    f"bench: FATAL — foreign Spark JVMs alive after "
                    f"{timeout_s:.0f}s idle wait: {jvms}. Kill them and "
                    f"re-run; refusing to pin numbers against them.",
                    file=sys.stderr,
                )
                sys.exit(3)
            return {
                "gated_seconds": round(time.time() - t0, 1),
                "start_loadavg1": load,
                "violated": True,
            }
        time.sleep(5.0)


def _cpu_jiffies() -> dict[str, int]:
    """Aggregate /proc/stat counters — steal% tells hypervisor noise
    apart from real regressions (same methodology as BENCH_SCALING)."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = list(map(int, parts[1:]))
    return {"steal": vals[7], "total": sum(vals)}


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


def _ensure_index(spark, n_docs: int) -> str:
    """Persisted full index of the bench corpus (cached across runs) —
    the graph the online-query-path benchmarks serve from. Build time
    is NOT part of any query timing (kg_index_e2e measures indexing)."""
    from graphrag_kb_server_spark.plans.index_pipeline import run_index

    out = f"{Path(__file__).resolve().parent}/.data/bench_index_{n_docs}"
    if not os.path.exists(f"{out}/doc_status/_SUCCESS"):
        pages = spark.read.parquet(_ensure_corpus(spark, n_docs))
        run_index(spark, pages, out)
    return out


def bench_kg_index(spark, n_docs: int) -> float:
    """End-to-end KG construction (the north-rule chain: extract text →
    chunk → triple-extract → merge → link → canonicalize → degrees),
    evaluated via the noop sink. mentions is checkpointed ONCE — the
    same staged materialization run_index does with its parquet stage
    boundaries — so the nodes and edges branches don't recompute the
    Python extraction chain. Returns seconds."""
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
    return time.time() - t0


def _graph_tables(spark, out: str):
    from graphrag_kb_server_spark.plans.query_pipeline import GraphTables

    rd = lambda n: spark.read.parquet(f"{out}/{n}")
    docs = rd("documents")
    return GraphTables(
        nodes=rd("nodes"),
        edges=rd("edges"),
        chunks=rd("chunks"),
        entity_embeddings=rd("entity_embeddings"),
        relation_embeddings=rd("relation_embeddings"),
        chunk_embeddings=rd("chunk_embeddings"),
        path_properties=docs.select(
            F.col("url").alias("file_path"),
            F.col("warc_ts").alias("last_modified"),
        ).dropDuplicates(["file_path"]),
    )


def bench_query_path(spark, n_docs: int, repeats: int) -> dict[str, list[float]]:
    """Online-surface latency: kg_query (hybrid + mix) and answer_query
    end-to-end — stage 1-4 including the driver-side context collects,
    exactly what a serving request pays. A fresh query string per repeat
    defeats the LLM cache so every repeat is a cold answer."""
    from graphrag_kb_server_spark.plans.query_pipeline import (
        QueryParams,
        answer_query,
        kg_query,
    )

    g = _graph_tables(spark, _ensure_index(spark, n_docs))
    hub = g.nodes.orderBy(F.desc("mention_count"), "name").first()["name"]
    out: dict[str, list[float]] = {
        "kg_query_hybrid": [], "kg_query_mix": [], "kg_answer_hybrid": [],
    }
    for i in range(repeats):
        q = f"What is the relationship between {hub} and others? (run {i})"
        t = time.time()
        kg_query(spark, g, q, QueryParams(mode="hybrid", top_k=60))
        out["kg_query_hybrid"].append(time.time() - t)
        t = time.time()
        kg_query(spark, g, q, QueryParams(mode="mix", top_k=60))
        out["kg_query_mix"].append(time.time() - t)
        t = time.time()
        answer_query(
            spark, g, q, QueryParams(mode="hybrid", top_k=60),
            cache_path=f"/tmp/bench_llm_cache_{os.getpid()}",
        )
        out["kg_answer_hybrid"].append(time.time() - t)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    n_docs = int(os.environ.get("BENCH_DOCS", "5000" if sf >= 0.1 else "1000"))
    repeats = max(int(os.environ.get("BENCH_REPEATS", "2")), 1)

    idle_load = float(os.environ.get("BENCH_IDLE_LOAD", "1.5"))
    gate = idle_gate(idle_load)

    spark = get_spark("bench", cpus=cpus, shuffle_partitions=max(cpus, 8))

    j0 = _cpu_jiffies()
    t0 = time.time()

    repeat_times: dict[str, list[float]] = {}
    repeat_load: dict[str, list[float]] = {}
    repeat_steal: dict[str, list[float]] = {}
    volatile_repeats = max(repeats, 3)

    def _steal_between(a: dict, b: dict) -> float:
        return round(
            100.0 * (b["steal"] - a["steal"]) / max(b["total"] - a["total"], 1),
            1,
        )

    idx_runs, idx_load, idx_steal = [], [], []
    for _ in range(volatile_repeats):
        idx_load.append(_loadavg1())
        ja = _cpu_jiffies()
        idx_runs.append(bench_kg_index(spark, n_docs))
        idx_steal.append(_steal_between(ja, _cpu_jiffies()))
    repeat_times["kg_index_e2e"] = idx_runs
    repeat_load["kg_index_e2e"] = idx_load
    repeat_steal["kg_index_e2e"] = idx_steal

    qs = entrymod.queries()
    for name in BENCH_QUERIES:
        runs, loads, steals = [], [], []
        n = volatile_repeats if name in VOLATILE_QUERIES else repeats
        for _ in range(n):
            loads.append(_loadavg1())
            ja = _cpu_jiffies()
            t1 = time.time()
            _noop_write(qs[name](spark, sf_dir))
            runs.append(time.time() - t1)
            steals.append(_steal_between(ja, _cpu_jiffies()))
        repeat_times[name] = runs
        repeat_load[name] = loads
        repeat_steal[name] = steals

    # G2b: Louvain-style refinement over the SAME sf-derived KG graph
    # that g2_lpa_communities benches — tracks the refinement's cost at
    # sf scale (both ops take the size-adaptive driver path here; the
    # distributed rounds are oracled separately by g2_refine_distributed)
    def _refine_kg():
        from graphrag_kb_server_spark.operators.communities import (
            label_propagation,
            modularity_refine,
        )

        m = entrymod._mentions_from_lineitem(spark, sf_dir).where(
            F.col("chunk_id").substr(-1, 1).isin("0", "5")
        )
        edges = build_edges(m)
        return modularity_refine(edges, label_propagation(edges))

    runs, loads, steals = [], [], []
    for _ in range(repeats):
        loads.append(_loadavg1())
        ja = _cpu_jiffies()
        t1 = time.time()
        _noop_write(_refine_kg())
        runs.append(time.time() - t1)
        steals.append(_steal_between(ja, _cpu_jiffies()))
    repeat_times["g2_refine_kg"] = runs
    repeat_load["g2_refine_kg"] = loads
    repeat_steal["g2_refine_kg"] = steals

    # G1c: 20 PageRank power iterations over the same sf-derived KG
    # edge graph — tracks the strided-checkpoint iteration schedule's
    # cost (one contribution shuffle per round, 1 action per 5 rounds)
    def _pagerank_kg():
        from graphrag_kb_server_spark.operators.centrality import pagerank

        m = entrymod._mentions_from_lineitem(spark, sf_dir).where(
            F.col("chunk_id").substr(-1, 1).isin("0", "5")
        )
        return pagerank(build_edges(m))

    runs, loads, steals = [], [], []
    for _ in range(repeats):
        loads.append(_loadavg1())
        ja = _cpu_jiffies()
        t1 = time.time()
        _noop_write(_pagerank_kg())
        runs.append(time.time() - t1)
        steals.append(_steal_between(ja, _cpu_jiffies()))
    repeat_times["g1_pagerank_kg"] = runs
    repeat_load["g1_pagerank_kg"] = loads
    repeat_steal["g1_pagerank_kg"] = steals

    # Composed curation funnel over the SAME web corpus the indexing
    # headline uses: C4 lines → repetition → quality → lang-ID → PII →
    # exact dedup, one scan + one exchange (plans/curation_pipeline).
    # Timed as kept-noop-write + stats collect — both outputs a real
    # curation job materializes.
    def _curation_e2e() -> float:
        from graphrag_kb_server_spark.plans.curation_pipeline import (
            curate_corpus,
        )

        pages = spark.read.parquet(_ensure_corpus(spark, n_docs))
        docs = pages.select(
            F.col("url").alias("doc_id"),
            TXT.extract_text(F.col("text"), F.col("url")).alias("content"),
        )
        t1 = time.time()
        kept, stats = curate_corpus(docs, id_col="doc_id", text_col="content")
        _noop_write(kept)
        stats.collect()
        return time.time() - t1

    runs, loads, steals = [], [], []
    for _ in range(repeats):
        loads.append(_loadavg1())
        ja = _cpu_jiffies()
        runs.append(_curation_e2e())
        steals.append(_steal_between(ja, _cpu_jiffies()))
    repeat_times["curation_e2e"] = runs
    repeat_load["curation_e2e"] = loads
    repeat_steal["curation_e2e"] = steals

    # The online query path issues many small driver actions whose
    # codegen/JIT warm-up spans the first 2-3 invocations (observed:
    # 22.5 → 5.8 → 5.4 → 4.4s on an idle box) — with 2 repeats the min
    # still lands mid-warm-up, so these always get ≥4.
    for k, v in bench_query_path(spark, n_docs, max(repeats, 4)).items():
        repeat_times[k] = v
        repeat_load[k] = []
        repeat_steal[k] = []

    total = round(time.time() - t0, 3)
    j1 = _cpu_jiffies()
    steal_pct = round(
        100.0 * (j1["steal"] - j0["steal"]) / max(j1["total"] - j0["total"], 1), 1
    )

    timings = {k: round(min(v), 3) for k, v in repeat_times.items()}
    print(
        json.dumps(
            {
                "metric": "bench_total_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "repeats": {
                    k: [round(x, 3) for x in v] for k, v in repeat_times.items()
                },
                "repeat_loadavg1": {
                    k: [round(x, 2) for x in v] for k, v in repeat_load.items()
                },
                "repeat_steal_pct": repeat_steal,
                "aggregation": f"min of {repeats} repeats"
                f" ({volatile_repeats} for volatile entries)",
                "idle_gate": gate,
                "host_steal_pct": steal_pct,
                "sf": sf,
                "cpus": cpus,
                "index_docs": n_docs,
                "index_docs_per_sec": round(n_docs / min(idx_runs), 2),
                "curation_docs_per_sec": round(n_docs / min(runs), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
