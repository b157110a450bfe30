"""Physical-plan audit for the driver-contract queries (PLANS.md).

For each query: count Exchange / BroadcastHashJoin /
BroadcastNestedLoopJoin / Expand / CartesianProduct nodes and extract
``ReadSchema`` + ``PushedFilters`` from every parquet scan — the
evidence that column pruning, filter pushdown and join selection land
where the 100 TB design needs them. Iterative operators (betweenness,
star components) execute their loop actions while the audited plan is
built; the printed plan is the final-stage plan.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

import importlib
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graphrag_kb_server_spark.session import get_spark  # noqa: E402

e = importlib.import_module("__spark_entry__")

DEFAULT_QUERIES = [
    "t4_entity_merge", "t5_edge_merge", "q2_cosine_topk", "ann_batch_topk",
    "ann_ivf_topk", "dedup_minhash_signature", "dedup_jaccard_pairs",
    "dedup_embedding_pairs", "text_quality", "s_sessionize",
    "g1_degree_centrality", "g7_histogram", "q8_truncation",
    "t9_incremental", "g1_betweenness_s16", "g3_components_star",
]


def audit(spark, name, df):
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    n_exchange = plan.count("Exchange")
    n_bhj = plan.count("BroadcastHashJoin")
    n_expand = len(re.findall(r"\(\d+\) Expand", plan))
    n_cartesian = plan.count("CartesianProduct")
    n_wsc = len(re.findall(r"WholeStageCodegen", plan))
    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    print(
        f"== {name}: exchanges={n_exchange} bhj={n_bhj} bnlj={n_bnlj} "
        f"expand={n_expand} cartesian={n_cartesian} codegen_spans={n_wsc}"
    )
    for s in scans[:3]:
        cols = [c.split(":")[0] for c in s.split(",")] if s else []
        print(f"   scan cols: {cols[:12]}")
    for p in pushed[:3]:
        if p:
            print(f"   pushed: {p[:100]}")


def main():
    args = sys.argv[1:]
    sf = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] or DEFAULT_QUERIES
    spark = get_spark("audit", cpus=8, shuffle_partitions=8)
    qs = e.queries()
    for name in names:
        try:
            audit(spark, name, qs[name](spark, sf))
        except Exception as ex:  # keep auditing the rest
            print(f"== {name}: ERROR {ex}")


if __name__ == "__main__":
    main()
