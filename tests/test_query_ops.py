import pandas as pd
from pyspark.sql import functions as F

from graphrag_kb_server_spark.operators.merge import rank_branch, round_robin_merge
from graphrag_kb_server_spark.operators.truncation import (
    cumulative_prefix_by_budget,
    truncate_by_token_budget,
)
from graphrag_kb_server_spark.operators.vector_topk import cosine_topk


def test_round_robin_merge_matches_sequential(spark):
    # reference semantics: interleave position-wise, first occurrence wins
    local = spark.createDataFrame(
        [("A", 0.9), ("B", 0.8), ("C", 0.7)], "name string, score double"
    )
    glob = spark.createDataFrame(
        [("B", 0.95), ("D", 0.85), ("A", 0.75)], "name string, score double"
    )
    b0 = rank_branch(local, [F.desc("score"), "name"], 0)
    b1 = rank_branch(glob, [F.desc("score"), "name"], 1)
    out = round_robin_merge([b0, b1], ["name"]).orderBy("merge_ix").collect()
    # sequential interleave: A(l0) B(g0) B(l1,dup) D(g1) C(l2) A(g2,dup)
    assert [r["name"] for r in out] == ["A", "B", "D", "C"]
    assert [r["merge_ix"] for r in out] == [0, 1, 2, 3]


def test_token_truncation_prefix(spark):
    rows = [(i, "word " * 10) for i in range(10)]  # ~10-11 tokens each
    df = spark.createDataFrame(rows, "pos int, txt string")
    out = truncate_by_token_budget(df, "txt", "pos", budget=35).collect()
    assert [r["pos"] for r in out] == [0, 1, 2]
    # faithful default: an over-budget FIRST row yields an EMPTY result
    # (the reference's truncate_list_by_token_size returns list[:0]);
    # keep_at_least_one=True opts back into a guaranteed row
    out1 = truncate_by_token_budget(df, "txt", "pos", budget=3).collect()
    assert out1 == []
    out2 = truncate_by_token_budget(
        df, "txt", "pos", budget=3, keep_at_least_one=True
    ).collect()
    assert [r["pos"] for r in out2] == [0]


def test_cumulative_prefix_by_budget(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 5.0), (3, 5.0)], "pos int, w double")
    out = cumulative_prefix_by_budget(df, "w", "pos", 10.0).collect()
    assert [r["pos"] for r in out] == [1, 2]


def test_cosine_topk_exact(spark):
    import numpy as np

    rows = [
        ("a", [1.0, 0.0, 0.0]),
        ("b", [0.9, 0.1, 0.0]),
        ("c", [0.0, 1.0, 0.0]),
        ("d", [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"id": [r[0] for r in rows],
                      "embedding": [np.array(r[1], dtype="float32") for r in rows]})
    )
    out = cosine_topk(df, [1.0, 0.0, 0.0], 2).collect()
    assert [r["id"] for r in out] == ["a", "b"]
    assert abs(out[0]["score"] - 1.0) < 1e-9
    # self-exclusion path
    out2 = cosine_topk(df, [1.0, 0.0, 0.0], 2, exclude_key=("id", "a")).collect()
    assert [r["id"] for r in out2] == ["b", "c"]


def _mini_graph(spark):
    """Hand-built GraphTables: one entity whose chunk has a <SEP>-joined
    multi-file file_path (the Q21 expansion case)."""
    from graphrag_kb_server_spark import GRAPH_FIELD_SEP
    from graphrag_kb_server_spark.functions.embedding import embed_text
    from graphrag_kb_server_spark.plans.query_pipeline import GraphTables

    def emb(t):
        return [float(x) for x in embed_text(t)]

    nodes = spark.createDataFrame(
        [("Alpha", "org", "alpha org", 1, ["c1"]),
         ("Beta", "org", "beta org", 1, ["c1"])],
        "name string, type string, description string, degree int, "
        "source_chunk_ids array<string>",
    )
    edges = spark.createDataFrame(
        [("Alpha", "Beta", "works", "alpha-beta", 1.0, 2, ["c1"])],
        "src string, tgt string, keywords string, description string, "
        "weight double, combined_degree bigint, source_chunk_ids array<string>",
    )
    multi = f"a.txt{GRAPH_FIELD_SEP}b.txt"
    chunks = spark.createDataFrame(
        [("c1", "alpha and beta work together", multi)],
        "chunk_id string, content string, file_path string",
    )
    g = GraphTables(
        nodes=nodes,
        edges=edges,
        chunks=chunks,
        entity_embeddings=spark.createDataFrame(
            [("Alpha", emb("Alpha\nalpha org")), ("Beta", emb("Beta\nbeta org"))],
            "name string, embedding array<float>",
        ),
        relation_embeddings=spark.createDataFrame(
            [("Alpha", "Beta", emb("Alpha\tBeta"))],
            "src string, tgt string, embedding array<float>",
        ),
        chunk_embeddings=spark.createDataFrame(
            [("c1", emb("alpha and beta work together"))],
            "chunk_id string, embedding array<float>",
        ),
    )
    return g


def test_sep_joined_chunk_gets_real_reference_id(spark):
    """Regression (ADVICE r2): a chunk whose file_path is a <SEP>-joined
    multi-file string must cite the min expanded ref_ix, not dangle at
    reference_id 0."""
    from graphrag_kb_server_spark.plans.query_pipeline import (
        QueryParams, kg_query,
    )

    g = _mini_graph(spark)
    ctx = kg_query(spark, g, "Alpha", QueryParams(mode="hybrid", top_k=5))
    assert ctx.chunks, "chunk survives"
    ref_ids = {r["reference_id"] for r in ctx.references}
    assert ctx.chunks[0]["reference_id"] in ref_ids
    assert ctx.chunks[0]["reference_id"] != 0
    # both expanded paths are listed
    assert {r["file_path"] for r in ctx.references} == {"a.txt", "b.txt"}


def test_q14_budget_tracks_actual_usage(spark):
    """Q14 regression (VERDICT r2 #4): the chunk budget must follow the
    reference formula — max_total − tokens(sys scaffold) − tokens(kg
    context actually kept) − tokens(query) − 200 — so it tightens when
    the user_prompt grows and when more entity/relation tokens are kept."""
    from graphrag_kb_server_spark.operators.context_ops import build_rag_prompt
    from graphrag_kb_server_spark.plans.query_pipeline import (
        KG_QUERY_CONTEXT_TEMPLATE, QueryParams, _json_lines, kg_query,
    )
    from graphrag_kb_server_spark.tokenizer import count_tokens

    g = _mini_graph(spark)
    query = "Alpha"
    p1 = QueryParams(mode="hybrid", top_k=5, max_total_tokens=4000)
    ctx1 = kg_query(spark, g, query, p1)
    b1 = ctx1.processing_info["available_chunk_tokens"]
    # exact formula reproduction from the kept context
    pre_kg = KG_QUERY_CONTEXT_TEMPLATE.format(
        entities_str=_json_lines(ctx1.entities, ("entity", "type", "description")),
        relations_str=_json_lines(
            ctx1.relations, ("entity1", "entity2", "description")
        ),
        text_chunks_str="",
        reference_list_str="",
    )
    expected = (
        4000
        - count_tokens(build_rag_prompt("", p1.response_type, p1.user_prompt))
        - count_tokens(pre_kg)
        - count_tokens(query)
        - 200
    )
    assert b1 == expected
    # budget tightens with a fat user_prompt (system-prompt overhead)
    p2 = QueryParams(mode="hybrid", top_k=5, max_total_tokens=4000,
                     user_prompt="be very detailed " * 50)
    ctx2 = kg_query(spark, g, query, p2)
    assert ctx2.processing_info["available_chunk_tokens"] < b1
    # local mode never keeps MORE kg-context tokens than hybrid (here
    # the one-hop expansion makes them equal on this 2-node graph)
    p3 = QueryParams(mode="local", top_k=5, max_total_tokens=4000)
    ctx3 = kg_query(spark, g, query, p3)
    assert ctx3.processing_info["available_chunk_tokens"] >= b1


def test_rrf_fuse(spark):
    """Hand-checked RRF: an id ranked high in BOTH lists beats the
    single-list leaders; rank ties broken by id identically."""
    from pyspark.sql import functions as F

    from graphrag_kb_server_spark.operators.merge import rrf_fuse

    l1 = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7)], "id long, s double")
    l2 = spark.createDataFrame(
        [(2, 5.0), (4, 4.0), (1, 3.0)], "id long, s double")
    out = [(r.id, r.rrf, r.n_lists) for r in
           rrf_fuse([(l1, "s"), (l2, "s")], "id", rrf_k=60, top_k=4)
           .collect()]
    def rr(*ranks):
        return round(sum(1.0 / (60 + r) for r in ranks), 6)
    assert out[0] == (2, rr(2, 1), 2)   # in both lists, high in both
    assert out[1] == (1, rr(1, 3), 2)
    assert {o[0] for o in out} == {1, 2, 3, 4}
    assert dict((o[0], o[2]) for o in out)[4] == 1
