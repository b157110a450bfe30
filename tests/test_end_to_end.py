"""End-to-end: index the tiny corpus, run kg_query in each mode, and
verify resume semantics (T8/T9)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from graphrag_kb_server_spark.corpus import generate
from graphrag_kb_server_spark.plans.index_pipeline import (
    incremental_docs,
    run_index,
)
from graphrag_kb_server_spark.plans.query_pipeline import (
    GraphTables,
    QueryParams,
    kg_query,
)


@pytest.fixture(scope="module")
def indexed(spark, tmp_out):
    out = f"{tmp_out}/index_e2e"
    pages = generate(spark, 80)
    res = run_index(spark, pages, out)
    return out, res


def _graph_tables(spark, out) -> GraphTables:
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


def test_index_outputs(spark, indexed):
    out, res = indexed
    nodes = spark.read.parquet(f"{out}/nodes")
    edges = spark.read.parquet(f"{out}/edges")
    assert nodes.count() > 20
    assert edges.count() > 20
    # undirected key invariant
    assert edges.where(F.col("src") >= F.col("tgt")).count() == 0
    # every stage reported metrics
    stages = {m["stage"] for m in res.metrics}
    assert {"documents", "chunks", "mentions", "nodes", "edges"} <= stages


def test_kg_query_modes(spark, indexed):
    out, _ = indexed
    g = _graph_tables(spark, out)
    # pick a hub entity that certainly exists
    hub = (
        spark.read.parquet(f"{out}/nodes")
        .orderBy(F.desc("mention_count"))
        .first()["name"]
    )
    for mode in ["local", "global", "hybrid", "mix"]:
        ctx = kg_query(
            spark, g, f"What is the relationship between {hub} and others?",
            # max_entity_tokens: the faithful truncation default drops
            # ALL entities when the first serialized row overflows the
            # budget (reference truncate_list_by_token_size); the
            # reference default of 100 tokens is too small for this
            # fixture's hub descriptions, so give a working budget
            QueryParams(
                mode=mode, top_k=10, max_total_tokens=8000,
                max_entity_tokens=1600,
            ),
        )
        if mode in ("local", "hybrid", "mix"):
            assert ctx.entities, mode
            assert hub in [e["entity"] for e in ctx.entities], mode
        if mode in ("global", "hybrid", "mix"):
            assert ctx.relations, mode
        assert ctx.chunks, mode
        assert ctx.context_str().startswith("-----Entities(KG)-----")
        # token budgets respected: the serialized kept rows fit the
        # entity budget (hybrid/mix round-robin two branches, so the
        # COUNT can exceed top_k — the budget is the real contract)
        import json as _json

        from graphrag_kb_server_spark.tokenizer import count_tokens

        ser = [
            _json.dumps(
                {
                    "entity": e["entity"],
                    "type": e["type"],
                    "description": e["description"],
                }
            )
            for e in ctx.entities
        ]
        assert sum(count_tokens(s) for s in ser) <= 1600
        # Q15 fidelity: every reference carries warc_ts-derived
        # last_modified (lightrag_search.py:826-861)
        assert ctx.references and all(
            r["last_modified"] is not None for r in ctx.references
        ), mode


def test_resume_skips_and_is_identical(spark, indexed, tmp_out):
    out, _ = indexed
    pages = generate(spark, 80)
    nodes_before = spark.read.parquet(f"{out}/nodes").orderBy("name").toPandas()
    res2 = run_index(spark, pages, out, resume=True)
    assert all(m.get("skipped") for m in res2.metrics)
    # kill-and-resume: delete downstream stages, rerun → identical output
    for stg in ["nodes", "edges", "doc_status"]:
        shutil.rmtree(f"{out}/{stg}")
    res3 = run_index(spark, pages, out, resume=True)
    redone = {m["stage"] for m in res3.metrics if not m.get("skipped")}
    assert "nodes" in redone and "chunks" not in redone
    nodes_after = spark.read.parquet(f"{out}/nodes").orderBy("name").toPandas()
    import pandas as pd

    pd.testing.assert_frame_equal(nodes_before, nodes_after)


def test_incremental_anti_join(spark, indexed):
    out, _ = indexed
    doc_status = spark.read.parquet(f"{out}/doc_status")
    docs = spark.read.parquet(f"{out}/documents")
    assert incremental_docs(docs, doc_status).count() == 0
    # new docs show up
    extra = docs.limit(5).withColumn("doc_id", F.concat(F.lit("new-"), "doc_id"))
    assert incremental_docs(docs.unionByName(extra), doc_status).count() == 5


def test_answer_query_modes_and_q12(spark, indexed, tmp_out):
    from graphrag_kb_server_spark.plans.query_pipeline import answer_query

    out, _ = indexed
    g = _graph_tables(spark, out)
    hub = (
        spark.read.parquet(f"{out}/nodes")
        .orderBy(F.desc("mention_count"))
        .first()["name"]
    )
    q = f"Tell me about {hub}"
    ctx_only = answer_query(
        spark, g, q, QueryParams(mode="hybrid", top_k=8, only_need_context=True),
        cache_path=f"{tmp_out}/cache1",
    )
    assert "-----Entities(KG)-----" in ctx_only["context"]
    assert ctx_only["references"], "reference list populated"
    assert ctx_only["raw_data"]["metadata"]["processing_info"][
        "final_chunks_count"
    ] == len(ctx_only["raw_data"]["data"]["chunks"])
    prompt_only = answer_query(
        spark, g, q, QueryParams(mode="local", top_k=8, only_need_prompt=True),
        cache_path=f"{tmp_out}/cache1",
    )
    # Q17 fidelity: the reference's rag_response system-prompt sections
    # in order, with the response_type/user_prompt slots filled
    # (lightrag_search.py:87-117)
    p = prompt_only["prompt"]
    markers = ["---Role---", "---Goal---",
               "---Knowledge Graph and Document Chunks---",
               "---Response Rules---", "---Question---"]
    pos = [p.index(m) for m in markers]
    assert pos == sorted(pos)
    assert "Target format and length: Multiple Paragraphs" in p
    assert "[KG/DC] file_path" in p
    a1 = answer_query(spark, g, q, QueryParams(mode="local", top_k=8),
                      cache_path=f"{tmp_out}/cache1")
    a2 = answer_query(spark, g, q, QueryParams(mode="local", top_k=8),
                      cache_path=f"{tmp_out}/cache1")
    assert a1["answer"] == a2["answer"]  # Q17 cache
    # Q12 vector chunk pick path
    vec = kg_query(spark, g, q, QueryParams(mode="local", top_k=8, chunk_pick="vector"))
    assert vec.chunks


def test_q16_context_template_shape(spark, indexed):
    """Q16 fidelity: the context string has the reference's four
    template sections in order, JSON-lines payloads with the reference's
    exact row keys (lightrag_search.py:780-785, :822-824, :1166-1200
    post-truncation shapes), and '[id] path (last_modified: iso)'
    reference rows (:846-853)."""
    import json
    import re as _re

    out, _ = indexed
    g = _graph_tables(spark, out)
    hub = (
        spark.read.parquet(f"{out}/nodes")
        .orderBy(F.desc("mention_count"))
        .first()["name"]
    )
    # entity budget: the reference default (100 tokens) faithfully
    # truncates to EMPTY on this fixture's long descriptions
    ctx = kg_query(spark, g, f"Tell me about {hub}",
                   QueryParams(mode="hybrid", top_k=8,
                               max_entity_tokens=1600,
                               max_total_tokens=8000))
    s = ctx.context_str()
    sections = ["-----Entities(KG)-----", "-----Relationships(KG)-----",
                "-----Document Chunks(DC)-----",
                "-----Reference Document List-----"]
    positions = [s.index(sec) for sec in sections]
    assert positions == sorted(positions), "sections in template order"
    # JSON-lines payloads carry exactly the reference's row keys
    ent_block = s[s.index(sections[0]):s.index(sections[1])]
    ent_rows = [json.loads(l) for l in ent_block.splitlines()
                if l.startswith("{")]
    assert ent_rows and all(
        list(r.keys()) == ["entity", "type", "description"] for r in ent_rows
    )
    rel_block = s[s.index(sections[1]):s.index(sections[2])]
    rel_rows = [json.loads(l) for l in rel_block.splitlines()
                if l.startswith("{")]
    assert rel_rows and all(
        list(r.keys()) == ["entity1", "entity2", "description"] for r in rel_rows
    )
    chunk_block = s[s.index(sections[2]):s.index(sections[3])]
    chunk_rows = [json.loads(l) for l in chunk_block.splitlines()
                  if l.startswith("{")]
    assert chunk_rows and all(
        list(r.keys()) == ["reference_id", "content"] for r in chunk_rows
    )
    ref_block = s[s.index(sections[3]):]
    ref_lines = [l for l in ref_block.splitlines() if l.startswith("[")]
    assert ref_lines and all(
        _re.match(r"^\[\d+\] \S+ \(last_modified: .+\)$", l) for l in ref_lines
    )
    # raw_data carries the reference's metadata/processing_info keys
    rd = ctx.raw_data()
    assert set(rd["data"]) == {"entities", "relationships", "chunks"}
    assert set(rd["metadata"]["processing_info"]) == {
        "total_entities_found", "total_relations_found",
        "entities_after_truncation", "relations_after_truncation",
        "merged_chunks_count", "final_chunks_count",
        "available_chunk_tokens",
    }
    assert set(rd["metadata"]["keywords"]) == {"high_level", "low_level"}


def test_hybrid_cross_derivation(spark, indexed):
    """Reference hybrid: entity list includes endpoint entities from the
    relation branch; relation list includes edges incident to top local
    entities (lightrag_search.py:984-1066)."""
    out, _ = indexed
    g = _graph_tables(spark, out)
    hub = (
        spark.read.parquet(f"{out}/nodes")
        .orderBy(F.desc("mention_count"))
        .first()["name"]
    )
    ctx_local = kg_query(spark, g, f"About {hub}",
                         QueryParams(mode="local", top_k=6, max_relation_tokens=800))
    # local mode must now surface relations via one-hop expansion
    assert ctx_local.relations, "local mode derives incident relations"
    ctx_global = kg_query(spark, g, f"About {hub}",
                          QueryParams(mode="global", top_k=6, max_entity_tokens=400))
    assert ctx_global.entities, "global mode derives endpoint entities"


def test_query_composite_matches_sequential_twin(spark):
    """The driver's kg_query_context entry (full 4-stage hybrid query)
    must match golden.golden_kg_query_context — the independent
    sequential pandas twin — row for row (the CI guard behind the
    CORRECTNESS oracle entry)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __spark_entry__ as entrymod
    from graphrag_kb_server_spark.golden import golden_kg_query_context

    spark_rows = sorted(
        tuple(r) for r in entrymod.queries()["kg_query_context"](spark, "").collect()
    )
    golden_rows = sorted(
        tuple(r) for r in golden_kg_query_context(120).itertuples(index=False)
    )
    assert spark_rows == golden_rows


def test_run_index_orc_format(spark, tmp_out, monkeypatch):
    """The stage-table format seam is genuinely format-parametric: the
    whole pipeline runs, resumes, and reads back through
    KGSPARK_TABLE_FORMAT=orc (the iceberg branch shares the same three
    seam functions — _write/_read_table/_exists — and differs only in
    addressing tables by catalog identifier)."""
    import glob

    from graphrag_kb_server_spark.corpus import generate

    monkeypatch.setenv("KGSPARK_TABLE_FORMAT", "orc")
    out = tmp_out + "/orc_ix"
    pages = generate(spark, 40)
    res = run_index(spark, pages, out)
    assert res.table(spark, "nodes").count() > 0
    assert glob.glob(out + "/nodes/part-*.orc"), "stage files must be ORC"
    res2 = run_index(spark, pages, out, resume=True)
    assert all(m.get("skipped") for m in res2.metrics)
