import datetime as dt

import pytest
from pyspark.sql import functions as F

from graphrag_kb_server_spark.operators.context_ops import (
    LlmCache,
    answer_with_cache,
    compute_args_hash,
    dedup_by_content_combine,
    expand_file_references,
    reference_list,
    vector_similarity_chunk_pick,
)
from graphrag_kb_server_spark.operators.personalization import (
    build_search_question,
    candidate_entities,
    generate_questions,
    group_by_type,
    last_modified,
    match_and_score,
    postprocess_topics,
    remove_abbreviations,
    sort_by_relevance,
    topics_from_text,
)
from graphrag_kb_server_spark.operators.reports import community_inputs, generate_reports


def test_q12_vector_chunk_pick(spark):
    from graphrag_kb_server_spark.functions.embedding import embed_text
    import pandas as pd
    import numpy as np

    texts = {"c1": "Alice Johnson acquired Acme", "c2": "totally unrelated words here",
             "c3": "Alice Johnson and Acme Systems again"}
    emb = spark.createDataFrame(
        pd.DataFrame({"chunk_id": list(texts), "embedding": [np.array(embed_text(t)) for t in texts.values()]})
    )
    cands = spark.createDataFrame([(c,) for c in texts], "chunk_id string")
    out = vector_similarity_chunk_pick(cands, emb, "Alice Johnson Acme", n_entities=1, related_chunk_number=2)
    rows = out.collect()
    assert len(rows) == 1  # 2*1/2
    assert rows[0]["chunk_id"] in ("c1", "c3")


def test_q15_reference_list_and_q21_expansion(spark):
    chunks = spark.createDataFrame(
        [("a.txt", 0), ("b.txt<SEP>c.txt", 1), ("a.txt", 2)],
        "file_path string, merge_ix int",
    )
    refs = reference_list(chunks)
    assert [(r["ref_ix"], r["file_path"]) for r in refs.orderBy("ref_ix").collect()] == [
        (1, "a.txt"), (2, "b.txt<SEP>c.txt"),
    ]
    expanded = expand_file_references(refs).orderBy("file_path").collect()
    assert {r["file_path"] for r in expanded} == {"a.txt", "b.txt", "c.txt"}


def test_q20_dedup_combine(spark):
    a = spark.createDataFrame([(1, "x", "d1"), (2, "y", "d2")], "id int, content string, extra string")
    b = spark.createDataFrame([(9, "x", "d1"), (3, "z", "d3")], "id int, content string, extra string")
    out = dedup_by_content_combine([a, b], ["content", "extra"]).orderBy("id").collect()
    assert [r["content"] for r in out] == ["x", "y", "z"]
    assert [r["id"] for r in out] == [1, 2, 3]  # ids reassigned


def test_q17_llm_cache(spark, tmp_out):
    cache = LlmCache(spark, f"{tmp_out}/llm_cache")
    h = compute_args_hash("hybrid", "q?", {"k": 1})
    assert cache.get(h) is None
    a1 = answer_with_cache(cache, "hybrid", "q?", {"k": 1}, "ctx")
    a2 = answer_with_cache(cache, "hybrid", "q?", {"k": 1}, "DIFFERENT ctx")
    assert a1 == a2  # cache hit, deterministic
    a3 = answer_with_cache(cache, "local", "q?", {"k": 1}, "ctx")
    assert a3 != a1 or compute_args_hash("local", "q?", {"k": 1}) != h


def test_llm_cache_compaction_bounds_files(spark, tmp_out):
    """Sustained puts don't grow one-file-per-answer forever: at
    compact_every part-files the cache folds into a single
    last-write-wins file, and reads still see the newest value."""
    cache = LlmCache(spark, f"{tmp_out}/llm_cache_c", compact_every=4)
    for i in range(10):
        cache.put(f"h{i % 3}", f"v{i}")
        assert cache._part_files() <= 4
    assert cache.get("h0") == "v9"  # newest write for h0 (i=9)
    assert cache.get("h1") == "v7"
    assert cache.get("h2") == "v8"
    assert cache.get("missing") is None


def test_llm_cache_crash_recovery(spark, tmp_out):
    """A crash between compact()'s two renames leaves the live path
    absent with the data stranded in __compact (or __old); the next
    reader restores it instead of silently rebuilding empty."""
    import os
    import shutil

    base = f"{tmp_out}/llm_cache_crash"
    cache = LlmCache(spark, base)
    cache.put("k1", "v1")
    cache.put("k2", "v2")
    # simulate the crash window: live dir renamed aside, compacted dir
    # fully written but not yet swapped in
    shutil.copytree(base, f"{base}__compact")
    os.rename(base, f"{base}__old")
    assert not os.path.exists(base)
    fresh = LlmCache(spark, base)  # __init__ recovery path
    assert fresh.get("k1") == "v1" and fresh.get("k2") == "v2"
    assert not os.path.exists(f"{base}__old")
    # ...and the same via _view when only __old survives (no _SUCCESS
    # in a partial __compact)
    os.rename(base, f"{base}__old")
    os.makedirs(f"{base}__compact")  # partial: no _SUCCESS
    fresh2 = LlmCache.for_path(spark, base)
    fresh2._df = None
    assert fresh2.get("k2") == "v2"
    assert not os.path.exists(f"{base}__compact")


def test_llm_cache_memo_bounded(spark, tmp_out):
    """The for_path memo is LRU-bounded and unpersists evicted
    instances' pinned DataFrames (ADVICE r4)."""
    LlmCache._instances.clear()
    insts = []
    for i in range(LlmCache._MAX_INSTANCES + 3):
        c = LlmCache.for_path(spark, f"{tmp_out}/memo_{i}")
        c.put("h", f"v{i}")
        assert c.get("h") == f"v{i}"  # builds the pinned view
        insts.append(c)
    assert len(LlmCache._instances) == LlmCache._MAX_INSTANCES
    # the oldest instances were evicted AND their views released
    for c in insts[:3]:
        assert c._df is None
    # compact_every is honored on lookup, not just first construction
    again = LlmCache.for_path(spark, f"{tmp_out}/memo_5", compact_every=2)
    assert again.compact_every == 2


def _centrality(spark):
    return spark.createDataFrame(
        [("Artificial Intelligence", "concept", "desc", 0.9),
         ("AI", "concept", "d", 0.8),
         ("Berlin", "geo", "d", 0.7),
         ("Alice Johnson", "person", "d", 0.6)],
        "entity_id string, entity_type string, description string, centrality double",
    )


def test_p1_p2_p3_p5(spark):
    cand = candidate_entities(_centrality(spark), ["concept", "geo"], limit=3)
    assert [r["entity_id"] for r in cand.collect()] == [
        "Artificial Intelligence", "AI", "Berlin",
    ]
    scored = match_and_score(cand, "profile interested in artificial intelligence berlin", threshold=0.5)
    names = {r["entity_id"] for r in scored.collect()}
    assert "Berlin" in names
    no_abbrev = remove_abbreviations(_centrality(spark))
    assert "AI" not in {r["entity_id"] for r in no_abbrev.collect()}
    grouped = {r["entity_type"]: r["entities"] for r in group_by_type(_centrality(spark)).collect()}
    assert grouped["geo"] == ["Berlin"]


def test_p3_single_word_expansion_and_self_survival(spark):
    """Reference initials come from any split(): 'W' abbreviates the
    single word 'Wombat' and is dropped; a lone single-letter entity
    survives (only the self-pair is excluded)."""
    ents = spark.createDataFrame(
        [("W", "geo", 0.5), ("Wombat", "geo", 0.9)],
        "entity_id string, entity_type string, centrality double",
    )
    kept = {r["entity_id"] for r in remove_abbreviations(ents).collect()}
    assert kept == {"Wombat"}
    alone = spark.createDataFrame(
        [("W", "geo", 0.5)],
        "entity_id string, entity_type string, centrality double",
    )
    assert {r["entity_id"] for r in remove_abbreviations(alone).collect()} == {"W"}


def test_p12_last_modified_picks_latest_recrawl(spark):
    pages = spark.createDataFrame(
        [
            ("u1", dt.datetime(2026, 1, 2)),
            ("u1", dt.datetime(2026, 3, 4)),
            ("u1", dt.datetime(2025, 12, 31)),
        ],
        "url string, warc_ts timestamp",
    )
    out = last_modified(pages).collect()
    assert len(out) == 1
    assert out[0]["last_modified"] == dt.datetime(2026, 3, 4)


def test_p6_relevance_sort_and_question():
    q = build_search_question("data engineer", ["spark", "graphs"])
    assert "data engineer" in q and "spark, graphs" in q


def test_p6_sort(spark):
    docs = spark.createDataFrame(
        [("a", "low"), ("b", "very_high"), ("c", "medium")],
        "file_path string, relevancy_score string",
    )
    out = [r["file_path"] for r in sort_by_relevance(docs).collect()]
    assert out == ["b", "c", "a"]


def test_p9_p10(spark):
    topics = spark.createDataFrame(
        [("T1", "x" * 3000), ("T1", "dup"), ("T2", "ok")], "name string, description string"
    )
    pp = postprocess_topics(topics)
    assert pp.count() == 2
    assert pp.where("name = 'T1'").first()["description"].__len__() <= 1024
    nodes = spark.createDataFrame([("Berlin",), ("Acme Systems",)], "name string")
    t = topics_from_text(nodes, ["berlin", "unknown"])
    assert [r["name"] for r in t.collect()] == ["Berlin"]
    qs = generate_questions(t).first()
    assert len(qs["questions"]) == 3 and "Berlin" in qs["questions"][0]


def test_p7_summarize_documents(spark):
    """P7 contract (search_documents.py:94-135): per-doc summary = first
    2 sentences + question digest (pure Catalyst); a custom fn runs
    Arrow-batched."""
    from graphrag_kb_server_spark.operators.personalization import summarize_documents

    docs = spark.createDataFrame(
        [("d1", "One. Two. Three. Four."), ("d2", "Solo sentence")],
        "file_path string, content string",
    )
    out = {r["file_path"]: r["summary"]
           for r in summarize_documents(docs, "profile", "what matters?").collect()}
    assert out["d1"] == "One. Two [re: what matters?]"
    assert out["d2"] == "Solo sentence [re: what matters?]"
    custom = summarize_documents(
        docs, "profile", "q", summarize_fn=lambda c: c[:3].upper()
    )
    assert {r["summary"] for r in custom.collect()} == {"ONE", "SOL"}


def test_p8_topics(spark):
    """P8 (service/topic_generation.py:48-66): type filter → centrality
    desc → limit, projected to (name, description, type)."""
    from graphrag_kb_server_spark.operators.graph_support import topics

    cent = spark.createDataFrame(
        [("B", "concept", "db", 0.9), ("A", "concept", "da", 0.9),
         ("C", "geo", "dc", 0.5), ("D", "person", "dd", 1.0)],
        "entity_id string, entity_type string, description string, centrality double",
    )
    out = topics(cent, ["concept", "geo"], limit=2).collect()
    assert [(r["name"], r["type"]) for r in out] == [("A", "concept"), ("B", "concept")]
    assert set(out[0].asDict()) == {"name", "description", "type"}


def test_p13_enrich_references(spark):
    """P13 (main/query_support.py:94-199): drop KG-type refs, join links
    + last_modified, dedup by file keeping the lowest ref_ix."""
    from graphrag_kb_server_spark.operators.personalization import enrich_references

    refs = spark.createDataFrame(
        [(1, "f1", "DC"), (2, "f2", "KG"), (3, "f1", "DC"), (4, "f3", "DC")],
        "ref_ix int, file_path string, type string",
    )
    links = spark.createDataFrame(
        [("f1", "https://l1")], "file_path string, link string"
    )
    props = spark.createDataFrame(
        [("f1", dt.datetime(2026, 2, 1)), ("f3", dt.datetime(2026, 3, 1))],
        "file_path string, last_modified timestamp",
    )
    out = {r["file_path"]: r for r in
           enrich_references(refs, links, props).collect()}
    assert set(out) == {"f1", "f3"}, "KG ref dropped, f1 deduped"
    assert out["f1"]["ref_ix"] == 1 and out["f1"]["link"] == "https://l1"
    assert out["f3"]["last_modified"] == dt.datetime(2026, 3, 1)
    assert out["f3"]["link"] is None


def test_p14_doc_summary_lookup(spark):
    """P14 (lightrag_summary.py:12-33): file_path → content_summary."""
    from graphrag_kb_server_spark.operators.personalization import doc_summary_lookup

    status = spark.createDataFrame(
        [("f1", "sum1", "processed"), ("f2", "sum2", "processed")],
        "file_path string, content_summary string, status string",
    )
    paths = spark.createDataFrame([("f1",), ("fX",)], "file_path string")
    out = {r["file_path"]: r["content_summary"]
           for r in doc_summary_lookup(status, paths).collect()}
    assert out == {"f1": "sum1", "fX": None}


def test_p2_custom_fn_arrow_batched(spark):
    """The LLM-slot path of match_and_score (caller-supplied score_fn)
    runs through a pandas_udf and honors the threshold."""
    cand = _centrality(spark)
    out = match_and_score(
        cand, "profile", threshold=0.5,
        score_fn=lambda name, prof: (0.9 if " " in name else 0.1, "low"),
    )
    names = {r["entity_id"] for r in out.collect()}
    assert names == {"Artificial Intelligence", "Alice Johnson"}
    scored = {r["entity_id"]: r["score"] for r in out.collect()}
    assert all(v == 0.9 for v in scored.values())


def test_p12_last_modified(spark):
    pages = spark.createDataFrame(
        [("u1", dt.datetime(2026, 1, 2))], "url string, warc_ts timestamp"
    )
    out = last_modified(pages).first()
    assert out["file_path"] == "u1" and out["last_modified"].year == 2026


def test_g8_reports(spark):
    asg = spark.createDataFrame(
        [("a", 0, "c0"), ("b", 0, "c0"), ("c", 0, "c1")],
        "node string, level int, cluster string",
    )
    nodes = spark.createDataFrame(
        [("a", "da", 3), ("b", "db", 1), ("c", "dc", 2)],
        "name string, description string, degree int",
    )
    inputs = community_inputs(asg, nodes)
    reports = {r["cluster"]: r for r in generate_reports(inputs).collect()}
    assert reports["c0"]["size"] == 2
    assert reports["c0"]["title"].startswith("Community of")
    assert reports["c1"]["summary"].startswith("dc"[:2])
