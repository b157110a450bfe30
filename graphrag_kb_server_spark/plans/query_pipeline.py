"""The 4-stage kg_query pipeline as a parameterized DataFrame program.

Reference entry point: ``kg_query``
(/root/reference/graphrag_kb_server/service/lightrag/lightrag_search.py:330-597),
stages labelled at :612-614 — 1. Search → 2. Truncate → 3. Merge chunks
→ 4. Build LLM context.

Spark lifecycle (SURVEY.md §3.1): the query embedding is computed once
(reference :959-974) and broadcast by value; local/global branches are
independent sub-plans Spark schedules in parallel; every order-sensitive
reference loop (round-robin dedup, prefix truncation, weighted polling)
is an explicit window over an explicit rank; the final context rows
(≤ ~1k) are collected to the driver for assembly — the LLM boundary.

Modes (reference :984-1034, normalization all→hybrid at
model/rag_parameters.py:116): local = entity search; global = relation
search; hybrid = both; mix = both + direct chunk vector search.
"""

from __future__ import annotations

import json
import re
from collections import Counter
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from .. import GRAPH_FIELD_SEP
from ..functions.embedding import embed_text
from ..tokenizer import count_tokens
from ..operators.merge import rank_branch, round_robin_merge
from ..operators.polling import gradient_quotas, weighted_polling_pick
from ..operators.truncation import truncate_by_token_budget
from ..operators.vector_topk import cosine_topk

_STOPWORDS = {
    "the", "a", "an", "of", "in", "on", "to", "and", "or", "is", "are",
    "what", "which", "who", "how", "does", "do", "with", "for", "about",
    "tell", "me", "between", "relationship",
}


def extract_keywords(query: str, user_keywords: list[str] | None = None) -> list[str]:
    """Q1 — the LLM keyword slot's deterministic stand-in: tf-ranked
    non-stopword terms plus capitalized spans, unioned with user-supplied
    keywords (set union, reference lightrag_search.py:83-84, :385-390)."""
    spans = re.findall(r"(?:[A-Z][A-Za-z0-9'&-]*)(?:\s+[A-Z][A-Za-z0-9'&-]*)*", query)
    words = [w for w in re.findall(r"[a-z]+", query.lower()) if w not in _STOPWORDS]
    ranked = [w for w, _ in Counter(words).most_common(8)]
    out: list[str] = []
    for kw in spans + ranked + (user_keywords or []):
        if kw and kw not in out:
            out.append(kw)
    return out


def extract_keywords_hl_ll(
    query: str, user_keywords: list[str] | None = None
) -> tuple[list[str], list[str]]:
    """The reference splits keywords into high-level (thematic) and
    low-level (specific entities) lists (lightrag_search.py:689-699).
    Deterministic stand-in: capitalized entity spans → low-level,
    tf-ranked terms + user keywords → high-level."""
    spans = re.findall(r"(?:[A-Z][A-Za-z0-9'&-]*)(?:\s+[A-Z][A-Za-z0-9'&-]*)*", query)
    words = [w for w in re.findall(r"[a-z]+", query.lower()) if w not in _STOPWORDS]
    ranked = [w for w, _ in Counter(words).most_common(8)]
    ll = list(dict.fromkeys(s for s in spans if s))
    hl = [w for w in dict.fromkeys(ranked + (user_keywords or [])) if w not in ll]
    return hl, ll


@dataclass
class QueryParams:
    """Mirror of the reference QueryParameters defaults
    (model/rag_parameters.py:27,121-122; top_k default 60 in LightRAG)."""
    mode: str = "hybrid"  # local | global | hybrid | mix (all→hybrid)
    top_k: int = 60
    max_entity_tokens: int = 100
    max_relation_tokens: int = 800
    max_total_tokens: int = 5000
    related_chunk_number: int = 5
    # Q11 vs Q12 (lightrag_search.py:1472-1521): 'weighted_polling' or
    # 'vector' (vector falls back to polling on failure)
    chunk_pick: str = "weighted_polling"
    # Q19 (lightrag_search.py:454-487)
    only_need_context: bool = False
    only_need_prompt: bool = False
    # Q17 prompt slots (reference defaults at lightrag_search.py:771-777)
    response_type: str = "Multiple Paragraphs"
    user_prompt: str = ""


@dataclass
class GraphTables:
    nodes: DataFrame
    edges: DataFrame
    chunks: DataFrame
    entity_embeddings: DataFrame
    relation_embeddings: DataFrame
    chunk_embeddings: DataFrame
    # (file_path, last_modified) — P12: for webtext the authoritative
    # last-modified is warc_ts (operators.personalization.last_modified);
    # joined into the query reference list (lightrag_search.py:826-861)
    path_properties: DataFrame | None = None


# The four-slot context template (reference: PROMPTS["kg_query_context"]
# formatted at lightrag_search.py:895-900 with entities_str/relations_str/
# text_chunks_str/reference_list_str; section payloads are JSON-lines,
# lightrag_search.py:780-785, :822-824; reference rows are
# "[id] path (last_modified: iso)", :846-853).
KG_QUERY_CONTEXT_TEMPLATE = """-----Entities(KG)-----

```json
{entities_str}
```

-----Relationships(KG)-----

```json
{relations_str}
```

-----Document Chunks(DC)-----

```json
{text_chunks_str}
```

-----Reference Document List-----

{reference_list_str}
"""


def _json_lines(rows, keys) -> str:
    """JSON-lines section payload, exactly as the reference serializes
    context rows (json.dumps with default separators, ensure_ascii=False
    — lightrag_search.py:780-785)."""
    return "\n".join(
        json.dumps({k: r[k] for k in keys}, ensure_ascii=False) for r in rows
    )


@dataclass
class QueryContext:
    # post-truncation row shapes match the reference exactly
    # (lightrag_search.py:1166-1173, :1193-1200 minus the file_path/
    # created_at keys the reference strips during truncation, :1208-1240):
    # entities: {entity, type, description}; relations: {entity1,
    # entity2, description}; chunks: {reference_id, content} (+ chunk_id/
    # file_path kept for provenance, not serialized into the context).
    entities: list[dict] = field(default_factory=list)
    relations: list[dict] = field(default_factory=list)
    chunks: list[dict] = field(default_factory=list)
    keywords: list[str] = field(default_factory=list)
    keywords_hl: list[str] = field(default_factory=list)
    keywords_ll: list[str] = field(default_factory=list)
    references: list[dict] = field(default_factory=list)
    mode: str = "hybrid"
    processing_info: dict = field(default_factory=dict)

    def reference_list_str(self) -> str:
        def fmt(r: dict) -> str:
            lm = r.get("last_modified")
            ts = f" (last_modified: {lm.isoformat()})" if lm else ""
            return f"[{r['reference_id']}] {r['file_path']}{ts}"

        return "\n".join(fmt(r) for r in self.references if r["reference_id"])

    def context_str(self) -> str:
        """Q16 — the templated context assembly (reference :728-924)."""
        return KG_QUERY_CONTEXT_TEMPLATE.format(
            entities_str=_json_lines(self.entities, ("entity", "type", "description")),
            relations_str=_json_lines(
                self.relations, ("entity1", "entity2", "description")
            ),
            text_chunks_str=_json_lines(self.chunks, ("reference_id", "content")),
            reference_list_str=self.reference_list_str(),
        )

    def raw_data(self) -> dict:
        """The structured payload next to the context string
        (convert_to_user_format shape + the metadata/processing_info
        counts at lightrag_search.py:693-712)."""
        return {
            "data": {
                "entities": self.entities,
                "relationships": self.relations,
                "chunks": self.chunks,
            },
            "metadata": {
                "query_mode": self.mode,
                "keywords": {
                    "high_level": self.keywords_hl,
                    "low_level": self.keywords_ll,
                },
                "processing_info": self.processing_info,
            },
            "status": "success",
        }


def _entity_search(g: GraphTables, qvec, k: int) -> DataFrame:
    """Q2 — entity vector top-k + node attrs + degree ("local")."""
    top = cosine_topk(g.entity_embeddings, qvec, k, score_alias="vscore")
    return top.join(g.nodes, "name").select(
        "name", "type", "description", "degree", "source_chunk_ids", "vscore"
    )


def _relation_search(g: GraphTables, qvec, k: int) -> DataFrame:
    """Q3 — relation vector top-k + edge attrs ("global")."""
    top = cosine_topk(g.relation_embeddings, qvec, k, score_alias="vscore")
    return top.join(g.edges, ["src", "tgt"]).select(
        "src", "tgt", "keywords", "description", "weight", "combined_degree",
        "source_chunk_ids", "vscore",
    )


def _chunk_search(g: GraphTables, qvec, k: int) -> DataFrame:
    """Q4 — direct chunk vector top-k ("naive"/"mix" contribution)."""
    top = cosine_topk(g.chunk_embeddings, qvec, k, score_alias="vscore")
    return top.join(g.chunks.select("chunk_id", "content", "file_path"), "chunk_id")


def gather_chunks_from_members(
    selected: DataFrame, member_col: str, chunk_ids_col: str = "source_chunk_ids"
) -> DataFrame:
    """Q9/Q10 — explode member→chunk provenance; occurrence = how many
    selected members reference the chunk; first-member-wins dedup; rank
    chunks per member by occurrence desc (reference :1389-1464)."""
    exploded = selected.select(
        F.col(member_col).alias("member"),
        F.col("merge_ix"),
        F.explode(chunk_ids_col).alias("chunk_id"),
    )
    occ = Window.partitionBy("chunk_id")
    first_w = Window.partitionBy("chunk_id").orderBy("merge_ix")
    return (
        exploded.withColumn("occurrence", F.count(F.lit(1)).over(occ))
        .withColumn("_rk", F.row_number().over(first_w))
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )


def kg_query(
    spark: SparkSession,
    g: GraphTables,
    query: str,
    params: QueryParams | None = None,
    user_keywords: list[str] | None = None,
) -> QueryContext:
    params = params or QueryParams()
    mode = "hybrid" if params.mode == "all" else params.mode
    if mode not in ("local", "global", "hybrid", "mix"):
        # an unknown/misspelled mode would otherwise run zero branches
        # and return an EMPTY context with status success — callers
        # could not tell a bad mode from a genuinely empty result
        raise ValueError(
            f"kg_query: unsupported mode {params.mode!r} "
            "(expected local | global | hybrid | mix | all)"
        )
    keywords = extract_keywords(query, user_keywords)
    # Q1: embed once, reuse across all vector ops (reference :959-974)
    qvec = embed_text(query if not keywords else " ".join(keywords))

    # ── Stage 1: search (independent branches; Spark runs them when
    #    actions fire — the asyncio.gather analogue) ──────────────────
    want_local = mode in ("local", "hybrid", "mix")
    want_global = mode in ("global", "hybrid", "mix")
    want_vector = mode == "mix"

    # Reference hybrid semantics (lightrag_search.py:984-1066): the
    # local (entity) search ALSO yields the edges incident to its top
    # entities, and the global (relation) search ALSO yields its edges'
    # endpoint entities; each final list is the round-robin interleave
    # of its two branches with first-occurrence dedup.
    # Each search result feeds two later branches (entities + incident
    # relations / relations + endpoint entities). They are NOT
    # checkpointed: both branches live inside the ONE stage-2b job, the
    # duplicated top-k sub-plan is bounded (k rows over a TakeOrdered
    # scan), and the lazy localCheckpoints used previously cost ~0.2s
    # of plan→RDD compilation per query — more than the duplicated
    # compute they saved (measured A/B, OPTIMIZATION_r06.md).
    loc = _entity_search(g, qvec, params.top_k) if want_local else None
    glob = _relation_search(g, qvec, params.top_k) if want_global else None

    ent_branches: list[DataFrame] = []
    if loc is not None:
        ent_branches.append(rank_branch(loc, [F.desc("vscore"), "name"], 0))
    if glob is not None:
        # endpoint entities of the top relations, in relation-score order
        endpoints = glob.select(
            F.explode(F.array("src", "tgt")).alias("name"), "vscore"
        ).groupBy("name").agg(F.max("vscore").alias("vscore"))
        ep = endpoints.join(g.nodes, "name").select(
            "name", "type", "description", "degree", "source_chunk_ids", "vscore"
        )
        ent_branches.append(
            rank_branch(ep, [F.desc("vscore"), "name"], len(ent_branches))
        )
    entities = (
        round_robin_merge(ent_branches, ["name"]) if ent_branches else None
    )

    rel_branches: list[DataFrame] = []
    if glob is not None:
        rel_branches.append(rank_branch(glob, [F.desc("vscore"), "src", "tgt"], 0))
    if loc is not None:
        # edges incident to the top local entities, ranked by the
        # entity's score then edge weight (one-hop graph expansion)
        inc = (
            loc.select("name", "vscore")
            .join(
                g.edges,
                (F.col("name") == F.col("src")) | (F.col("name") == F.col("tgt")),
            )
            .groupBy("src", "tgt")
            .agg(
                F.max("vscore").alias("vscore"),
                F.first("keywords").alias("keywords"),
                F.first("description").alias("description"),
                F.first("weight").alias("weight"),
                F.first("combined_degree").alias("combined_degree"),
                F.first("source_chunk_ids").alias("source_chunk_ids"),
            )
        )
        rel_branches.append(
            rank_branch(
                inc.select(
                    "src", "tgt", "keywords", "description", "weight",
                    "combined_degree", "source_chunk_ids", "vscore",
                ),
                [F.desc("vscore"), F.desc("weight"), "src", "tgt"],
                len(rel_branches),
            )
        )
    relations = (
        round_robin_merge(rel_branches, ["src", "tgt"]) if rel_branches else None
    )

    # ── Stage 2: token truncation (Q8) ───────────────────────────────
    # token accounting serializes the same stripped row shape the
    # reference does (file_path/created_at removed before counting,
    # lightrag_search.py:1208-1240): entities as {entity, type,
    # description}, relations as {entity1, entity2, description}.
    # Known deviation: F.to_json emits compact separators ("," ":")
    # while the reference counts json.dumps' spaced form (", " ": ") —
    # the spaced punctuation can tokenize to slightly more tokens, so
    # rows within a few tokens of max_entity/relation_tokens may be
    # kept here that the reference would cut. The kept-set rule and
    # ordering are identical; only the boundary token arithmetic
    # differs (Catalyst's to_json has no separator option; the q8
    # oracle pins THIS accounting).
    # Pre-truncation counts ride Observations on the plan nodes the
    # final collects execute anyway — zero extra Spark jobs (the
    # reference's processing_info counts, lightrag_search.py:693-712).
    ent_obs = rel_obs = None
    if entities is not None:
        ent_obs = Observation("n_entities_found")
        entities = entities.observe(ent_obs, F.count(F.lit(1)).alias("n"))
        entities = entities.withColumn(
            "_ser",
            F.to_json(
                F.struct(
                    F.col("name").alias("entity"), "type", "description"
                )
            ),
        )
        entities = truncate_by_token_budget(
            entities, "_ser", "merge_ix", params.max_entity_tokens
        ).drop("_ser")
    if relations is not None:
        rel_obs = Observation("n_relations_found")
        relations = relations.observe(rel_obs, F.count(F.lit(1)).alias("n"))
        relations = relations.withColumn(
            "_ser",
            F.to_json(
                F.struct(
                    F.col("src").alias("entity1"),
                    F.col("tgt").alias("entity2"),
                    "description",
                )
            ),
        )
        relations = truncate_by_token_budget(
            relations, "_ser", "merge_ix", params.max_relation_tokens
        ).drop("_ser")

    # ── Stage 2b: materialize + collect the token-budgeted entity /
    #    relation context. Q14's budget needs the tokens ACTUALLY kept
    #    (lightrag_search.py:780-812); the eager checkpoint is the one
    #    action that populates the pre-truncation Observations AND lets
    #    stage 3 reuse the truncated lists without recomputing the
    #    merge/truncate windows per downstream branch. ─────────────────
    hl, ll = extract_keywords_hl_ll(query, user_keywords)
    ctx = QueryContext(keywords=keywords, keywords_hl=hl, keywords_ll=ll, mode=mode)
    n_entities_found = n_relations_found = 0
    # Both truncated branches materialize in ONE tagged-union
    # checkpoint (their independent sub-plans run as parallel stages of
    # a single job — the asyncio.gather analogue made literal) and the
    # driver reads the result back in ONE collect; the per-branch
    # views below are trivial filters over the checkpointed RDD.
    ent_cols = ["name", "type", "description", "degree",
                "source_chunk_ids", "merge_ix"]
    rel_cols = ["src", "tgt", "keywords", "description", "weight",
                "combined_degree", "source_chunk_ids", "merge_ix"]
    parts = []
    if entities is not None:
        parts.append(
            entities.select(*ent_cols).withColumn("_sec", F.lit("ent"))
        )
    if relations is not None:
        parts.append(
            relations.select(*rel_cols).withColumn("_sec", F.lit("rel"))
        )
    if parts:
        both = parts[0]
        for p in parts[1:]:
            both = both.unionByName(p, allowMissingColumns=True)
        # NOTE: this EAGER checkpoint is the DataFrame action that
        # fires the CollectMetrics nodes feeding ent_obs/rel_obs below —
        # the checkpoint replaces the logical plan with a LogicalRDD, so
        # the later collect() no longer contains them. If this ever
        # becomes lazy (or a branch is pruned before it), Observation.get
        # would block forever; keep eager=True or replace the
        # Observations with explicit count aggregates.
        both = both.localCheckpoint(eager=True)
        rows = both.orderBy("_sec", "merge_ix").collect()
        # (A local-relation rebuild of entities/relations from the
        # collected rows was A/B-tested here and measured SLOWER than
        # the filter-over-checkpoint views — the local relations lose
        # the checkpoint's stats and Arrow-free construction costs more
        # than the trivial filters; see OPTIMIZATION_r06.md.)
        if entities is not None:
            entities = both.where(F.col("_sec") == "ent").select(*ent_cols)
            ctx.entities = [
                {"entity": r["name"], "type": r["type"],
                 "description": r["description"]}
                for r in rows if r["_sec"] == "ent"
            ]
            n_entities_found = int(ent_obs.get["n"])
        if relations is not None:
            relations = both.where(F.col("_sec") == "rel").select(*rel_cols)
            ctx.relations = [
                {"entity1": r["src"], "entity2": r["tgt"],
                 "description": r["description"]}
                for r in rows if r["_sec"] == "rel"
            ]
            n_relations_found = int(rel_obs.get["n"])

    # ── Stage 3: chunk gathering + merge (Q9/Q10/Q11/Q13) ────────────
    chunk_branches: list[DataFrame] = []
    branch_ix = 0
    if want_vector:
        vec_chunks = _chunk_search(g, qvec, params.related_chunk_number * 2)
        chunk_branches.append(
            rank_branch(
                vec_chunks.select("chunk_id", "vscore"),
                [F.desc("vscore"), "chunk_id"],
                branch_ix,
            ).select("chunk_id", "_pos", "_branch")
        )
        branch_ix += 1
    ent_chunk_ids = None
    if entities is not None:
        ent_chunks = gather_chunks_from_members(entities, "name")
        if params.chunk_pick == "vector":
            # Q12: rank candidates by cosine to the query embedding;
            # on failure the reference falls back to weighted polling
            from ..operators.context_ops import vector_similarity_chunk_pick

            try:
                n_ent = len(ctx.entities)
                picked = vector_similarity_chunk_pick(
                    ent_chunks.select("chunk_id").distinct(),
                    g.chunk_embeddings,
                    query,
                    n_entities=max(n_ent, 1),
                    related_chunk_number=params.related_chunk_number,
                ).join(ent_chunks, "chunk_id").withColumnRenamed("member", "name")
            except Exception:
                picked = None
        else:
            picked = None
        if picked is None:
            quotas = gradient_quotas(
                entities.select("name", "merge_ix").withColumnRenamed("merge_ix", "rank"),
                "rank",
                params.related_chunk_number,
                n_total=len(ctx.entities),  # known — no count() job
            )
            picked = weighted_polling_pick(
                ent_chunks.withColumnRenamed("member", "name"), quotas, "name"
            )
        ent_chunk_ids = picked.select("chunk_id")
        chunk_branches.append(
            rank_branch(
                picked.select("chunk_id", "occurrence"),
                [F.desc("occurrence"), "chunk_id"],
                branch_ix,
            ).select("chunk_id", "_pos", "_branch")
        )
        branch_ix += 1
    if relations is not None:
        rel_sel = relations.withColumn("name", F.concat_ws("|", "src", "tgt"))
        rel_chunks = gather_chunks_from_members(rel_sel, "name")
        if ent_chunk_ids is not None:  # Q10 anti-dedup vs entity chunks
            rel_chunks = rel_chunks.join(ent_chunk_ids, "chunk_id", "left_anti")
        chunk_branches.append(
            rank_branch(
                rel_chunks.select("chunk_id", "occurrence"),
                [F.desc("occurrence"), "chunk_id"],
                branch_ix,
            ).select("chunk_id", "_pos", "_branch")
        )
        branch_ix += 1

    merged_chunks = None
    chunk_obs = None
    available_chunk_tokens = 0
    if chunk_branches:
        merged_ids = round_robin_merge(chunk_branches, ["chunk_id"])
        chunk_obs = Observation("merged_chunks_count")
        merged_chunks = merged_ids.join(
            g.chunks.select("chunk_id", "content", "file_path"), "chunk_id"
        ).observe(chunk_obs, F.count(F.lit(1)).alias("n"))
        # ── Q14: dynamic chunk token budget (lightrag_search.py:761-823)
        # available = max_total − tokens(system-prompt scaffold) −
        # tokens(kg context ACTUALLY kept) − tokens(query) − 200 buffer,
        # all through the shared tokenizer — the reference formula, not
        # the configured-maxima estimate.
        from ..operators.context_ops import build_rag_prompt

        pre_kg_context = KG_QUERY_CONTEXT_TEMPLATE.format(
            entities_str=_json_lines(
                ctx.entities, ("entity", "type", "description")
            ),
            relations_str=_json_lines(
                ctx.relations, ("entity1", "entity2", "description")
            ),
            text_chunks_str="",
            reference_list_str="",
        )
        pre_sys_prompt = build_rag_prompt(
            "", params.response_type, params.user_prompt
        )
        available_chunk_tokens = max(
            params.max_total_tokens
            - count_tokens(pre_sys_prompt)
            - count_tokens(pre_kg_context)
            - count_tokens(query)
            - 200,  # reference: reserved for reference list + safety
            0,
        )
        merged_chunks = truncate_by_token_budget(
            merged_chunks, "content", "merge_ix", available_chunk_tokens
        )
        # ONE materialization of the gather/merge/truncate plan: the
        # eager checkpoint publishes chunk_obs and both stage-4 reads
        # (references, chunk rows) become trivial scans of the
        # checkpointed result instead of re-executing the plan each.
        merged_chunks = merged_chunks.localCheckpoint(eager=True)

    # ── Stage 4: context assembly (collect the small result) ─────────
    if merged_chunks is not None:
        # Q15/Q21: numbered reference list (+ last_modified from the
        # path-properties table, lightrag_search.py:826-861) with <SEP>
        # expansion; each surviving chunk carries its reference_id.
        # Both stage-4 reads (reference rows AND chunk rows) are folded
        # into ONE action: a tagged union over the checkpointed
        # merged_chunks, so the online path runs one driver job here
        # instead of two (both sides are trivial scans of the same
        # checkpoint; the refs side adds only the small
        # path_properties broadcast join).
        from ..operators.context_ops import expand_file_references, reference_list

        refs = expand_file_references(reference_list(merged_chunks))
        if g.path_properties is not None:
            refs = refs.drop("last_modified").join(
                g.path_properties.select("file_path", "last_modified"),
                "file_path",
                "left",
            )
        ref_part = refs.select(
            F.lit("ref").alias("_sec"), F.col("ref_ix").alias("_ix"),
            "file_path", "last_modified",
            F.lit(None).cast("string").alias("chunk_id"),
            F.lit(None).cast("string").alias("content"),
        )
        chunk_part = merged_chunks.select(
            F.lit("chunk").alias("_sec"), F.col("merge_ix").alias("_ix"),
            "file_path", F.lit(None).cast("timestamp").alias("last_modified"),
            "chunk_id", "content",
        )
        all_rows = ref_part.unionByName(chunk_part).orderBy("_sec", "_ix").collect()
        ref_rows = [r for r in all_rows if r["_sec"] == "ref"]
        chunk_rows = [r for r in all_rows if r["_sec"] == "chunk"]
        ctx.references = [
            {"reference_id": r["_ix"], "file_path": r["file_path"],
             "last_modified": r["last_modified"]}
            for r in ref_rows
        ]
        ref_by_path = {r["file_path"]: r["_ix"] for r in ref_rows}

        def _ref_for(raw_path: str) -> int:
            # a chunk's file_path may be a <SEP>-joined multi-file
            # string; refs are keyed on the EXPANDED single paths (Q21),
            # so cite the first (min ref_ix) matching expanded path —
            # the reference's generate_reference_list_from_chunks
            # behavior (lightrag_search.py:826-861)
            hits = [
                ref_by_path[p]
                for p in (raw_path or "").split(GRAPH_FIELD_SEP)
                if p in ref_by_path
            ]
            return min(hits) if hits else 0

        ctx.chunks = [
            {"reference_id": _ref_for(r["file_path"]),
             "content": r["content"], "chunk_id": r["chunk_id"],
             "file_path": r["file_path"]}
            for r in chunk_rows
        ]
    ctx.processing_info = {
        "total_entities_found": n_entities_found,
        "total_relations_found": n_relations_found,
        "entities_after_truncation": len(ctx.entities),
        "relations_after_truncation": len(ctx.relations),
        "merged_chunks_count": (
            int(chunk_obs.get["n"]) if chunk_obs is not None else 0
        ),
        "final_chunks_count": len(ctx.chunks),
        "available_chunk_tokens": available_chunk_tokens,
    }
    return ctx


def answer_query(
    spark: SparkSession,
    g: GraphTables,
    query: str,
    params: QueryParams | None = None,
    cache_path: str | None = None,
    llm_fn=None,
    max_retries: int = 5,
) -> dict:
    """Q17/Q18/Q19 — the full chat surface: kg_query → context/prompt
    modes → cached LLM answer, with the reference's retry-with-shrunken-
    params policy (≤5 retries at max_entity/relation size 10,
    lightrag_search.py:202-240)."""
    from ..operators.context_ops import LlmCache, answer_with_cache

    params = params or QueryParams()
    attempt_params = params
    last_err: Exception | None = None
    for attempt in range(max_retries):
        try:
            ctx = kg_query(spark, g, query, attempt_params)
            break
        except Exception as e:  # Q18: shrink and retry
            last_err = e
            attempt_params = QueryParams(
                mode=params.mode, top_k=10, max_entity_tokens=100,
                max_relation_tokens=100, max_total_tokens=2000,
                related_chunk_number=2, chunk_pick="weighted_polling",
            )
    else:
        raise last_err  # exhausted retries
    context_str = ctx.context_str()
    if params.only_need_context:
        return {"context": context_str, "references": ctx.references,
                "raw_data": ctx.raw_data(),
                "processing_info": ctx.processing_info}
    from ..operators.context_ops import build_rag_prompt

    # the reference's rag_response system prompt wraps the context
    # (lightrag_search.py:87-117); the query is the user message
    sys_prompt = build_rag_prompt(
        context_str, params.response_type, params.user_prompt
    )
    prompt = f"{sys_prompt}\n\n---Question---\n{query}\n"
    if params.only_need_prompt:
        return {"prompt": prompt, "references": ctx.references,
                "raw_data": ctx.raw_data(),
                "processing_info": ctx.processing_info}
    cache = LlmCache.for_path(spark, cache_path or "/tmp/kgspark_llm_cache")
    # cache key mirrors the reference's composition (lightrag_search.py
    # :499-513: mode, query, response_type, top_k, token budgets,
    # user_prompt, project_dir) — the kb scope here is the cache path
    # itself, included so KBs sharing the default path cannot serve
    # each other's answers
    answer = answer_with_cache(
        cache, params.mode, query,
        {
            "top_k": attempt_params.top_k,
            "response_type": params.response_type,
            "max_entity_tokens": attempt_params.max_entity_tokens,
            "max_relation_tokens": attempt_params.max_relation_tokens,
            "max_total_tokens": attempt_params.max_total_tokens,
            "related_chunk_number": attempt_params.related_chunk_number,
            "chunk_pick": attempt_params.chunk_pick,
            "user_prompt": params.user_prompt or "",
            "kb": cache_path or "/tmp/kgspark_llm_cache",
        },
        context_str, llm_fn=llm_fn,
        prompt=prompt,
    )
    return {"answer": answer, "references": ctx.references,
            "raw_data": ctx.raw_data(),
            "processing_info": ctx.processing_info}
