"""Q12/Q15/Q20/Q21 + Q17 cache — the remaining kg_query context ops.

- Q12 vector-similarity chunk pick: rank candidate chunks by cosine to
  the query embedding, keep ``related_chunk_number * n_entities / 2``
  (/root/reference/graphrag_kb_server/service/lightrag/lightrag_search.py:1472-1510,
  :1676-1713; query embedding precomputed once :959-974). Fallback to
  weighted polling on failure is the caller's try/except.
- Q15 reference list: number surviving chunks, emit
  ``[id] file_path (last_modified)`` (:826-861).
- Q20 dedup-by-content combine: dedup on all fields except id/created_at,
  reassign ids (:1758-1788).
- Q21 <SEP> file-reference expansion (:1791-1817).
- Q17 LLM-response cache: ``llm_cache(args_hash, content)`` keyed by a
  deterministic hash of (mode, query, params) — ``compute_args_hash``
  analogue (:499-513); the cache IS a table (determinism fixture).
"""

from __future__ import annotations

import hashlib
import json
from collections import OrderedDict

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.windows import bounded_global

from .. import GRAPH_FIELD_SEP
from ..functions import vectors as V
from ..functions.embedding import embed_text


def vector_similarity_chunk_pick(
    candidate_chunk_ids: DataFrame,
    chunk_embeddings: DataFrame,
    query_text: str,
    n_entities: int,
    related_chunk_number: int = 5,
) -> DataFrame:
    """Q12 — candidates(chunk_id) → top ``related_chunk_number *
    n_entities / 2`` by cosine to the query embedding."""
    num = max(int(related_chunk_number * n_entities / 2), 1)
    qvec = embed_text(query_text)
    scored = candidate_chunk_ids.join(chunk_embeddings, "chunk_id").withColumn(
        "vscore", V.cosine_with_query(V.to_double(F.col("embedding")), qvec)
    )
    return (
        scored.orderBy(F.desc("vscore"), "chunk_id")
        .limit(num)
        .select("chunk_id", "vscore")
    )


def reference_list(
    surviving_chunks: DataFrame,
    path_properties: DataFrame | None = None,
    order_col: str = "merge_ix",
) -> DataFrame:
    """Q15 — (ref_ix, file_path, last_modified) numbered reference rows;
    last_modified joined from the path-properties table (for webtext the
    authoritative source is ``warc_ts`` — P12)."""
    w = bounded_global(order_col)
    refs = (
        surviving_chunks.select("file_path", order_col)
        .withColumn("_rk", F.row_number().over(Window.partitionBy("file_path").orderBy(order_col)))
        .where(F.col("_rk") == 1)
        .drop("_rk")
        .withColumn("ref_ix", F.row_number().over(w))
        .drop(order_col)
    )
    if path_properties is not None:
        refs = refs.join(
            path_properties.select("file_path", "last_modified"), "file_path", "left"
        )
    else:
        refs = refs.withColumn("last_modified", F.lit(None).cast("timestamp"))
    return refs.select("ref_ix", "file_path", "last_modified")


def dedup_by_content_combine(
    parts: list[DataFrame],
    content_cols: list[str],
    order_cols: list[str] | None = None,
    id_col: str = "id",
) -> DataFrame:
    """Q20 — union context lists, dedup on every column except
    id/created_at, reassign sequential ids in first-occurrence order.

    "First occurrence" is made explicit: position = (part index,
    order_cols within the part) — distributed row order is never used
    (order_cols defaults to the existing id column)."""
    order_cols = order_cols or [id_col]
    tagged_parts = [
        p.withColumn("_part", F.lit(i)) for i, p in enumerate(parts)
    ]
    unioned = tagged_parts[0]
    for p in tagged_parts[1:]:
        unioned = unioned.unionByName(p)
    pos_w = bounded_global("_part", *order_cols)
    tagged = unioned.withColumn("_pos", F.row_number().over(pos_w))
    first_w = Window.partitionBy(*content_cols).orderBy("_pos")
    out = (
        tagged.withColumn("_rk", F.row_number().over(first_w))
        .where(F.col("_rk") == 1)
        .withColumn(id_col, F.row_number().over(bounded_global("_pos")))
        .drop("_pos", "_rk", "_part")
    )
    return out


def expand_file_references(refs: DataFrame, file_col: str = "file_path") -> DataFrame:
    """Q21 — split ``<SEP>``-joined multi-file references into separate
    rows, dedup by file (first occurrence wins by ref_ix)."""
    exploded = refs.withColumn(
        file_col, F.explode(F.split(F.col(file_col), GRAPH_FIELD_SEP))
    )
    w = Window.partitionBy(file_col).orderBy("ref_ix")
    return (
        exploded.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )


# The reference's rag_response system prompt, quoted as a behavioral
# contract (prompt text is user-facing configuration, not engine code —
# same rationale as the byte-exact special-token regex in
# functions/text.py): lightrag_search.py:87-117 overrides
# PROMPTS["rag_response"] with Role / Goal / timestamp-handling rules /
# the knowledge block / Response Rules carrying the {response_type} and
# {user_prompt} slots and the [KG/DC] reference-citation instruction.
# A user switching engines gets the same system prompt; the LLM slot
# itself stays a deterministic stand-in here.
RAG_RESPONSE_TEMPLATE = """---Role---

You are a helpful assistant responding to user query about Knowledge \
Graph and Document Chunks provided in JSON format below.

---Goal---

Generate a concise response based on Knowledge Base and follow \
Response Rules, considering both the conversation history and the \
current query. Summarise all information in the provided Knowledge \
Base, and incorporating general knowledge relevant to the Knowledge \
Base. Do not include information not provided by Knowledge Base.

When handling relationships with timestamps:
1. Each relationship has a "created_at" timestamp indicating when we \
acquired this knowledge
2. When encountering conflicting relationships, consider both the \
semantic content and the timestamp
3. Don't automatically prefer the most recently created relationships \
- use judgment based on the context
4. For time-specific queries, prioritise temporal information in the \
content before considering creation timestamps

---Knowledge Graph and Document Chunks---
{context_data}

---Response Rules---

- Target format and length: {response_type}
- Use markdown formatting with appropriate section headings
- Please respond in the same language as the user's question.
- Ensure the response maintains continuity with the conversation \
history.
- List up to 10 most important reference sources at the end under \
"References" section. Clearly indicating whether each source is from \
Knowledge Graph (KG) or Document Chunks (DC), and include the file \
path if available, in the following format: [KG/DC] file_path
- If you don't know the answer, just say so.
- Do not make anything up. Do not include information not provided by \
the Knowledge Base.
- Addtional user prompt: {user_prompt}

Response:"""


def build_rag_prompt(
    context_data: str,
    response_type: str = "Multiple Paragraphs",
    user_prompt: str = "",
) -> str:
    """Q17 — the system prompt handed to the LLM slot, with the
    reference's section structure and format slots
    (lightrag_search.py:87-117; response_type default at :771-775)."""
    return RAG_RESPONSE_TEMPLATE.format(
        context_data=context_data,
        response_type=response_type,
        user_prompt=user_prompt,
    )


def compute_args_hash(mode: str, query: str, params: dict) -> str:
    """Q17 — deterministic cache key (compute_args_hash analogue)."""
    payload = json.dumps({"mode": mode, "query": query, "params": params},
                         sort_keys=True, ensure_ascii=False)
    return hashlib.md5(payload.encode("utf-8")).hexdigest()


class LlmCache:
    """The llm_cache table: parquet-backed KV of args_hash → content.

    Stays a *table* (not an in-process dict) because it is the
    determinism fixture the reference relies on (kv_store_llm_response_cache).
    Writes are append + last-write-wins on read (max by written_at).

    Small-file hygiene: each ``put`` appends one tiny file, so once the
    directory holds ``compact_every`` part-files ``put`` folds it back
    into a single last-write-wins file (``compact``). File counts stay
    bounded at sustained QPS instead of growing one-file-per-answer.
    Single-writer by design (the fixture contract); a shared production
    cache would sit on a real table format's MERGE instead.
    """

    #: per-process instance memo (LRU, bounded) — answer_query reuses
    #: ONE LlmCache (and its cached parquet DataFrame) per path instead
    #: of re-listing and re-reading the cache directory on every query.
    #: Bounded + unpersist-on-evict: every memoized instance pins a
    #: Spark-cached DataFrame, so an unbounded dict in a long-lived
    #: driver would accumulate persisted blocks one per cache path.
    _instances: "OrderedDict[str, LlmCache]" = OrderedDict()
    _MAX_INSTANCES = 8

    @classmethod
    def for_path(cls, spark, path: str, compact_every: int = 64) -> "LlmCache":
        inst = cls._instances.get(path)
        if inst is not None and inst.spark is spark:
            # honor the caller's compaction setting on lookup, not only
            # on first construction
            inst.compact_every = compact_every
            cls._instances.move_to_end(path)
            return inst
        if inst is not None:  # stale session: release its pinned cache
            inst._invalidate()
        inst = cls(spark, path, compact_every)
        cls._instances[path] = inst
        cls._instances.move_to_end(path)
        while len(cls._instances) > cls._MAX_INSTANCES:
            _, evicted = cls._instances.popitem(last=False)
            evicted._invalidate()
        return inst

    def __init__(self, spark, path: str, compact_every: int = 64):
        self.spark = spark
        self.path = path
        self.compact_every = compact_every
        self._df = None  # cached reader view; invalidated on put/compact
        self._recover()

    def _recover(self) -> None:
        """compact() has an unavoidable instant between renaming
        live→__old and compacted→live where the live dir is absent. If
        a crash landed there, restore automatically instead of silently
        rebuilding an empty cache while the data sits stranded."""
        import os
        import shutil

        if os.path.exists(self.path):
            return
        tmp = f"{self.path}__compact"
        old = f"{self.path}__old"
        if os.path.exists(os.path.join(tmp, "_SUCCESS")):
            # the compacted dir is complete and supersedes __old
            os.rename(tmp, self.path)
            shutil.rmtree(old, ignore_errors=True)
        elif os.path.exists(old):
            os.rename(old, self.path)
            shutil.rmtree(tmp, ignore_errors=True)

    def _part_files(self) -> int:
        import os

        try:
            return sum(
                1 for f in os.scandir(self.path) if f.name.startswith("part-")
            )
        except FileNotFoundError:
            return 0

    def _view(self):
        """Spark-cached view of the cache table, built once per
        generation (invalidated by put/compact): repeated gets skip the
        file listing + parquet scan after the first."""
        if self._df is None:
            self._recover()  # heal a crashed compact() before reading
            if self._part_files() == 0:
                return None
            self._df = self.spark.read.parquet(self.path).cache()
        return self._df

    def _invalidate(self) -> None:
        if self._df is not None:
            self._df.unpersist()
            self._df = None

    def get(self, args_hash: str) -> str | None:
        df = self._view()
        if df is None:
            return None
        row = (
            df.where(F.col("args_hash") == args_hash)
            .orderBy(F.desc("written_at"))
            .select("content")
            .first()
        )
        return row["content"] if row else None

    def put(self, args_hash: str, content: str) -> None:
        # heal a crashed compact() BEFORE appending: writing first
        # would recreate the live path as a fresh one-row cache, after
        # which _recover() never restores the stranded __old/__compact
        # dir and the next compact() rmtree's it — silently dropping
        # every previously cached answer
        self._recover()
        self.spark.createDataFrame(
            [(args_hash, content)], "args_hash string, content string"
        ).withColumn("written_at", F.current_timestamp()).write.mode(
            "append"
        ).parquet(self.path)
        self._invalidate()
        if self.compact_every and self._part_files() >= self.compact_every:
            self.compact()

    def compact(self) -> None:
        """Fold the append log into one file, keeping the newest row per
        args_hash (same last-write-wins the reads apply)."""
        import os
        import shutil

        from pyspark.sql import Window

        w = Window.partitionBy("args_hash").orderBy(F.desc("written_at"))
        latest = (
            self.spark.read.parquet(self.path)
            .withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .drop("_rk")
            .coalesce(1)
        )
        # crash-safe swap: write compacted → move live aside → move
        # compacted in → drop the old dir. Between the two renames the
        # LIVE path is briefly absent; _recover() (run on init and
        # before every fresh read) restores the stranded __compact or
        # __old dir automatically, so a crash in that window costs
        # nothing but the restore. The local rename/rmtree calls match
        # the cache's contract — a single-writer local-fixture path; a
        # cluster deployment replaces this class with a real table
        # format's MERGE.
        tmp = f"{self.path}__compact"
        old = f"{self.path}__old"
        latest.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(old, ignore_errors=True)
        os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old)
        self._invalidate()


def answer_with_cache(
    cache: LlmCache, mode: str, query: str, params: dict, context_str: str,
    llm_fn=None, prompt: str | None = None,
) -> str:
    """Q17 — cache lookup → LLM slot → post-cleanup → cache store.
    ``llm_fn(prompt)`` is the model boundary; the deterministic echo
    stand-in returns a digest of the context (reproducible). ``prompt``
    overrides the default framing (answer_query passes the reference's
    rag_response system prompt built by :func:`build_rag_prompt`)."""
    h = compute_args_hash(mode, query, params)
    hit = cache.get(h)
    if hit is not None:
        return hit
    if llm_fn is None:
        def llm_fn(prompt: str) -> str:
            d = hashlib.md5(prompt.encode("utf-8")).hexdigest()[:12]
            return f"[deterministic-echo {d}] {query}"
    answer = llm_fn(prompt or f"context:\n{context_str}\n\nquestion: {query}")
    # reference post-cleanup replace chain (lightrag_search.py:560-590)
    for junk in ("<|endoftext|>", "<|im_end|>"):
        answer = answer.replace(junk, "")
    cache.put(h, answer.strip())
    return answer.strip()
