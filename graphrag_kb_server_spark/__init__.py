"""graphrag_kb_server_spark — a PySpark-native knowledge-graph construction
and graph-RAG query engine.

Brand-new implementation (NOT a port) of the computational semantics of
OnepointConsultingLtd/graphrag_kb_server (reference at /root/reference,
read-only), re-expressed as idiomatic Spark DataFrame/SQL programs:

- ``sources``    — web_pages corpus schema, readers/writers, exports
- ``functions``  — scalar/column-level helpers (sanitize, cosine, minhash,
                   hash-embeddings) built on pyspark.sql.functions
- ``operators``  — the operator inventory of SURVEY.md §2 (chunking,
                   extraction, graph build, linking, connected components,
                   round-robin merge, token truncation, dedup family,
                   similarity search, text stats, analytics)
- ``plans``      — end-to-end pipelines (indexing, kg_query)
- ``streaming``  — incremental / availableNow-style indexing

All LLM-shaped slots in the reference (triple extraction, embeddings,
keywording) are deterministic stand-ins with identical contracts, so a
real model client can be swapped in per-slot (SURVEY.md §7).
"""

__version__ = "0.1.0"

GRAPH_FIELD_SEP = "<SEP>"
