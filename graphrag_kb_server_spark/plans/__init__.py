"""End-to-end pipelines: indexing (web_pages → graph tables) and kg_query."""
