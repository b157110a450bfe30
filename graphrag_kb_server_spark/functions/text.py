"""Text scalar functions — sanitize, framing invariant, ids.

The per-row invariant of BASELINE.json input_hint binds here: for each
url, extracted text must be byte-identical to the reference framing
``f"{text}\\n\\nSource: {url}\\n"``
(/root/reference/graphrag_kb_server/service/index_support.py:50-53)
after the tiktoken special-token strip
(/root/reference/graphrag_kb_server/service/lightrag/lightrag_index_support.py:27-35).

Everything here is a built-in Catalyst expression (whole-stage codegen,
no Python in the hot path).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exact regex from lightrag_index_support.py:27-30 (8 tiktoken special tokens).
TIKTOKEN_SPECIAL_TOKENS_PATTERN = (
    r"<\|endoftext\|>|<\|fim_prefix\|>|<\|fim_middle\|>|<\|fim_suffix\|>"
    r"|<\|endofprompt\|>|<\|im_start\|>|<\|im_end\|>|<\|im_sep\|>"
)
_SPECIAL_RE = re.compile(TIKTOKEN_SPECIAL_TOKENS_PATTERN)


def sanitize_special_tokens(col: Column) -> Column:
    """T1: strip tiktoken special tokens (regexp_replace, codegen'd)."""
    return F.regexp_replace(col, TIKTOKEN_SPECIAL_TOKENS_PATTERN, "")


def sanitize_special_tokens_py(text: str) -> str:
    """Pure-Python twin of :func:`sanitize_special_tokens` for fixtures."""
    return _SPECIAL_RE.sub("", text)


def frame_source(text_col: Column, url_col: Column) -> Column:
    """Reference framing: ``{text}\\n\\nSource: {url}\\n`` (byte-exact)."""
    return F.concat(text_col, F.lit("\n\nSource: "), url_col, F.lit("\n"))


def frame_source_py(text: str, url: str) -> str:
    return f"{text}\n\nSource: {url}\n"


def extract_text(text_col: Column, url_col: Column) -> Column:
    """The full extracted-text invariant: sanitize then frame."""
    return frame_source(sanitize_special_tokens(text_col), url_col)


def extract_text_py(text: str, url: str) -> str:
    return frame_source_py(sanitize_special_tokens_py(text), url)


def doc_id(content_col: Column) -> Column:
    """``doc-<md5(content)>`` — content-hash ids as in the reference KV
    stores (deterministic, order-independent → idempotent recompute)."""
    return F.concat(F.lit("doc-"), F.md5(content_col))


def chunk_id(content_col: Column) -> Column:
    return F.concat(F.lit("chunk-"), F.md5(content_col))


def initials(name_col: Column) -> Column:
    """Uppercased initials of the words of a name — the abbreviation-removal
    join key (reference: service/search/matching.py:38-59)."""
    return F.upper(
        F.concat_ws(
            "", F.transform(F.split(name_col, r"\s+"), lambda w: F.substring(w, 1, 1))
        )
    )
