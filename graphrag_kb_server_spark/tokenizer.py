"""Deterministic, lossless tokenizer — the sandbox stand-in for tiktoken.

The reference chunks with tiktoken cl100k windows
(/root/reference/graphrag_kb_server/service/lightrag/lightrag_init.py:28-68,
defaults overlap_token_size=128 max_token_size=1024 at :33-34). tiktoken is
not installed in this environment, so the engine and the golden-fixture
generator share THIS tokenizer; swapping tiktoken back in is a one-line
change in ``encode``/``decode`` (the windowing logic is unchanged).

Design requirements it satisfies:
- lossless: ``decode(encode(s)) == s`` byte-for-byte (tokens are the
  original substrings, whitespace attached), so chunk content is a real
  substring-window of the document — same property tiktoken decode gives.
- BPE-ish granularity: words, numbers, and single punctuation marks split
  like a GPT-style pre-tokenizer (the classic ``'s|'t|...|\\s?\\w+|...``
  pattern family, public from the GPT-2 release).
- pure function of the input string: deterministic across partitions,
  executors and runs — no state, no vocab files.
"""

from __future__ import annotations

import re

# GPT-2-style pre-tokenizer pattern, adapted to keep leading whitespace
# attached to the following token and to capture trailing whitespace, so the
# concatenation of all tokens reproduces the input exactly.
_TOKEN_RE = re.compile(
    r"'(?:[sdmt]|ll|ve|re)"  # common English contractions
    r"|\s?[A-Za-z]+"  # optional leading space + letters
    r"|\s?[0-9]+"  # optional leading space + digits
    r"|\s?[^\sA-Za-z0-9]+"  # optional leading space + punctuation run
    r"|\s+"  # residual whitespace (incl. newlines)
)


def encode(text: str) -> list[str]:
    """Split ``text`` into a lossless token list."""
    if not text:
        return []
    return _TOKEN_RE.findall(text)


def decode(tokens: list[str]) -> str:
    """Inverse of :func:`encode` over any contiguous token window."""
    return "".join(tokens)


def count_tokens(text: str) -> int:
    return len(_TOKEN_RE.findall(text))
