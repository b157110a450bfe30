"""Golden-fixture generation (FIXTURES.md §2) — the 'reference' side of
the P/R ≥ 0.95 gate.

These run the SAME deterministic stand-in functions as the engine's UDF
slots, but single-threaded in plain pandas over whole documents — an
independent execution path (no Spark) against which the distributed
pipeline's outputs are compared:

- golden_text(url)        → byte-identical extracted text invariant
- golden_chunks(doc)      → expected token-window chunking
- golden_triples(corpus)  → expected distinct (subj, pred, obj) per url
"""

from __future__ import annotations

import pandas as pd

from .corpus import generate_pandas
from .functions.text import extract_text_py
from .operators.chunking import chunk_text
from .operators.extraction import extract_triples


def golden_documents(n_rows: int, seed: int = 42) -> pd.DataFrame:
    pages = generate_pandas(n_rows, seed)
    pages["content"] = [
        extract_text_py(t, u) for t, u in zip(pages["text"], pages["url"])
    ]
    return pages[["url", "warc_ts", "lang", "content"]]


def golden_chunks(n_rows: int, seed: int = 42) -> pd.DataFrame:
    docs = golden_documents(n_rows, seed)
    rows = []
    for url, content in zip(docs["url"], docs["content"]):
        for c in chunk_text(content):
            rows.append(
                {
                    "url": url,
                    "chunk_ix": c["chunk_ix"],
                    "n_tokens": c["tokens"],
                    "content": c["content"],
                }
            )
    return pd.DataFrame(rows)


def golden_triples(n_rows: int, seed: int = 42) -> pd.DataFrame:
    """Distinct (url, subj, pred, obj) from whole-document extraction."""
    docs = golden_documents(n_rows, seed)
    rows = []
    for url, content in zip(docs["url"], docs["content"]):
        for t in extract_triples(content, is_first_chunk=True):
            rows.append(
                {"url": url, "subj": t["subj"], "pred": t["pred"], "obj": t["obj"]}
            )
    return pd.DataFrame(rows).drop_duplicates().reset_index(drop=True)


def precision_recall(
    predicted: pd.DataFrame, golden: pd.DataFrame, keys: list[str]
) -> tuple[float, float]:
    p = set(map(tuple, predicted[keys].itertuples(index=False)))
    g = set(map(tuple, golden[keys].itertuples(index=False)))
    if not p or not g:
        return (0.0, 0.0)
    tp = len(p & g)
    return (tp / len(p), tp / len(g))
