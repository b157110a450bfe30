"""Golden-fixture generation (FIXTURES.md §2) — the 'reference' side of
the P/R ≥ 0.95 gate.

These run the SAME deterministic stand-in functions as the engine's UDF
slots, but single-threaded in plain pandas over whole documents — an
independent execution path (no Spark) against which the distributed
pipeline's outputs are compared:

- golden_text(url)        → byte-identical extracted text invariant
- golden_chunks(doc)      → expected token-window chunking
- golden_triples(corpus)  → expected distinct (subj, pred, obj) per url

The ``golden_kg_*`` family below are exact twins of the driver-contract
``kg_*`` queries in ``__spark_entry__.py`` (chunk table, chunked triple
set, merged nodes with degrees, canonical map): single-threaded pandas /
pure python re-derivations of the same semantics, used to generate
pinned VALUES oracles — so the DuckDB comparison verifies the
DISTRIBUTED execution (partitioning, shuffles, chunk boundaries, merge
aggregations, LSH blocking) against an independent sequential path.
"""

from __future__ import annotations

import hashlib
import re

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


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def golden_kg_chunks(n_rows: int, seed: int = 42) -> pd.DataFrame:
    """Twin of the kg_chunks driver query: (chunk_id, doc_id, chunk_ix,
    n_tokens) with the engine's content-hash ids."""
    docs = golden_documents(n_rows, seed)
    rows = []
    for content in docs["content"]:
        did = "doc-" + _md5(content)
        for c in chunk_text(content):
            rows.append(
                {
                    "chunk_id": "chunk-" + _md5(c["content"]),
                    "doc_id": did,
                    "chunk_ix": c["chunk_ix"],
                    "n_tokens": c["tokens"],
                }
            )
    return pd.DataFrame(rows)


def golden_kg_mentions(n_rows: int, seed: int = 42) -> pd.DataFrame:
    """Per-chunk mention extraction — the T3 output the Spark pipeline
    produces (chunk boundaries and fragment suppression included)."""
    docs = golden_documents(n_rows, seed)
    rows = []
    for content in docs["content"]:
        did = "doc-" + _md5(content)
        for c in chunk_text(content):
            cid = "chunk-" + _md5(c["content"])
            for t in extract_triples(c["content"], is_first_chunk=(c["chunk_ix"] == 0)):
                rows.append({"chunk_id": cid, "doc_id": did, **t})
    return pd.DataFrame(rows)


def golden_kg_triples(n_rows: int, seed: int = 42) -> pd.DataFrame:
    """Distinct (subj, pred, obj) from CHUNKED extraction — twin of the
    kg_triples driver query."""
    m = golden_kg_mentions(n_rows, seed)
    return m[["subj", "pred", "obj"]].drop_duplicates().reset_index(drop=True)


def golden_kg_nodes(n_rows: int, seed: int = 42) -> pd.DataFrame:
    """Twin of kg_nodes: T4 entity merge + T7 degree over merged
    undirected edges — (name, type, degree, mention_count)."""
    m = golden_kg_mentions(n_rows, seed)
    sides = pd.concat(
        [
            m[["subj", "subj_type"]].rename(columns={"subj": "name", "subj_type": "type"}),
            m[["obj", "obj_type"]].rename(columns={"obj": "name", "obj_type": "type"}),
        ]
    )
    nodes = sides.groupby("name").agg(
        type=("type", "min"), mention_count=("type", "size")
    )
    epairs = {
        (min(s, o), max(s, o)) for s, o in zip(m["subj"], m["obj"])
    }
    deg: dict[str, int] = {}
    for s, t in epairs:
        deg[s] = deg.get(s, 0) + 1
        deg[t] = deg.get(t, 0) + 1
    nodes["degree"] = [deg.get(n, 0) for n in nodes.index]
    return nodes.reset_index()[["name", "type", "degree", "mention_count"]]


def _char_shingles(s: str, k: int = 3) -> list[str]:
    s = s.lower()
    n = max(len(s) - (k - 1), 1)
    return list(dict.fromkeys(s[i : i + k] for i in range(n)))


def _initials(name: str) -> str:
    # Java regex \s is [ \t\n\x0B\f\r]; Python's additionally matches
    # \x1c-\x1f — use the Java class so the twin splits exactly like
    # Catalyst's F.split(name, r"\s+") (found by hypothesis)
    return "".join(w[:1] for w in re.split(r"[ \t\n\x0B\f\r]+", name)).upper()


def _fold_dot(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _fold_norm(a: list[float]) -> float:
    acc = 0.0
    for x in a:
        acc += x * x
    return acc ** 0.5


def golden_kg_canonical_map(n_rows: int, seed: int = 42) -> pd.DataFrame:
    """Twin of kg_canonical_map: MinHash-LSH candidate blocking (8
    hashes = one md5 per shingle sliced 4-hex-wide, 4 bands × 2 rows,
    oversized-bucket split at 64) → hash-embedding cosine ≥ 0.80 →
    abbreviation channel → connected components (min member)."""
    from .functions.embedding import embed_text

    names = sorted(golden_kg_nodes(n_rows, seed)["name"].unique())

    # minhash signature + band keys, exactly as hashing.py slices them
    buckets: dict[str, list[str]] = {}
    for name in names:
        hexes = [_md5(g) for g in _char_shingles(name)]
        sig = [min(h[i * 4 : i * 4 + 4] for h in hexes) for i in range(8)]
        for b in range(4):
            key = f"{b}|{sig[2 * b]}|{sig[2 * b + 1]}"
            buckets.setdefault(key, []).append(name)

    pairs: set[tuple[str, str]] = set()
    for key, members in buckets.items():
        members = sorted(members)
        for sub_start in range(0, len(members), 64):  # split, never drop
            sub = members[sub_start : sub_start + 64]
            for i, a in enumerate(sub):
                for b in sub[i + 1 :]:
                    pairs.add((a, b))

    # embedding-cosine scoring with the engine's fold order (bit-stable)
    emb = {
        n: [float(x) for x in embed_text(n)] for n in names
    }  # float32 values widened to float64, as to_double does
    scored = set()
    for a, b in pairs:
        denom = _fold_norm(emb[a]) * _fold_norm(emb[b])
        cos = 0.0 if denom == 0.0 else _fold_dot(emb[a], emb[b]) / denom
        if cos >= 0.80:
            scored.add((a, b))

    for a in names:  # abbreviation channel
        if " " in a:
            continue
        for b in names:
            if " " in b and a != b and a.upper() == _initials(b):
                scored.add((a, b))

    # connected components, component id = min member
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in scored:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return pd.DataFrame(
        {"name": names, "canonical_name": [find(n) for n in names]}
    )


def precision_recall(
    predicted: pd.DataFrame, golden: pd.DataFrame, keys: list[str]
) -> tuple[float, float]:
    p = set(map(tuple, predicted[keys].itertuples(index=False)))
    g = set(map(tuple, golden[keys].itertuples(index=False)))
    if not p or not g:
        return (0.0, 0.0)
    tp = len(p & g)
    return (tp / len(p), tp / len(g))
