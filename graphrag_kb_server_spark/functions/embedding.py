"""Deterministic hash-embedding — the sandbox stand-in for the reference's
OpenAI ``text-embedding-3-small`` slot (1536-d, injected at
/root/reference/graphrag_kb_server/service/lightrag/lightrag_init.py:83).

Contract preserved: batched text → ``ARRAY<FLOAT>`` via an Arrow-batched
pandas UDF (series → series), L2-normalized. Swapping a real embedding
client in is a one-line change inside ``embed_batch`` — the Spark plan
(mapInPandas/pandas_udf stage) is identical.

The stand-in: character-3-gram feature hashing into ``dim`` buckets with
a hash-derived sign, then L2 normalization. Pure function of the text →
identical across partitions/runs; similar strings get similar vectors
(shared n-grams), which is what the linking cosine threshold relies on.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

EMBEDDING_DIM = 64


def embed_text(text: str, dim: int = EMBEDDING_DIM) -> np.ndarray:
    v = np.zeros(dim, dtype=np.float64)
    s = (text or "").lower()
    if len(s) < 3:
        s = s + "\x00" * (3 - len(s))
    for i in range(len(s) - 2):
        g = s[i : i + 3]
        d = hashlib.md5(g.encode("utf-8", "ignore")).digest()
        bucket = int.from_bytes(d[:4], "big") % dim
        sign = 1.0 if d[4] & 1 else -1.0
        v[bucket] += sign
    n = np.linalg.norm(v)
    if n > 0:
        v /= n
    return v.astype(np.float32)


def embed_batch(texts: pd.Series, dim: int = EMBEDDING_DIM) -> pd.Series:
    """The LLM-slot boundary: replace body with a real client for prod."""
    return texts.map(lambda t: embed_text(t, dim))


@F.pandas_udf(T.ArrayType(T.FloatType()))
def embed_udf(texts: pd.Series) -> pd.Series:
    return embed_batch(texts)
