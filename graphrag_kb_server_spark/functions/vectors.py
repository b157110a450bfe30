"""Vector math over ``ARRAY<FLOAT>`` embedding columns — pure Catalyst
expressions (higher-order functions), no UDFs, so cosine top-k stays
inside whole-stage codegen and scales linearly with executors.

Reference analogues: cosine top-k over nano-vectordb matrices
(/root/reference/graphrag_kb_server/service/similar_topics.py:94-167,
lightrag_search.py:985-1034) and the embedding-cosine dedup
(/root/reference/graphrag_kb_server/service/search/matching.py:100-128).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(vec: Column) -> Column:
    """Cast ARRAY<FLOAT> → ARRAY<DOUBLE> so accumulation happens in
    float64 (bit-stable vs the DuckDB oracle which also sums doubles
    left-to-right)."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays; 0.0 for zero vectors."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def cosine_with_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """``cosine`` with the norms supplied as precomputed columns —
    per-row/per-pair cost drops to ONE dot aggregate (interpreted HOFs
    re-evaluate the norm aggregates per reference otherwise).
    Bit-identical to ``cosine`` when ``na``/``nb`` were produced by
    ``norm`` on the same arrays (same fold, same multiply order)."""
    denom = na * nb
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def cosine_with_query(a: Column, query_vec) -> Column:
    """Cosine of ``a`` vs a CONSTANT query vector: the query norm is
    folded at plan-build time with the same left-to-right float64
    accumulation as ``norm``'s F.aggregate — bit-identical values —
    and the whole denominator is bound once as a lambda variable, so
    each row pays one norm + one dot instead of five aggregates
    (cosine's when-condition and branch each re-evaluate both norms
    under interpreted-HOF evaluation)."""
    import math

    qn = 0.0
    for x in query_vec:
        qn += float(x) * float(x)
    qn = math.sqrt(qn)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return F.transform(
        F.array(norm(a) * F.lit(qn)),
        lambda d: F.when(d == 0.0, F.lit(0.0)).otherwise(dot(a, q) / d),
    )[0]


def l2_normalize(a: Column) -> Column:
    # the norm is bound ONCE as a lambda variable: referenced directly
    # inside the transform it would be re-aggregated per element
    # (interpreted HOFs get no subexpression elimination → O(d²)/row)
    return F.transform(
        F.array(norm(a)),
        lambda n: F.when(n == 0.0, a).otherwise(F.transform(a, lambda x: x / n)),
    )[0]
