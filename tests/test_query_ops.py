import pandas as pd
from pyspark.sql import functions as F

from graphrag_kb_server_spark.operators.merge import rank_branch, round_robin_merge
from graphrag_kb_server_spark.operators.truncation import (
    cumulative_prefix_by_budget,
    truncate_by_token_budget,
)
from graphrag_kb_server_spark.operators.vector_topk import cosine_topk


def test_round_robin_merge_matches_sequential(spark):
    # reference semantics: interleave position-wise, first occurrence wins
    local = spark.createDataFrame(
        [("A", 0.9), ("B", 0.8), ("C", 0.7)], "name string, score double"
    )
    glob = spark.createDataFrame(
        [("B", 0.95), ("D", 0.85), ("A", 0.75)], "name string, score double"
    )
    b0 = rank_branch(local, [F.desc("score"), "name"], 0)
    b1 = rank_branch(glob, [F.desc("score"), "name"], 1)
    out = round_robin_merge([b0, b1], ["name"]).orderBy("merge_ix").collect()
    # sequential interleave: A(l0) B(g0) B(l1,dup) D(g1) C(l2) A(g2,dup)
    assert [r["name"] for r in out] == ["A", "B", "D", "C"]
    assert [r["merge_ix"] for r in out] == [0, 1, 2, 3]


def test_token_truncation_prefix(spark):
    rows = [(i, "word " * 10) for i in range(10)]  # ~10-11 tokens each
    df = spark.createDataFrame(rows, "pos int, txt string")
    out = truncate_by_token_budget(df, "txt", "pos", budget=35).collect()
    assert [r["pos"] for r in out] == [0, 1, 2]
    # keep_at_least_one on overflow
    out1 = truncate_by_token_budget(df, "txt", "pos", budget=3).collect()
    assert [r["pos"] for r in out1] == [0]


def test_cumulative_prefix_by_budget(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 5.0), (3, 5.0)], "pos int, w double")
    out = cumulative_prefix_by_budget(df, "w", "pos", 10.0).collect()
    assert [r["pos"] for r in out] == [1, 2]


def test_cosine_topk_exact(spark):
    import numpy as np

    rows = [
        ("a", [1.0, 0.0, 0.0]),
        ("b", [0.9, 0.1, 0.0]),
        ("c", [0.0, 1.0, 0.0]),
        ("d", [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"id": [r[0] for r in rows],
                      "embedding": [np.array(r[1], dtype="float32") for r in rows]})
    )
    out = cosine_topk(df, [1.0, 0.0, 0.0], 2).collect()
    assert [r["id"] for r in out] == ["a", "b"]
    assert abs(out[0]["score"] - 1.0) < 1e-9
    # self-exclusion path
    out2 = cosine_topk(df, [1.0, 0.0, 0.0], 2, exclude_key=("id", "a")).collect()
    assert [r["id"] for r in out2] == ["b", "c"]
