"""Distributed IRLS logistic regression (operators/classifier.py):
learns a separable rule, matches a sequential numpy IRLS bit-for-bit
through the rounded-sufficient-statistics protocol, and is
partitioning-invariant."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from graphrag_kb_server_spark.operators.classifier import (
    logistic_predict,
    logistic_train,
)


def _data(spark, n=400):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(n):
        x1 = float(rng.normal())
        x2 = float(rng.normal())
        y = 1.0 if (1.5 * x1 - x2 + float(rng.normal()) * 0.3) > 0 else 0.0
        rows.append((i, x1, x2, y))
    return spark.createDataFrame(rows, "id long, x1 double, x2 double, y double"), rows


def _numpy_irls(rows, iters=6, ridge=1e-3):
    X = np.column_stack([
        np.ones(len(rows)),
        np.array([r[1] for r in rows]),
        np.array([r[2] for r in rows]),
    ])
    y = np.array([r[3] for r in rows])
    beta = np.zeros(3)
    for _ in range(iters):
        eta = np.clip(X @ beta, -30, 30)
        mu = 1 / (1 + np.exp(-eta))
        w = np.maximum(mu * (1 - mu), 1e-12)
        z = eta + (y - mu) / w
        A = np.zeros((3, 3))
        b = np.zeros(3)
        from decimal import ROUND_HALF_UP, Decimal

        def r6(x):
            return float(Decimal(repr(float(x)))
                         .quantize(Decimal("1e-6"), ROUND_HALF_UP))

        for i in range(3):
            for j in range(i, 3):
                A[i, j] = A[j, i] = r6((w * X[:, i] * X[:, j]).sum())
            b[i] = r6((w * X[:, i] * z).sum())
        A += ridge * np.eye(3)
        beta = np.linalg.solve(A, b)
    return [float(v) for v in beta]


def test_irls_matches_sequential_twin_and_learns(spark):
    df, rows = _data(spark)
    beta = logistic_train(df, ["x1", "x2"], "y")
    assert beta == _numpy_irls(rows)
    # learned the rule: positive on x1, negative on x2, decisively
    assert beta[1] > 1.0 and beta[2] < -0.5
    scored = logistic_predict(df, ["x1", "x2"], beta)
    acc = scored.where(
        ((F.col("prob") > 0.5) & (F.col("y") == 1.0))
        | ((F.col("prob") <= 0.5) & (F.col("y") == 0.0))
    ).count() / 400
    assert acc > 0.85


def test_irls_partitioning_invariant(spark):
    df, _ = _data(spark, n=200)
    b1 = logistic_train(df.repartition(1), ["x1", "x2"], "y")
    b2 = logistic_train(df.repartition(17), ["x1", "x2"], "y")
    assert b1 == b2
