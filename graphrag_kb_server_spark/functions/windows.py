"""Window helpers.

``bounded_global`` declares the single-partition execution of a global
ranking as intent: the query-path merge/truncation/polling operators
rank BOUNDED inputs (every branch is top-k-limited by construction
before it reaches them — operators/truncation.py:16-21), so the whole
input fits one task by contract. Using this helper instead of a bare
``Window.orderBy`` marks each call site as a reviewed bounded global
sort, not an accidental unbounded one.

(A constant ``partitionBy`` key cannot express this plan-side — Catalyst
constant-folds it away and WindowExec still sees an empty partition
spec — so the matching "No Partition Defined" log noise is demoted once
in session.get_spark instead.)
"""

from __future__ import annotations

from pyspark.sql import Window, WindowSpec


def bounded_global(*order_cols) -> WindowSpec:
    """Global-ordering window over a bounded (top-k-limited) input."""
    return Window.orderBy(*order_cols)
