"""Distributed logistic regression by full-batch gradient descent.

The iterative-ML representative beside PCA (``operators/pca.py``) and
the graph fixpoints: each iteration is ONE mergeable aggregate over the
corpus — ``grad_j = mean((sigmoid(w.x) - y) * x_j)`` — so the 100 TB
cost profile is (#iters x one map-side-combined reduce of d doubles);
the d-dimensional weight update is driver arithmetic. No MLlib, no
per-row Python: the sigmoid and the per-feature products are codegen
column expressions.

Determinism contract (oracle = DuckDB recursive CTE replaying the same
descent): each iteration's MEAN gradient is rounded to 9 decimals
before the update — engine fold-order noise and last-ulp libm ``exp``
divergence sit at ~1e-13 absolute on the gradient, six orders below the
5e-10 rounding boundary, so both engines walk the IDENTICAL weight
trajectory (the per-step version of the PCA covariance fixing). Fixed
iteration count and learning rate; weights start at zero.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GD_ITERS = 25
GD_LR = 2.0
GRAD_DECIMALS = 9


def _sigmoid(z: Column) -> Column:
    return 1.0 / (1.0 + F.exp(-z))


def logreg_gd(
    data: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = GD_ITERS,
    lr: float = GD_LR,
) -> list[float] | None:
    """Returns the trained weight vector (one weight per feature column;
    include a constant column for the bias), or ``None`` when ``data``
    is EMPTY — no gradient exists over zero rows (``avg`` is NULL), and
    the recursive-CTE oracle twin's recursion dies on the empty cross
    join the same way. ``data`` is re-scanned per iteration — eagerly
    checkpoint/cache it upstream when the features are derived (the
    registry entry does)."""
    d = len(feature_cols)
    w = [0.0] * d
    for _ in range(iters):
        grads = _grad_df(data, feature_cols, label_col, w).collect()[0]
        if grads[0] is None:
            return None
        w = [w[j] - lr * grads[j] for j in range(d)]
    return w


def _grad_df(
    data: DataFrame, feature_cols: list[str], label_col: str, w: list[float]
) -> DataFrame:
    """One gradient step as a 1-row DataFrame of the d rounded means.

    The weights ride in as a broadcast ONE-ROW array<double> column
    instead of inline literals (r13 optimization, the kmeans lesson):
    literal weights changed the expression tree every iteration, so
    Catalyst re-analyzed and Janino re-compiled a fresh plan per step —
    ~25 codegen compiles to aggregate 3 doubles (~0.2 s/step measured).
    With the weights as column data the aggregate stage's plan is
    iteration-invariant, the codegen cache hits, and a step costs one
    mergeable aggregate job. The one-row side is ``spark.range(1)``
    plus an array literal — NOT ``spark.createDataFrame``, whose
    Python-RDD conversion alone measured 0.4 s per call, dwarfing the
    compile it was meant to save; the array literal constant-folds to
    a single referenced object, so even the broadcast side's codegen
    source is iteration-stable. Arithmetic is unchanged (same
    left-to-right ``0.0 + x_j * w_j`` fold over the same doubles), so
    the weight trajectory is bit-identical.

    r14 NOTE (attempted, reverted): folding the weights into a
    constant array literal consumed via ``aggregate(zip_with(...))``
    removes the per-step BroadcastExchange job, but higher-order
    functions are CodegenFallback — the z fold then evaluates
    INTERPRETED per row, which measured ~1.5 s SLOWER over 25 steps
    than the broadcast it saved. The broadcast-column shape keeps the
    dot product in whole-stage codegen; at 150k rows/step that wins."""
    spark = data.sparkSession
    # "__w", not "w": a collision-proof internal name (the "__id"/"__x"
    # convention) — a caller whose data already has a column "w" must
    # not get an ambiguous reference out of this generic operator.
    wdf = spark.range(1).select(F.lit([float(v) for v in w]).alias("__w"))
    z = sum(
        (F.col(c) * F.col("__w").getItem(j) for j, c in enumerate(feature_cols)),
        F.lit(0.0),
    )
    err = _sigmoid(z) - F.col(label_col)
    return data.crossJoin(F.broadcast(wdf)).agg(
        *[
            F.round(F.avg(err * F.col(c)), GRAD_DECIMALS).alias(f"g{j}")
            for j, c in enumerate(feature_cols)
        ]
    )
