"""In-engine ML training sanity: the descent must actually descend."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from projetos_etl_spark.operators.logreg import logreg_gd
from projetos_etl_spark.sources.io import load_table
from tests.conftest import SF_DIR


def _log_loss(df, w, cols, label):
    z = sum((F.col(c) * float(w[j]) for j, c in enumerate(cols)), F.lit(0.0))
    p = 1.0 / (1.0 + F.exp(-z))
    eps = 1e-12
    ll = df.agg(
        F.avg(
            -(
                F.col(label) * F.log(p + eps)
                + (1 - F.col(label)) * F.log(1 - p + eps)
            )
        )
    ).collect()[0][0]
    return ll


def test_logreg_gd_reduces_loss_and_is_deterministic(spark):
    o = load_table(spark, SF_DIR, "orders")
    feats = o.select(
        F.lit(1.0).alias("x0"),
        (F.col("o_totalprice") / 500000.0).alias("x1"),
        ((F.year("o_orderdate") - 1995) / 4.0).alias("x2"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("y"),
    ).localCheckpoint(eager=True)
    cols = ["x0", "x1", "x2"]
    w = logreg_gd(feats, cols, "y")
    base = _log_loss(feats, [0.0, 0.0, 0.0], cols, "y")
    trained = _log_loss(feats, w, cols, "y")
    assert trained < base, (trained, base)
    # Base rate ~0.2 => all-zero weights give ln(2); trained must beat
    # the best CONSTANT predictor too, not just w=0.
    rate = feats.agg(F.avg("y")).collect()[0][0]
    const_best = -(rate * math.log(rate) + (1 - rate) * math.log(1 - rate))
    assert trained <= const_best + 1e-6
    # Same data, same hyperparameters -> bitwise-identical weights.
    assert logreg_gd(feats, cols, "y") == w
