"""Distributed PCA (top principal component) over an embedding column.

The 100 TB shape: the ONLY thing that touches the full corpus is a
single mergeable reduction producing ``(n, sum_vec[d], gram[d*d])`` —
each Arrow batch contributes one partial row computed as a vectorized
``X.T @ X`` (this is the legitimate mapInPandas case: an elementwise
d*d outer-product expansion in pure column functions would multiply the
row count by d^2 = 4096 before the partial aggregate could shrink it,
i.e. a 4096x CPU blowup the Arrow batch computes as one BLAS call).
Partials reduce by elementwise array sums (one shuffle of ~#batches
rows), the d x d covariance is assembled and ROUNDED IN SPARK SQL
(half-up, matching DuckDB ``round``), and the power iteration runs on
the driver over the 64 x 64 matrix — driver state O(d^2), independent
of corpus size. Scoring the corpus is a broadcast-literal dot product,
whole-stage codegen, no Python.

Determinism contract (oracle = DuckDB recursive CTE replaying the same
math): engines sum floats in different orders, so the raw moments carry
~1e-15 relative noise — the covariance is therefore fixed to 9 decimals
BEFORE iteration (noise is ~1e-13 absolute, far below the 5e-10
boundary), both engines start from the exact double 1/8 = 1/sqrt(64),
and the converged direction is stable to ~1e-12 (the fixture's top
eigengap is thin — lambda2/lambda1 ~ 0.93 — hence 300 iterations:
0.93^300 ~ 7e-10; per-iteration ulp noise stays bounded by
ulp/(1 - lambda2/lambda1) ~ 1.5e-15 because the iteration map is a
contraction near the fixed point), far inside the final
6-decimal rounding of scores. Init sign fixes the eigenvector sign.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

POWER_ITERS = 300
MOMENT_DECIMALS = 9
SCORE_DECIMALS = 6


def _gram_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if not len(pdf):
            continue
        x = np.asarray(pdf["v"].tolist(), dtype=np.float64)
        yield pd.DataFrame(
            {
                "n": [len(x)],
                "s": [x.sum(axis=0).tolist()],
                "g": [(x.T @ x).ravel().tolist()],
            }
        )


def covariance_matrix(vecs: DataFrame, vec_col: str, dim: int) -> tuple[int, np.ndarray, np.ndarray]:
    """One corpus pass -> (n, mean[d] rounded, cov[d,d] rounded).

    All rounding happens in Spark SQL (HALF_UP, = DuckDB ``round``), not
    numpy (ties-to-even), so the oracle twin folds identical decimals.
    """
    # NULL, WRONG-DIMENSION, and NULL-ELEMENT vectors carry no d-space
    # moments (the SQL twin gates the same way: v IS NOT NULL AND
    # len(v) = d AND no NULL elements); without the filter np.stack
    # crashes on the first None OR ragged row in a batch, and a
    # right-length vector with one NULL element converts to NaN
    # (np.asarray maps None -> nan for float64) which SILENTLY poisons
    # the whole Gram — every score in the corpus becomes NaN from one
    # corrupt row (r9 ADVICE class). Scoring stays over ALL rows — a
    # NULL, ragged, or NULL-holed vector's centered fold is NULL, so its
    # pc1_score is NULL in both engines (the oracle CASE-guards its
    # per-dimension sum, which would otherwise SKIP the missing/NULL
    # positions instead of propagating).
    from projetos_etl_spark.operators.cosine import well_formed

    partials = (
        vecs.filter(well_formed(vec_col, dim))
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .mapInPandas(_gram_partials, schema="n long, s array<double>, g array<double>")
    )
    # Elementwise reduce of the partial arrays: explode to (pos, val),
    # ONE partial-aggregated shuffle of <= d*d groups, nothing else.
    n_total = partials.agg(F.sum("n")).collect()[0][0]
    if not n_total:
        # Empty corpus (a filter upstream can legitimately produce one):
        # no moments exist. Zero mean/cov keep every consumer total —
        # scoring selects over the same empty input, so the result is
        # empty either way — instead of a float/None crash here.
        return 0, np.zeros(dim), np.zeros((dim, dim))
    moments = (
        partials.select(
            F.posexplode(F.concat(F.col("s"), F.col("g"))).alias("pos", "val")
        )
        .groupBy("pos")
        .agg(F.sum("val").alias("val"))
    )
    mu_rows = (
        moments.filter(F.col("pos") < dim)
        .select("pos", F.round(F.col("val") / n_total, MOMENT_DECIMALS).alias("mu"))
        .collect()
    )
    mu = np.zeros(dim)
    for r in mu_rows:
        mu[r.pos] = r.mu
    g_rows = moments.filter(F.col("pos") >= dim).collect()
    gram = np.zeros(dim * dim)
    for r in g_rows:
        gram[r.pos - dim] = r.val
    gram = gram.reshape(dim, dim)
    # cov_ij = round(G_ij/n - mu_i*mu_j, 9) with the ROUNDED mu — Spark
    # round semantics via a tiny local DataFrame would be overkill for a
    # d x d literal; python round() is ties-to-even, so emulate HALF_UP
    # exactly the way both engines do it on these magnitudes.
    raw = gram / n_total - np.outer(mu, mu)
    cov = np.floor(np.abs(raw) * 10**MOMENT_DECIMALS + 0.5) / 10**MOMENT_DECIMALS
    cov = np.sign(raw) * cov
    return int(n_total), mu, cov


def top_component(cov: np.ndarray, iters: int = POWER_ITERS) -> np.ndarray:
    """Fixed-iteration power method from the exact-double uniform init
    (1/sqrt(d) with d a power of two => exactly representable)."""
    d = cov.shape[0]
    v = np.full(d, 1.0 / np.sqrt(d))
    for _ in range(iters):
        w = cov @ v
        norm = np.linalg.norm(w)
        if norm == 0.0:  # zero matrix (empty/degenerate corpus): any
            return v  # direction is an eigenvector; keep the init
        v = w / norm
    return v


def pca_scores(
    vecs: DataFrame, id_col: str, vec_col: str, dim: int
) -> DataFrame:
    """(id, pc1_score) for every vector: score = (x - mean) . v1."""
    n, mu, cov = covariance_matrix(vecs, vec_col, dim)
    if not np.any(cov):
        # Degenerate corpus (a single vector, or one vector duplicated):
        # the rounded covariance is all-zero, so no principal direction
        # exists — scores are undefined -> NULL, exactly what the SQL
        # twin's power-iteration replay propagates (0-norm division
        # NULLs v, and 0 * NULL is NULL).
        return vecs.select(
            F.col(id_col), F.lit(None).cast("double").alias("pc1_score")
        ).orderBy(id_col)
    v1 = top_component(cov)
    # The dot product against the broadcast-literal component: zip the
    # centered vector with v1 and fold — sequential, codegen-only.
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.array(*[F.lit(float(m)) for m in mu]),
        lambda x, m: x - m,
    )
    dot = F.aggregate(
        F.zip_with(centered, F.array(*[F.lit(float(c)) for c in v1]), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return vecs.select(
        F.col(id_col), F.round(dot, SCORE_DECIMALS).alias("pc1_score")
    ).orderBy(id_col)
