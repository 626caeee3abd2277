"""PCA operator: numpy cross-check + determinism-contract pins."""

from __future__ import annotations

import numpy as np

from projetos_etl_spark.operators.pca import (
    covariance_matrix,
    pca_scores,
    top_component,
)
from projetos_etl_spark.sources.io import load_table
from tests.conftest import SF_DIR


def _dense(spark):
    rows = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r.vec_id)
    return np.array([r.embedding for r in rows], dtype=np.float64)


def test_covariance_matches_numpy(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    n, mu, cov = covariance_matrix(emb, "embedding", 64)
    x = _dense(spark)
    assert n == len(x)
    np.testing.assert_allclose(mu, x.mean(axis=0), atol=1e-9)
    ref = (x.T @ x) / n - np.outer(x.mean(axis=0), x.mean(axis=0))
    np.testing.assert_allclose(cov, ref, atol=2e-9)  # 9-decimal fixing


def test_scores_match_dense_eigvector_projection(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    got = {r.vec_id: r.pc1_score for r in pca_scores(emb, "vec_id", "embedding", 64).collect()}
    x = _dense(spark)
    c = np.cov(x, rowvar=False, bias=True)
    w, v = np.linalg.eigh(c)
    top = v[:, -1]
    proj = (x - x.mean(axis=0)) @ top
    ours = np.array([got[i] for i in range(len(x))])
    # Power iteration's sign is init-determined; eigh's is arbitrary.
    if np.dot(ours, proj) < 0:
        proj = -proj
    np.testing.assert_allclose(ours, proj, atol=1e-4)
    # The component must actually be the TOP one: projected variance
    # within 1% of the largest eigenvalue.
    assert ours.var() >= 0.99 * w[-1]


def test_power_iteration_deterministic():
    rng = np.random.default_rng(7)
    a = rng.normal(size=(64, 8))
    cov = np.round(a @ a.T / 64, 9)
    v1 = top_component(cov)
    v2 = top_component(cov.copy())
    np.testing.assert_array_equal(v1, v2)
    assert abs(np.linalg.norm(v1) - 1.0) < 1e-12
