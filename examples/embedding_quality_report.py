"""Embedding-space quality report, as a user would run it before
committing an embedding model to a retrieval or dedup pipeline.

Four independent diagnostics over the embeddings table, each a registry
operator, composed into one printed report:

  geometry    top-principal-component share of variance
              (``operators/pca.py`` — a dominant "rogue dimension"
              poisons cosine similarity; healthy spaces spread variance)
  retrieval   NDCG@5 of exact cosine retrieval against cluster labels
              (``eval_ndcg_at_k`` — does nearest-neighbor structure
              agree with semantics?)
  truncation  top-k overlap of leading-16-dim vs full-64-dim ranking
              (``emb_matryoshka_overlap`` — can storage be quartered?)
  clusters    per-label centroid norms + sizes (``emb_centroid_per_label``
              — degenerate/empty clusters show up as tiny norms)

Run it:

    python examples/embedding_quality_report.py [sf_dir]

(defaults to /root/testdata/sf0.001; every stage is bounded-driver-state
and corpus-single-pass, so any sf dir works.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from projetos_etl_spark.operators.pca import covariance_matrix, top_component
from projetos_etl_spark.registry.similarity import (
    emb_centroid_per_label,
    emb_pca_top_component,
    eval_ndcg_at_k,
)
from projetos_etl_spark.session import get_spark
from projetos_etl_spark.sources.io import load_table


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="embedding-quality-report")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    n_vecs = emb.count()
    print(f"== embedding quality report ({sf_dir}, {n_vecs} vectors) ==")

    # 1. Geometry: variance share of the top component (one corpus pass).
    import numpy as np

    _, _, cov = covariance_matrix(emb, "embedding", 64)
    v1 = top_component(cov)
    lam1 = float(v1 @ cov @ v1)
    total_var = float(np.trace(cov))
    print(
        f"geometry:   top-PC variance share = {lam1 / total_var:.3f} "
        f"(rogue-dimension alarm at > 0.5)"
    )
    scores = emb_pca_top_component(spark, sf_dir)
    row = scores.agg(
        F.round(F.min("pc1_score"), 3), F.round(F.max("pc1_score"), 3)
    ).collect()[0]
    print(f"            pc1 score range = [{row[0]}, {row[1]}]")

    # 2. Retrieval quality vs labels.
    ndcg = eval_ndcg_at_k(spark, sf_dir)
    m = ndcg.agg(
        F.round(F.avg("ndcg"), 3).alias("mean_ndcg"),
        F.round(F.avg("n_relevant"), 2).alias("mean_rel"),
    ).collect()[0]
    print(f"retrieval:  mean NDCG@5 = {m.mean_ndcg} (mean relevant/5 = {m.mean_rel})")

    # 3. Truncation safety (Matryoshka).
    from projetos_etl_spark.registry import all_queries

    overlap = all_queries()["emb_matryoshka_overlap"](spark, sf_dir)
    o = overlap.agg(F.round(F.avg("overlap_frac"), 3)).collect()[0][0]
    print(f"truncation: mean top-k overlap (16 of 64 dims) = {o}")

    # 4. Cluster health.
    cents = emb_centroid_per_label(spark, sf_dir)
    print("clusters:   per-label centroid profile")
    cents.groupBy("label").agg(
        F.count(F.lit(1)).alias("dims"),
        F.round(F.sqrt(F.sum(F.col("centroid") * F.col("centroid"))), 4).alias(
            "centroid_norm"
        ),
    ).join(
        emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_members")), "label"
    ).orderBy("label").show(20, truncate=False)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
