"""End-to-end ANN retrieval over the embeddings table, as a user would
run it — and a live recall report comparing every approximate tier to
the exact baseline on the same queries.

This is the retrieval half of a training-data pipeline (nearest-neighbor
mining for hard negatives, semantic dedup probes, RAG index serving).
The engine ships four tiers; this example runs them all and prints
recall@k so the cost/recall dial is visible on real numbers:

  exact     brute-force cosine (correctness baseline, O(Q*N))
  ivf       inverted lists, probe n_probe/n_cells of the corpus
  pq-adc    8x one-byte codes per vector, LUT-sum scan + exact rerank
  ivf+pq    the composed FAISS ``IVFxx,PQyy`` end-state

Run it:

    python examples/ann_retrieval_pipeline.py [sf_dir]

(defaults to /root/testdata/sf0.001; any sf dir works — driver state is
bounded at every tier, see operators/cosine.py docstrings.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from projetos_etl_spark.operators.cosine import (
    brute_force_topk,
    ivf_pq_topk,
    ivf_topk,
    pq_adc_topk,
)
from projetos_etl_spark.session import get_spark
from projetos_etl_spark.sources.io import load_table

K = 5
N_QUERIES = 10


def recall_at_k(approx: DataFrame, exact: DataFrame) -> float:
    """|approx ∩ exact| / |exact| over (query_id, neighbor_id) pairs."""
    hit = approx.select("query_id", "neighbor_id").join(
        exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "semi"
    )
    denom = exact.count()
    return hit.count() / denom if denom else 1.0


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="ann-retrieval-example")
    vecs = load_table(spark, sf_dir, "embeddings")
    n = vecs.count()

    # Deterministic bounded query set (the contract every tier shares):
    # the N_QUERIES hash-lowest ids, broadcastable by construction.
    queries = vecs.orderBy(F.md5(F.col("vec_id").cast("string"))).limit(N_QUERIES)

    exact = brute_force_topk(queries, vecs, k=K).cache()
    print(f"corpus={n} vectors, {N_QUERIES} queries, k={K}")
    print(f"exact     : {exact.count()} result rows (baseline)")

    # n_probe is the recall/cost dial: probe 4/16 cells scans ~25% of
    # the corpus, 8/16 ~50%, 16/16 is exact. Recall tracks it.
    for label, df in [
        ("ivf p=4", ivf_topk(queries, vecs, k=K, n_probe=4)),
        ("ivf p=8", ivf_topk(queries, vecs, k=K, n_probe=8)),
        ("pq-adc", pq_adc_topk(queries, vecs, k=K)),
        ("pq-adc s=8", pq_adc_topk(queries, vecs, k=K, shortlist_factor=8)),
        ("ivf+pq", ivf_pq_topk(queries, vecs, k=K)),
        ("ivf+pq p=8", ivf_pq_topk(queries, vecs, k=K, n_probe=8)),
    ]:
        r = recall_at_k(df, exact)
        print(f"{label:<10}: recall@{K} = {r:.3f}")

    exact.unpersist()
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
