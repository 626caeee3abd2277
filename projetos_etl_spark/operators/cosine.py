"""Embedding cosine similarity: exact brute-force top-k (correctness
tier) and SRP-LSH bucketed search (scale tier). BASELINE.json north star:
"similarity search ... brute-force cosine top-k as the baseline; an IVF
or LSH-bucketed variant as the scale path".

Arithmetic is a left-to-right double fold in both this implementation
and the DuckDB oracle twin (same order => bit-identical sums), computed
with built-in higher-order functions — no Python in the data path.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k: broadcast the (small) query set against all candidates.
    O(|Q| * N) — the correctness baseline and the right plan when |Q| is
    bounded; for |Q| ~ N use the LSH path below. Ranking uses the rounded
    similarity + id tie-break so results are deterministic."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(F.col(vec_col)).alias("qv")
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def srp_bucket_col(vec_col: Column, planes: np.ndarray) -> Column:
    """Signed-random-projection bucket id: one bit per hyperplane."""
    bits = []
    for plane in planes:
        lit_plane = F.array(*[F.lit(float(w)) for w in plane])
        bits.append(F.when(dot(vec_col, lit_plane) >= 0, "1").otherwise("0"))
    return F.concat(*bits)


def srp_lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_bits: int = 4,
    n_tables: int = 3,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates meet a query only when they share an
    SRP bucket in any of ``n_tables`` tables. At 100 TB this replaces the
    O(Q*N) scan with an equi-join on (table, bucket) — candidate volume
    tracks bucket occupancy (~N/2^bits per table). Hyperplanes are fixed
    by ``seed`` (deterministic plan, no runtime randomness)."""
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_tables, n_bits, dim))

    def bucketize(df: DataFrame, alias_id: str) -> DataFrame:
        v = as_double_array(F.col(vec_col))
        tables = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    srp_bucket_col(v, planes[t]).alias("bucket"),
                )
                for t in range(n_tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(alias_id),
            v.alias(f"{alias_id}_v"),
            F.explode(tables).alias("b"),
        ).select(alias_id, f"{alias_id}_v", "b.tbl", "b.bucket")

    qb = bucketize(queries, "query_id")
    cb = bucketize(candidates, "neighbor_id")
    cand = (
        qb.join(cb, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "query_id_v", "neighbor_id_v")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    from pyspark.sql import Window

    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("query_id_v"), F.col("neighbor_id_v")), 6).alias(
            "cosine_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )
