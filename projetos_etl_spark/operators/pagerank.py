"""Distributed PageRank by power iteration on DataFrames.

The iterative-algorithm representative alongside connected components
(``operators/components.py``): importance scoring over a directed graph
built from relational edges (here: the customer->supplier purchase graph
derived from orders x lineitem; on a crawl corpus the same operator ranks
the hyperlink graph that feeds crawl-frontier and quality decisions for
training-data pipelines — the original use of the algorithm).

Formulation (Page et al., "The PageRank Citation Ranking", 1999; damped,
dangling-aware, rank mass normalized to N):

    rank'(v) = (1 - d) + d * (sum_{u->v} rank(u)/deg(u) + dangling/N)

Scale posture (100 TB): each iteration is ONE shuffle join
(ranks x edges on src) plus ONE groupBy(dst) sum — both partitioned on
the vertex key, the same profile per round regardless of iteration
count. The dangling-mass term is a 1-row aggregate broadcast via
crossJoin (the repo's scalar-subquery pattern). Every round is eagerly
``localCheckpoint``-ed to truncate lineage — without it the plan tree
deepens per round and analysis time goes super-linear (same lesson as
components; see that module's docstring). Fixed ``iters`` keeps the
result deterministic across partitionings; the iteration count needed
for a given tolerance is O(log(1/eps)/log(1/d)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    damping: float = DAMPING,
) -> DataFrame:
    """Ranks over the directed edge set: returns (id, rank) for every
    vertex appearing as src or dst. Rank mass sums to N (vertex count),
    so scores are comparable across graph sizes; divide by N for the
    probability formulation."""
    # The distinct-ed edge set is joined EVERY iteration: checkpoint it
    # once so its scan + distinct shuffle don't re-execute in all
    # ``iters`` checkpoint jobs (across-job plans don't reuse exchanges —
    # without this the edge dedup dominated the whole operator's cost).
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Vertex set + out-degree in ONE aggregate over the endpoint union
    # (r13: was vertices-distinct + deg-groupBy + left-join — three
    # exchanges and an extra checkpoint for the same (id, deg) table):
    # src endpoints vote 1 into the out-degree, dst endpoints vote 0,
    # so dst-only (dangling) vertices fall out with deg = 0 exactly as
    # the old coalesce produced. out-degree rides along with the rank
    # row so the per-iteration join touches only (ranks x edges).
    ranks = (
        e.select(F.col("src").alias("id"), F.lit(1).alias("isout"))
        .unionByName(e.select(F.col("dst").alias("id"), F.lit(0).alias("isout")))
        .groupBy("id")
        .agg(F.sum("isout").cast("long").alias("deg"))
        .select("id", "deg", F.lit(1.0).alias("rank"))
        .localCheckpoint(eager=True)
    )
    n = ranks.count()
    for _ in range(iters):
        dangling = ranks.filter(F.col("deg") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass")
        )
        # Each vertex's base row (deg, inflow 0) UNIONs with its inbound
        # contributions, then ONE hash aggregate per iteration produces
        # both the summed inflow and the carried-along degree — fusing
        # the old groupBy(dst) + left-join-back-to-ranks pair (two wide
        # shuffles) into a single shuffle on the vertex key.
        contribs = (
            ranks.filter(F.col("deg") > 0)
            .join(e, ranks.id == e.src)
            .select(
                F.col("dst").alias("id"),
                F.lit(None).cast("long").alias("deg"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
        )
        base = ranks.select("id", F.col("deg").cast("long"), F.lit(0.0).alias("c"))
        ranks = (
            base.unionByName(contribs)
            .groupBy("id")
            .agg(F.max("deg").alias("deg"), F.sum("c").alias("inflow"))
            .crossJoin(dangling)  # 1-row broadcast scalar, not a real cross
            .select(
                "id",
                "deg",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * (F.col("inflow") + F.col("dmass") / n)
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("id", "rank")
