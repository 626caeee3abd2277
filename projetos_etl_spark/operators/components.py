"""Distributed connected components (min-label propagation).

The clustering step of near-duplicate removal: blocking passes (exact
prefix, LSH bands, shingle keys, ...) each emit candidate-pair *edges*;
transitive closure over the union of those edges groups documents into
duplicate clusters, from which one canonical representative survives.
The reference repo has no analogue (it has no joins at all — SURVEY.md
§2A); this is part of the derived LLM-data surface (SURVEY.md §2B).

Algorithm: iterative min-label propagation. Every vertex starts labeled
with its own id; each round every vertex takes the min of its own label
and its neighbors' labels; converged when a round changes nothing. The
number of rounds is bounded by the longest shortest-path in any
component — for near-dup clusters (tiny diameter) that is 2-4 rounds.

Scale posture (100 TB): each round is one shuffle join (edges x labels,
both partitioned by the join key) + one groupBy-min. Labels are
persisted per round and the previous round unpersisted, so lineage and
memory stay O(1) in rounds; the convergence check rides the same
aggregation (a count of changed labels), costing one action per round.
For web-scale graphs with large-diameter components, swap in the
large-star/small-star variant (Kiveris et al., "Connected Components in
MapReduce and Beyond", SOCC'14) which converges in O(log n) rounds —
the driver loop below is structured so only `_one_round` changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Column contract: edges(src, dst) — symmetric (both directions present
#: or made so here); vertices(id).
MAX_ROUNDS_DEFAULT = 20


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_rounds: int = MAX_ROUNDS_DEFAULT,
) -> DataFrame:
    """Return ``(id, component)`` where component = min vertex id reachable.

    ``vertices`` must have column ``id``; ``edges`` columns ``src``/``dst``.
    Edges are symmetrized and self-loops dropped internally. Exact and
    deterministic: the fixpoint is unique regardless of partitioning.
    """
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    labels = vertices.select("id", F.col("id").alias("component")).persist()
    labels.count()  # materialize before the loop

    for _ in range(max_rounds):
        # neighbor labels: for each edge (src, dst) the label of dst
        neighbor = (
            sym.join(labels, sym.dst == labels.id)
            .select(F.col("src").alias("id"), "component")
        )
        new_labels = (
            labels.select("id", "component")
            .union(neighbor)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels
