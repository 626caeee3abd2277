"""Distributed k-means (Lloyd) with a cross-engine determinism contract.

Third member of the in-engine ML family (PCA ``operators/pca.py``,
logistic regression ``operators/logreg.py``): per iteration ONE corpus
pass computes assignments (codegen-only distance expressions against
broadcast-literal centroids) and ONE mergeable aggregate produces the
k*d new centroid means — driver state is k*d doubles, independent of
corpus size. This is also exactly the trainer shape behind the IVF ANN
tier (``operators/cosine.train_ivf_centroids``); this module is the
HASH-VERIFIABLE variant, which demands two extra disciplines:

1. **Assignments must be bitwise identical across engines** — k-means
   makes a DISCRETE per-row decision, so rounding can't absorb a
   distance ulp the way it does for pure aggregates. Distances are
   therefore SEQUENTIAL LEFT FOLDS of (x_i - c_i)^2 in both engines
   (Spark ``F.aggregate``; DuckDB ``list_reduce``) over identical
   doubles: +,-,* are IEEE-exact, so every distance — and hence every
   argmin — is the same bit pattern on both sides.
2. **Centroid means are fixed to 9 decimals per iteration** (the
   logreg/PCA trick): the per-dimension AVG folds rows in engine-
   specific order, and the rounding re-synchronizes the trajectory
   each step.

Initialization: the first k vectors by id (deterministic, no RNG).
Empty clusters simply drop (both engines aggregate only non-empty
assignments) — with data-point init they cannot occur on real data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KM_ITERS = 10
CENT_DECIMALS = 9


def _sq_dist(x, c):
    # Sequential left fold (see module docstring discipline #1).
    return F.aggregate(
        F.zip_with(x, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans_lloyd(
    vecs: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int = KM_ITERS,
    dim: int | None = None,
) -> dict[int, list[float]]:
    """Returns {cluster_id: centroid} after ``iters`` Lloyd steps,
    seeded from the first ``k`` vectors by id (ids need not be
    contiguous or zero-based). Fewer than ``k`` rows seed that many
    clusters; an EMPTY corpus returns no centroids — exactly the
    ``ORDER BY id LIMIT k`` seeding the SQL oracle twin replays, and
    the behavior that keeps a pipeline alive when an upstream filter
    legitimately empties the training input.

    Centroids ship as ONE constant-folded complex literal (see
    ``_iteration_df``) — NOT as k separate per-centroid literal
    expressions unrolled into the distance tree: that shape made
    Catalyst re-analyze + Janino re-compile a fresh ~256-node tree
    every iteration (measured 3.4-5.0 s PER ITERATION at sf0.1 for
    2,000 rows of actual work). A single folded array<struct> literal
    is passed to codegen BY REFERENCE, so the compiled source — and
    hence the codegen cache key — is iteration-invariant, and an
    iteration costs the data, not the compiler.

    The assignment itself is a PER-ROW ``array_min`` over the
    transform-built (distance, cid) structs — no row explosion, no
    shuffle (r13 optimization, guide §2.4): the previous k-row-centroid
    crossJoin fanned every point into k rows and then re-grouped them
    by ``__id`` through a full Exchange (SortAggregate of min(struct) +
    first(vector) — the point VECTORS crossed the wire every round just
    to undo the fan-out). ``array_min`` picks the same lexicographic
    (d, cid) minimum struct, so assignments are bit-identical; the only
    remaining per-iteration Exchange is the k*d-group mean (map-side
    combined, k*d doubles per task)."""
    spark = vecs.sparkSession
    x = F.col(vec_col).cast("array<double>")
    # NULL vectors have no position in space: excluded from seeding and
    # assignment (the oracle twin filters identically). A crash here —
    # list(None) at seed collect — would kill the job for one bad row.
    # With a declared ``dim``, ragged/NULL-holed vectors are excluded
    # too (cosine.well_formed): a wrong-dimension seed would yield a
    # centroid other vectors can't fold distances against (NULL dists
    # order NULLS FIRST in Spark vs NULLS LAST in DuckDB — an engine
    # divergence on exactly the malformed rows), and a holed vector
    # poisons the mean of its cluster.
    if dim is not None:
        from projetos_etl_spark.operators.cosine import well_formed

        vecs = vecs.filter(well_formed(vec_col, dim))
    data = (
        vecs.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("__id"), x.alias("__x"))
        .localCheckpoint(eager=True)
    )
    # PRECONDITION (shared with the SQL oracle twin): ids are unique.
    # The per-row assignment weights every ROW in the centroid means,
    # while the oracle's rn=1 window collapses duplicate ids to one
    # assignment — and with differing vectors under one id BOTH engines
    # would be nondeterministic (arbitrary row_number / arbitrary seed
    # pick). Enforce loudly instead of diverging silently; one tiny
    # aggregate over the checkpointed (id, vec) frame.
    n_rows, n_ids = data.agg(F.count(F.lit(1)), F.count_distinct("__id")).first()
    if n_rows != n_ids:
        raise ValueError(
            f"kmeans_lloyd requires unique {id_col!r} values: "
            f"{n_rows} rows but {n_ids} distinct ids"
        )
    init = data.orderBy("__id").limit(k).collect()
    cents: dict[int, list[float]] = {int(r["__id"]): list(r["__x"]) for r in init}
    if not cents:
        return cents
    for _ in range(iters):
        rows = _iteration_df(data, cents).collect()
        new: dict[int, list[float]] = {}
        for r in rows:
            new.setdefault(int(r.cid), [0.0] * len(next(iter(cents.values()))))[
                r.pos
            ] = r.m
        cents = new
    return cents


def _iteration_df(data: DataFrame, cents: dict[int, list[float]]) -> DataFrame:
    """One Lloyd step as a DataFrame: (cid, pos, m) new-centroid means.

    Shuffle-free assignment (see the docstring above): the centroid set
    rides in as ONE folded literal array<struct<cid,c>>, each point
    computes ``array_min`` over its (distance, cid) structs — the exact
    lexicographic (min d, tie -> min cid) the old min-over-struct
    aggregate produced — and only the posexploded (cid, pos, val)
    triples reach the single mergeable k*d-group mean Exchange."""
    # The centroid set is an IN-EXPRESSION literal array<struct<cid,c>>
    # — no per-iteration createDataFrame (its Python-RDD conversion
    # measured 0.4 s PER CALL, 2/3 of the whole iteration) and no
    # broadcast-join stage either. ConstantFolding collapses the
    # CreateArray(CreateStruct(literals...)) tree into ONE complex
    # Literal that codegen passes by reference (references[n] in the
    # generated source, NOT inlined the way primitive literals are), so
    # the compiled stage source is identical every iteration and the
    # codegen cache hits; the transform lambda references the row's
    # ``__x``, which stops folding from reaching the distance math.
    cents_struct = F.array(
        *[
            F.struct(
                F.lit(int(cid)).alias("cid"),
                F.array(*[F.lit(float(x)) for x in c]).alias("c"),
            )
            for cid, c in sorted(cents.items())
        ]
    )
    dc = F.array_min(
        F.transform(
            cents_struct,
            lambda ct: F.struct(
                _sq_dist(F.col("__x"), ct["c"]).alias("d"),
                ct["cid"].alias("cid"),
            ),
        )
    )
    assigned = data.select(dc.getField("cid").alias("cid"), F.col("__x"))
    return (
        assigned.select("cid", F.posexplode("__x").alias("pos", "val"))
        .groupBy("cid", "pos")
        .agg(F.round(F.avg("val"), CENT_DECIMALS).alias("m"))
    )
