"""DuckDB SQL fragments that mirror ``operators/cosine``'s vector math
EXACTLY — including what happens to malformed (ragged) vectors.

Spark computes dot products as ``zip_with`` + a 0.0-seeded sequential
fold (``operators/cosine.dot``): ``zip_with`` pads the shorter array
with NULL, any NULL product poisons the fold to NULL, and ``cosine``
pins the NULL (or a zero denominator) to 0.0 similarity. The oracles
used to approximate this with ``list_sum``, which SKIPS NULL terms —
so a truncated or NULL-holed vector produced a PARTIAL dot in DuckDB
where Spark produced 0.0, a guaranteed hash mismatch on exactly the
ragged inputs the r9/r10 hardening covers (r9 SCALE.md; the ``sf_ragged``
fixture axis pins this).

The fragments here are the faithful mirror, verified case-by-case
against Spark in tests/test_degenerate_inputs.py:

- ``sql_dot``   folds ``x[i] * y[i]`` for i in 1..greatest(len(x),
  len(y)) with a 0.0 seed via ``list_reduce(list_prepend(0.0, ...))``:
  out-of-range indexing yields NULL exactly where ``zip_with`` pads,
  NULL propagates through the fold exactly like Spark's ``acc + x``,
  and two EQUAL-length short vectors still get their real dot (so do
  both engines — ``zip_with`` pads nothing when lengths agree).
- ``sql_norm``  same seeded fold over the array's own elements: real
  for any length (including a real 32-dim norm for a truncated
  vector), NULL when any element is NULL, 0.0 for an empty array —
  never the unseeded ``list_reduce`` that ERRORS on an empty list.
- ``sql_cosine`` wraps them in the shared degenerate convention
  ``round(coalesce(dot / nullif(nx * ny, 0), 0), 6)``.
- ``sql_well_formed`` is the oracle twin of
  ``operators/cosine.well_formed``: non-NULL, declared dimension, no
  NULL elements — the gate the trained tiers / trainers apply on BOTH
  engines (a ragged vector would crash their numpy kernels; a
  NULL-holed one NaN-poisons them through Arrow).
"""

from __future__ import annotations


def sql_dot(x: str, y: str) -> str:
    """NULL-propagating 0.0-seeded dot product of two DOUBLE[] exprs —
    the exact DuckDB twin of ``zip_with`` + fold (see module doc)."""
    return (
        f"list_reduce(list_prepend(0.0, list_transform("
        f"generate_series(1, greatest(len({x}), len({y}))),"
        f" i -> {x}[i] * {y}[i])), (acc, t) -> acc + t)"
    )


def sql_norm(x: str) -> str:
    """NULL-propagating 0.0-seeded L2 norm of a DOUBLE[] expr (empty
    array -> 0.0, NULL element -> NULL, whole-NULL array -> NULL, any
    length -> its own norm).

    The whole-NULL CASE is load-bearing: DuckDB's ``list_prepend(0.0,
    NULL)`` is ``[0.0]`` (it builds a list around the seed), so the
    seeded fold alone would claim norm 0.0 for a NULL vector — turning
    "corrupt upstream" into the legitimate zero-vector convention,
    exactly the conflation the r8 ADVICE banned (caught by the sf_nulls
    sweep against emb_norm_outlier_audit's min_norm)."""
    return (
        f"CASE WHEN {x} IS NULL THEN NULL ELSE "
        f"sqrt(list_reduce(list_prepend(0.0, list_transform("
        f"{x}, t -> t * t)), (acc, t) -> acc + t)) END"
    )


def sql_cosine(x: str, y: str, decimals: int = 6) -> str:
    """Cosine similarity with the engine-shared degenerate convention:
    NULL fold (ragged/holed input) and zero norm both pin to 0.0."""
    return (
        f"round(coalesce({sql_dot(x, y)}"
        f" / nullif({sql_norm(x)} * {sql_norm(y)}, 0), 0), {decimals})"
    )


def sql_well_formed(col: str, dim: int) -> str:
    """Predicate fragment: ``col`` holds a well-formed ``dim``-vector
    (mirror of ``operators/cosine.well_formed``)."""
    return (
        f"{col} IS NOT NULL AND len({col}) = {dim}"
        f" AND len(list_filter({col}, x -> x IS NULL)) = 0"
    )
