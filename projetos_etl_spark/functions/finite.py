"""The non-finite measurement convention (r10 sf_nan hostile probe).

A NaN or +/-Inf in a numeric measurement column is a CORRUPT READING —
a 0/0 or overflow upstream — not a value: at 100 TB one NaN in
``events.value`` NaN-poisons every moment-based statistic downstream
(stddev, z-scores, autocorrelation, geomeans, variance merges), crashes
DuckDB's ``STDDEV`` outright on Inf (Out of Range), and Spark/DuckDB
NaN ordering disagrees enough that medians/maxima silently diverge
cross-engine. The engine-wide convention mirrors the embedding
``well_formed`` story: the moment/order-statistic consumers treat
non-finite as NULL (excluded, flowing through each entry's existing
NULL handling), and the hygiene audit REPORTS the count instead of
hiding the exclusion.

``finite`` is the Spark gate; ``sql_finite`` is its DuckDB oracle twin.
Sum-like aggregates that are well-defined and ENGINE-AGREEING over
non-finite input (plain sums, counts, filters on finite thresholds)
keep the raw column — the gate is for the entries where NaN/Inf either
crashes an engine or lands on engine-divergent semantics; each gated
entry says so in its docstring.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def finite(col: Column | str) -> Column:
    """``col`` as DOUBLE with NaN/+Inf/-Inf mapped to NULL (corrupt
    reading -> excluded like NULL; NULL stays NULL)."""
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("double")
    return F.when(~F.isnan(c) & (F.abs(c) != float("inf")), c)


def sql_finite(col: str) -> str:
    """DuckDB twin of :func:`finite` (NULL on NaN/Inf, else the value).

    ``isfinite(NULL)`` is NULL -> CASE falls through to NULL, matching
    Spark's ``when`` with no otherwise."""
    return f"CASE WHEN isfinite({col}) THEN CAST({col} AS DOUBLE) END"
