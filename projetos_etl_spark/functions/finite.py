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

r12 (sf_extremes hostile probe, "family ten"): the gate also excludes
FINITE values of absurd magnitude. A reading like 1e300 passes an
isfinite check and then overflows INSIDE the second-moment aggregates
— Spark's variance quietly answers +Inf (corr/skew/kurtosis NaN) while
DuckDB RAISES "VARSAMP is out of range", i.e. one wild sensor reading
kills the whole statistics job on one engine and silently poisons it
on the other. ``MAG_CAP`` = 1e75 keeps every moment through the FOURTH
power finite ((1e75)^4 = 1e300 < DBL_MAX ~ 1.8e308, with ~1e8 headroom
for row-count accumulation), and no legitimate measurement domain in
the corpus is within 70 orders of magnitude of it — anything past the
cap is a corrupt reading exactly like NaN/Inf.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Fourth-moment-safe magnitude cap (see module docstring): a FINITE
#: reading with ``abs(v) >= MAG_CAP`` is treated as corrupt.
MAG_CAP = 1e75

#: The cap as a SQL literal, derived from the constant (r12 ADVICE:
#: every oracle must interpolate this, never re-spell the number, so
#: retuning MAG_CAP can't desync the Spark gate from its DuckDB
#: twins).  ``1e+75`` -> ``1e75`` only normalizes formatting.
MAG_CAP_SQL = f"{MAG_CAP:g}".replace("e+", "e")


def finite(col: Column | str) -> Column:
    """``col`` as DOUBLE with NaN/+Inf/-Inf — and finite values of
    absurd magnitude (``abs >= MAG_CAP``, which would overflow the
    moment aggregates) — mapped to NULL (corrupt reading -> excluded
    like NULL; NULL stays NULL)."""
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("double")
    # abs(c) < MAG_CAP is False for +/-Inf and for NaN comparisons,
    # but the explicit isnan keeps the three-valued logic readable.
    return F.when(~F.isnan(c) & (F.abs(c) < MAG_CAP), c)


def sql_finite_pred(col: str) -> str:
    """DuckDB predicate twin of the :func:`finite` gate condition
    (TRUE iff the reading is a usable finite value below ``MAG_CAP``;
    NULL/NaN/Inf/absurd-magnitude all fail it).  Hand-written oracle
    WHERE clauses must use this instead of re-spelling the literal so
    that retuning ``MAG_CAP`` can never desync the Spark gate from its
    DuckDB twins."""
    return f"isfinite({col}) AND abs({col}) < {MAG_CAP_SQL}"


def sql_finite(col: str) -> str:
    """DuckDB twin of :func:`finite` (NULL on NaN/Inf/absurd magnitude,
    else the value).

    ``isfinite(NULL)`` is NULL -> CASE falls through to NULL, matching
    Spark's ``when`` with no otherwise."""
    return (
        f"CASE WHEN {sql_finite_pred(col)} "
        f"THEN CAST({col} AS DOUBLE) END"
    )
