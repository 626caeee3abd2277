"""As-of (time-travel) join.

Spark SQL has no native ASOF JOIN (DuckDB does; SURVEY.md §2B
``join_asof_events``). The scalable emulation: union both sides with a
side tag, sort within each key partition once, and carry the right side's
last-seen value forward with ``last(..., ignorenulls=True)`` over a
running window. One shuffle on the key, no range explosion, no per-group
Python — this survives 100 TB where a ``pd.merge_asof``-per-group would
not (a single hot key would OOM one executor; here the window sort spills).

Tie semantics match DuckDB's ``ASOF JOIN ... ON r.ts <= l.ts``: at equal
timestamps the right row is visible to the left row (right sorts first via
the side tag).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row (per ``on`` key)
    with ``right[right_ts] <= left[left_ts]``. Left rows with no prior
    right row keep NULLs (left-asof semantics)."""
    keys = [on] if isinstance(on, str) else list(on)
    out_cols = [f"{c}{suffix}" for c in right_value_cols]

    l_tagged = left.withColumn("__asof_ts", F.col(left_ts)).withColumn(
        "__is_left", F.lit(1)
    )
    for c in out_cols:
        l_tagged = l_tagged.withColumn(c, F.lit(None))
    # Right side contributes only key + ts + carried values.
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_value_cols],
    )
    l_cols = [c for c in l_tagged.columns]
    unioned = l_tagged.select(*l_cols).unionByName(r_tagged, allowMissingColumns=True)

    # Right rows (__is_left=0) sort before left rows at equal ts => "<=".
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__asof_ts"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned
    for c in out_cols:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return filled.filter(F.col("__is_left") == 1).drop("__asof_ts", "__is_left")


def _example_condition() -> Column:  # pragma: no cover - doc helper
    return F.lit(True)
