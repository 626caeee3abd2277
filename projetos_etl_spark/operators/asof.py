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

NULL-timestamp semantics also match DuckDB's: the ASOF inequality is
NULL for a NULL timestamp on either side, so a NULL-ts right row can
never be anyone's match and a NULL-ts left row matches nothing (it is
kept, with NULL carried values — left-join semantics). This must be
EXPLICIT in the window emulation: Spark's ascending sort puts NULLs
FIRST, so an unfiltered NULL-ts right row would sort to the window head
and forward-fill its value into EVERY row of its key — one
unparseable-timestamp record silently becoming the "most recent match"
for an entire user's history (caught by the r10 null-keys probe,
SCALE.md family seven).
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
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row (per ``on`` key)
    with ``right[right_ts] <= left[left_ts]``. Left rows with no prior
    right row keep NULLs (left-asof semantics).

    ``direction="forward"`` flips the inequality: the NEAREST right row
    with ``right_ts >= left_ts`` (DuckDB ``ASOF ... ON r.ts >= l.ts``) —
    the "next reading after" lookup. Same single shuffle: only the
    window's sort order reverses, the carry logic is identical.

    ``tolerance_seconds``: bounded-staleness variant (pandas
    ``merge_asof(tolerance=...)`` semantics) — a match older than the
    tolerance is treated as NO match and the carried values are NULLed.
    This is the time-series norm for sensor/price lookups where a
    too-stale reading is worse than none. Implemented by carrying the
    matched right row's OWN timestamp through the same forward-fill
    window and null-gating on its age: zero extra shuffles over the
    plain as-of."""
    keys = [on] if isinstance(on, str) else list(on)
    out_cols = [f"{c}{suffix}" for c in right_value_cols]

    # A NULL-ts right row can never satisfy the ASOF inequality, and a
    # NULL-KEY right row can never satisfy the equi-condition (JOIN
    # semantics: NULL = NULL is not a match — unlike the window's
    # partitionBy, which GROUPS the NULL keys together and would happily
    # match a NULL-user probe to a NULL-user reading). Drop both BEFORE
    # the union, or Spark's NULLS-FIRST ascending sort would place the
    # NULL-ts rows at the window head and forward-fill them into the
    # whole key.
    right = right.filter(F.col(right_ts).isNotNull())
    for k in keys:
        right = right.filter(F.col(k).isNotNull())

    l_tagged = left.withColumn("__asof_ts", F.col(left_ts)).withColumn(
        "__is_left", F.lit(1)
    )
    for c in out_cols:
        l_tagged = l_tagged.withColumn(c, F.lit(None))
    # Right side contributes only key + ts + carried values (plus its own
    # ts a second time when a staleness bound must be enforced).
    src_ts_cols = (
        [F.col(right_ts).alias("__asof_src_ts")] if tolerance_seconds else []
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_value_cols],
        *src_ts_cols,
    )
    l_cols = [c for c in l_tagged.columns]
    unioned = l_tagged.select(*l_cols).unionByName(r_tagged, allowMissingColumns=True)

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # Right rows (__is_left=0) sort before left rows at equal ts, so the
    # right row is visible at ties in BOTH directions ("<=" / ">=").
    # Forward = the same running carry over the series reversed in time.
    ts_order = (
        F.col("__asof_ts") if direction == "backward" else F.col("__asof_ts").desc()
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned
    fill_cols = out_cols + (["__asof_src_ts"] if tolerance_seconds else [])
    for c in fill_cols:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    result = filled.filter(F.col("__is_left") == 1)
    # A NULL-ts or NULL-key LEFT row matches nothing (inequality /
    # equi-condition is NULL): keep the row, null its carried values.
    # With the right side pre-filtered the fill above is usually already
    # NULL here, but only by sort-order accident — pin the semantics
    # explicitly.
    unmatched = F.col(left_ts).isNull()
    for k in keys:
        unmatched = unmatched | F.col(k).isNull()
    for c in out_cols:
        result = result.withColumn(
            c, F.when(unmatched, F.lit(None)).otherwise(F.col(c))
        )
    if tolerance_seconds:
        age = (
            F.unix_micros(F.col("__asof_ts")) - F.unix_micros(F.col("__asof_src_ts"))
            if direction == "backward"
            else F.unix_micros(F.col("__asof_src_ts")) - F.unix_micros(F.col("__asof_ts"))
        )
        stale = F.col("__asof_src_ts").isNull() | (
            age > int(tolerance_seconds * 1_000_000)
        )
        for c in out_cols:
            result = result.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
        result = result.drop("__asof_src_ts")
    return result.drop("__asof_ts", "__is_left")


def _example_condition() -> Column:  # pragma: no cover - doc helper
    return F.lit(True)
