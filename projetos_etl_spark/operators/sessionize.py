"""Sessionization (gaps-and-islands).

Batch twin of Structured Streaming's ``session_window`` (SURVEY.md §2B
``stream_session_window``): a new session starts when the gap to the
previous event of the same key exceeds ``gap_seconds``.

Scale: one shuffle on the key, one window sort per partition (spillable),
no Python in the path. Skewed keys (one user with 10^9 events) are the
known hazard of any per-key ordering; mitigations at 100 TB are key
salting by time-bucket or the streaming session_window operator which
bounds state by watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: float,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign per-key session ids (1-based, in time order) to every row.

    Rows with NULL ``ts_col`` are DROPPED: a session is a maximal run of
    gap-bounded timestamps, so an un-timestamped event has no gap
    relation to any neighbor — and Spark's NULLS-FIRST ascending sort
    would otherwise park it at the window head where ``lag`` feeds it
    into the first timed event's gap (engine-divergent: DuckDB sorts the
    same NULLs last). Family-seven convention, SCALE.md r10."""
    df = df.filter(F.col(ts_col).isNotNull())
    w = Window.partitionBy(key).orderBy(F.col(ts_col))
    sec = F.col(ts_col).cast("double")
    prev = F.lag(sec).over(w)
    is_new = F.when(prev.isNull() | ((sec - prev) > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
