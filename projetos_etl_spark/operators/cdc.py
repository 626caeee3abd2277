"""CDC change application (MERGE-style upsert without a table format).

The reference loads full snapshots (`bronze:165-177` row-inserts the
whole workbook); real warehouses apply *change streams*. This operator
applies an insert/update/delete change set to a base snapshot with
latest-change-wins semantics — the batch core of what Delta/Iceberg
MERGE INTO does, expressed on plain DataFrames so it works on any
parquet layer.

Scale posture: one window over the change set (small relative to base),
then one anti join + union against the base — the base table is touched
exactly once, shuffled on the merge key only for the anti join; with a
broadcast-sized change set the whole apply is map-side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply a change set to ``base`` (latest change per key wins).

    ``changes`` must carry: the ``key`` column, ``op_col`` in
    {'I','U','D'}, ``seq_col`` (monotone per key), and the full payload
    columns of ``base``. Returns the merged snapshot.
    """
    w = Window.partitionBy(key).orderBy(F.col(seq_col).desc())
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    payload = [c for c in base.columns]
    untouched = base.join(latest.select(key), key, "left_anti")
    applied = latest.filter(F.col(op_col) != "D").select(*payload)
    return untouched.unionByName(applied)


def synth_change_set(
    base: DataFrame, key: str, payload: Sequence[str]
) -> DataFrame:  # pragma: no cover - fixture helper, exercised via registry
    raise NotImplementedError("change sets are built per-entry; see registry")
