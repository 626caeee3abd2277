"""SCD Type-2 dimension upsert (slowly-changing dimensions).

The reference loads its silver table into a Postgres warehouse
(``silver:161-193``) with no history handling; any real warehouse
consumer of that table needs versioned dimensions. This operator applies
a batch of updates to an SCD2 dimension snapshot:

- unchanged current rows pass through;
- changed rows are CLOSED (``valid_to`` set to the batch timestamp) and
  a NEW current version is appended;
- brand-new keys are inserted as current.

Pure DataFrame joins + union — the plan is one shuffle on the business
key. At 100 TB the dimension is partitioned by ``is_current`` (hot scans
read only current rows) and the update batch is usually small enough to
broadcast — the path this implementation takes via join strategy hints
being left to AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    batch_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply ``updates`` (one row per key: the new attribute values) to an
    SCD2 ``dim`` carrying (key, attrs..., valid_from, valid_to). Rows with
    ``valid_to IS NULL`` are current. ``batch_ts`` is the (string literal)
    effective timestamp for closes/opens — passed in, never wall-clock, so
    runs are reproducible."""
    ts = F.lit(batch_ts).cast("timestamp")
    history = dim.filter(F.col(valid_to).isNotNull())
    current = dim.filter(F.col(valid_to).isNull())

    # Presence is tracked with explicit marker columns, NOT key-nullness:
    # a NULL business key is a legitimate (if ugly) dimension row, and a
    # plain equi-join would never match it — classifying existence by
    # key IS NOT NULL would silently drop it from the snapshot. The join
    # is null-safe, so a NULL-key update row matches the NULL-key
    # dimension row (NULL keys collate as one key, like GROUP BY).
    cur = current.withColumn("__cur", F.lit(1))
    upd = updates.select(
        F.col(key).alias("__k"),
        *[F.col(a).alias(f"__new_{a}") for a in attrs],
        F.lit(1).alias("__upd"),
    )
    joined = cur.join(upd, cur[key].eqNullSafe(F.col("__k")), "full_outer")

    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.col(f"__new_{a}"))
    has_update = F.col("__upd").isNotNull()
    is_existing = F.col("__cur").isNotNull()

    # 1. current rows without an update, or with a no-op update: unchanged.
    unchanged = joined.filter(is_existing & (~has_update | ~changed)).select(
        key, *attrs, valid_from, valid_to
    )
    # 2. current rows whose attributes changed: close them at batch_ts.
    closed = joined.filter(is_existing & has_update & changed).select(
        key, *attrs, valid_from, ts.alias(valid_to)
    )
    # 3. new versions for changed keys + brand-new keys: open at batch_ts.
    opened = joined.filter(has_update & (~is_existing | changed)).select(
        F.col("__k").alias(key),
        *[F.col(f"__new_{a}").alias(a) for a in attrs],
        ts.alias(valid_from),
        F.lit(None).cast("timestamp").alias(valid_to),
    )
    return history.select(key, *attrs, valid_from, valid_to).unionByName(
        unchanged.unionByName(closed).unionByName(opened)
    )
