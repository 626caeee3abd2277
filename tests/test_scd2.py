"""SCD2 upsert semantics on a hand-built scenario: no-op update, real
change (close + reopen), untouched key, brand-new key, and history
preservation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from projetos_etl_spark.operators.scd2 import scd2_apply

TS0 = "2000-01-01 00:00:00"
TS1 = "2001-01-01 00:00:00"
TS2 = "2002-01-01 00:00:00"


@pytest.fixture()
def result(spark):
    dim = spark.createDataFrame(
        [
            # key 1: already-closed historical version + current version
            (1, "A", TS0, TS1),
            (1, "B", TS1, None),
            # key 2: current, will receive a no-op update
            (2, "X", TS0, None),
            # key 3: current, untouched by the batch
            (3, "Y", TS0, None),
        ],
        "k long, attr string, valid_from string, valid_to string",
    ).select(
        "k",
        "attr",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    updates = spark.createDataFrame(
        [(1, "C"), (2, "X"), (9, "NEW")], "k long, attr string"
    )
    out = scd2_apply(dim, updates, key="k", attrs=["attr"], batch_ts=TS2)
    return {
        (r.k, r.attr): (
            str(r.valid_from) if r.valid_from else None,
            str(r.valid_to) if r.valid_to else None,
        )
        for r in out.collect()
    }


def test_changed_key_closed_and_reopened(result):
    assert result[(1, "B")] == (TS1, TS2)  # closed at batch ts
    assert result[(1, "C")] == (TS2, None)  # new current version


def test_noop_update_leaves_row_current(result):
    assert result[(2, "X")] == (TS0, None)


def test_untouched_key_unchanged(result):
    assert result[(3, "Y")] == (TS0, None)


def test_new_key_inserted_current(result):
    assert result[(9, "NEW")] == (TS2, None)


def test_history_preserved(result):
    assert result[(1, "A")] == (TS0, TS1)
    assert len(result) == 6


def test_null_business_key_rows_survive(spark):
    """ADVICE r1 (medium): a current row whose business key is NULL must
    pass through an apply untouched — and a NULL-key update row must
    match it null-safely (NULL keys collate as one key), not silently
    vanish from the snapshot."""
    dim = spark.createDataFrame(
        [(None, "legacy", TS0, None), (1, "A", TS0, None)],
        "k long, attr string, valid_from string, valid_to string",
    ).select(
        "k",
        "attr",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )

    # Batch 1: no NULL-key update -> the NULL-key row passes through.
    out1 = scd2_apply(
        dim,
        spark.createDataFrame([(1, "B")], "k long, attr string"),
        key="k",
        attrs=["attr"],
        batch_ts=TS2,
    )
    survivors = {(r.k, r.attr) for r in out1.filter(F.col("valid_to").isNull()).collect()}
    assert (None, "legacy") in survivors and (1, "B") in survivors

    # Batch 2: a NULL-key update matches the NULL-key row (eqNullSafe)
    # and versions it like any other key.
    out2 = scd2_apply(
        dim,
        spark.createDataFrame([(None, "modern")], "k long, attr string"),
        key="k",
        attrs=["attr"],
        batch_ts=TS2,
    )
    null_rows = {
        (r.attr, r.valid_to is None) for r in out2.filter(F.col("k").isNull()).collect()
    }
    assert null_rows == {("legacy", False), ("modern", True)}
