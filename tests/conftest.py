"""Shared pytest fixtures: one local SparkSession + DuckDB oracle helpers.

The oracle-parity helper mirrors the driver's compare (sort columns by
name, order-insensitive row compare) so a local pass predicts a driver
pass at sf0.01.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from projetos_etl_spark.session import get_spark
from projetos_etl_spark.sources.io import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    session = get_spark(app_name="projetos-etl-spark-tests", cpus=8, shuffle_partitions=8)
    yield session


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all values — order-insensitive."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="first", kind="mergesort")
    return df.reset_index(drop=True)


def assert_oracle_match(spark_df, duck_con, sql: str, check_exact: bool = True) -> None:
    sp = normalize(spark_df.toPandas())
    du = normalize(duck_con.sql(sql).df())
    assert list(sp.columns) == list(du.columns), f"columns {list(sp.columns)} != {list(du.columns)}"
    assert len(sp) == len(du), f"row count {len(sp)} != {len(du)}"
    # dtype *kind* must agree (int vs float vs object vs datetime); exact
    # width may differ (int32/int64) and is tolerated like the driver's
    # value-hash would after normalization.
    for c in sp.columns:
        ks, kd = sp[c].dtype.kind, du[c].dtype.kind
        assert (ks == kd) or {ks, kd} <= {"i", "u"}, f"dtype kind mismatch on {c}: {ks} vs {kd}"
    pd.testing.assert_frame_equal(sp, du, check_dtype=False, check_exact=check_exact)
