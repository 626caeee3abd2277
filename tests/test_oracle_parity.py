"""The master correctness gate, run locally: every registered query with a
DuckDB oracle twin must match it exactly (mirrors the driver's
CORRECTNESS_r{N}.json check, at sf0.001 for speed)."""

from __future__ import annotations

import pytest

from projetos_etl_spark.registry import all_oracle_sql, all_queries
from tests.conftest import SF_DIR, assert_oracle_match

QUERIES = all_queries()
ORACLE = all_oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(name, spark, duck):
    assert_oracle_match(QUERIES[name](spark, SF_DIR), duck, ORACLE[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(name, spark, duck):
    """Queries without an oracle twin must still execute and return a
    stable schema (the driver's weaker rows-only check)."""
    df = QUERIES[name](spark, SF_DIR)
    assert df.columns, f"{name} returned no columns"
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    # driver re-checks: every oracle key must exist in queries()
    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
