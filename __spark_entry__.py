"""Driver contract for the spark-graft builder (PySpark target).

Delegates to :mod:`projetos_etl_spark.registry`, where every implemented
operator from SURVEY.md §2 registers a named PySpark query and (where
SQL-expressible) a DuckDB oracle twin with matching column names/types.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from projetos_etl_spark.registry import all_oracle_sql, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    return all_queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin per query (omitted => rows-only check)."""
    return all_oracle_sql()
