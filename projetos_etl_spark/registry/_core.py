"""Registry plumbing for the driver contract (``__spark_entry__.py``).

Each query family module builds a ``Registry``: named PySpark callables
``(spark, sf_dir) -> DataFrame`` plus, where SQL-expressible, a DuckDB
oracle twin. Column names/types are aligned between the two on purpose —
the driver's compare sorts columns by name and value-hashes.

Determinism conventions used across all families (so the hash compare is
stable across engines and across partition orderings):
- money-scale SUMs over many rows are rounded to 0 decimals; small-group
  sums to 2; AVGs and ratios to 6 (floating-point accumulation order
  differs between Spark partials and DuckDB, so unrounded doubles would
  hash-mismatch at the last ulp);
- timestamps are emitted as formatted strings (engine-neutral);
- every top-k uses an explicit deterministic tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


class Registry:
    def __init__(self) -> None:
        self.queries: dict[str, QueryFn] = {}
        self.oracle: dict[str, str] = {}

    def add(self, name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
        """Register ``fn`` under ``name``; ``oracle`` is the DuckDB SQL twin
        (omit for non-SQL-expressible ops -> driver does a rows-only check)."""

        def deco(fn: QueryFn) -> QueryFn:
            if name in self.queries:
                raise ValueError(f"duplicate query name: {name}")
            self.queries[name] = fn
            if oracle is not None:
                self.oracle[name] = oracle
            return fn

        return deco

    def merge(self, *others: "Registry") -> "Registry":
        for other in others:
            for name in other.queries:
                if name in self.queries:
                    raise ValueError(f"duplicate query name across families: {name}")
            self.queries.update(other.queries)
            self.oracle.update(other.oracle)
        return self


# Engine-neutral timestamp rendering (Spark pattern <-> DuckDB strftime):
TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"
DATE_FMT_SPARK = "yyyy-MM-dd"
DATE_FMT_DUCK = "%Y-%m-%d"
