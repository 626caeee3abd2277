"""Master query registry: merges every family module.

``__spark_entry__.py`` (the driver contract) delegates here. Family
modules are imported lazily inside :func:`all_queries` so an optional
dependency failing in one family can't take down the whole registry.
"""

from __future__ import annotations

from projetos_etl_spark.registry._core import QueryFn, Registry

# Family order drives registry insertion order, which in turn is the order
# external verification harnesses iterate ``queries()``.  Rounds 1-2 verified
# the relational/tpch/medallion/sources prefix; round 3 leads with the
# families whose entries have not yet had a driver-verified correctness row
# (aggregates, windows, setops, scalars, dedup, similarity, ...) so the
# first-50 window lands on fresh entries.  A per-entry ledger lives in
# COVERAGE.md ("Driver-coverage ledger").
_FAMILIES = [
    "aggregates",
    "windows",
    "setops",
    "scalars",
    "dedup",
    "similarity",
    "prep",
    "text",
    "corpus",
    "multimodal",
    "streams",
    "relational",
    "tpch_breadth",
    "medallion",
    "sources",
]


def build() -> Registry:
    import importlib

    master = Registry()
    for mod_name in _FAMILIES:
        mod = importlib.import_module(f"projetos_etl_spark.registry.{mod_name}")
        master.merge(mod.REG)
    return master


def all_queries() -> dict[str, QueryFn]:
    return build().queries


def all_oracle_sql() -> dict[str, str]:
    return build().oracle
