"""Master query registry: merges every family module.

``__spark_entry__.py`` (the driver contract) delegates here. Family
modules are imported lazily inside :func:`all_queries` so an optional
dependency failing in one family can't take down the whole registry.
"""

from __future__ import annotations

from projetos_etl_spark.registry._core import QueryFn, Registry

_FAMILIES = [
    "relational",
    "tpch_breadth",
    "medallion",
    "sources",
    "aggregates",
    "windows",
    "setops",
    "scalars",
    "prep",
    "text",
    "corpus",
    "dedup",
    "similarity",
    "multimodal",
    "streams",
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
