"""Master query registry: merges every family module.

``__spark_entry__.py`` (the driver contract) delegates here. Family
modules are imported lazily inside :func:`all_queries` so an optional
dependency failing in one family can't take down the whole registry.
"""

from __future__ import annotations

from projetos_etl_spark.registry._core import QueryFn, Registry

# Family order drives registry insertion order, which in turn is the order
# external verification harnesses iterate ``queries()``.  Rounds 1-2 verified
# the relational/tpch/medallion/sources prefix; round 3 covered
# aggregates/windows/setops/scalars (+dedup_near_minhash).  Round 4 leads
# with the still-never-driver-verified families — streams, similarity
# (now 7 entries with the r4 ``sim_search_ivf_pq`` addition), text,
# corpus, multimodal, then the dedup head — so the first-50 window is
# streams(12) + similarity(7) + text(9) + corpus(9) + multimodal(6) +
# dedup[:7]: 49 first-ever entries (the one repeat is dedup_near_minhash
# at the head of dedup).  The remainder (dedup tail from
# ``dedup_minhash_incremental``, all of prep, 2 sources entries) plus the
# 13 entries that errored in r3 (aggregates/windows/scalars, events-ts
# root cause, fixed in the r3 tail commit) are the r5 window.  A
# per-entry ledger lives in COVERAGE.md ("Driver-coverage ledger").
_FAMILIES = [
    "streams",
    "similarity",
    "text",
    "corpus",
    "multimodal",
    "dedup",
    "prep",
    "sources",
    "aggregates",
    "windows",
    "scalars",
    "setops",
    "relational",
    "tpch_breadth",
    "medallion",
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
