"""Physical-plan inspection helpers.

The 100 TB design loop this engine prescribes (BASELINE.json north star)
is: write the query declaratively, then *verify the plan* — filters
pushed to the scan, columns pruned, small sides broadcast, top-k planned
as TakeOrderedAndProject, wide codegen spans — and iterate until the plan
is the one you'd want on a 1000-executor cluster. These helpers turn that
loop into assertions (see ``tests/test_plans.py``).

All functions take a (lazy, unexecuted) DataFrame; they read Catalyst's
formatted explain output, so they see the static plan AQE starts from.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The plan string ``df.explain(mode)`` would print."""
    jdf = df._jdf  # classic (non-Connect) PySpark
    jvm = df.sparkSession._jvm
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return jdf.queryExecution().explainString(explain_mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """Every ``PushedFilters: [...]`` entry across the plan's scans —
    predicates the parquet reader evaluates against row-group stats
    (data skipped, not read). Empty when pushdown was lost."""
    plan = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(p.strip() for p in m.group(1).split(",") if p.strip())
    return out


def read_schemas(df: DataFrame) -> list[set[str]]:
    """Per-scan sets of column names actually read (ReadSchema) — the
    column-pruning check: a scan reading all columns for a 2-column
    projection is a plan bug."""
    plan = explain_str(df)
    schemas: list[set[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
        schemas.append(cols)
    return schemas


def has_operator(df: DataFrame, op_name: str) -> bool:
    """True if the physical plan contains an operator whose name matches
    ``op_name`` (e.g. 'BroadcastHashJoin', 'TakeOrderedAndProject',
    'SortMergeJoin', 'PartitionFilters')."""
    return op_name in explain_str(df)


def codegen_stage_count(df: DataFrame, execute: bool = True) -> int:
    """Number of WholeStageCodegen spans. More operators fused into fewer
    spans = less virtual-call overhead; a plan full of codegen breaks
    (UDFs, RDD hops) shows up as many small spans or none.

    Under AQE the adaptive plan assigns codegen ids only once finalized,
    so by default this executes the query (test-scale inputs only) and
    inspects the executed plan."""
    if execute:
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    else:
        plan = explain_str(df)
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    ids |= set(re.findall(r"\[codegen id : (\d+)\]", plan))
    return len(ids)
