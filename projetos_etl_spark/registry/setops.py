"""Set-operation family (SURVEY.md §2B "Set ops"): union / intersect /
except / distinct / exact dedup."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projetos_etl_spark.registry._core import Registry
from projetos_etl_spark.sources.io import load_table

REG = Registry()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@REG.add(
    "set_union_all",
    oracle="""
    SELECT nationkey, side, count(*) AS n
    FROM (
        SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    )
    GROUP BY nationkey, side
    ORDER BY nationkey, side
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL by name (no dedup shuffle) + aggregate."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return (
        cust.unionByName(supp)
        .groupBy("nationkey", "side")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("nationkey", "side")
    )


@REG.add(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): nations having both customers and
    suppliers."""
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp).orderBy("nationkey")


@REG.add(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): nations with customers but no
    suppliers."""
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.subtract(supp).orderBy("nationkey")


@REG.add(
    "set_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_linenumber
    FROM lineitem
    ORDER BY l_returnflag, l_linestatus, l_linenumber
    """,
)
def set_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT — hash-dedup with map-side partials."""
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_linenumber")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus", "l_linenumber")
    )


@REG.add(
    "dedup_exact",
    oracle="""
    SELECT md5(text)    AS text_hash,
           min(doc_id)  AS keep_doc_id,
           count(*)     AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash-groupBy keeping the smallest doc_id — the
    deterministic form of ``dropDuplicates`` (which keeps an arbitrary
    row). Grouping on md5(text) instead of the full text keeps shuffle
    keys at 32 bytes regardless of document size — the 100 TB essential."""
    return (
        _t(spark, sf_dir, "documents")
        .groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@REG.add(
    "set_intersect_all",
    oracle="""
    SELECT nationkey, CAST(count(*) AS BIGINT) AS multiplicity FROM (
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT ALL
        SELECT s_nationkey FROM supplier
    ) GROUP BY nationkey ORDER BY nationkey
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): each nation key survives
    min(count_left, count_right) times — the multiplicity-preserving
    variant a reconciliation diff needs (plain INTERSECT collapses to
    one row and hides count drift). Spark plans ``intersectAll`` as a
    counted hash aggregate per side, same single-shuffle economics as
    the distinct form; the result is re-aggregated to (key,
    multiplicity) so the compare is order-free."""
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return (
        cust.intersectAll(supp)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).cast("long").alias("multiplicity"))
        .orderBy("nationkey")
    )


@REG.add(
    "set_except_all",
    oracle="""
    SELECT nationkey, CAST(count(*) AS BIGINT) AS multiplicity FROM (
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey FROM supplier
    ) GROUP BY nationkey ORDER BY nationkey
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics): per key, max(count_left -
    count_right, 0) surviving rows — the exact "what's left after
    cancelling matches" diff (the distinct EXCEPT would drop a key with
    1000 left rows the moment ONE right row exists). Same counted-
    aggregate plan shape as ``set_intersect_all``."""
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return (
        cust.exceptAll(supp)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).cast("long").alias("multiplicity"))
        .orderBy("nationkey")
    )
