"""Aggregation family (SURVEY.md §2B "Aggregation").

All aggregates here are hash aggregations with map-side partials; the
multi-dimensional ones (rollup/cube/grouping sets) expand grouping keys
*before* the shuffle, so the cost at 100 TB is (#grouping sets x) one
pass — Spark's Expand operator — not multiple scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projetos_etl_spark.registry._core import Registry
from projetos_etl_spark.sources.io import load_table

REG = Registry()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@REG.add(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_suppliers,
           count(*)                  AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — Spark plans this as a two-phase expand+agg; at
    scale prefer approx_count_distinct (below) when exactness is optional."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@REG.add(
    "agg_count_distinct_approx",
    # The estimate can't be value-oracled, but its CONTRACT can (same
    # pattern as agg_hll_sketch_rollup / agg_percentile_approx): pin the
    # exact count and COMPUTE the within-rsd-band claim on the Spark
    # side (3x the 2% rsd => ~99.7% of sketches) while the oracle pins
    # it true. A broken sketch fails the hash compare.
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           true AS est_within_band
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_count_distinct_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the 100 TB path for cardinality
    (single pass, fixed-size sketch, no expand shuffle). Unit tests
    additionally bound the relative error vs the exact count."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("_approx"),
            F.countDistinct("l_partkey").cast("long").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("_approx") - F.col("exact_parts"))
                <= 0.06 * F.col("exact_parts")
            ).alias("est_within_band"),
        )
        .orderBy("l_returnflag")
    )


@REG.add(
    "agg_rollup",
    oracle="""
    SELECT r_name AS region_name,
           n_name AS nation_name,
           round(sum(c_acctbal), 2) AS total_balance,
           count(*)                 AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY region_name NULLS FIRST, nation_name NULLS FIRST
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals region -> nation -> grand total."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"), "c_acctbal")
        .rollup("region_name", "nation_name")
        .agg(
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .orderBy(F.col("region_name").asc_nulls_first(), F.col("nation_name").asc_nulls_first())
    )


@REG.add(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*)                  AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping combinations in one Expand pass."""
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


@REG.add(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           round(sum(o_totalprice), 0) AS total_price,
           count(*)                    AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (same Catalyst Expand as
    rollup/cube, arbitrary set list)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("pes_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               round(sum(o_totalprice), 0) AS total_price,
               count(*)                    AS n_orders
        FROM pes_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


@REG.add(
    "agg_stats",
    oracle="""
    SELECT o_orderstatus,
           round(min(o_totalprice), 2)          AS min_price,
           round(max(o_totalprice), 2)          AS max_price,
           round(stddev_samp(o_totalprice), 4)  AS stddev_price,
           round(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
           count(*)                             AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates incl. exact interpolated median. At 100 TB
    the exact percentile becomes approx_percentile (t-digest sketch)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.stddev_samp("o_totalprice"), 4).alias("stddev_price"),
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("median_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


@REG.add(
    "agg_pivot",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
           count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
           count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts by status. Pinned pivot values => single-pass
    plan with no value-discovery pre-query (required at scale)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
        .orderBy("o_orderpriority")
    )


@REG.add(
    "agg_percentiles",
    oracle="""
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.5)  AS median_price,
           quantile_cont(o_totalprice, 0.9)  AS p90_price,
           quantile_cont(o_totalprice, 0.99) AS p99_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``, bit-identical — verified, no rounding needed).
    Exact percentile sorts per group; at 100 TB switch to
    ``percentile_approx`` (t-digest, mergeable map-side) and accept
    bounded error — the same trade as count-distinct vs HLL."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("median_price"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90_price"),
            F.expr("percentile(o_totalprice, 0.99)").alias("p99_price"),
        )
        .orderBy("o_orderstatus")
    )


@REG.add(
    "agg_histogram",
    oracle="""
    SELECT CAST(least(floor(o_totalprice / 50000), 9) AS INTEGER) AS bucket,
           CAST(count(*) AS BIGINT)                               AS n,
           round(sum(o_totalprice), 0)                            AS bucket_total
    FROM orders
    GROUP BY 1
    ORDER BY bucket
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (10 x 50k buckets, top
    bucket open-ended): the bucket id is explicit floor arithmetic
    rather than width_bucket so both engines compute the identical
    boundary math (DuckDB floor() returns DOUBLE, Spark LONG — the cast
    pins it). Bucketing before the shuffle means the aggregation moves
    10 rows per partition regardless of table size."""
    bucket = F.least(F.floor(F.col("o_totalprice") / 50000), F.lit(9)).cast("int")
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 0).alias("bucket_total"),
        )
        .orderBy("bucket")
    )


@REG.add(
    "agg_mode_deterministic",
    # Spark 3.4+ ships mode(), but its tie choice is undefined — this
    # entry is the engine-portable DETERMINISTIC form: max count, ties
    # broken on the smallest value, pure integer/string comparisons.
    oracle="""
    SELECT c_nationkey, c_mktsegment AS mode_segment, n AS n_customers
    FROM (
        SELECT c_nationkey, c_mktsegment, count(*) AS n,
               row_number() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY count(*) DESC, c_mktsegment) AS rn
        FROM customer
        GROUP BY c_nationkey, c_mktsegment
    ) WHERE rn = 1
    ORDER BY c_nationkey
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation modal market segment with a defined tie-break (count
    DESC, then segment ASC) — the categorical summary statistic done
    right: the built-in ``mode()`` leaves ties unspecified, which is a
    silent nondeterminism bug in any incremental pipeline. One partial-
    aggregated count shuffle, then ``min_by`` on a (-count, value)
    struct — struct comparison is lexicographic, so the min is (max
    count, then smallest segment) with no window over raw rows and no
    second shuffle."""
    c = load_table(spark, sf_dir, "customer")
    counted = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    key = F.struct((-F.col("n")).alias("neg_n"), F.col("c_mktsegment").alias("seg"))
    return (
        counted.groupBy("c_nationkey")
        .agg(
            F.min_by("c_mktsegment", key).alias("mode_segment"),
            F.max("n").alias("n_customers"),
        )
        .orderBy("c_nationkey")
    )
