"""Relational core: scans, filters, projections, joins, gold marts.

Covers SURVEY.md §2B rows: ``scan_parquet``, ``filter_pred``,
``project_rename`` (ref op #13, ``silver:85-104``), ``join_*``, plus the
TPC-H-shaped headline queries (q1/q3/q5) and the gold sales mart the
reference's gold layer (``dags/gold/dag_gold_financial_sample.py`` — an
unimplemented stub) was meant to provide.

Scale notes per operator are in each docstring; the common themes:
- dimension joins broadcast (region/nation/part/supplier are small by
  construction in a star schema — at 100 TB the fact table scales, the
  dims don't);
- fact-fact joins (lineitem-orders) shuffle on the join key and rely on
  AQE for skew splitting;
- aggregates are partial (map-side combine) by Spark's hash aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projetos_etl_spark.operators.asof import asof_join
from projetos_etl_spark.registry._core import (
    DATE_FMT_DUCK,
    DATE_FMT_SPARK,
    TS_FMT_DUCK,
    TS_FMT_SPARK,
    Registry,
)
from projetos_etl_spark.sources.io import load_table, register_views

REG = Registry()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1 shape (scan -> filter -> hash agg -> sort).
# ---------------------------------------------------------------------------


@REG.add(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                          AS sum_qty,
           round(sum(l_extendedprice), 0)                                     AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 0)                  AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 0)    AS sum_charge,
           round(avg(l_quantity), 6)                                          AS avg_qty,
           round(avg(l_extendedprice), 6)                                     AS avg_price,
           round(avg(l_discount), 6)                                          AS avg_disc,
           count(*)                                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary (TPC-H Q1 shape; SURVEY.md §7 Phase 1 flagship).

    Whole pipeline in one query: parquet scan with the shipdate predicate
    pushed down, column pruning to 7 of 11 columns, partial+final hash
    aggregation on two low-cardinality keys (no skew possible), tiny sort.
    At 100 TB this is a single pass over lineitem — the optimal plan.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 0).alias("sum_base_price"),
            F.round(F.sum(disc_price), 0).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 0).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@REG.add(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '{DATE_FMT_DUCK}')          AS orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 unshipped high-revenue orders (TPC-H Q3 shape).

    customer is a filtered small dim -> broadcast into orders; the
    orders-lineitem join shuffles on orderkey; final top-k plans as
    TakeOrderedAndProject (no global sort materialization).
    """
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(
            orders.join(
                F.broadcast(cust), orders.o_custkey == cust.c_custkey
            ).select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", DATE_FMT_SPARK).alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@REG.add(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 0) AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume (TPC-H Q5 shape): 6-way star join.

    region/nation/supplier/customer are dims -> broadcast; the only
    shuffles are lineitem-orders on orderkey. AQE may further reorder.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc())
    )


# ---------------------------------------------------------------------------
# Projection / filter primitives (ref ops #13 / silver filter semantics).
# ---------------------------------------------------------------------------


@REG.add(
    "filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity > 45 AND l_discount < 0.02
      AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicate + projection; all three predicates and the
    4-column projection reach the parquet scan (PushedFilters/ReadSchema)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_quantity") > 45)
            & (F.col("l_discount") < 0.02)
            & (F.col("l_shipdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@REG.add(
    "project_rename",
    oracle="""
    SELECT c_custkey   AS customer_key,
           c_name      AS customer_name,
           c_mktsegment AS market_segment,
           round(c_acctbal, 2) AS account_balance
    FROM customer
    """,
)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk rename-to-snake_case projection (ref op #13, ``silver:85-104``,
    with the reference's ``gross_sale``/``gocs`` typos NOT reproduced —
    SURVEY.md §1.2). Pure projection: zero shuffle, column-pruned scan."""
    return _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("customer_key"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("market_segment"),
        F.round(F.col("c_acctbal"), 2).alias("account_balance"),
    )


# ---------------------------------------------------------------------------
# Join family.
# ---------------------------------------------------------------------------


@REG.add(
    "join_inner_hash",
    oracle="""
    SELECT c_mktsegment,
           count(*)                    AS n_orders,
           round(sum(o_totalprice), 0) AS total_sales
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def join_inner_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join + aggregate. Spark/AQE picks broadcast-hash here
    (customer is small); at 100 TB with a huge dim it degrades gracefully
    to sort-merge on the shuffled key."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 0).alias("total_sales"),
        )
        .orderBy("c_mktsegment")
    )


@REG.add(
    "join_left",
    oracle="""
    SELECT c_custkey,
           count(o_orderkey)                        AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@REG.add(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers with at least one finished order.
    Semi joins never duplicate the left side — no fan-out at scale."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment")


@REG.add(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no in-progress order."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@REG.add(
    "join_broadcast",
    oracle="""
    SELECT p_brand,
           round(sum(l_extendedprice * (1 - l_discount)), 0) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join: part is a bounded dim, so the fact
    scan streams through a map-side hash join — zero shuffle for the join
    itself even at 100 TB of lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("p_brand")
    )


@REG.add(
    "join_theta_range",
    oracle="""
    SELECT s_suppkey,
           count(*) AS n_richer_customers
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND c_acctbal > s_acctbal
    GROUP BY s_suppkey
    ORDER BY s_suppkey
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range (theta) join: same-nation customers richer than the
    supplier. The equi key carries the shuffle/broadcast; the range
    predicate evaluates inside the join — never a cartesian product."""
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    return (
        supp.join(
            cust,
            (supp.s_nationkey == cust.c_nationkey) & (cust.c_acctbal > supp.s_acctbal),
        )
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_richer_customers"))
        .orderBy("s_suppkey")
    )


@REG.add(
    "join_asof_events",
    oracle=f"""
    SELECT p.event_id,
           p.user_id,
           strftime(p.ts, '{TS_FMT_DUCK}') AS purchase_ts,
           CASE WHEN p.ts IS NULL THEN NULL
                ELSE strftime(e.ts, '{TS_FMT_DUCK}') END AS last_error_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error'
                    AND ts IS NOT NULL AND user_id IS NOT NULL) e
      ON p.user_id = e.user_id AND e.ts <= p.ts
    """,
)
def join_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (DuckDB ``ASOF JOIN`` equivalent; SURVEY.md §4.3): each
    purchase gets the user's most recent error at-or-before it. See
    ``operators/asof.py`` for the single-shuffle window emulation."""
    events = _t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = events.filter(F.col("event_type") == "error").select("user_id", "ts")
    joined = asof_join(
        purchases,
        errors.withColumn("error_ts", F.col("ts")).select("user_id", "ts", "error_ts"),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["error_ts"],
        suffix="",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT_SPARK).alias("purchase_ts"),
        F.date_format("error_ts", TS_FMT_SPARK).alias("last_error_ts"),
    )


@REG.add(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 shape): which customers returned
    the most revenue this year. Returns filter prunes lineitem at the
    scan; customer/nation broadcast; top-20 plans as
    TakeOrderedAndProject."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@REG.add(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey,
           round(o_totalprice, 2)    AS totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    GROUP BY c_custkey, o_orderkey, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders (TPC-H Q18 shape): IN over an aggregated
    subquery, executed as a LEFT SEMI join against the pre-aggregated
    key set — one extra aggregation instead of a per-row subquery, and
    the semi join never duplicates the probe side."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 150)
        .select(F.col("l_orderkey").alias("__big_key"))
    )
    return (
        orders.join(big_orders, orders.o_orderkey == F.col("__big_key"), "left_semi")
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_custkey", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey"))
    )


@REG.add(
    "subquery_scalar",
    oracle="""
    SELECT p_partkey, p_brand, round(p_retailprice, 2) AS retail
    FROM part
    WHERE p_retailprice > 1.02 * (SELECT avg(p_retailprice) FROM part)
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (parts priced >2% above the global average),
    decorrelated as a broadcast of the 1-row aggregate — the scalar is
    computed once and shipped to every executor, never a driver
    collect()."""
    part = _t(spark, sf_dir, "part")
    avg_price = part.agg(F.avg("p_retailprice").alias("__avg"))
    return (
        part.crossJoin(F.broadcast(avg_price))
        .filter(F.col("p_retailprice") > 1.02 * F.col("__avg"))
        .select(
            "p_partkey", "p_brand", F.round("p_retailprice", 2).alias("retail")
        )
    )


@REG.add(
    "subquery_correlated",
    oracle="""
    SELECT l.l_partkey,
           count(*)                   AS n_small,
           round(sum(l.l_quantity), 2) AS small_qty
    FROM lineitem l
    WHERE l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    GROUP BY l.l_partkey
    ORDER BY l.l_partkey
    """,
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape: lineitems under half
    the part's average quantity), decorrelated into a per-part aggregate
    joined back to the fact — one shuffle on l_partkey instead of a
    subquery per row. This is the rewrite Catalyst itself applies to
    correlated scalar subqueries; spelling it out keeps the join
    broadcastable when the key side is bounded."""
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (0.5 * F.avg("l_quantity")).alias("__half_avg")
    )
    return (
        li.join(F.broadcast(per_part), li.l_partkey == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("__half_avg"))
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            F.round(F.sum("l_quantity"), 2).alias("small_qty"),
        )
        .orderBy("l_partkey")
    )


@REG.add(
    "join_salted_skew",
    oracle="""
    SELECT s_nationkey,
           count(*)                    AS n_items,
           round(sum(l_quantity), 2)   AS total_qty
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    ORDER BY s_nationkey
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join (``operators/salt.py``): the join key becomes
    (l_suppkey, salt) so a hypothetical celebrity supplier's rows spread
    over 16 shuffle partitions instead of one straggler task. The oracle
    is the PLAIN join — salting must be result-invisible."""
    from projetos_etl_spark.operators.salt import salted_join

    li = _t(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    return (
        salted_join(li, supp, on=["l_suppkey"], n_salts=16)
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .orderBy("s_nationkey")
    )


# ---------------------------------------------------------------------------
# Gold mart (the layer the reference never built — ``gold:1-31`` stub).
# ---------------------------------------------------------------------------


@REG.add(
    "gold_sales_mart",
    oracle="""
    SELECT r_name AS region_name,
           n_name AS nation_name,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           round(sum(l_extendedprice * (1 - l_discount)), 0) AS revenue,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders
    FROM lineitem
    JOIN orders   ON l_orderkey  = o_orderkey
    JOIN customer ON o_custkey   = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name, year(o_orderdate)
    ORDER BY region_name, nation_name, order_year
    """,
)
def gold_sales_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold-layer BI mart: revenue by region/nation/year. This is the shape
    the reference's README promises to Power BI (``README.md:23-24``) but
    never implements (``gold:1-31``). Dims broadcast; one shuffle for the
    fact-fact join, one for the final aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    # Pre-aggregate lineitem to one row per order BEFORE the fact-fact
    # join: o_orderkey is unique in orders, so COUNT(DISTINCT o_orderkey)
    # per group becomes a plain COUNT(*) and the join input shrinks from
    # line-item to order granularity (~4x fewer rows through the shuffle,
    # and no Expand node for the distinct) — same result, cheaper plan.
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("order_rev")
    )
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(
            F.round(F.sum("order_rev"), 0).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("region_name", "nation_name", "order_year")
    )


# ---------------------------------------------------------------------------
# SQL gateway (SURVEY.md §3.5 entry point 2: plain SQL over layer views).
# ---------------------------------------------------------------------------

SQL_REPORT = """
    WITH rev AS (
        SELECT c_mktsegment AS segment,
               CAST(year(o_orderdate) AS INTEGER) AS yr,
               sum(o_totalprice) AS revenue,
               count(*)          AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2
    )
    SELECT segment, yr,
           round(revenue, 0) AS revenue,
           CAST(n_orders AS BIGINT) AS n_orders,
           round(revenue / sum(revenue) OVER (PARTITION BY yr), 6) AS share_of_year
    FROM rev
    ORDER BY segment, yr
"""


@REG.add("sql_gateway_report", oracle=SQL_REPORT)
def sql_gateway_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL entry point (SURVEY.md §3.5): layer outputs are
    registered as temp views and the report is EXECUTED AS SQL TEXT via
    ``spark.sql`` — parser -> analyzer -> Catalyst -> same physical
    engine as the DataFrame API. The oracle is the *identical string*
    (dialect-portable subset), so this also pins that our SQL surface
    stays ANSI enough for a reference user to bring their queries
    unchanged."""
    for t in ("orders", "customer"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(SQL_REPORT)


@REG.add(
    "join_full_outer",
    oracle="""
    WITH profiles AS (
        SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 7000
    ),
    spend AS (
        SELECT o_custkey, sum(o_totalprice) AS total_1997
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY o_custkey
    )
    SELECT coalesce(c_custkey, o_custkey)          AS custkey,
           CASE WHEN c_custkey IS NULL THEN 0 ELSE 1 END AS has_profile,
           CASE WHEN o_custkey IS NULL THEN 0 ELSE 1 END AS has_spend,
           round(coalesce(c_acctbal, 0), 2)        AS acctbal,
           round(coalesce(total_1997, 0), 2)       AS total_1997
    FROM profiles FULL OUTER JOIN spend ON c_custkey = o_custkey
    ORDER BY custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (the reconciliation shape: rows present on either
    side survive, with null indicators): high-balance customer profiles
    against 1997 spend. Full outer can never broadcast (both sides must
    be preserved) — it is always a shuffle join on the key, which is
    why reconciliation jobs at 100 TB pre-aggregate both sides first,
    as here (spend is one row per customer before the join)."""
    profiles = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 7000)
        .select("c_custkey", "c_acctbal")
    )
    spend = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("total_1997"))
    )
    j = profiles.join(spend, profiles.c_custkey == spend.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.when(F.col("c_custkey").isNull(), 0).otherwise(1).alias("has_profile"),
        F.when(F.col("o_custkey").isNull(), 0).otherwise(1).alias("has_spend"),
        F.round(F.coalesce("c_acctbal", F.lit(0.0)), 2).alias("acctbal"),
        F.round(F.coalesce("total_1997", F.lit(0.0)), 2).alias("total_1997"),
    ).orderBy("custkey")


ASOF_TOLERANCE_SECONDS = 6 * 3600


@REG.add(
    "join_asof_tolerance",
    oracle=f"""
    SELECT p.event_id,
           p.user_id,
           strftime(p.ts, '{TS_FMT_DUCK}') AS purchase_ts,
           CASE WHEN p.ts IS NULL OR e.ts IS NULL
                  OR epoch_us(p.ts) - epoch_us(e.ts)
                     > {ASOF_TOLERANCE_SECONDS * 1_000_000}
                THEN NULL
                ELSE strftime(e.ts, '{TS_FMT_DUCK}') END AS last_error_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error'
                    AND ts IS NOT NULL AND user_id IS NOT NULL) e
      ON p.user_id = e.user_id AND e.ts <= p.ts
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-staleness as-of join (pandas ``merge_asof(tolerance=...)``
    semantics): each purchase gets the user's most recent error at-or-
    before it ONLY if that error is within 6 hours — older matches are
    NULLed, because a too-stale reading is worse than none (price/sensor
    lookups, feature freshness SLAs). Same single-shuffle window
    emulation as ``join_asof_events`` (``operators/asof.py``); the bound
    rides the existing forward-fill as one extra carried column and a
    null-gate — no second shuffle, no range join."""
    events = _t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = events.filter(F.col("event_type") == "error").select("user_id", "ts")
    joined = asof_join(
        purchases,
        errors.withColumn("error_ts", F.col("ts")).select("user_id", "ts", "error_ts"),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["error_ts"],
        suffix="",
        tolerance_seconds=ASOF_TOLERANCE_SECONDS,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT_SPARK).alias("purchase_ts"),
        F.date_format("error_ts", TS_FMT_SPARK).alias("last_error_ts"),
    )


@REG.add(
    "join_null_safe",
    oracle="""
    WITH left_side AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS seg_key
        FROM customer
    ),
    dim AS (
        SELECT DISTINCT seg_key,
               coalesce(seg_key, 'UNSEGMENTED') AS seg_label
        FROM left_side
    )
    SELECT d.seg_label,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM left_side l JOIN dim d ON l.seg_key IS NOT DISTINCT FROM d.seg_key
    GROUP BY d.seg_label ORDER BY d.seg_label
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): rows whose
    join key is NULL still pair up, where a plain equi-join silently
    drops them — the semantic trap in any enrichment join over a
    nullable foreign key (here: customers whose segment is unknown
    still land in an 'UNSEGMENTED' dim bucket instead of vanishing
    from the mart). ``<=>`` stays a hash-joinable equality predicate
    in Catalyst (EqualNullSafe is a valid shuffle/broadcast hash key,
    NULL hashing to its own bucket) — same plan shape and cost as the
    plain join, so the correctness fix is free at 100 TB. NOTE the
    skew caveat: every NULL row hashes to ONE bucket, so a
    mostly-null key wants the `join_salted_skew` treatment."""
    c = load_table(spark, sf_dir, "customer")
    left = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg_key"),
    )
    dim = left.select("seg_key").distinct().select(
        "seg_key", F.coalesce("seg_key", F.lit("UNSEGMENTED")).alias("seg_label")
    )
    return (
        left.join(F.broadcast(dim), left["seg_key"].eqNullSafe(dim["seg_key"]))
        .groupBy("seg_label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .orderBy("seg_label")
    )


SCD2_PIT_SWITCH_TS = "1995-06-01 00:00:00"


@REG.add(
    "join_scd2_point_in_time",
    oracle=f"""
    WITH dim AS (
        SELECT c_custkey, c_mktsegment AS segment,
               TIMESTAMP '1990-01-01 00:00:00' AS valid_from,
               CASE WHEN c_custkey % 3 = 0
                    THEN TIMESTAMP '{SCD2_PIT_SWITCH_TS}' END AS valid_to
        FROM customer
        UNION ALL
        SELECT c_custkey, 'MACHINERY',
               TIMESTAMP '{SCD2_PIT_SWITCH_TS}', NULL
        FROM customer WHERE c_custkey % 3 = 0
    )
    SELECT d.segment,
           CAST(count(*) AS BIGINT)      AS n_orders,
           round(sum(o.o_totalprice), 0) AS revenue
    FROM orders o
    JOIN dim d
      ON o.o_custkey = d.c_custkey
     AND d.valid_from <= o.o_orderdate
     AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
    GROUP BY d.segment ORDER BY d.segment
    """,
)
def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The READ side of SCD Type-2 — the point-in-time join:
    each fact row joins the dimension VERSION that was valid at the
    fact's own timestamp (``valid_from <= ts < valid_to``), so history
    reports attribute facts as the world was, not as it is
    (``scd2_dimension_upsert`` writes these versions; this is how they
    are consumed). Plan shape: an EQUI hash join on the dimension key
    carries the whole cost — the validity predicate filters the ≤
    version-count-per-key joined rows afterward, so cost tracks
    (facts × avg versions/key), never a range-join blowup; an SCD2 dim
    is broadcastable exactly like its Type-1 projection. Orders before
    the 1995 segment switch resolve to the original segment, later
    ones to MACHINERY — the oracle totals prove temporal resolution,
    not just join cardinality."""
    c = load_table(spark, sf_dir, "customer")
    switch = F.lit(SCD2_PIT_SWITCH_TS).cast("timestamp")
    v1 = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1990-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.when(F.col("c_custkey") % 3 == 0, switch).alias("valid_to"),
    )
    v2 = c.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.lit("MACHINERY").alias("segment"),
        switch.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(
            F.broadcast(dim),
            (o["o_custkey"] == dim["c_custkey"])
            & (dim["valid_from"] <= o["o_orderdate"])
            & (dim["valid_to"].isNull() | (o["o_orderdate"] < dim["valid_to"])),
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 0).alias("revenue"),
        )
        .orderBy("segment")
    )


@REG.add(
    "subquery_not_exists_vs_not_in",
    oracle="""
    WITH probe AS (
        SELECT CASE WHEN c_custkey % 50 = 0 THEN NULL ELSE c_custkey END AS k
        FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    SELECT 'not_exists' AS variant,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM probe p WHERE p.k = c.c_custkey)
    UNION ALL
    SELECT 'not_in', CAST(count(*) AS BIGINT)
    FROM customer c
    WHERE c.c_custkey NOT IN (SELECT k FROM probe)
    ORDER BY variant
    """,
)
def subquery_not_exists_vs_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN null trap, demonstrated side by side: against a probe
    list CONTAINING A NULL, ``NOT EXISTS`` excludes exactly the matched
    keys (planned as a clean left-anti hash join), while SQL-standard
    ``NOT IN`` returns ZERO rows — ``k <> NULL`` is UNKNOWN for every
    candidate, so no row can prove membership-absence. Both engines
    implement the standard, so the oracle pins the trap itself; the
    plan difference is the scale story — NOT IN with a nullable probe
    forces a null-aware anti join (broadcast-only in Spark: the whole
    probe must be visible to every task), where NOT EXISTS stays an
    ordinary shuffle-able anti join. Rewrite-to-NOT-EXISTS (or filter
    the NULLs) is the fix this entry documents."""
    c = load_table(spark, sf_dir, "customer")
    probe = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.when(F.col("c_custkey") % 50 == 0, F.lit(None))
        .otherwise(F.col("c_custkey"))
        .alias("k")
    )
    c.createOrReplaceTempView("pes_cust_ne")
    probe.createOrReplaceTempView("pes_probe_ne")
    return spark.sql(
        """
        SELECT 'not_exists' AS variant, CAST(count(*) AS BIGINT) AS n_customers
        FROM pes_cust_ne c
        WHERE NOT EXISTS (SELECT 1 FROM pes_probe_ne p WHERE p.k = c.c_custkey)
        UNION ALL
        SELECT 'not_in', CAST(count(*) AS BIGINT)
        FROM pes_cust_ne c
        WHERE c.c_custkey NOT IN (SELECT k FROM pes_probe_ne)
        ORDER BY variant
        """
    )


@REG.add(
    "join_bloom_prune",
    oracle="""
    SELECT l_linestatus,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 0) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
      AND o_orderdate >= DATE '1996-01-01'
      AND o_orderdate <  DATE '1996-07-01'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def join_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning (semi-join reduction): the
    selective predicate lives on ``orders`` but the bytes live in
    ``lineitem`` — a plain shuffle join moves ALL of lineitem before the
    join discards ~90% of it. Catalyst's runtime row-level filter builds
    a bloom filter over the filtered build-side join keys and injects
    ``might_contain(l_orderkey)`` into the lineitem SCAN, so pruned rows
    never enter the shuffle. This is THE 100 TB lever for
    fact-to-filtered-dim joins that outgrow broadcast: shuffle bytes
    drop by the predicate's selectivity for the cost of one ~MB bloom
    broadcast. Locally the filtered side is broadcastable so Spark
    plans BHJ (also shuffle-free — same destination, smaller mechanism);
    the bloom-injection plan itself is pinned under forced-shuffle confs
    in ``tests/test_plans.py::test_runtime_bloom_filter_injected``. The
    confs set here are session-safe: injection self-gates on build-side
    size/selectivity, so enabling it cannot regress other plans."""
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    # Injection also requires the APPLICATION side to look big enough to
    # be worth filtering; local fixtures are far below the 10 GB default.
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("date"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0).alias(
                "revenue"
            ),
        )
        .orderBy("l_linestatus")
    )


@REG.add(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE edges AS (
        SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
        FROM orders o
        JOIN customer c ON o.o_custkey  = c.c_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN supplier s ON l.l_suppkey  = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey
          AND o.o_orderpriority = '1-URGENT'
          AND o.o_totalprice > 200000
    ),
    reach(dst, hop) AS (
        SELECT dst, 1 AS hop FROM edges WHERE src = 0
        UNION ALL
        SELECT e.dst, r.hop + 1
        FROM reach r JOIN edges e ON r.dst = e.src
        WHERE r.hop < 3
    )
    SELECT n.n_name,
           CAST(min(r.hop) AS BIGINT) AS min_hops
    FROM reach r JOIN nation n ON n.n_nationkey = r.dst
    GROUP BY n.n_name ORDER BY n.n_name
    """,
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.0+): BFS reachability over the directed
    trade graph — minimum hops from nation 0 through high-value urgent
    order flows, the transitive-closure query class (bill-of-materials,
    org rollups, lineage chase) that previously forced a driver-side
    loop of joins (the ``connected_components`` shape). The engine
    executes each recursion step as a distributed join against the
    previous frontier; the hop guard bounds depth exactly like the
    iteration cap in ``operators/components.py``. Frontier dedup
    (min-per-node) happens in the final aggregate; at 100 TB you would
    aggregate per step instead (semi-naive evaluation) to stop frontier
    re-expansion — same algebra, one extra groupBy inside the loop."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE edges AS (
            SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
            FROM orders o
            JOIN customer c ON o.o_custkey  = c.c_custkey
            JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            JOIN supplier s ON l.l_suppkey  = s.s_suppkey
            WHERE c.c_nationkey <> s.s_nationkey
              AND o.o_orderpriority = '1-URGENT'
              AND o.o_totalprice > 200000
        ),
        reach(dst, hop) AS (
            SELECT dst, 1 AS hop FROM edges WHERE src = 0
            UNION ALL
            SELECT e.dst, r.hop + 1
            FROM reach r JOIN edges e ON r.dst = e.src
            WHERE r.hop < 3
        )
        SELECT n.n_name,
               CAST(min(r.hop) AS BIGINT) AS min_hops
        FROM reach r JOIN nation n ON n.n_nationkey = r.dst
        GROUP BY n.n_name ORDER BY n.n_name
        """
    )


@REG.add(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT)    AS n_items,
           round(sum(l_quantity), 2)   AS total_qty
    FROM lineitem
    WHERE l_discount > 0.05
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0+, the GoogleSQL ``|>`` operator
    chain): the same scan -> filter -> aggregate plan as the classic
    form — pipes are pure syntax, Catalyst sees an identical logical
    plan, so pushdown/pruning/codegen are unchanged. Registered so a
    reference user migrating analyst-written pipe queries knows the
    engine runs them natively; the oracle is the classic-SQL spelling
    of the same query, proving the equivalence."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_discount > 0.05
        |> AGGREGATE count(*) AS n_items, round(sum(l_quantity), 2) AS total_qty
           GROUP BY l_returnflag
        |> ORDER BY l_returnflag
        """
    )


@REG.add(
    "sql_declared_udf",
    oracle="""
    SELECT o_orderpriority,
           round(sum(o_totalprice * 0.19), 0) AS est_margin
    FROM orders
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def sql_declared_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-declared scalar function (Spark 4.0+ ``CREATE FUNCTION ...
    RETURN expr``): business logic shared as a catalog object instead
    of a Python closure — and, unlike a Python UDF, the body is
    INLINED into the plan, so it stays inside whole-stage codegen with
    zero serialization boundary (the fastest kind of 'UDF' there is;
    the Python tier in ``udf_scalar``/``udf_pandas_vec`` exists for
    logic SQL can't express). The oracle inlines the same expression
    by hand, proving the substitution semantics."""
    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION est_margin(x DOUBLE) "
        "RETURNS DOUBLE RETURN x * 0.19"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               round(sum(est_margin(o_totalprice)), 0) AS est_margin
        FROM orders
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


@REG.add(
    "join_lateral_topk",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    WHERE c.c_mktsegment = 'BUILDING'
    ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
    """,
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 orders per customer) — the
    per-row-subquery spelling analysts reach for, supported natively.
    Catalyst DECORRELATES it: the per-customer LIMIT becomes a
    rank-within-partition over one join, i.e. the exact
    ``win_rank_topk_per_group`` plan — no per-row subquery execution
    ever happens, which is why this is safe at 100 TB while a naive
    nested-loop interpretation would be quadratic. Registered so the
    SQL surface parity is explicit; the oracle runs the identical
    statement."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c, LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        WHERE c.c_mktsegment = 'BUILDING'
        ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
        """
    )


@REG.add(
    "join_bucketed_no_shuffle",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 0) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
)
def join_bucketed_no_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucketed co-located join — at 100 TB the single biggest
    shuffle eliminator: both fact tables are written ONCE as bucketed +
    sorted tables on the join key (here 8 buckets on the orderkey), and
    every subsequent join on that key is a bucket-local sort-merge with
    NO Exchange on either side (pinned in tests/test_plans.py; this
    entry pins the RESULT so the driver verifies the bucketed read path
    end-to-end, not just the plan shape). The write amortizes across
    every downstream join — the classic layout investment for a fact
    table joined daily."""
    import os
    import re

    from projetos_etl_spark.scratch import _pid_alive

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    # Table names carry the owner PID (the scratch.py ownership
    # convention, applied to the shared spark-warehouse/): a FIXED name
    # let two concurrent engine processes on one host clobber each
    # other — process A's overwrite deleted bucket files process B's
    # join was mid-scan on (FAILED_READ_FILE, caught by r10's parallel
    # hostile sweeps). Each process writes its own tables; dead owners'
    # leftover warehouse dirs are pruned here (catalog entries die with
    # their in-memory metastore; the DIRECTORIES persist and would
    # otherwise leak a table copy per crashed session).
    pid = os.getpid()
    t_orders, t_li = f"pes_bkt_orders_{pid}", f"pes_bkt_lineitem_{pid}"
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    wpath = jvm.org.apache.hadoop.fs.Path(warehouse)
    fs = wpath.getFileSystem(hconf)
    if fs.exists(wpath):
        for status in fs.listStatus(wpath):
            name = status.getPath().getName()
            m = re.fullmatch(r"pes_bkt_\w+_(\d+)", name)
            if not m:
                continue
            owner = int(m.group(1))
            if owner != pid and not _pid_alive(owner):
                fs.delete(status.getPath(), True)
    for tbl in (t_orders, t_li):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        p = jvm.org.apache.hadoop.fs.Path(f"{warehouse}/{tbl}")
        if fs.exists(p):
            fs.delete(p, True)
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(t_orders)
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(t_li)
    )
    return (
        spark.table(t_li)
        .join(
            spark.table(t_orders),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0
            ).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@REG.add(
    "join_asof_forward",
    oracle=f"""
    SELECT p.event_id,
           p.user_id,
           strftime(p.ts, '{TS_FMT_DUCK}') AS purchase_ts,
           CASE WHEN p.ts IS NULL THEN NULL
                ELSE strftime(e.ts, '{TS_FMT_DUCK}') END AS next_error_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error'
                    AND ts IS NOT NULL AND user_id IS NOT NULL) e
      ON p.user_id = e.user_id AND e.ts >= p.ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each purchase gets the user's next error
    at-or-after it — the "did a failure follow this action" lookup
    (churn analysis, incident attribution). Same single-shuffle window
    emulation as the backward form (``operators/asof.py``), only the
    carry runs over the series reversed in time; DuckDB's ASOF JOIN
    supports the flipped inequality natively."""
    events = _t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = events.filter(F.col("event_type") == "error").select("user_id", "ts")
    joined = asof_join(
        purchases,
        errors.withColumn("error_ts", F.col("ts")).select("user_id", "ts", "error_ts"),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["error_ts"],
        suffix="",
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT_SPARK).alias("purchase_ts"),
        F.date_format("error_ts", TS_FMT_SPARK).alias("next_error_ts"),
    )


@REG.add(
    "sql_star_except",
    oracle="""
    SELECT * EXCLUDE (n_comment)
    FROM (SELECT n_nationkey, n_name, n_regionkey,
                 'x' AS n_comment FROM nation)
    ORDER BY n_nationkey
    """,
)
def sql_star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT * EXCEPT (cols)`` (Spark 4; DuckDB spells it EXCLUDE) —
    the wide-table projection idiom that drops the two audit columns
    from a 400-column feature table without enumerating 398 names.
    Pure syntax over the identical Catalyst projection; column pruning
    still reaches the scan."""
    _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey", F.lit("x").alias("n_comment")
    ).createOrReplaceTempView("pes_star_except")
    return spark.sql(
        "SELECT * EXCEPT (n_comment) FROM pes_star_except ORDER BY n_nationkey"
    )


@REG.add(
    "sql_group_by_all",
    oracle="""
    SELECT o_orderpriority,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           count(*) AS n_orders,
           round(sum(o_totalprice), 0) AS sum_price
    FROM orders
    GROUP BY ALL
    ORDER BY o_orderpriority, order_year
    """,
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` (Spark 3.4+/4; DuckDB native) — groups by every
    non-aggregate select expression, the analyst idiom that keeps wide
    rollups refactor-safe (add a dimension to SELECT and the grouping
    follows). Resolves to the identical hash-aggregate plan as the
    explicit key list."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("pes_gba_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(year(o_orderdate) AS INT) AS order_year,
               count(*) AS n_orders,
               round(sum(o_totalprice), 0) AS sum_price
        FROM pes_gba_orders
        GROUP BY ALL
        ORDER BY o_orderpriority, order_year
        """
    )


@REG.add(
    "sql_lateral_column_alias",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(round(l_discount * 100, 0) AS INTEGER))
               AS net_e4,
           CAST(net_e4 AS DOUBLE) / 10000 AS net,
           CAST(net_e4 * (100 + CAST(round(l_tax * 100, 0) AS INTEGER))
                AS DOUBLE) / 1000000 AS gross
    FROM lineitem
    WHERE l_orderkey < 100
    ORDER BY l_orderkey, l_linenumber
    """,
)
def sql_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases (Spark 3.4+; DuckDB native): a SELECT
    expression refers to a sibling alias (``gross`` built from ``net``)
    instead of repeating the whole subexpression — the incremental-
    derivation idiom that keeps 40-column feature SELECTs readable.
    Catalyst inlines the alias, so the plan is the same single
    projection. ``net_e4`` is referenced by TWO sibling aliases, and
    the arithmetic is integer-exact cents (price_cents * (100-disc) *
    (100+tax)): every derived value is an exact integer divided once,
    so no rounding can tie at a half cent in either engine (the naive
    round(net*(1+tax),2) form diverged on exactly 1 row in 376 — the
    classic boundary-tie lesson, see _core.py conventions)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("pes_lca_lineitem")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100, 0) AS INT))
                   AS net_e4,
               CAST(net_e4 AS DOUBLE) / 10000 AS net,
               CAST(net_e4 * (100 + CAST(round(l_tax * 100, 0) AS INT))
                    AS DOUBLE) / 1000000 AS gross
        FROM pes_lca_lineitem
        WHERE l_orderkey < 100
        ORDER BY l_orderkey, l_linenumber
        """
    )


@REG.add(
    "sql_unpivot_syntax",
    oracle="""
    WITH wide AS (
        SELECT r.r_name,
               count(DISTINCT n.n_nationkey) AS n_nations,
               count(DISTINCT c.c_custkey)   AS n_customers
        FROM region r
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
        GROUP BY r.r_name
    )
    SELECT r_name, 'n_nations' AS metric, n_nations AS value FROM wide
    UNION ALL
    SELECT r_name, 'n_customers', n_customers FROM wide
    ORDER BY r_name, metric
    """,
)
def sql_unpivot_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL ``UNPIVOT`` clause (Spark 3.4+) — the syntax twin of the
    DataFrame ``unpivot_melt`` entry: a per-region wide rollup turned
    tidy (region, metric, value) inside one statement. The oracle spells
    it as the equivalent UNION ALL, which is also exactly what the
    logical plan expands to — no extra shuffle beyond the rollup."""
    _t(spark, sf_dir, "region").createOrReplaceTempView("pes_up_region")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("pes_up_nation")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("pes_up_customer")
    return spark.sql(
        """
        WITH wide AS (
            SELECT r.r_name,
                   count(DISTINCT n.n_nationkey) AS n_nations,
                   count(DISTINCT c.c_custkey)   AS n_customers
            FROM pes_up_region r
            JOIN pes_up_nation n ON n.n_regionkey = r.r_regionkey
            LEFT JOIN pes_up_customer c ON c.c_nationkey = n.n_nationkey
            GROUP BY r.r_name
        )
        SELECT r_name, metric, value
        FROM wide UNPIVOT (value FOR metric IN (n_nations, n_customers))
        ORDER BY r_name, metric
        """
    )


@REG.add(
    "join_asof_nearest",
    oracle=f"""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    e AS (SELECT user_id, ts FROM events WHERE event_type = 'error'
          AND ts IS NOT NULL AND user_id IS NOT NULL),
    back AS (
        SELECT p.event_id, CASE WHEN p.ts IS NULL THEN NULL ELSE e.ts END AS bts
        FROM p ASOF LEFT JOIN e
          ON p.user_id = e.user_id AND e.ts <= p.ts
    ),
    fwd AS (
        SELECT p.event_id, CASE WHEN p.ts IS NULL THEN NULL ELSE e.ts END AS fts
        FROM p ASOF LEFT JOIN e
          ON p.user_id = e.user_id AND e.ts >= p.ts
    )
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '{TS_FMT_DUCK}') AS purchase_ts,
           strftime(CASE
               WHEN bts IS NULL THEN fts
               WHEN fts IS NULL THEN bts
               WHEN epoch_us(p.ts) - epoch_us(bts)
                    <= epoch_us(fts) - epoch_us(p.ts) THEN bts
               ELSE fts END, '{TS_FMT_DUCK}') AS nearest_error_ts,
           CASE
               WHEN bts IS NULL AND fts IS NULL THEN NULL
               WHEN fts IS NULL THEN 'backward'
               WHEN bts IS NULL THEN 'forward'
               WHEN epoch_us(p.ts) - epoch_us(bts)
                    <= epoch_us(fts) - epoch_us(p.ts) THEN 'backward'
               ELSE 'forward' END AS direction
    FROM p
    JOIN back USING (event_id)
    JOIN fwd USING (event_id)
    ORDER BY event_id
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join (pandas ``merge_asof(direction=
    'nearest')`` semantics): each purchase gets the user's closest error
    in either time direction, ties and the missing-side cases resolving
    to backward — the remaining member of the as-of family (backward =
    ``join_asof_events``, forward = ``join_asof_forward``). Composed
    from the SAME single-shuffle window carries as those entries — both
    directions ride one user-keyed sort, then an integer microsecond
    comparison picks the side; no second shuffle, no range join."""
    events = _t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = events.filter(F.col("event_type") == "error").select("user_id", "ts")
    back = asof_join(
        purchases,
        errors.withColumn("bts", F.col("ts")).select("user_id", "ts", "bts"),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["bts"],
        suffix="",
        direction="backward",
    )
    fwd = asof_join(
        purchases,
        errors.withColumn("fts", F.col("ts")).select("user_id", "ts", "fts"),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["fts"],
        suffix="",
        direction="forward",
    ).select("event_id", "fts")
    j = back.join(fwd, "event_id")
    dist_b = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("bts"))
    dist_f = F.unix_micros(F.col("fts")) - F.unix_micros(F.col("ts"))
    nearest = (
        F.when(F.col("bts").isNull(), F.col("fts"))
        .when(F.col("fts").isNull(), F.col("bts"))
        .when(dist_b <= dist_f, F.col("bts"))
        .otherwise(F.col("fts"))
    )
    direction = (
        F.when(F.col("bts").isNull() & F.col("fts").isNull(), F.lit(None))
        .when(F.col("fts").isNull(), F.lit("backward"))
        .when(F.col("bts").isNull(), F.lit("forward"))
        .when(dist_b <= dist_f, F.lit("backward"))
        .otherwise(F.lit("forward"))
    )
    return j.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT_SPARK).alias("purchase_ts"),
        F.date_format(nearest, TS_FMT_SPARK).alias("nearest_error_ts"),
        direction.alias("direction"),
    ).orderBy("event_id")
