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
    # HAVING count(*) > 0 pins the one grouping-sets edge where the
    # engines' NATIVE semantics diverge: on EMPTY input the SQL standard
    # (and DuckDB) emit the global () row, but Spark's Expand-based
    # implementation emits no rows at all. On non-empty input every
    # grouping-set row has count >= 1, so the clause provably changes
    # nothing there — it makes the oracle a true twin of Spark's
    # behavior across all inputs (same clause on the cube /
    # grouping-sets / grouping-id twins).
    oracle="""
    SELECT r_name AS region_name,
           n_name AS nation_name,
           round(sum(c_acctbal), 2) AS total_balance,
           count(*)                 AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    HAVING count(*) > 0
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
    HAVING count(*) > 0
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
    HAVING count(*) > 0
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
    oracle="""
    SELECT c_mktsegment, o_orderpriority AS mode_priority, n
    FROM (
        SELECT c_mktsegment, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY count(*) DESC, o_orderpriority) AS rn
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment, o_orderpriority
    )
    WHERE rn = 1
    ORDER BY c_mktsegment
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode (most frequent value) per group with an explicit tie-break:
    count-then-rank instead of a native mode() aggregate, because
    engines disagree on which tied value mode() returns — spelled out,
    the result is engine-invariant and the plan is still just one
    aggregation plus a window over the (tiny) per-group value counts."""
    from pyspark.sql import Window

    counts = (
        _t(spark, sf_dir, "orders")
        .join(
            F.broadcast(_t(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("n").desc(), "o_orderpriority"
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment", F.col("o_orderpriority").alias("mode_priority"), "n"
        )
        .orderBy("c_mktsegment")
    )


@REG.add(
    "agg_argmax",
    # The struct key (price, orderkey) makes the argmax total-ordered:
    # DuckDB's arg_max can't take a struct key, but MAX over a struct
    # compares lexicographically exactly like Spark's max_by ordering
    # struct, and the FILTER mirrors max_by skipping NULL keys (an
    # unpriced order is not a candidate; an all-NULL-price customer is
    # NULL/NULL on both engines).
    oracle="""
    SELECT o_custkey,
           (max(struct_pack(p := o_totalprice, k := o_orderkey))
                FILTER (WHERE o_totalprice IS NOT NULL)).k AS biggest_order,
           round(max(o_totalprice), 2)                     AS biggest_total
    FROM orders
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg_max / max_by aggregation: each customer's highest-value order
    in ONE aggregation pass — no self-join back onto the max, no window.
    Combinable partial aggregate: the cheapest formulation of "row of
    the max" at any scale.

    r12 (sf_ties): tied prices within a customer made a bare
    ``max_by(o_orderkey, o_totalprice)`` pick whichever tied row its
    partial saw first — nondeterministic across partitionings, and the
    engines disagreed. The ordering key is now the (value, unique-key)
    STRUCT, a total order: highest price, then highest orderkey. The
    ``when`` guard keeps NULL-price rows out of the struct so max_by
    still skips them (a non-NULL struct with a NULL field would rank)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max_by(
                "o_orderkey",
                F.when(
                    F.col("o_totalprice").isNotNull(),
                    F.struct("o_totalprice", "o_orderkey"),
                ),
            ).alias("biggest_order"),
            F.round(F.max("o_totalprice"), 2).alias("biggest_total"),
        )
        .orderBy("o_custkey")
    )


@REG.add(
    "agg_corr_regression",
    oracle="""
    SELECT o_orderstatus,
           round(corr(o_totalprice, o_custkey), 4)        AS price_cust_corr,
           round(covar_samp(o_totalprice, o_custkey), 2)  AS price_cust_covar,
           round(regr_slope(o_totalprice, o_custkey), 6)  AS price_cust_slope,
           CAST(count(*) AS BIGINT)                       AS n
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics (corr / covar_samp / regr_slope) per group —
    single-pass combinable aggregates (each keeps a constant-size moment
    tuple per group), so the 100 TB cost is one scan + one tiny shuffle.
    Rounded because the moment accumulation order differs between Spark
    partials and DuckDB; the statistics are normalized/ratio-scaled so
    4-6 dp is far above the ulp noise."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.corr("o_totalprice", "o_custkey"), 4).alias("price_cust_corr"),
            F.round(F.covar_samp("o_totalprice", "o_custkey"), 2).alias(
                "price_cust_covar"
            ),
            F.round(
                F.expr("regr_slope(o_totalprice, o_custkey)"), 6
            ).alias("price_cust_slope"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderstatus")
    )


@REG.add(
    "agg_collect_sorted",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT)                              AS n_events,
           md5(array_to_string(
               list(event_type ORDER BY ts, event_id)
                   FILTER (WHERE ts IS NOT NULL), ',')) AS seq_md5
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array aggregation: each user's event-type *sequence* (time
    order, event_id tie-break), digested for comparison. Spark's
    collect_list is partition-order-dependent, so the deterministic
    formulation collects (ts, event_id, type) structs and sort_array's
    them AFTER the aggregate — the sequence signature is then engine-
    and partitioning-invariant. This is the behavioral-sequence
    extraction step of session/funnel mining.

    Family-seven convention: an un-timestamped event has no sequence
    position — counted in ``n_events``, absent from the digest (Spark's
    struct sort parks NULL ts first, DuckDB's ORDER BY last; inside a
    fingerprint that is a silent cross-engine hash flip). collect_list
    skips the NULL the ``when`` produces; the oracle mirrors with
    FILTER. A user whose EVERY event is un-timestamped has no sequence
    at all: DuckDB's list(...) FILTER over zero qualifying rows is NULL
    (md5(NULL) = NULL), while Spark's collect_list yields an empty
    array (md5('') = d41d8...), so the digest is gated on a non-empty
    sequence to make both engines emit NULL for a positionless-only
    user (r10 ADVICE)."""
    seq = F.transform(
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("ts").isNotNull(),
                    F.struct("ts", "event_id", "event_type"),
                )
            )
        ),
        lambda s: s["event_type"],
    )
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.when(
                F.size(seq) > 0,
                F.md5(F.array_join(seq, ",").cast("binary")),
            ).alias("seq_md5"),
        )
        .orderBy("user_id")
    )


@REG.add(
    "agg_percentile_approx",
    # The estimate itself can't be value-oracled, but its CONTRACT can
    # (VERDICT r4 #8, same pattern as agg_hll_sketch_rollup): the exact
    # median is pinned, and the claim that the sketch honors its RANK
    # error guarantee is COMPUTED on the Spark side while the oracle
    # pins it true. A broken sketch fails the hash compare. r11 (family
    # eight): the old value-band form compared the estimate against the
    # interpolated 0.495/0.505 quantiles, which for any group with
    # 0.01*(n-1) < 1 — e.g. the NULL-status group the sf_nullcats axis
    # plants — is an interval containing NO data point, so the flag was
    # structurally false on small groups. The contract is now the real
    # one: the estimate's rank interval [cnt_lt+1, cnt_le] must meet
    # the target window 0.5*n +/- (0.001*n + 1) (sketch guarantee plus
    # one rank of discretization), valid at every group size. r12
    # (ADVICE r11): the sketch ranks over NON-NULL prices only, so the
    # target window must too — n is count(o_totalprice), not count(*)
    # (a mostly-NULL-price group would otherwise demand a rank the
    # non-NULL population can't reach), and a group with ZERO non-NULL
    # prices (NULL approx_median — both engines) is vacuously within
    # band: there is no rank contract over an empty population.
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 2) AS exact_median,
           CAST(count(o_totalprice) AS BIGINT) AS n,
           true AS est_within_band
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest percentile sketch (``percentile_approx``) next to the
    exact interpolated percentile — the 100 TB path for quantiles (the
    sketch is map-side mergeable; exact percentile sorts per group).
    The rank-error contract is verified by counting how many of the
    group's values fall strictly below / at-or-below the estimate: one
    groupBy produces the sketch, the tiny (~|distinct status|) result
    broadcast-joins back onto the scan null-safely, and one further
    count aggregate yields the estimate's exact rank interval.
    ``tests/test_aggregate_bounds.py`` additionally asserts the rank
    error against the accuracy parameter at both test scales."""
    orders = _t(spark, sf_dir, "orders")
    est = orders.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", 0.5, 1000).alias("approx_median"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("exact_median"),
        # Non-NULL count: the population the sketch actually ranks over
        # (ADVICE r11 — count(*) would inflate the target rank window
        # wherever prices are NULL-holed).
        F.count("o_totalprice").cast("long").alias("n"),
    )
    # Null-safe re-join (the NULL-status group is a group like any
    # other); rank window check in exact integer/double arithmetic.
    ranked = (
        orders.select("o_orderstatus", "o_totalprice")
        .join(
            F.broadcast(
                est.select(
                    F.col("o_orderstatus").alias("_st"), "approx_median"
                )
            ),
            F.col("o_orderstatus").eqNullSafe(F.col("_st")),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.sum(
                (F.col("o_totalprice") < F.col("approx_median")).cast("long")
            ).alias("_cnt_lt"),
            F.sum(
                (F.col("o_totalprice") <= F.col("approx_median")).cast("long")
            ).alias("_cnt_le"),
        )
    )
    return (
        est.join(
            ranked.withColumnRenamed("o_orderstatus", "_st2"),
            F.col("o_orderstatus").eqNullSafe(F.col("_st2")),
        )
        .select(
            "o_orderstatus",
            "exact_median",
            "n",
            # Vacuous truth for an all-NULL-price group: no estimate,
            # no rank contract (both engines produce NULL approx_median
            # there; the NULL comparisons would otherwise yield NULL
            # against the oracle's pinned true).
            F.when(F.col("approx_median").isNull(), F.lit(True))
            .otherwise(
                (F.col("_cnt_lt") + 1 <= 0.5 * F.col("n") + (0.001 * F.col("n") + 1))
                & (F.col("_cnt_le") >= 0.5 * F.col("n") - (0.001 * F.col("n") + 1))
            )
            .alias("est_within_band"),
        )
        .orderBy("o_orderstatus")
    )


@REG.add(
    "agg_hll_sketch_rollup",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           true AS est_within_5pct
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def agg_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE cardinality sketches — the property that matters at
    100 TB: ``hll_sketch_agg`` builds a per-(event_type, day) Datasketches
    HLL sketch (a small binary), and ``hll_union_agg`` re-aggregates
    those sketches to event_type grain WITHOUT touching the raw rows
    again. That two-level shape is how daily-rollup tables stay
    re-aggregatable to any coarser grain (week/month/all-time) at the
    cost of unioning kilobyte sketches — ``approx_count_distinct``
    alone gives an estimate but not a storable, re-mergeable state.
    The oracle pins the exact per-type distinct count plus the claim
    the merged estimate lands within 5% of it (HLL at default
    lgConfigK=12 is ~1.6% rse; the flag is computed, not assumed —
    a broken merge fails the hash compare).
    """
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.hll_sketch_agg("user_id").alias("sketch"),
            F.countDistinct("user_id").alias("n_day_exact"),
        )
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est"),
    )
    exact = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users_exact"))
    )
    # NULL-safe tier join (family seven, mechanism 3): the UNTYPED
    # group survives GROUP BY on both engines, but a plain equi-join
    # between the two tiers would silently drop it (NULL != NULL) while
    # the single-pass oracle keeps it. Plain aggregation keeps the NULL
    # group — so the internal join must too.
    return (
        exact.join(
            merged, exact["event_type"].eqNullSafe(merged["event_type"])
        )
        .select(
            exact["event_type"],
            "n_users_exact",
            (
                F.abs(F.col("est") - F.col("n_users_exact"))
                / F.col("n_users_exact")
                <= 0.05
            ).alias("est_within_5pct"),
        )
        .orderBy("event_type")
    )


@REG.add(
    "agg_approx_top_k",
    oracle="""
    SELECT event_type AS item, CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1 ORDER BY n_events DESC, item
    """,
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based frequent items via the native ``approx_top_k``
    aggregate (Spark 4): ONE mergeable sketch pass, no full group-by
    materialization — the heavy-hitter primitive for high-cardinality
    keys where ``agg_heavy_hitters``' exact group-by would carry every
    distinct key through the shuffle. The sketch is provably EXACT when
    maxItemsTracked >= the column's true cardinality (here 1000 >>
    ~10 event types), which is what lets an exact SQL oracle verify
    it; at real cardinality the same call degrades gracefully to
    approximate counts with a bounded-memory guarantee. Output is
    re-sorted by (count desc, item) because the sketch's own tie order
    is unspecified."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.agg(F.expr("approx_top_k(event_type, 20, 1000)").alias("top"))
    return (
        sk.select(F.explode("top").alias("e"))
        .select(
            F.col("e.item").alias("item"),
            F.col("e.count").cast("long").alias("n_events"),
        )
        .orderBy(F.desc("n_events"), "item")
    )


@REG.add(
    "agg_filter_clause",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
               AS n_finished,
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 0)
               AS finished_revenue,
           CAST(count(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT)
               AS n_large
    FROM orders GROUP BY 1 ORDER BY priority
    """,
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard FILTER-clause aggregates: several differently-
    conditioned metrics (overall volume, finished-only volume and
    revenue, large-order count) computed in ONE pass over ONE shuffle —
    the pattern that replaces N filtered subquery scans with N
    conditional accumulators. Every FILTER stays inside the same
    partial/final hash aggregate, so adding a segment metric costs one
    register, not one job; this is how dashboard fact rollups stay
    single-scan as the metric list grows."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.expr("count(*) FILTER (WHERE o_orderstatus = 'F')")
            .cast("long")
            .alias("n_finished"),
            F.round(
                F.expr("sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F')"), 0
            ).alias("finished_revenue"),
            F.expr("count(*) FILTER (WHERE o_totalprice > 200000)")
            .cast("long")
            .alias("n_large"),
        )
        .orderBy("priority")
    )


@REG.add(
    "agg_listagg_sorted",
    oracle="""
    SELECT r_name AS region,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           CAST(count(*) AS BIGINT) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY region
    """,
)
def agg_listagg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (`LISTAGG ... WITHIN GROUP`, SQL:2016;
    Spark 4 native) — the denormalized-label column every report and
    entity-resolution explainer needs. The WITHIN GROUP order is what
    makes it deterministic across partitionings (an unordered
    concat_ws(collect_list(...)) silently changes per run — the classic
    wrong-fix). Mind the scale footgun: the aggregate's state is the
    whole group's strings, so at 100 TB this belongs AFTER a top-k or
    bounded-cardinality grouping, never on an unbounded group (here:
    ≤25 nations per region)."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").alias(
                "nations"
            ),
            F.count(F.lit(1)).cast("long").alias("n_nations"),
        )
        .orderBy("region")
    )


@REG.add(
    "agg_mean_family",
    oracle="""
    SELECT p_brand,
           CAST(count(*) AS BIGINT)                       AS n_parts,
           round(avg(p_retailprice), 4)                   AS arith_mean,
           round(exp(avg(ln(p_retailprice))), 4)          AS geo_mean,
           round(count(*) / sum(1.0 / p_retailprice), 4)  AS harm_mean
    FROM part WHERE p_retailprice > 0
    GROUP BY p_brand ORDER BY p_brand
    """,
)
def agg_mean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three Pythagorean means per group in one pass: arithmetic,
    geometric (exp∘avg∘ln — the right average for ratios and the
    aggregate behind composite eval scores like BLEU), and harmonic
    (n/Σ(1/x) — the right average for rates). All three reduce to
    plain sum/count accumulators under a log/reciprocal projection, so
    the whole family stays ONE map-combinable hash aggregate — no
    second pass, no window. Zero/negative inputs are excluded up front
    (ln and 1/x are undefined there) and that predicate pushes to the
    scan."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_retailprice") > 0)
    return (
        p.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("arith_mean"),
            F.round(F.exp(F.avg(F.log("p_retailprice"))), 4).alias("geo_mean"),
            F.round(
                F.count(F.lit(1)) / F.sum(1.0 / F.col("p_retailprice")), 4
            ).alias("harm_mean"),
        )
        .orderBy("p_brand")
    )


@REG.add(
    "agg_bitwise",
    oracle="""
    SELECT p_brand,
           CAST(bit_and(p_size) AS BIGINT) AS size_and,
           CAST(bit_or(p_size) AS BIGINT)  AS size_or,
           CAST(bit_xor(p_size) AS BIGINT) AS size_xor,
           CAST(count(*) AS BIGINT)        AS n_parts
    FROM part GROUP BY p_brand ORDER BY p_brand
    """,
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate family (bit_and / bit_or / bit_xor) — the
    flag-column rollup: OR accumulates 'any row has capability X', AND
    'every row has it', XOR parity-checks. All three are commutative,
    associative single-word accumulators — the cheapest mergeable
    aggregates that exist — so flag rollups over 100 TB cost exactly
    one map-combinable pass with 8 bytes of state per group per
    function."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand")
        .agg(
            F.expr("bit_and(p_size)").cast("long").alias("size_and"),
            F.expr("bit_or(p_size)").cast("long").alias("size_or"),
            F.expr("bit_xor(p_size)").cast("long").alias("size_xor"),
            F.count(F.lit(1)).cast("long").alias("n_parts"),
        )
        .orderBy("p_brand")
    )


@REG.add(
    "agg_weighted_median",
    oracle="""
    WITH g AS (
        SELECT l_returnflag, l_extendedprice AS price,
               sum(l_quantity) AS w
        FROM lineitem GROUP BY 1, 2
    ),
    c AS (
        SELECT l_returnflag, price,
               sum(w) OVER (PARTITION BY l_returnflag ORDER BY price) AS cum,
               sum(w) OVER (PARTITION BY l_returnflag)                AS tot
        FROM g
    )
    SELECT l_returnflag, round(min(price), 2) AS weighted_median
    FROM c WHERE cum >= tot / 2
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median (price weighted by quantity) per group —
    the robust 'typical unit price' a mean can't give when a few huge
    line items dominate. Distributed shape: pre-aggregate weights by
    (group, value) FIRST (mergeable hash agg — the shuffle then carries
    one row per distinct value, not one per input row), then a single
    window sort per group turns cumulative weight into the median pick.
    At 100 TB the distinct-value set per group is the binding quantity;
    when the value domain is unbounded (continuous measures), swap the
    exact window stage for ``percentile_approx`` — the pre-aggregation
    stage and the cum-weight>=half rule are unchanged."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy(
        "l_returnflag", F.col("l_extendedprice").alias("price")
    ).agg(F.sum("l_quantity").alias("w"))
    wo = Window.partitionBy("l_returnflag").orderBy("price")
    wp = Window.partitionBy("l_returnflag")
    c = g.select(
        "l_returnflag",
        "price",
        F.sum("w").over(wo).alias("cum"),
        F.sum("w").over(wp).alias("tot"),
    )
    return (
        c.filter(F.col("cum") >= F.col("tot") / 2)
        .groupBy("l_returnflag")
        .agg(F.round(F.min("price"), 2).alias("weighted_median"))
        .orderBy("l_returnflag")
    )


@REG.add(
    "agg_grouping_id",
    oracle="""
    SELECT o_orderstatus,
           o_orderpriority,
           CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           CASE grouping(o_orderstatus, o_orderpriority)
                WHEN 0 THEN 'cell' WHEN 1 THEN 'status_total'
                WHEN 2 THEN 'priority_total' ELSE 'grand_total' END AS level,
           CAST(count(*) AS BIGINT)        AS n_orders,
           round(sum(o_totalprice), 0)     AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    HAVING count(*) > 0
    ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``grouping_id()`` level labeling over a CUBE: the bitmask that
    tells subtotal rows apart from data cells whose key value happens
    to be NULL — the only correct way to consume multi-level rollup
    output downstream (filtering on ``key IS NULL`` misattributes real
    NULL groups). Same single Expand + hash-agg plan as ``agg_cube``;
    the id is computed from the Expand's grouping bitvector, zero
    extra shuffle or pass."""
    o = load_table(spark, sf_dir, "orders")
    gid = F.grouping_id()
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            gid.cast("long").alias("gid"),
            F.when(gid == 0, "cell")
            .when(gid == 1, "status_total")
            .when(gid == 2, "priority_total")
            .otherwise("grand_total")
            .alias("level"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 0).alias("total_price"),
        )
        .orderBy(
            "gid",
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@REG.add(
    "agg_moments_family",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               count(*)                  AS n,
               avg(l_quantity)           AS mu,
               sum(l_quantity * l_quantity)                            AS s2,
               sum(l_quantity * l_quantity * l_quantity)               AS s3,
               sum(l_quantity * l_quantity * l_quantity * l_quantity)  AS s4,
               sum(l_quantity)           AS s1
        FROM lineitem GROUP BY 1
    ),
    c AS (
        SELECT l_returnflag, n, mu,
               (s2 - n * mu * mu) / n                                    AS m2,
               (s3 - 3 * mu * s2 + 3 * mu * mu * s1 - n * mu * mu * mu)  AS cm3,
               (s4 - 4 * mu * s3 + 6 * mu * mu * s2
                   - 4 * mu * mu * mu * s1 + n * mu * mu * mu * mu)      AS cm4
        FROM m
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT)                              AS n_rows,
           round(mu, 4)                                   AS mean_qty,
           round(sqrt(m2), 4)                             AS std_pop,
           round((cm3 / n) / nullif(pow(m2, 1.5), 0), 4)  AS skewness,
           round((cm4 / n) / nullif(m2 * m2, 0) - 3, 4)   AS kurtosis_excess
    FROM c ORDER BY l_returnflag
    """,
)
def agg_moments_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third and fourth standardized moments (skewness, excess
    kurtosis) from raw power sums — the tail-shape profile a feature
    audit wants next to mean/std. Built from sum(x), sum(x^2..x^4) so
    the whole family is ONE map-combinable hash aggregate (5 doubles of
    state per group, mergeable across 1000 executors by addition);
    the central-moment algebra happens on the one-row-per-group result.
    The same formula runs verbatim in the oracle — engine built-ins
    disagree on bias correction (sample vs population), raw power sums
    don't. Population definitions; excess kurtosis (normal = 0); a
    zero-variance group yields NULL via nullif (ANSI mode would
    otherwise raise on the division)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(q).alias("mu"),
        F.sum(q * q).alias("s2"),
        F.sum(q * q * q).alias("s3"),
        F.sum(q * q * q * q).alias("s4"),
        F.sum(q).alias("s1"),
    )
    n, mu = F.col("n"), F.col("mu")
    m2 = (F.col("s2") - n * mu * mu) / n
    cm3 = F.col("s3") - 3 * mu * F.col("s2") + 3 * mu * mu * F.col("s1") - n * mu * mu * mu
    cm4 = (
        F.col("s4")
        - 4 * mu * F.col("s3")
        + 6 * mu * mu * F.col("s2")
        - 4 * mu * mu * mu * F.col("s1")
        + n * mu * mu * mu * mu
    )
    return m.select(
        "l_returnflag",
        n.cast("long").alias("n_rows"),
        F.round(mu, 4).alias("mean_qty"),
        F.round(F.sqrt(m2), 4).alias("std_pop"),
        F.round((cm3 / n) / F.nullif(F.pow(m2, 1.5), F.lit(0.0)), 4).alias("skewness"),
        F.round((cm4 / n) / F.nullif(m2 * m2, F.lit(0.0)) - 3, 4).alias("kurtosis_excess"),
    ).orderBy("l_returnflag")


@REG.add(
    "agg_pareto_concentration",
    oracle="""
    WITH spend AS (
        SELECT c.c_mktsegment AS segment, o.o_custkey AS custkey,
               CAST(round(round(sum(o.o_totalprice), 2) * 100, 0) AS BIGINT)
                   AS spend_c
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT segment, custkey, spend_c,
               sum(spend_c) OVER (PARTITION BY segment
                                  ORDER BY spend_c DESC, custkey) AS cum_c,
               row_number() OVER (PARTITION BY segment
                                  ORDER BY spend_c DESC, custkey) AS rk
        FROM spend
    ),
    tot AS (
        SELECT segment, custkey, spend_c, cum_c, rk,
               max(cum_c) OVER (PARTITION BY segment) AS total_c
        FROM ranked
    )
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN 10 * (cum_c - spend_c) < 8 * total_c
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_top80,
           round(sum(CASE WHEN rk <= 10 THEN spend_c ELSE 0 END) / max(total_c), 6)
               AS top10_share
    FROM tot GROUP BY segment ORDER BY segment
    """,
)
def agg_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC concentration audit: per market segment, how many
    customers carry 80% of revenue, and the top-10 share — the
    skew-awareness report that decides whether a key needs salting
    before it ever burns a 100 TB shuffle (the same heavy-hitter shape
    `graph_degree_stats` reads off the purchase graph). Plan: one
    grouped sum, one window sort per segment over the CUSTOMER-grain
    rows (already reduced — never the raw facts), then a one-row-per-
    segment aggregate. The cumulative threshold compare is integer-
    exact: per-customer spend is fixed to BIGINT cents before the
    window, so the running sum folds identically in both engines
    regardless of how each associates float additions (a double
    running sum put the 80% boundary on an ulp coin-flip — ADVICE r4);
    the 0.8 threshold becomes the integer compare 10*(cum-spend) <
    8*total."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    spend = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), F.col("o_custkey").alias("custkey"))
        .agg(
            F.round(F.round(F.sum("o_totalprice"), 2) * 100, 0)
            .cast("long")
            .alias("spend_c")
        )
    )
    wo = Window.partitionBy("segment").orderBy(F.col("spend_c").desc(), "custkey")
    wp = Window.partitionBy("segment")
    ranked = spend.select(
        "segment",
        "custkey",
        "spend_c",
        F.sum("spend_c").over(wo).alias("cum_c"),
        F.row_number().over(wo).alias("rk"),
    ).withColumn("total_c", F.max("cum_c").over(wp))
    return (
        ranked.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum(
                (10 * (F.col("cum_c") - F.col("spend_c")) < 8 * F.col("total_c")).cast(
                    "int"
                )
            )
            .cast("long")
            .alias("n_top80"),
            F.round(
                F.sum(F.when(F.col("rk") <= 10, F.col("spend_c")).otherwise(F.lit(0)))
                / F.max("total_c"),
                6,
            ).alias("top10_share"),
        )
        .orderBy("segment")
    )


@REG.add(
    "agg_trimmed_mean",
    oracle="""
    WITH cuts AS (
        SELECT o_orderpriority AS priority,
               quantile_cont(o_totalprice, 0.1) AS lo,
               quantile_cont(o_totalprice, 0.9) AS hi
        FROM orders GROUP BY 1
    )
    SELECT c.priority,
           CAST(count(*) AS BIGINT)        AS n_all,
           CAST(sum(CASE WHEN o.o_totalprice >= c.lo AND o.o_totalprice <= c.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(avg(o.o_totalprice), 2)   AS mean_raw,
           round(avg(CASE WHEN o.o_totalprice >= c.lo AND o.o_totalprice <= c.hi
                          THEN o.o_totalprice END), 2) AS mean_trimmed
    FROM orders o JOIN cuts c ON o.o_orderpriority = c.priority
    GROUP BY c.priority ORDER BY c.priority
    """,
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-90 trimmed mean per group next to the raw mean — the robust
    eval-metric aggregate (a handful of degenerate outliers moves a raw
    benchmark average; the trimmed one ignores both tails). Two passes
    over one broadcast-joined fence table, exactly the
    ``quality_outlier_iqr`` economics: the fence aggregate is the only
    shuffle, facts re-join by broadcast. Cut points are percentiles of
    the RAW column (verified bit-identical across engines — derived-
    value percentiles are the ones that diverge, see
    ``quality_outlier_mad``); the trimmed mean averages inside [lo, hi]
    inclusively so kept rows are an exact data-defined set."""
    o = load_table(spark, sf_dir, "orders")
    cuts = o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.expr("percentile(o_totalprice, 0.1)").alias("lo"),
        F.expr("percentile(o_totalprice, 0.9)").alias("hi"),
    )
    kept = (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") <= F.col("hi"))
    return (
        o.join(F.broadcast(cuts), o["o_orderpriority"] == cuts["priority"])
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_all"),
            F.sum(kept.cast("int")).cast("long").alias("n_kept"),
            F.round(F.avg("o_totalprice"), 2).alias("mean_raw"),
            F.round(F.avg(F.when(kept, F.col("o_totalprice"))), 2).alias("mean_trimmed"),
        )
        .orderBy("priority")
    )


@REG.add(
    "agg_gini_coefficient",
    oracle="""
    WITH ranked AS (
        SELECT c_mktsegment AS segment,
               c_acctbal - min(c_acctbal) OVER (PARTITION BY c_mktsegment) AS x,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal, c_custkey) AS i,
               count(*) OVER (PARTITION BY c_mktsegment) AS n
        FROM customer
    )
    SELECT segment,
           CAST(max(n) AS BIGINT) AS n_rows,
           round(sum((2.0 * i - n - 1) * x) / (max(n) * nullif(sum(x), 0)), 6)
               AS gini
    FROM ranked GROUP BY segment ORDER BY segment
    """,
)
def agg_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient per group (0 = perfectly even, 1 = one member
    holds everything) via the rank formula
    ``sum((2i - n - 1) * x) / (n * sum(x))`` — the single-number
    inequality measure that complements ``agg_pareto_concentration``'s
    cutoff counts and ``quality_entropy_profile``'s categorical
    balance. Values are shifted non-negative per group (Gini is
    defined on non-negative quantities; account balances go negative)
    by subtracting the group minimum. Cost: one window sort per group
    over the grouping key's shuffle — the same single-exchange shape
    as every keyed window; the i*x products fold map-side in the final
    hash aggregate. Deterministic: ties rank by the unique customer
    key, identically in both engines."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    wp = Window.partitionBy("c_mktsegment")
    wo = wp.orderBy("c_acctbal", "c_custkey")
    ranked = c.select(
        F.col("c_mktsegment").alias("segment"),
        (F.col("c_acctbal") - F.min("c_acctbal").over(wp)).alias("x"),
        F.row_number().over(wo).alias("i"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    return (
        ranked.groupBy("segment")
        .agg(
            F.max("n").cast("long").alias("n_rows"),
            F.round(
                F.sum((2.0 * F.col("i") - F.col("n") - 1) * F.col("x"))
                / (F.max("n") * F.nullif(F.sum("x"), F.lit(0.0))),
                6,
            ).alias("gini"),
        )
        .orderBy("segment")
    )


@REG.add(
    "agg_histogram_2d",
    oracle="""
    SELECT CAST(floor(l_quantity / 10) AS BIGINT)           AS qty_bin,
           CAST(floor(l_extendedprice / 10000) AS BIGINT)   AS price_bin,
           CAST(count(*) AS BIGINT)                         AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 0) AS revenue
    FROM lineitem
    GROUP BY 1, 2
    ORDER BY qty_bin, price_bin
    """,
)
def agg_histogram_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D histogram (heatmap binning): quantity x price cells with
    count and revenue — the joint-distribution profile behind every
    density heatmap and the binned sketch a BI layer renders instead of
    600 k raw points. Binning is two integer floor-divisions in the
    projection, so the whole thing is ONE map-combinable hash aggregate
    whose state is O(occupied cells) — at 100 TB the cell grid, not the
    row count, bounds memory, and the same cells re-aggregate to
    coarser grids without rescanning facts (the bitmap/HLL tier
    argument, applied to density)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.floor(F.col("l_quantity") / 10).cast("long").alias("qty_bin"),
            F.floor(F.col("l_extendedprice") / 10000).cast("long").alias("price_bin"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0).alias(
                "revenue"
            ),
        )
        .orderBy("qty_bin", "price_bin")
    )


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@REG.add(
    "agg_corr_matrix",
    # corr from raw moments: (n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx^2) *
    # sqrt(n*Syy - Sy^2)) — one scan collects every sum, the matrix is
    # assembled from the single stats row. Engine float-order noise in
    # the sums is ~1e-15 relative, 9 orders below the 6dp rounding.
    oracle="""
    WITH s AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               sum(l_quantity) AS s1, sum(l_extendedprice) AS s2,
               sum(l_discount) AS s3, sum(l_tax) AS s4,
               sum(l_quantity * l_quantity) AS q11,
               sum(l_extendedprice * l_extendedprice) AS q22,
               sum(l_discount * l_discount) AS q33,
               sum(l_tax * l_tax) AS q44,
               sum(l_quantity * l_extendedprice) AS q12,
               sum(l_quantity * l_discount) AS q13,
               sum(l_quantity * l_tax) AS q14,
               sum(l_extendedprice * l_discount) AS q23,
               sum(l_extendedprice * l_tax) AS q24,
               sum(l_discount * l_tax) AS q34
        FROM lineitem
    )
    SELECT col_x, col_y,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
               AS corr,
           CAST(n AS BIGINT) AS n_rows
    FROM (
        SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
               n, s1 AS sx, s2 AS sy, q11 AS sxx, q22 AS syy, q12 AS sxy FROM s
        UNION ALL SELECT 'l_quantity', 'l_discount',
               n, s1, s3, q11, q33, q13 FROM s
        UNION ALL SELECT 'l_quantity', 'l_tax',
               n, s1, s4, q11, q44, q14 FROM s
        UNION ALL SELECT 'l_extendedprice', 'l_discount',
               n, s2, s3, q22, q33, q23 FROM s
        UNION ALL SELECT 'l_extendedprice', 'l_tax',
               n, s2, s4, q22, q44, q24 FROM s
        UNION ALL SELECT 'l_discount', 'l_tax',
               n, s3, s4, q33, q44, q34 FROM s
    )
    ORDER BY col_x, col_y
    """,
)
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the lineitem measures in
    ONE corpus pass — the feature-selection / multicollinearity audit
    that precedes model training. All 15 raw moments (4 sums, 4 sum-of-
    squares, 6 cross-products, count) come from a single partial-
    aggregated reduce; the 6-pair matrix is assembled from that one
    stats row (a 1-row broadcast, no second scan). The same moments are
    mergeable, so at 100 TB this is a map-side-combined single shuffle
    of one row per partition."""
    li = _t(spark, sf_dir, "lineitem")
    cols = _CORR_COLS
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for i, a in enumerate(cols):
        aggs.append(F.sum(F.col(a)).alias(f"s{i}"))
        for j, b in enumerate(cols):
            if i <= j:
                aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"q{i}{j}"))
    # ONE job collects the single stats row (bounded driver state: 15
    # doubles) — unioning 6 selects over the agg subplan instead would
    # replan the scan per branch (measured: 12 FileScans, 0 reuse).
    s = li.agg(*aggs).collect()[0].asDict()
    pair_rows = [
        (a, b, s["n"], s[f"s{i}"], s[f"s{j}"], s[f"q{i}{i}"], s[f"q{j}{j}"], s[f"q{i}{j}"])
        for i, a in enumerate(cols)
        for j, b in enumerate(cols)
        if i < j
    ]
    pairs = spark.createDataFrame(
        pair_rows,
        "col_x string, col_y string, n double, sx double, sy double, "
        "sxx double, syy double, sxy double",
    )
    # corr + rounding computed as Spark column expressions so the
    # HALF_UP semantics match the oracle exactly.
    return pairs.select(
        "col_x",
        "col_y",
        # try_divide: a zero variance (single-row or constant column)
        # makes the correlation undefined -> NULL, matching the SQL
        # twin's x/0 -> NULL instead of an ANSI DIVIDE_BY_ZERO.
        F.round(
            F.try_divide(
                F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"),
                F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")),
            ),
            6,
        ).alias("corr"),
        F.col("n").cast("long").alias("n_rows"),
    ).orderBy("col_x", "col_y")


#: CountMinSketch params: eps (additive error <= eps*N), confidence, seed.
#: The FIXED seed makes the sketch — and therefore both contract flags —
#: deterministic for a given fixture, not probabilistic across runs.
_CMS_EPS, _CMS_CONF, _CMS_SEED, _CMS_TOP = 0.001, 0.999, 42, 10


@REG.add(
    "agg_count_min_sketch",
    # Same contract-oracle pattern as the HLL/t-digest entries: the
    # exact counts are pinned, the CMS guarantees are COMPUTED Spark-
    # side (never-underestimate is unconditional; the eps*N bound holds
    # with 99.9% confidence per key and is seed-deterministic here —
    # verified at all three fixture scales) and pinned true.
    oracle=f"""
    SELECT l_partkey, CAST(count(*) AS BIGINT) AS exact_n,
           true AS est_ge_exact, true AS est_within_eps
    FROM lineitem GROUP BY l_partkey
    ORDER BY exact_n DESC, l_partkey LIMIT {_CMS_TOP}
    """,
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates beside exact counts — the
    mergeable heavy-hitter sketch for 100 TB streams (fixed-size 2-D
    counter array; map-side partials union by cell-wise add, so one
    pass yields approximate counts for ANY later key probe without
    storing per-key state). The sketch is built distributed
    (``count_min_sketch`` aggregate); only the kilobyte sketch binary
    and the {_CMS_TOP}-row probe set reach the driver."""
    li = _t(spark, sf_dir, "lineitem")
    # One pass builds the sketch AND the row count (r13: was a separate
    # count() job scanning lineitem a second time).
    stats = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            f"count_min_sketch(l_partkey, {_CMS_EPS}d, {_CMS_CONF}d, {_CMS_SEED})"
        ).alias("s"),
    ).collect()[0]
    total, sk = stats.n, stats.s
    cms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(sk))
    top = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "l_partkey")
        .limit(_CMS_TOP)
        .collect()
    )
    bound = _CMS_EPS * total
    rows = []
    for r in top:
        est = cms.estimateCount(spark._jvm.java.lang.Long(int(r.l_partkey)))
        rows.append(
            (
                int(r.l_partkey),
                int(r.exact_n),
                bool(est >= r.exact_n),
                bool(est - r.exact_n <= bound),
            )
        )
    return spark.createDataFrame(
        rows, "l_partkey long, exact_n long, est_ge_exact boolean, est_within_eps boolean"
    ).orderBy(F.col("exact_n").desc(), "l_partkey")


@REG.add(
    "agg_linear_regression",
    # regr_slope/intercept/r2 exist as built-in aggregates in BOTH
    # engines and reduce to the same raw-moment formulas the corr-matrix
    # entry pins; fold-order ulp noise sits far below the 6dp rounding.
    oracle="""
    SELECT o_orderstatus,
           CAST(regr_count(o_totalprice, year(o_orderdate) + month(o_orderdate) / 12.0)
                AS BIGINT) AS n,
           round(regr_slope(o_totalprice, year(o_orderdate) + month(o_orderdate) / 12.0), 6)
               AS slope,
           round(regr_intercept(o_totalprice, year(o_orderdate) + month(o_orderdate) / 12.0), 6)
               AS intercept,
           round(regr_r2(o_totalprice, year(o_orderdate) + month(o_orderdate) / 12.0), 6)
               AS r2
    FROM orders
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary least squares via the SQL-standard ``regr_*``
    aggregate family (slope / intercept / r2) — trend fitting as a
    single mergeable hash aggregate, no ML library, no iteration (the
    aggregates fold the same five raw moments the correlation matrix
    uses). The regressor is fractional order time (year + month/12), so
    this is literally the price-vs-time drift monitor."""
    o = _t(spark, sf_dir, "orders")
    x = F.year("o_orderdate") + F.month("o_orderdate") / 12.0
    y = F.col("o_totalprice")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.expr("regr_count(o_totalprice, year(o_orderdate) + month(o_orderdate) / 12.0)")
            .cast("long")
            .alias("n"),
            F.round(F.regr_slope(y, x), 6).alias("slope"),
            F.round(F.regr_intercept(y, x), 6).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
        )
        .orderBy("o_orderstatus")
    )


@REG.add(
    "agg_percentile_cont_multi",
    # Exact interpolated quantiles: both engines sort the same doubles
    # and interpolate linearly between the same two order statistics —
    # a fixed IEEE expression on identical inputs, no estimation.
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           round(quantile_cont(o_totalprice, 0.90), 4) AS p90
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def agg_percentile_cont_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-quantile profile (p25/p50/p75/p90 of order value per
    priority) via linearly-interpolated continuous percentiles — the
    exact companion to ``agg_percentile_approx``: one aggregate
    computes all four cut points from a single per-group sort, so
    adding quantiles is free. Exactness is the point at audit time;
    the approx sketch is the 100 TB default and this is the
    verification pass run on samples or small groups. 4dp rounding
    guards the interpolation's last ulp."""
    o = _t(spark, sf_dir, "orders")
    pct = F.percentile(F.col("o_totalprice"), F.array(
        F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.9)
    ))
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.element_at(pct, 1), 4).alias("p25"),
            F.round(F.element_at(pct, 2), 4).alias("p50"),
            F.round(F.element_at(pct, 3), 4).alias("p75"),
            F.round(F.element_at(pct, 4), 4).alias("p90"),
        )
        .orderBy("o_orderpriority")
    )


@REG.add(
    "agg_boolean_family",
    # bool_and/bool_or/count_if reduce to integer comparisons — exact
    # in both engines; the any_value slot is made deterministic via min.
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000)    AS all_over_1k,
           bool_or(o_orderstatus = 'F')     AS any_finished,
           CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_large,
           min(o_orderstatus)               AS sample_status
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def agg_boolean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The boolean aggregate family — bool_and / bool_or / count_if per
    group (dashboard predicates: 'did every order clear X', 'any
    failures?', 'how many above threshold'), plus a DETERMINISTIC
    stand-in for any_value (min) since any_value's pick is
    partition-order-dependent and therefore banned from any compared
    or incremental path. All predicate logic folds map-side; one
    shuffle."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
            F.count_if(F.col("o_totalprice") > 100000).alias("n_large"),
            F.min("o_orderstatus").alias("sample_status"),
        )
        .orderBy("o_orderpriority")
    )
