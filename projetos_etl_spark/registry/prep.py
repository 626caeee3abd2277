"""Data-prep family: time-series regularization and schema profiling —
maintenance ops a training-data or BI pipeline runs around the core
queries (SURVEY.md §2B extensions; the reference has no analogue, its
pipeline ships every row it ingests). Deterministic stratified
sampling lives in the text family (``sample_stratified_hash``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projetos_etl_spark.registry._core import Registry
from projetos_etl_spark.sources.io import load_table

REG = Registry()

HOUR_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
HOUR_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


@REG.add(
    "ts_resample_ffill",
    oracle=f"""
    WITH hourly AS (
        SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS h, value
        FROM (
            SELECT user_id, ts, round(value, 6) AS value,
                   row_number() OVER (
                       PARTITION BY user_id, time_bucket(INTERVAL '1 hour', ts)
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
        WHERE rn = 1
    ),
    spans AS (
        SELECT user_id, min(h) AS h_lo, max(h) AS h_hi FROM hourly GROUP BY user_id
    ),
    spine AS (
        SELECT user_id, unnest(generate_series(h_lo, h_hi, INTERVAL 1 HOUR)) AS h
        FROM spans
    )
    SELECT s.user_id,
           strftime(s.h, '{HOUR_FMT_DUCK}') AS hour,
           last_value(hourly.value IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
    FROM spine s LEFT JOIN hourly ON s.user_id = hourly.user_id AND s.h = hourly.h
    """,
)
def ts_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: resample each user's event stream onto
    an hourly spine (``sequence`` + explode — generated distributed, per
    user, never on the driver) and forward-fill gaps with the last
    observed value (``last(ignorenulls)`` over an ordered window). The
    per-hour observation is the latest event in the hour with an explicit
    (ts, event_id) tie-break so both engines pick the same row. Gap
    filling is the canonical prep step for ML feature windows over
    irregular events. Scale: the per-hour pick is ``max_by`` over a
    (ts, event_id) struct — a combinable hash aggregate with map-side
    partials, deliberately NOT a row_number window (which would sort
    every partition); spine generation, the join, and the fill window
    then all partition by user_id."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = (
        ev.select(
            "user_id", "ts", "event_id", hour.alias("h"), F.round("value", 6).alias("value")
        )
        .groupBy("user_id", "h")
        .agg(F.max_by("value", F.struct("ts", "event_id")).alias("value"))
    )
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("h_lo"), F.max("h").alias("h_hi"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h_lo", "h_hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    w_fill = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["user_id", "h"], "left")
        .withColumn("value_ffill", F.last("value", ignorenulls=True).over(w_fill))
        .select(
            "user_id",
            F.date_format("h", HOUR_FMT_SPARK).alias("hour"),
            "value_ffill",
        )
    )


#: Columns profiled by quality_schema_profile (orders table).
_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]


@REG.add(
    "quality_schema_profile",
    oracle="""
    SELECT 'o_orderkey' AS column_name,
           CAST(count(*) - count(o_orderkey) AS BIGINT) AS null_count,
           CAST(count(DISTINCT o_orderkey) AS BIGINT)   AS distinct_count,
           CAST(min(o_orderkey) AS VARCHAR)             AS min_value,
           CAST(max(o_orderkey) AS VARCHAR)             AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*) - count(o_custkey), count(DISTINCT o_custkey),
           CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus),
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*) - count(o_totalprice),
           count(DISTINCT round(o_totalprice, 2)),
           CAST(round(min(o_totalprice), 2) AS VARCHAR),
           CAST(round(max(o_totalprice), 2) AS VARCHAR)
    FROM orders
    ORDER BY column_name
    """,
)
def quality_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema/data profiling: one row per column with null count,
    distinct count, and min/max rendered as strings (the shape a data
    catalog ingests). Computed as a SINGLE aggregation pass over the
    table — all per-column aggregates ride one scan, then the wide row
    is unpivoted driver-free with ``stack``. The distinct counts make
    this a shuffle-bearing profile; at 100 TB swap them for
    approx_count_distinct and the pass becomes fully map-combinable."""
    o = load_table(spark, sf_dir, "orders")
    price = F.round(F.col("o_totalprice"), 2)
    wide = o.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.count(c).alias(f"nn_{c}") for c in _PROFILE_COLS],
        F.countDistinct("o_orderkey").alias("d_o_orderkey"),
        F.countDistinct("o_custkey").alias("d_o_custkey"),
        F.countDistinct("o_orderstatus").alias("d_o_orderstatus"),
        F.countDistinct(price).alias("d_o_totalprice"),
        F.min("o_orderkey").cast("string").alias("min_o_orderkey"),
        F.max("o_orderkey").cast("string").alias("max_o_orderkey"),
        F.min("o_custkey").cast("string").alias("min_o_custkey"),
        F.max("o_custkey").cast("string").alias("max_o_custkey"),
        F.min("o_orderstatus").alias("min_o_orderstatus"),
        F.max("o_orderstatus").alias("max_o_orderstatus"),
        F.round(F.min("o_totalprice"), 2).cast("string").alias("min_o_totalprice"),
        F.round(F.max("o_totalprice"), 2).cast("string").alias("max_o_totalprice"),
    )
    stack_args = ", ".join(
        f"'{c}', n - nn_{c}, d_{c}, min_{c}, max_{c}" for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(column_name, null_count, distinct_count, min_value, max_value)"
    ).orderBy("column_name")
