"""Streaming family (SURVEY.md §2B "Streaming").

Unlike typical "streaming demos", these registry entries *actually run*
Structured Streaming: each callable starts a streaming query over the
events parquet as a file source, drives it to completion, and returns
the sink table — so the driver's oracle checks real streaming output
against batch SQL (exact batch/stream equivalence on finite input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projetos_etl_spark.functions.finite import finite, sql_finite
from projetos_etl_spark.scratch import scratch_dir, scratch_path
from projetos_etl_spark.registry._core import TS_FMT_DUCK, TS_FMT_SPARK, Registry
from projetos_etl_spark.streaming.jobs import (
    read_events_stream,
    run_foreach_batch_parquet,
    run_to_memory,
    scoped_stream_parallelism,
    session_agg,
    sliding_agg,
    tumbling_agg,
)

REG = Registry()

HOUR_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
HOUR_FMT_DUCK = "%Y-%m-%d %H:%M:%S"
SESSION_GAP = "4 hours"
SESSION_GAP_SECONDS = 4 * 3600


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_events_stream(spark, f"{sf_dir}/events.parquet")


@REG.add(
    "stream_tumbling_count",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{HOUR_FMT_DUCK}') AS window_start,
           event_type,
           count(*)              AS n,
           round(sum(value), 6)  AS sum_value
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY 1, 2
    """,
)
def stream_tumbling_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling-window counts per event type, computed by a real
    streaming query (complete mode memory sink) — oracle is the exact
    batch equivalent."""
    agg = tumbling_agg(_events_stream(spark, sf_dir).withWatermark("ts", "2 hours"))
    out = run_to_memory(agg, "complete")
    return out.select(
        F.date_format("w.start", HOUR_FMT_SPARK).alias("window_start"),
        "event_type",
        "n",
        "sum_value",
    )


@REG.add(
    "stream_sliding_agg",
    oracle=f"""
    SELECT window_start, event_type, count(*) AS n FROM (
        SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{HOUR_FMT_DUCK}')
                   AS window_start, event_type
        FROM events WHERE ts IS NOT NULL
        UNION ALL
        SELECT strftime(time_bucket(INTERVAL '1 hour', ts, INTERVAL '30 minutes'),
                        '{HOUR_FMT_DUCK}'), event_type
        FROM events WHERE ts IS NOT NULL
    )
    GROUP BY 1, 2
    """,
)
def stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event lands in two
    windows; the oracle reproduces that as two offset time_buckets)."""
    agg = sliding_agg(_events_stream(spark, sf_dir))
    out = run_to_memory(agg, "complete")
    return out.select(
        F.date_format("w.start", HOUR_FMT_SPARK).alias("window_start"),
        "event_type",
        "n",
    )


@REG.add(
    "stream_session_window",
    oracle=f"""
    WITH gaps AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) > {SESSION_GAP_SECONDS}
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
        SELECT user_id, ts, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM gaps)
    SELECT user_id,
           strftime(min(ts), '{TS_FMT_DUCK}') AS session_start,
           count(*)                           AS n_events,
           round(sum(value), 6)               AS total_value
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native streaming ``session_window`` (4h gap); the oracle is the
    gaps-and-islands batch formulation. Boundary semantics verified
    empirically (r12, sf_ties — hour-truncated events create EXACT 4h
    gaps no earlier fixture contained): an event at exactly
    ``prev_ts + gap`` MERGES into the running session (session_window
    treats its half-open [ts, ts+gap) windows as mergeable when
    touching), so a new session starts only when the gap is STRICTLY
    greater — the oracle's is_new predicate is ``>``, same as the batch
    ``sessionize_events`` twin."""
    agg = session_agg(_events_stream(spark, sf_dir), SESSION_GAP)
    out = run_to_memory(agg, "complete")
    return out.select(
        "user_id",
        F.date_format("w.start", TS_FMT_SPARK).alias("session_start"),
        "n_events",
        "total_value",
    )


@REG.add(
    "stream_dedup_keys",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup on (user_id, event_type): first-seen rows
    pass, later duplicates are dropped against the state store. Output is
    projected to the key columns so it is deterministic (which *row*
    survives first-seen dedup is arrival-order-dependent)."""
    ev = _events_stream(spark, sf_dir)
    deduped = ev.dropDuplicates(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
    return run_to_memory(deduped, "append")


@REG.add(
    "stream_late_data",
    oracle=f"""
    WITH cut AS (
        SELECT time_bucket(INTERVAL '1 hour', max(ts) - INTERVAL '3 hours') AS cutoff
        FROM events
    )
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{HOUR_FMT_DUCK}') AS window_start,
           event_type,
           count(*) AS n
    FROM events, cut
    WHERE ts >= cutoff
    GROUP BY 1, 2
    """,
)
def stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data DROP, observed for real across two micro-batches:

    batch 1 delivers every event from the last ~3 hours of the fixture,
    advancing the watermark to ``max_ts - 1h``; batch 2 then delivers all
    OLDER events — every one falls in a window that ended before the
    watermark, so streaming discards them all. The sink therefore holds
    exactly the batch-1 aggregates, which is what the oracle computes
    (events at or after the hour-truncated ``max_ts - 3h`` cutoff).

    At scale this is the knob that bounds state: watermark delay trades
    late-data tolerance for state-store size (SURVEY.md §2B Streaming).
    """

    from projetos_etl_spark.streaming.jobs import stage_files

    from projetos_etl_spark.sources.io import load_table

    ev_all = load_table(spark, sf_dir, "events")
    cutoff = ev_all.agg(
        F.date_trunc("hour", F.max("ts") - F.expr("INTERVAL 3 HOURS")).alias("c")
    ).collect()[0][0]
    on_time = ev_all.filter(F.col("ts") >= F.lit(cutoff))
    late = ev_all.filter(F.col("ts") < F.lit(cutoff))

    watch = scratch_dir("late_")
    stage_files(on_time, watch, "batch1")

    stream = (
        spark.readStream.format("parquet").schema(ev_all.schema).load(watch)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = "pes_late_sink"
    with scoped_stream_parallelism(spark):
        q = (
            agg.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()  # batch 1: establishes the watermark
            stage_files(late, watch, "batch2")
            q.processAllAvailable()  # batch 2: every row late -> dropped
        finally:
            q.stop()
    return spark.table(name).select(
        F.date_format("w.start", HOUR_FMT_SPARK).alias("window_start"),
        "event_type",
        "n",
    )


@REG.add(
    "stream_dedup_within_watermark",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dropDuplicatesWithinWatermark`` (§2B ``stream_dedup_stateful``):
    unlike plain streaming ``dropDuplicates`` (whose key state grows
    forever), state for a key is evicted once the watermark passes it —
    the only sane variant at 100 TB/day. On this finite input every
    duplicate pair is within the watermark, so output = DISTINCT keys."""
    ev = _events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    deduped = ev.dropDuplicatesWithinWatermark(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
    return run_to_memory(deduped, "append")


@REG.add(
    "stream_custom_stateful_profile",
    # sum/max ride the finite gate (functions/finite.py): the pandas
    # state fn receives NULLs as NaN through Arrow, so it cannot help
    # treating NULL and NaN alike — the operator makes that explicit
    # (finite readings only; see streaming/stateful.py) and the oracle
    # mirrors it. n_events still counts every event.
    oracle=f"""
    SELECT user_id,
           count(*) AS n_events,
           round(sum({sql_finite("value")}), 6)  AS total_value,
           round(max({sql_finite("value")}), 6)  AS max_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_custom_stateful_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``, see
    ``streaming/stateful.py``) driven across TWO micro-batches: the
    second batch's emissions must CONTINUE from state built in the first
    (not restart), so the final per-user profile equals the batch
    aggregate over all events — which is exactly the oracle. The sink
    keeps every update; the final row per user is the one with the
    highest running count."""

    from projetos_etl_spark.sources.io import load_table
    from projetos_etl_spark.streaming.jobs import stage_files
    from projetos_etl_spark.streaming.stateful import running_user_profile

    ev_all = load_table(spark, sf_dir, "events")
    median_ts = ev_all.agg(
        F.expr("percentile_approx(ts, 0.5)").alias("m")
    ).collect()[0][0]

    watch = scratch_dir("state_")
    # The profile is an ARRIVAL-order state machine (no watermark, no
    # event-time): every event counts, timestamped or not. A bare
    # `ts <= median` split would strand NULL-ts rows in NEITHER batch
    # (three-valued logic) — the family-seven probe caught the profile
    # silently undercounting exactly the corrupt-stamp events.
    stage_files(
        ev_all.filter((F.col("ts") <= F.lit(median_ts)) | F.col("ts").isNull()),
        watch,
        "batch1",
    )

    stream = spark.readStream.format("parquet").schema(ev_all.schema).load(watch)
    profile = running_user_profile(stream)
    name = "pes_stateful_sink"
    with scoped_stream_parallelism(spark):
        q = (
            profile.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
            stage_files(
                ev_all.filter(F.col("ts") > F.lit(median_ts)), watch, "batch2"
            )
            q.processAllAvailable()
        finally:
            q.stop()

    sink = spark.table(name)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        sink.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            "n_events",
            F.round("total_value", 6).alias("total_value"),
            F.round("max_value", 6).alias("max_value"),
        )
    )


@REG.add(
    "stream_foreach_batch_sink",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 6) AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def stream_foreach_batch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch parquet sink: per-epoch idempotent write (epoch id
    stamped on every row), read back keeping only the final epoch —
    the standard exactly-once-style custom-sink pattern."""
    out_dir = scratch_dir("febatch_")
    agg = (
        _events_stream(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
    )

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.withColumn("epoch_id", F.lit(epoch_id)).write.mode("append").parquet(
            out_dir
        )

    with scoped_stream_parallelism(spark):
        q = agg.writeStream.outputMode("complete").foreachBatch(write_batch).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    result = spark.read.parquet(out_dir)
    last = result.agg(F.max("epoch_id")).collect()[0][0]
    return result.filter(F.col("epoch_id") == last).select("event_type", "n", "sum_value")


@REG.add(
    "stream_static_join_enrich",
    # The enrichment measure rides the finite gate (functions/
    # finite.py, r12 sf_extremes): corrupt ±1e300 readings in one
    # (tier, type) group made sum_value an accumulation-order function
    # (micro-batch partials vs the oracle's single pass). n counts
    # every event.
    oracle=f"""
    WITH tiers AS (
        SELECT DISTINCT user_id,
               CASE WHEN user_id % 3 = 0 THEN 'gold'
                    WHEN user_id % 3 = 1 THEN 'silver'
                    ELSE 'bronze' END AS tier
        FROM events
    )
    SELECT t.tier, e.event_type,
           count(*)             AS n,
           round(sum({sql_finite("e.value")}), 6) AS sum_value
    FROM events e JOIN tiers t ON e.user_id = t.user_id
    GROUP BY t.tier, e.event_type
    """,
)
def stream_static_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriches each row against a
    static dimension table (user tiers) then aggregates per tier. The
    static side is a plain batch DataFrame — Spark re-plans it into
    every micro-batch as a broadcast hash join, the canonical pattern
    for dimension enrichment at 100 TB/day stream scale (the dim is
    bounded; the stream never shuffles for the join)."""
    from projetos_etl_spark.sources.io import load_table

    tiers = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .withColumn(
            "tier",
            F.when(F.col("user_id") % 3 == 0, "gold")
            .when(F.col("user_id") % 3 == 1, "silver")
            .otherwise("bronze"),
        )
    )
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.join(F.broadcast(tiers), "user_id")
        .groupBy("tier", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(finite("value")), 6).alias("sum_value"),
        )
    )
    return run_to_memory(agg, "complete")


@REG.add(
    "stream_stream_interval_join",
    oracle=f"""
    SELECT p.event_id                      AS purchase_id,
           p.user_id,
           strftime(p.ts, '{TS_FMT_DUCK}') AS purchase_ts,
           strftime(e.ts, '{TS_FMT_DUCK}') AS error_ts
    FROM events p JOIN events e
      ON p.user_id = e.user_id
     AND p.event_type = 'purchase' AND e.event_type = 'error'
     AND e.ts >= p.ts - INTERVAL '2 hours' AND e.ts <= p.ts
    """,
)
def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: purchases matched to same-user errors
    in the 2 hours leading up to the purchase. Both sides are streaming
    with watermarks; the time-range condition bounds the join state on
    each side (rows age out once the other side's watermark passes the
    interval) — without it, stream-stream join state grows forever.
    Inner join in append mode; on finite input the emitted pairs equal
    the batch interval join, which is the oracle."""
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    errors = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select(F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts"))
        .withWatermark("e_ts", "2 hours")
    )
    joined = purchases.join(
        errors,
        (F.col("user_id") == F.col("e_user"))
        & (F.col("e_ts") >= F.col("p_ts") - F.expr("INTERVAL 2 HOURS"))
        & (F.col("e_ts") <= F.col("p_ts")),
    )
    out = run_to_memory(joined, "append")
    return out.select(
        "purchase_id",
        "user_id",
        F.date_format("p_ts", TS_FMT_SPARK).alias("purchase_ts"),
        F.date_format("e_ts", TS_FMT_SPARK).alias("error_ts"),
    )


@REG.add(
    "stream_append_finalized_windows",
    oracle=f"""
    WITH wm AS (
        SELECT max(ts) - INTERVAL '2 hours' AS watermark FROM events
    )
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{HOUR_FMT_DUCK}') AS window_start,
           event_type,
           count(*) AS n
    FROM events, wm
    WHERE time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' <= watermark
    GROUP BY 1, 2
    """,
)
def stream_append_finalized_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPEND-mode windowed aggregation: a window row is emitted exactly
    once, only after the watermark passes its end (finalized = immutable
    downstream — what you want feeding a parquet/Kafka sink, where
    update-mode's re-emissions would duplicate). Two micro-batches:
    batch 2's newer events advance the watermark to max_ts - 2h,
    finalizing exactly the windows whose END is at or before it — which
    is the oracle's predicate. Windows still open when the stream ends
    are NEVER emitted in append mode: that is the semantic, visible
    here as the missing trailing ~2-3 hours."""

    from projetos_etl_spark.sources.io import load_table
    from projetos_etl_spark.streaming.jobs import stage_files

    ev_all = load_table(spark, sf_dir, "events")
    cutoff = ev_all.agg(
        F.date_trunc("hour", F.max("ts") - F.expr("INTERVAL 3 HOURS")).alias("c")
    ).collect()[0][0]
    old = ev_all.filter(F.col("ts") < F.lit(cutoff))
    new = ev_all.filter(F.col("ts") >= F.lit(cutoff))

    watch = scratch_dir("append_")
    stage_files(old, watch, "batch1")
    stream = spark.readStream.format("parquet").schema(ev_all.schema).load(watch)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = "pes_append_sink"
    with scoped_stream_parallelism(spark):
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()  # batch 1: nothing finalized yet
            stage_files(new, watch, "batch2")
            q.processAllAvailable()  # batch 2 advances watermark -> emit
        finally:
            q.stop()
    return spark.table(name).select(
        F.date_format("w.start", HOUR_FMT_SPARK).alias("window_start"),
        "event_type",
        "n",
    )


@REG.add(
    "stream_stream_left_outer_join",
    oracle=f"""
    SELECT p.event_id                      AS purchase_id,
           p.user_id,
           strftime(p.ts, '{TS_FMT_DUCK}') AS purchase_ts,
           strftime(e.ts, '{TS_FMT_DUCK}') AS error_ts
    FROM (SELECT * FROM events
          WHERE event_type = 'purchase' AND ts IS NOT NULL) p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id
     AND e.ts >= p.ts - INTERVAL '2 hours' AND e.ts <= p.ts
    """,
)
def stream_stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join in append mode: a purchase
    with no same-user error in the preceding 2 hours must still emit —
    but only once the error side's watermark proves no match can arrive.
    A purchase near the end of a finite stream therefore never emits its
    NULL row in a naive run; this entry drives a second micro-batch of
    far-future watermark-advancer rows (sentinel user_id -1, filtered
    from the output) so EVERY real purchase finalizes, making the result
    equal to the batch left interval join — which is the oracle. This is
    the same bounded-state design as the inner variant: the interval
    condition lets both sides' state age out with the watermark."""

    from projetos_etl_spark.sources.io import load_table
    from projetos_etl_spark.streaming.jobs import stage_files

    ev_all = load_table(spark, sf_dir, "events")
    max_ts = ev_all.agg(F.max("ts").alias("m")).collect()[0][0]  # 1-row bound lookup
    advancers = spark.createDataFrame(
        [(-1, -1, "purchase", 0.0, "{}"), (-2, -1, "error", 0.0, "{}")],
        "event_id long, user_id long, event_type string, value double, props string",
    ).select(
        "event_id",
        F.lit(max_ts).cast("timestamp") + F.expr("INTERVAL 10 HOURS"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    watch = scratch_dir("louter_")
    stage_files(ev_all.select(*advancers.columns), watch, "batch1")

    # the staged files hold real TimestampType (already normalized), so
    # read with the normalized schema rather than the raw int64 one
    stream = (
        spark.readStream.format("parquet").schema(advancers.schema).load(watch)
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    errors = (
        stream.filter(F.col("event_type") == "error")
        .select(F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts"))
        .withWatermark("e_ts", "2 hours")
    )
    joined = purchases.join(
        errors,
        (F.col("user_id") == F.col("e_user"))
        & (F.col("e_ts") >= F.col("p_ts") - F.expr("INTERVAL 2 HOURS"))
        & (F.col("e_ts") <= F.col("p_ts")),
        "left_outer",
    )
    name = "pes_louter_sink"
    with scoped_stream_parallelism(spark):
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()  # batch 1: matches emit, NULLs held back
            stage_files(advancers, watch, "batch2")
            q.processAllAvailable()  # batch 2: watermark passes everything
        finally:
            q.stop()
    # The sentinel filter must not also swallow NULL-user purchases
    # (`NULL >= 0` is NULL): an unattributed purchase is still a
    # purchase — it emits with no error match, exactly as the batch
    # LEFT JOIN keeps it. NULL-ts purchases, by contrast, ARE dropped
    # — by the watermark, the streaming engine's own family-seven
    # semantics — and the oracle mirrors that gate.
    return (
        spark.table(name)
        .filter((F.col("user_id") >= 0) | F.col("user_id").isNull())
        .select(
            "purchase_id",
            "user_id",
            F.date_format("p_ts", TS_FMT_SPARK).alias("purchase_ts"),
            F.date_format("e_ts", TS_FMT_SPARK).alias("error_ts"),
        )
    )


@REG.add(
    "stream_sliding_topk",
    oracle=f"""
    WITH counts AS (
        SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{HOUR_FMT_DUCK}')
                   AS window_start,
               event_type, count(*) AS n
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    )
    SELECT window_start, event_type, n, rank FROM (
        SELECT *, CAST(row_number() OVER (
                   PARTITION BY window_start
                   ORDER BY n DESC, event_type NULLS LAST) AS INTEGER) AS rank
        FROM counts
    ) WHERE rank <= 3
    """,
)
def stream_sliding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming leaderboard: per-hour top-3 event types by count. The
    windowed count is a REAL streaming aggregation (complete-mode memory
    sink); the rank is a batch window over the materialized sink table —
    the standard split, because per-window top-k needs the window's
    final counts (rank-on-stream would emit provisional leaders). At
    100 TB the sink is a compacted table and the rank runs partition-
    local per window key with a deterministic (count DESC, type)
    tie-break — pinned NULLS LAST on both engines (family seven,
    mechanism 2: the UNTYPED group survives the plain streaming
    aggregation like its tumbling siblings, but an unpinned ascending
    tie-break would park it at OPPOSITE ends of the leaderboard)."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = run_to_memory(agg, "complete")
    w = Window.partitionBy("window_start").orderBy(
        F.col("n").desc(), F.col("event_type").asc_nulls_last()
    )
    return (
        out.select(
            F.date_format("w.start", HOUR_FMT_SPARK).alias("window_start"),
            "event_type",
            "n",
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
    )


@REG.add(
    "stream_session_close_stateful",
    # Oracle = batch sessionization MINUS each user's final session
    # (which is still open in stream state and must not be emitted).
    oracle=f"""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_SECONDS} SECOND
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
        SELECT user_id, ts,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    ),
    grouped AS (
        SELECT user_id, sid,
               strftime(min(ts), '{TS_FMT_DUCK}') AS session_start,
               strftime(max(ts), '{TS_FMT_DUCK}') AS session_end,
               CAST(count(*) AS BIGINT) AS n_events,
               max(sid) OVER (PARTITION BY user_id) AS last_sid
        FROM sess GROUP BY user_id, sid
    )
    SELECT user_id, session_start, session_end, n_events
    FROM grouped WHERE sid < last_sid
    ORDER BY user_id, session_start
    """,
)
def stream_session_close_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finalize-on-evidence sessionization (``streaming/stateful.py``):
    a custom ``applyInPandasWithState`` state machine emits a session
    row ONLY once a later event proves the gap — the still-open session
    stays in state and is never emitted (an open session must not bill;
    built-in ``session_window`` in append mode needs the watermark to
    pass, this emits on the first post-gap event per key). Append-mode
    output; state is one (start, last, n) tuple per user."""
    from projetos_etl_spark.streaming.stateful import closed_sessions

    stream = _events_stream(spark, sf_dir)
    out = run_to_memory(closed_sessions(stream), "append")
    return out.select(
        "user_id",
        F.date_format(F.timestamp_micros("start_us"), TS_FMT_SPARK).alias(
            "session_start"
        ),
        F.date_format(F.timestamp_micros("end_us"), TS_FMT_SPARK).alias(
            "session_end"
        ),
        "n_events",
    ).orderBy("user_id", "session_start")


@REG.add(
    "stream_upsert_tablelog",
    # The streamed two-epoch merge must land exactly where one batch
    # aggregate lands; sums ride integer cents so the two-stage
    # accumulation cannot drift from the oracle's single pass.
    # multi_commit is computed, not pinned TRUE: a commit happens per
    # NON-EMPTY epoch (epochs split on event_id parity), so a stream
    # whose events are all one parity legitimately commits once —
    # degenerate-but-valid input, same convention as the empty-stream
    # empty result.
    # value rides through the finite gate (functions/finite.py): a NaN
    # or Inf reading has no cents representation — the ANSI
    # bigint cast of round(NaN*100) ABORTED the foreachBatch sink (one
    # corrupt event killed the streaming job; r10 sf_nan probe) and
    # DuckDB's INT128 sum cast dies the same way. Non-finite values are
    # excluded from sum_value like NULLs; the event still counts in
    # n_events / last_ts.
    oracle=f"""
    SELECT user_id,
           count(*) AS n_events,
           CAST(sum(CAST(round({sql_finite("value")} * 100, 0) AS BIGINT))
                AS DOUBLE) / 100 AS sum_value,
           strftime(max(ts), '{TS_FMT_DUCK}') AS last_ts,
           (SELECT count(DISTINCT event_id % 2) FROM events) = 2
               AS multi_commit
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def stream_upsert_tablelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming upsert into the version-manifest table log — the
    hermetic form of "writeStream.foreachBatch + MERGE INTO delta": raw
    events arrive across TWO real micro-batches (file drops pin the
    epochs); each batch folds its per-user partials into the current
    table-log snapshot and publishes the merge as an atomic overwrite
    commit (old versions stay time-travelable). The read-back of the
    final version must equal the one-shot batch aggregate — the
    exactly-once bar for any streaming warehouse sink. Sums accumulate
    as integer cents so the two-stage merge is bit-exact; the
    ``multi_commit`` flag pins that at least two non-empty epochs
    really committed (a one-batch degenerate run would fail the
    oracle). State story at 100 TB: per-user partials are one mergeable
    shuffle per epoch, and the log merge touches only the user rows, a
    key-bounded table."""
    import os
    import shutil

    from projetos_etl_spark.operators.tablelog import commit, current_version, read
    from projetos_etl_spark.sources.io import load_table
    from projetos_etl_spark.streaming.jobs import stage_files

    ev_all = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    # finite(): see the oracle comment — NaN cents would ANSI-abort the
    # sink; corrupt readings are excluded from the sum like NULLs.
    cents = F.round(finite("value") * 100, 0).cast("bigint")
    # Per-process scratch (see ``scratch.py``): concurrent sessions on
    # one host can't clobber each other's table log, and dead sessions'
    # dirs are pruned by the next run. Same-process re-runs reuse and
    # reset the dir; the returned DataFrame scans these files lazily,
    # so the log must outlive this function (no finally-rmtree).
    table_dir = scratch_path("stream_upsert_log")
    shutil.rmtree(table_dir, ignore_errors=True)  # fresh run
    watch = scratch_dir("upsert_watch_")

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        agg = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("cents"),
            F.max("ts").alias("last_ts"),
        )
        if not agg.head(1):
            return
        if current_version(table_dir) > 0:
            agg = (
                read(spark, table_dir)
                .unionByName(agg)
                .groupBy("user_id")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("cents").alias("cents"),
                    F.max("last_ts").alias("last_ts"),
                )
            )
        commit(agg, table_dir, mode="overwrite")

    first = ev_all.filter(F.col("event_id") % 2 == 0)
    second = ev_all.filter(F.col("event_id") % 2 == 1)
    stage_files(first, watch, "epoch1")
    stream = spark.readStream.format("parquet").schema(ev_all.schema).load(watch)
    with scoped_stream_parallelism(spark):
        q = stream.writeStream.foreachBatch(merge_batch).start()
        try:
            q.processAllAvailable()  # epoch 1 -> initial commit
            stage_files(second, watch, "epoch2")
            q.processAllAvailable()  # epoch 2 -> merge commit
        finally:
            q.stop()
            shutil.rmtree(watch, ignore_errors=True)  # stream done; drop the drop-zone

    final_version = current_version(table_dir)
    if final_version == 0:
        # No event ever arrived: neither epoch committed, so there is
        # no table version to read — an empty stream upserts an empty
        # table (the oracle aggregates the same zero rows), it doesn't
        # crash the sink job.
        return spark.createDataFrame(
            [],
            "user_id long, n_events long, sum_value double, "
            "last_ts string, multi_commit boolean",
        )
    return (
        read(spark, table_dir)
        .select(
            "user_id",
            "n_events",
            (F.col("cents").cast("double") / 100).alias("sum_value"),
            F.date_format("last_ts", TS_FMT_SPARK).alias("last_ts"),
            F.lit(final_version >= 2).alias("multi_commit"),
        )
        .orderBy("user_id")
    )
