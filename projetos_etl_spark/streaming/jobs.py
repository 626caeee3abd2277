"""Streaming building blocks + a synchronous local runner.

``read_events_stream`` treats the fixture ``events.parquet`` as a file
source; transformations are plain DataFrame functions (usable unchanged
in batch); ``run_to_memory`` drives a finite stream to completion with a
memory sink (``processAllAvailable`` — the documented local pattern for
deterministic streaming tests).

Scale notes: state stores back the windowed aggs and dedup — watermarks
bound that state (without one, streaming dedup state grows forever); at
100 TB/day the watermark delay is the knob trading late-data tolerance
for state size. ``foreachBatch`` gives exactly-once-style idempotent
batch sinks (here: parquet per epoch).
"""

from __future__ import annotations

import contextlib
import itertools
import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_COUNTER = itertools.count()


@contextlib.contextmanager
def scoped_stream_parallelism(
    spark: SparkSession, max_partitions: int = 64, target: int = 32
) -> Iterator[None]:
    """Cap ``spark.sql.shuffle.partitions`` for the duration of a streaming
    query run, restoring the caller's value afterwards.

    Streaming aggregations allocate one state store per shuffle partition;
    the stock 200 means 200 state stores per windowed agg in local mode.
    The count is baked into a query's checkpoint at FIRST START — which is
    why the cap is applied around ``q.start()`` (by the runners below), not
    at stream-build time, and why restoring after ``q.stop()`` is safe.
    Restoring means batch queries run later on the same session keep their
    own parallelism (previously this leaked session-wide)."""
    key = "spark.sql.shuffle.partitions"
    prior = spark.conf.get(key, "200")
    capped = int(prior) > max_partitions
    if capped:
        spark.conf.set(key, str(target))
    try:
        yield
    finally:
        if capped:
            spark.conf.set(key, prior)

def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over events parquet, normalized to the same
    microsecond TimestampType contract as the batch reader.

    Streams need an explicit schema, and that schema must match the
    file's *physical* encoding — which has drifted across fixture
    generations (TIMESTAMP(NANOS) int64 → TIMESTAMP(MICROS)). Hard-coding
    either one silently corrupts timestamps when the other shows up, so
    the schema is probed from the file itself (one driver-side batch
    footer read — no data scan) and the value normalization is shared
    with the batch path (``sources.io.normalize_ts_cols``), guaranteeing
    batch/stream ingest parity by construction.

    Required session confs (``spark.sql.legacy.parquet.nanosAsLong`` for
    a TIMESTAMP(NANOS) fixture, UTC session TZ for deterministic
    rendering) are part of the engine session contract — pinned by
    ``session.get_spark`` and at the registry API boundary
    (``registry/_core.ENGINE_SESSION_CONFS``), NOT mutated here. Shuffle
    parallelism for the streaming state stores is scoped per query run by
    the runners below (``scoped_stream_parallelism``)."""
    from projetos_etl_spark.sources.io import normalize_ts_cols

    # Probe the physical schema via a batch read (footer-only on the
    # driver): whatever dtype batch loads for `ts` (bigint under
    # nanosAsLong, timestamp_ntz for micros) is the dtype the stream
    # must declare.
    raw_schema = spark.read.parquet(path).schema
    # File-stream sources want a *directory* to watch; the fixture is a
    # single file, so watch its parent with a glob filter (this is also
    # the right shape at scale: a drop-directory of event files).
    parent, fname = os.path.dirname(path), os.path.basename(path)
    raw = (
        spark.readStream.format("parquet")
        .schema(raw_schema)
        .option("pathGlobFilter", fname)
        .load(parent)
    )
    return normalize_ts_cols(raw, ["ts"])


def tumbling_agg(events: DataFrame, width: str = "1 hour") -> DataFrame:
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
    )


def sliding_agg(events: DataFrame, width: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def session_agg(events: DataFrame, gap: str = "4 hours") -> DataFrame:
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("total_value"))
    )


def run_to_memory(
    stream_df: DataFrame, output_mode: str = "complete", name: str | None = None
) -> DataFrame:
    """Run a finite stream to completion into a memory sink; return the
    sink table as a DataFrame."""
    name = name or f"pes_stream_{next(_COUNTER)}"
    with scoped_stream_parallelism(stream_df.sparkSession):
        q = (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    spark = stream_df.sparkSession
    return spark.table(name)


def stage_files(df: DataFrame, watch_dir: str, tag: str) -> None:
    """Materialize ``df`` as parquet part-files inside ``watch_dir`` (the
    directory a file-source stream watches) — the unit of arrival for a
    file stream is a file, so dropping a new batch of files IS the event
    of new data arriving. Used to pin micro-batch boundaries in tests
    (SURVEY.md §5.2 'streaming determinism')."""
    import glob
    import os
    import shutil
    from projetos_etl_spark.scratch import scratch_dir

    staging = scratch_dir("stage_")
    df.write.mode("overwrite").parquet(staging)
    os.makedirs(watch_dir, exist_ok=True)
    for i, part in enumerate(sorted(glob.glob(f"{staging}/part-*.parquet"))):
        shutil.move(part, os.path.join(watch_dir, f"{tag}-{i:05d}.parquet"))
    shutil.rmtree(staging, ignore_errors=True)


def run_foreach_batch_parquet(stream_df: DataFrame, out_dir: str) -> None:
    """Drive a stream through a ``foreachBatch`` parquet sink (idempotent
    per-epoch append — the standard exactly-once-style custom sink)."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.withColumn("epoch_id", F.lit(epoch_id)).write.mode("append").parquet(
            out_dir
        )

    with scoped_stream_parallelism(stream_df.sparkSession):
        q = stream_df.writeStream.outputMode("update").foreachBatch(write_batch).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
