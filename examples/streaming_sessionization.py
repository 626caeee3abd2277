"""End-to-end Structured Streaming sessionization, as a user would run
it — file-drop ingestion, watermarked session windows, and a live
batch-parity check on the final answer.

The pattern mirrors a production clickstream job: events land as files
in a watch directory (here: the fixture table staged in N chunks to
simulate arrival), the stream sessionizes per user with
``session_window`` under a watermark, and the run is validated by
re-deriving the same sessions from the batch table — the equivalence the
engine's oracle gate enforces for every stream entry.

Run it:

    python examples/streaming_sessionization.py [sf_dir]

(defaults to /root/testdata/sf0.001; sf0.01 also fine — the stream is
bounded because availableNow processes the staged files and stops.)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from projetos_etl_spark.session import get_spark
from projetos_etl_spark.sources.io import load_table
from projetos_etl_spark.streaming.jobs import (
    run_to_memory,
    session_agg,
    stage_files,
)

GAP = "4 hours"


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="streaming-sessionization-example")
    events = load_table(spark, sf_dir, "events")

    # 1. Stage the fixture as a file-drop directory (simulated arrival).
    watch = tempfile.mkdtemp(prefix="sessionize_watch_")
    stage_files(events, watch, "events")

    # 2. Watermarked session windows over the stream; the staged files
    #    already carry the engine's timestamp contract (they were written
    #    from the normalized batch read), so the stream declares that
    #    schema directly. run_to_memory drains the staged files and
    #    terminates, scoping the state-store parallelism itself.
    stream = spark.readStream.format("parquet").schema(events.schema).load(watch)
    sessions = run_to_memory(session_agg(stream, GAP), "complete")
    n_sessions = sessions.count()

    # 3. Batch parity: the same sessions from the static table via the
    #    gaps-and-islands formulation (new session when gap >= GAP).
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gap_s = 4 * 3600
    batch = (
        events.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            (
                F.col("prev").isNull()
                | ((F.unix_timestamp("ts") - F.unix_timestamp("prev")) >= gap_s)
            ).cast("int"),
        )
        .withColumn("sess_id", F.sum("new_sess").over(w))
        .groupBy("user_id", "sess_id")
        .count()
    )
    n_batch = batch.count()

    print(f"stream sessions: {n_sessions}")
    print(f"batch  sessions: {n_batch}")
    print("PARITY OK" if n_sessions == n_batch else "PARITY MISMATCH")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
