"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §1.4: "applyInPandasWithState for custom stateful operators").

The built-in stateful ops (windowed aggs, dropDuplicates*) cover fixed
shapes; ``applyInPandasWithState`` is the escape hatch for arbitrary
per-key state machines — fraud scoring, CDC merge, custom sessionization.
Here: a per-user running profile (event count, value sum, max value)
maintained in a typed state tuple across micro-batches.

Scale notes: state lives in the executor state store partitioned by the
grouping key (one shuffle); per batch, each key's rows arrive as pandas
frames (Arrow). State must stay bounded — real deployments pair this
with ``GroupStateTimeout`` eviction (set here) so idle keys age out
instead of accumulating for 100 TB/day streams.

Spark 4's successor API, ``transformWithStateInPandas`` (typed
Value/List/Map state + timers), is the forward path for these
operators but is ENV-GATED here: its Python<->JVM state protocol
requires ``google.protobuf``, which this container ships broken
(``cannot import name 'descriptor'`` — verified by running a
MapState processor end-to-end; it crashes the state server on init).
The operators below therefore stay on ``applyInPandasWithState``,
which is protocol-free and expresses the same state machines.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("nv", T.LongType()),  # finite readings seen
        T.StructField("total", T.DoubleType()),
        T.StructField("vmax", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)


def _update_user_profile(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # The finite gate (functions/finite.py convention), EXPLICIT rather
    # than an accident of pandas skipna: Arrow hands NULL values to the
    # state fn as NaN in a float64 column, so NULL and NaN readings are
    # already indistinguishable here — and pandas' default sum/max
    # silently skips NaN but PROPAGATES +/-Inf, which is neither SQL's
    # semantics nor anyone's intent for a corrupt reading (r10 sf_nan
    # probe caught the divergence). Sum/max run over the finite
    # readings only; n_events still counts every event; a user with no
    # finite reading yet profiles NULL (not 0.0 / -inf), exactly what
    # the SQL oracle's null-skipping aggregates produce. r12
    # (sf_extremes): the mask carries functions/finite.py's MAG_CAP —
    # a FINITE 1e300 reading is corrupt too (it poisons the running
    # sum exactly like Inf), and the oracle's sql_finite twin already
    # excludes it.
    import numpy as np

    from projetos_etl_spark.functions.finite import MAG_CAP

    n, nv, total, vmax = state.get if state.exists else (0, 0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        v = pdf["value"].to_numpy(dtype=np.float64, na_value=np.nan)
        fin = v[np.isfinite(v) & (np.abs(v) < MAG_CAP)]
        if len(fin):
            nv += len(fin)
            total += float(fin.sum())
            vmax = max(vmax, float(fin.max()))
    state.update((n, nv, total, vmax))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total if nv else None],
            "max_value": [vmax if nv else None],
        }
    )


def running_user_profile(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max) over a stream — emits the
    updated profile for every user seen in each micro-batch."""
    from projetos_etl_spark.session import ship_package

    ship_package(events.sparkSession)
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


SESSION_GAP_MICROS = 4 * 3600 * 1_000_000

CLOSE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)

CLOSE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _close_sessions(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit a session row the moment a LATER event proves the gap — the
    open session stays in state (and would be flushed by an event-time
    timeout in a production deployment)."""
    start, last, n = state.get if state.exists else (None, None, 0)
    out: list[tuple[int, int, int, int]] = []
    ts_all = sorted(
        int(t) for pdf in pdfs for t in pdf["ts_us"].tolist()
    )
    for t in ts_all:
        if start is None:
            start, last, n = t, t, 1
            continue
        if t - last > SESSION_GAP_MICROS:
            out.append((key[0], start, last, n))
            start, last, n = t, t, 1
        else:
            last, n = t, n + 1
    state.update((start, last, n))
    yield pd.DataFrame(out, columns=["user_id", "start_us", "end_us", "n_events"])


def closed_sessions(events: DataFrame) -> DataFrame:
    """Gap-closed sessions per user over a stream: rows appear only for
    sessions PROVEN over (a later event arrived past the gap), never for
    still-open ones — the finalize-on-evidence pattern CDC compaction
    and billing pipelines need (an open session must not bill)."""
    from pyspark.sql import functions as F

    from projetos_etl_spark.session import ship_package

    ship_package(events.sparkSession)
    # A session is a run of gap-bounded timestamps: an un-timestamped
    # event has no gap relation (family seven) — and Arrow hands the
    # pandas state fn its NULL ts as NaN, which would poison the gap
    # arithmetic rather than error. Watermarked operators drop such
    # rows implicitly; this NoTimeout state machine must do it
    # explicitly.
    return (
        events.filter(F.col("ts").isNotNull())
        .select("user_id", F.unix_micros("ts").alias("ts_us"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _close_sessions,
            outputStructType=CLOSE_OUTPUT_SCHEMA,
            stateStructType=CLOSE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
