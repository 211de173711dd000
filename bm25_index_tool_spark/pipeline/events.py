"""Event-stream processing (brief §2.10: Structured Streaming, watermarks +
windowed aggs for late data, ``applyInPandasWithState`` for custom stateful
operators) over the driver's ``events`` table
(event_id, ts, user_id, event_type, value, props).

Every operator exists twice, deliberately:

* a **batch** formulation in pure Column expressions / window functions —
  oracle-checkable against DuckDB (``windowed_event_counts``,
  ``sessionize_events``), and
* a **streaming** formulation with real event-time semantics —
  ``stream_windowed_counts`` (watermark + tumbling window, append mode:
  a window is emitted exactly once, when the watermark passes it; later
  events are dropped) and ``stream_sessionize`` (gap-based sessions in
  ``applyInPandasWithState`` with event-time timeout).  The streaming
  twins are differentially tested against the batch results
  (tests/test_events.py) — same input files, same answers, modulo the
  documented late-data policy.

At 100 TB the batch forms are plain shuffles on (window, event_type) /
(user_id); the streaming forms shard state by group key across executors —
the state store is the only addition, and it is bounded by watermark
eviction (windows) / timeouts (sessions).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


# ---------------------------------------------------------------------------
# Tumbling-window aggregation
# ---------------------------------------------------------------------------


def windowed_event_counts(
    events: DataFrame, *, window_duration: str = "10 minutes"
) -> DataFrame:
    """(window_start, window_end, event_type, n_events, sum_value) —
    tumbling event-time windows, one shuffle on (window, event_type)."""
    w = F.window("ts", window_duration)
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_windowed_counts(
    spark: SparkSession,
    source_dir: str,
    *,
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
    max_files_per_trigger: int | None = None,
):
    """Streaming twin: same aggregation over a file stream with an
    event-time watermark.  Append output mode — each window is finalized
    (emitted once) when the watermark passes ``window_end``; events arriving
    later than ``watermark`` behind the max seen ``ts`` are dropped.
    Returns the streaming DataFrame (caller attaches the sink)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:  # a SOURCE option, not a sink one
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    w = F.window("ts", window_duration)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Gap-based sessionization
# ---------------------------------------------------------------------------


def sessionize_events(
    events: DataFrame, *, gap_minutes: int = 30
) -> DataFrame:
    """Batch sessionization: consecutive events of a user belong to one
    session while the gap stays ≤ ``gap_minutes``.  Classic two-window
    formulation (lag → break flag → running sum = session index) — a
    single shuffle on user_id; DuckDB replays it verbatim."""
    from pyspark.sql.window import Window

    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap test (unix_micros ↔ DuckDB epoch_us): a cast
    # to whole seconds would truncate and disagree with the oracle on
    # sub-second boundary gaps.  Parquet timestamps load as TIMESTAMP_NTZ;
    # the tz-cast offset cancels in the difference.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    brk = F.when(
        us - F.lag(us).over(order) > gap_minutes * 60 * 1_000_000,
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        events.withColumn("_brk", brk)
        .withColumn("session_idx", F.sum("_brk").over(run).cast("long"))
        .groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


SESSION_STATE_SCHEMA = "start long, end long, n long, total double"
SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)


def _session_func(gap_minutes: int, tz: str = "UTC"):
    gap_us = gap_minutes * 60 * 1_000_000

    def _emit_ts(us: int) -> pd.Timestamp:
        # state holds TRUE epoch micros (ts_us = unix_micros, computed
        # JVM-side); emit a session-tz-naive timestamp so Spark's
        # naive→internal conversion lands back on the same epoch value
        return (
            pd.Timestamp(us, unit="us", tz="UTC").tz_convert(tz).tz_localize(None)
        )

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Stateful session merge for one user: fold the batch's events
        into (start, end, n, total) runs, emit every CLOSED session,
        keep the open one in state until the event-time timeout fires.

        Gap arithmetic runs on epoch micros (the ``ts_us`` column), never
        on the tz-naive pandas datetimes Arrow hands over — naive local
        values make DST transitions corrupt differences (code-review r05).
        Null-ts rows are dropped (no event time, no session); null values
        contribute 0 like the batch twin's F.sum null-skip."""
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                s, e, n, tot = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "session_start": [_emit_ts(s)],
                        "session_end": [_emit_ts(e)],
                        "n_events": [n],
                        "total_value": [round(tot, 6)],
                    }
                )
            return

        rows = pd.concat(list(pdfs)).dropna(subset=["ts_us"])
        if rows.empty and not state.exists:
            return
        rows = rows.sort_values(["ts_us", "event_id"])
        ts_us = rows["ts_us"].to_numpy()
        vals = rows["value"].to_numpy()
        cur = list(state.get) if state.exists else None
        out = []
        for t, v in zip(ts_us, vals):
            t = int(t)  # numpy int64 → int (GroupState serializes via JSON)
            if cur is None:
                cur = [t, t, 0, 0.0]
            elif t - cur[1] > gap_us:
                out.append(cur)
                cur = [t, t, 0, 0.0]
            # an out-of-order event inside the watermark may precede the
            # stored session start — the batch twin's min(ts) must match
            # (code-review r05; exact twin parity additionally needs
            # watermark delay ≤ gap, else a far-early event the batch
            # splits into its own session gets absorbed here)
            cur[0] = min(cur[0], t)
            cur[1] = max(cur[1], t)
            cur[2] += 1
            cur[3] += 0.0 if pd.isna(v) else float(v)
        if cur is None:
            return
        state.update((int(cur[0]), int(cur[1]), int(cur[2]), float(cur[3])))
        # close the open session once the watermark passes end + gap
        state.setTimeoutTimestamp(cur[1] // 1000 + gap_minutes * 60 * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out),
                    "session_start": [_emit_ts(s[0]) for s in out],
                    "session_end": [_emit_ts(s[1]) for s in out],
                    "n_events": [s[2] for s in out],
                    "total_value": [round(s[3], 6) for s in out],
                }
            )

    return fn


def stream_sessionize(
    spark: SparkSession,
    source_dir: str,
    *,
    gap_minutes: int = 30,
    watermark: str = "1 minute",
    max_files_per_trigger: int | None = None,
):
    """Streaming sessionization: state shards by user_id across executors;
    a session closes (and is emitted exactly once) either when a same-user
    event arrives past the gap, or when the event-time timeout fires after
    the watermark passes session_end + gap.  Returns the streaming
    DataFrame (append mode)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:  # a SOURCE option, not a sink one
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir).withColumn(
        "ts_us", F.unix_micros("ts")
    )
    tz = spark.conf.get("spark.sql.session.timeZone", "UTC") or "UTC"
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_func(gap_minutes, tz),
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
