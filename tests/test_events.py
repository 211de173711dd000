"""Streaming twins of the batch event operators: watermarked tumbling
windows (append mode: finalized once, late data dropped) and
applyInPandasWithState gap sessions — each differentially checked against
the batch/oracle formulation on the same files."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from bm25_index_tool_spark.pipeline import events as EV

SF_EVENTS = "/root/testdata/sf0.001/events.parquet"


def _read_events(spark):
    return spark.read.schema(EV.EVENT_SCHEMA).parquet(SF_EVENTS)


def _write_waves(spark, src_dir, frames):
    os.makedirs(src_dir, exist_ok=True)
    for i, df in enumerate(frames):
        df.coalesce(1).write.mode("overwrite").parquet(f"{src_dir}/_w{i}")
        # move the single part file into the watched dir, ordered by name
        part = [
            f for f in os.listdir(f"{src_dir}/_w{i}") if f.endswith(".parquet")
        ][0]
        os.rename(f"{src_dir}/_w{i}/{part}", f"{src_dir}/{i:02d}.parquet")


def test_stream_windowed_counts_matches_batch(spark, tmp_path):
    ev = _read_events(spark).orderBy("ts", "event_id").localCheckpoint()
    n = ev.count()
    rows = ev.collect()
    cut = int(n * 0.6)
    t1 = spark.createDataFrame(rows[:cut], EV.EVENT_SCHEMA)
    t2 = spark.createDataFrame(rows[cut:], EV.EVENT_SCHEMA)
    # a LATE straggler: re-timestamped far before the watermark
    late = spark.createDataFrame(rows[:1], EV.EVENT_SCHEMA).withColumn(
        "ts", F.col("ts") - F.expr("INTERVAL 10 DAYS")
    )
    src = str(tmp_path / "ev_drop")
    _write_waves(spark, src, [t1, t2, late])

    q = (
        EV.stream_windowed_counts(
            spark, src, window_duration="10 minutes",
            watermark="30 minutes", max_files_per_trigger=1,
        )
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("win_counts").collect()
    }
    assert len(got) > 0

    # append mode emits exactly the windows the final watermark passed;
    # the late straggler (10 days behind) must influence nothing
    max_ts = t1.unionByName(t2).agg(F.max("ts")).collect()[0][0]
    import datetime

    wm = max_ts - datetime.timedelta(minutes=30)
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in EV.windowed_event_counts(
            t1.unionByName(t2), window_duration="10 minutes"
        )
        .where(F.col("window_end") <= F.lit(wm))
        .collect()
    }
    assert got == expected


def test_stream_sessionize_matches_batch(spark, tmp_path):
    ev = _read_events(spark).where(F.col("user_id") < 10)
    rows = ev.orderBy("ts", "event_id").collect()
    cut = len(rows) // 2
    t1 = spark.createDataFrame(rows[:cut], EV.EVENT_SCHEMA)
    t2 = spark.createDataFrame(rows[cut:], EV.EVENT_SCHEMA)
    # sentinel far in the future: pushes the watermark past every session's
    # end + gap so every real session closes via event-time timeout
    sentinel = spark.createDataFrame(rows[:1], EV.EVENT_SCHEMA).select(
        F.lit(-1).cast("long").alias("event_id"),
        (F.col("ts") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
        F.lit(-1).cast("long").alias("user_id"),
        F.lit("sentinel").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    src = str(tmp_path / "sess_drop")
    _write_waves(spark, src, [t1, t2, sentinel])

    q = (
        EV.stream_sessionize(
            spark, src, gap_minutes=30, watermark="1 minute",
            max_files_per_trigger=1,
        )
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (
            r["user_id"],
            r["session_start"],
            r["session_end"],
            r["n_events"],
            round(r["total_value"], 6),
        )
        for r in spark.table("sessions")
        .where(F.col("user_id") >= 0)
        .collect()
    }
    expected = {
        (
            r["user_id"],
            r["session_start"],
            r["session_end"],
            r["n_events"],
            round(r["total_value"], 6),
        )
        for r in EV.sessionize_events(
            t1.unionByName(t2), gap_minutes=30
        ).collect()
    }
    assert got == expected
    assert len(got) > 5


def test_stream_sessionize_out_of_order_within_watermark(spark, tmp_path):
    """code-review r05: an out-of-order event INSIDE the watermark that
    precedes the stored session start must LOWER session_start (the batch
    twin's min(ts)); pre-fix the start was never lowered.  Also covers a
    null value contributing 0 like F.sum's null-skip."""
    import datetime as dt

    t0 = dt.datetime(2024, 3, 1, 10, 5, 0)

    def _ev(eid, uid, ts, value=1.0):
        return (eid, ts, uid, "click", value, "{}")

    # wave 1: 10:05.  wave 2: 10:04:30 (earlier, within the 2-min
    # watermark) + a null-value event.  sentinel closes everything.
    w1 = spark.createDataFrame([_ev(1, 7, t0)], EV.EVENT_SCHEMA)
    w2 = spark.createDataFrame(
        [
            _ev(2, 7, t0 - dt.timedelta(seconds=30)),
            (3, t0 + dt.timedelta(seconds=10), 7, "click", None, "{}"),
        ],
        EV.EVENT_SCHEMA,
    )
    sentinel = spark.createDataFrame(
        [_ev(-1, -1, t0 + dt.timedelta(days=30), 0.0)], EV.EVENT_SCHEMA
    )
    src = str(tmp_path / "sess_ooo")
    _write_waves(spark, src, [w1, w2, sentinel])
    q = (
        EV.stream_sessionize(
            spark, src, gap_minutes=30, watermark="2 minutes",
            max_files_per_trigger=1,
        )
        .writeStream.format("memory")
        .queryName("sessions_ooo")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ooo"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = (
        spark.table("sessions_ooo").where(F.col("user_id") == 7).collect()
    )
    assert len(rows) == 1
    r = rows[0]
    assert r["session_start"] == t0 - dt.timedelta(seconds=30)
    assert r["session_end"] == t0 + dt.timedelta(seconds=10)
    assert r["n_events"] == 3
    assert r["total_value"] == 2.0  # null value contributed 0
