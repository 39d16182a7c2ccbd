"""Structured Streaming module tests (SURVEY §2.9).

The capture path (file source → watermarked tumbling window → sink) and the
custom stateful sessionization operator, drained with Trigger.AvailableNow
for deterministic batch-parity assertions.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from my_feast_spark.streaming import (
    capture_to_parquet,
    read_event_stream,
    run_to_memory_table,
    sessionize,
    streaming_dedup,
    tumbling_window_agg,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


@pytest.fixture()
def event_dir(spark, tmp_path):
    """A small capture directory: two parquet files of (user_id, ts, value)."""
    rows = []
    for u in (1, 2):
        # session A: 3 events 5 min apart; 45-min gap; session B: 2 events
        for i in range(3):
            rows.append((u, T0 + dt.timedelta(minutes=5 * i), float(i)))
        rows.append((u, T0 + dt.timedelta(minutes=55), 10.0))
        rows.append((u, T0 + dt.timedelta(minutes=60), 11.0))
        # a third open-tail session 2 hours later
        rows.append((u, T0 + dt.timedelta(minutes=180), 99.0))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    path = str(tmp_path / "events_stream")
    df.repartition(2).write.parquet(path)
    return path


def test_tumbling_window_agg_matches_batch(spark, event_dir):
    stream = read_event_stream(spark, event_dir)
    agg = tumbling_window_agg(
        stream, "ts", "1 hour", ["user_id"],
        [F.sum("value").alias("sum_value"), F.count(F.lit(1)).alias("n")],
        watermark_delay="1 hour",
    )
    got = run_to_memory_table(agg, spark, output_mode="complete")
    batch = (
        spark.read.parquet(event_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("bucket_ts"), "user_id")
        .agg(F.sum("value").alias("sum_value"), F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, got.select("bucket_ts", "user_id", "sum_value", "n").collect())) == \
        sorted(map(tuple, batch.collect()))


def test_streaming_dedup_drops_repeats(spark, event_dir):
    stream = read_event_stream(spark, event_dir).select(
        "user_id", F.date_trunc("hour", "ts").alias("bucket_ts")
    )
    out = run_to_memory_table(
        streaming_dedup(stream, ["user_id"], ts_col="bucket_ts"),
        spark, output_mode="append",
    )
    # 2 users x 3 distinct hours (hour 0: minutes 0-55, hour 1: minute 60,
    # hour 3: minute 180) — repeats within hour 0 collapse
    assert out.count() == 6
    assert out.distinct().count() == 6


def test_sessionize_closes_on_gap(spark, event_dir):
    stream = read_event_stream(spark, event_dir)
    out = run_to_memory_table(
        sessionize(stream, gap_minutes=30), spark, output_mode="append"
    ).collect()
    # per user: session A (3 events) and session B (2 events) are CLOSED by
    # later events; the 180-min tail stays open (no timeout in drain mode)
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    assert set(by_user) == {1, 2}
    for u, sessions in by_user.items():
        got = sorted((r.session_start, r.session_end, r.n_events) for r in sessions)
        assert got == [
            (T0, T0 + dt.timedelta(minutes=10), 3),
            (T0 + dt.timedelta(minutes=55), T0 + dt.timedelta(minutes=60), 2),
        ]


def test_capture_to_parquet_roundtrip(spark, event_dir, tmp_path):
    stream = read_event_stream(spark, event_dir)
    out_path = str(tmp_path / "capture")
    ckpt = str(tmp_path / "ckpt")
    q = capture_to_parquet(stream, out_path, ckpt, available_now=True)
    q.awaitTermination(120)
    assert os.path.isdir(out_path)
    src_n = spark.read.parquet(event_dir).count()
    assert spark.read.parquet(out_path).count() == src_n
