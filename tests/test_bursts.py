"""Burst-detection tests: planted spike found, quiet types silent,
python z-score recompute, degenerate (constant-rate / single-window)
types emit nothing."""

import datetime

import numpy as np
import pytest

from pagerank_optimization_spark.operators.bursts import event_bursts

T0 = datetime.datetime(2024, 3, 1, 0, 0, 0)


def _events_df(spark, rows):
    # rows: (event_id, minutes_from_t0, event_type)
    full = [
        (i, T0 + datetime.timedelta(minutes=m), 1, t, 1.0, "{}")
        for (i, m, t) in rows
    ]
    return spark.createDataFrame(
        full,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_planted_spike_flagged_and_z_matches_numpy(spark):
    rows = []
    i = 0
    # type "a": 2 events/hour for 12 hours, then a 40-event spike hour
    for h in range(12):
        for k in range(2):
            rows.append((i, h * 60 + k, "a")); i += 1
    for k in range(40):
        rows.append((i, 12 * 60 + k, "a")); i += 1
    # type "b": perfectly constant -> sd 0 -> never flagged
    for h in range(10):
        rows.append((i, h * 60, "b")); i += 1
    df = _events_df(spark, rows)
    got = event_bursts(df, bucket_s=3600, z_threshold=3.0).collect()
    assert len(got) == 1
    r = got[0]
    assert r.event_type == "a" and r.n_events == 40
    counts = np.array([2.0] * 12 + [40.0])
    z = (40 - counts.mean()) / counts.std(ddof=1)
    assert abs(r.z - round(float(z), 6)) < 1e-9
    assert abs(r.mean_per_window - round(float(counts.mean()), 6)) < 1e-9
    # window starts at hour 12 from T0's epoch
    import calendar

    t0s = calendar.timegm(T0.timetuple())
    assert r.window_start_s == (t0s // 3600) * 3600 + 12 * 3600


def test_single_window_type_silent(spark):
    df = _events_df(spark, [(0, 0, "x"), (1, 1, "x"), (2, 2, "x")])
    assert event_bursts(df, bucket_s=3600, z_threshold=0.0).count() == 0


def test_bad_bucket_raises(spark):
    df = _events_df(spark, [(0, 0, "x")])
    with pytest.raises(ValueError):
        event_bursts(df, bucket_s=0)


def test_streaming_burst_flags_match_batch(spark, tmp_path):
    """Stream (time-split feed + watermark flush, frozen batch baseline)
    ≡ the batch z formula over the same counts — row-exact. The flush
    event uses a sentinel type so it perturbs no real type's windows."""
    import glob
    import os

    from pagerank_optimization_spark.streaming.bursts import (
        burst_baseline,
        streaming_burst_flags,
    )

    rows = []
    i = 0
    for h in range(12):
        for k in range(2):
            rows.append((i, T0 + datetime.timedelta(minutes=h * 60 + k), 1, "a", 1.0, "{}")); i += 1
    for k in range(40):
        rows.append((i, T0 + datetime.timedelta(minutes=12 * 60 + k), 1, "a", 1.0, "{}")); i += 1
    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    events = spark.createDataFrame(rows, schema)
    d = str(tmp_path / "feed")
    cut = len(rows) // 2
    flush = (-1, T0 + datetime.timedelta(days=30), -1, "_flush", 0.0, "{}")
    spark.createDataFrame(rows[:cut], schema).coalesce(1).write.parquet(f"{d}/c0")
    spark.createDataFrame(rows[cut:], schema).coalesce(1).write.parquet(f"{d}/c1")
    spark.createDataFrame([flush], schema).coalesce(1).write.parquet(f"{d}/c2")
    for j, part in enumerate(sorted(glob.glob(f"{d}/c*/part-*.parquet"))):
        os.rename(part, f"{d}/chunk{j}.parquet")

    baseline = burst_baseline(events, bucket_s=3600)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        streaming_burst_flags(stream, baseline, bucket_s=3600, z_threshold=3.0)
        .writeStream.format("memory")
        .queryName("bursts_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql(
        "SELECT * FROM bursts_out WHERE event_type <> '_flush'").collect()))
    want = sorted(map(tuple, event_bursts(events, bucket_s=3600, z_threshold=3.0).collect()))
    assert got == want
    assert len(got) == 1  # the planted hour-12 spike
