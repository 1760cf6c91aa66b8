"""Stream⇄batch equivalence: transcripts fed file-by-file (conversations
split across micro-batches) must reproduce the batch edge derivation
exactly; the stateful reply operator must carry per-conv state across
batches."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.graph_build import turn_entities
from pagerank_optimization_spark.sources.transcripts import synthesize_transcripts
from pagerank_optimization_spark.streaming.edges import (
    stream_transcripts,
    streaming_reply_edges,
    streaming_tool_edges,
    tool_usage_rates,
)


@pytest.fixture()
def feed_dir(spark):
    d = tempfile.mkdtemp(prefix="feed_")
    tr = synthesize_transcripts(spark, 40, seed=5).orderBy("conv_id", "turn_idx").collect()
    # split MID-conversation: first 60% of each conversation's turns in chunk 0
    chunk0, chunk1 = [], []
    by_conv = {}
    for r in tr:
        by_conv.setdefault(r.conv_id, []).append(r)
    for turns in by_conv.values():
        cut = max(1, int(len(turns) * 0.6))
        chunk0.extend(turns[:cut])
        chunk1.extend(turns[cut:])
    from pagerank_optimization_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    spark.createDataFrame(chunk0, TRANSCRIPT_SCHEMA).coalesce(1).write.parquet(f"{d}/c0")
    spark.createDataFrame(chunk1, TRANSCRIPT_SCHEMA).coalesce(1).write.parquet(f"{d}/c1")
    # file source reads a flat dir: move part files up
    import glob
    import os

    for i, part in enumerate(sorted(glob.glob(f"{d}/c*/part-*.parquet"))):
        os.rename(part, f"{d}/chunk{i}.parquet")
    shutil.rmtree(f"{d}/c0")
    shutil.rmtree(f"{d}/c1")
    yield d, spark.createDataFrame(tr, TRANSCRIPT_SCHEMA)
    shutil.rmtree(d, ignore_errors=True)


def _run_to_memory(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_reply_edges_match_batch(spark, feed_dir):
    d, batch = feed_dir
    stream = stream_transcripts(spark, d)
    _run_to_memory(streaming_reply_edges(stream), "reply_edges_out")
    got = sorted(
        (r.src, r.dst) for r in spark.sql("SELECT * FROM reply_edges_out").collect()
    )
    # batch oracle: lag over conv windows (pre-distinct, multiset equality)
    from pyspark.sql import Window as W

    turns = turn_entities(batch)
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    want = sorted(
        (r.src, r.dst)
        for r in turns.withColumn("prev", F.lag("entity").over(w))
        .filter(F.col("prev").isNotNull())
        .select(F.col("entity").alias("src"), F.col("prev").alias("dst"))
        .collect()
    )
    assert got == want
    assert len(got) > 0


def test_streaming_tool_edges_match_batch(spark, feed_dir):
    d, batch = feed_dir
    stream = stream_transcripts(spark, d)
    _run_to_memory(streaming_tool_edges(stream), "tool_edges_out")
    got = sorted((r.src, r.dst) for r in spark.sql("SELECT * FROM tool_edges_out").collect())
    # the same (stateless) expression applied in batch is the oracle
    want = sorted((r.src, r.dst) for r in streaming_tool_edges(batch).collect())
    assert got == want
    assert len(got) > 0


def test_tool_usage_rates_runs(spark, feed_dir):
    d, batch = feed_dir
    stream = stream_transcripts(spark, d)
    q = (
        tool_usage_rates(stream, window="6 hours")
        .writeStream.format("memory")
        .queryName("rates_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM rates_out").collect()
    # append-mode windowed agg emits only watermark-closed windows; the
    # deterministic feed spans many days so most windows close
    assert len(rows) > 0
    assert all(r.n_invocations > 0 for r in rows)


@pytest.fixture()
def events_feed_dir(spark):
    """Events TIME-SPLIT into two chunks (median ts) + a far-future flush
    event from a sentinel user: chunks arrive in time order so no real
    event is ever watermark-late, sessions spanning the split exercise
    cross-batch state-store merging, and the flush advances the watermark
    past every real session end so append mode emits them all."""
    import glob
    import os
    from datetime import timedelta

    d = tempfile.mkdtemp(prefix="events_feed_")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = events.orderBy("ts", "event_id").collect()
    schema = events.schema
    cut = len(rows) // 2
    t_max = max(r.ts for r in rows)
    flush = rows[-1].asDict()
    flush["event_id"], flush["user_id"] = -1, -1
    flush["ts"] = t_max + timedelta(days=30)
    from pyspark.sql import Row

    spark.createDataFrame(rows[:cut], schema).coalesce(1).write.parquet(f"{d}/c0")
    spark.createDataFrame(rows[cut:], schema).coalesce(1).write.parquet(f"{d}/c1")
    spark.createDataFrame([Row(**flush)], schema).coalesce(1).write.parquet(f"{d}/c2")
    for i, part in enumerate(sorted(glob.glob(f"{d}/c*/part-*.parquet"))):
        os.rename(part, f"{d}/chunk{i}.parquet")
    for c in ("c0", "c1", "c2"):
        shutil.rmtree(f"{d}/{c}")
    yield d, events, schema
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_session_stats_match_batch(spark, events_feed_dir):
    """Stream (time-split feed, cross-batch session merging, watermark
    flush) ≡ batch session_window_stats on the same events — row-exact."""
    from pagerank_optimization_spark.operators.sessions import session_window_stats
    from pagerank_optimization_spark.streaming.sessions import (
        stream_events,
        streaming_session_stats,
    )

    d, events, schema = events_feed_dir
    q = (
        streaming_session_stats(stream_events(spark, d, schema), gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM sess_out WHERE user_id <> -1").collect())
    )
    want = sorted(map(tuple, session_window_stats(events, gap_seconds=1800).collect()))
    assert got == want
    assert len(got) > 100  # real corpus: thousands of sessions


def test_session_window_stats_batch_consistency(spark):
    """The gap-merge operator agrees with the lag+cumsum session_stats on
    totals (same partition of events into sessions on this corpus — no
    exact-gap ties at 1800s)."""
    from pagerank_optimization_spark.operators.sessions import (
        session_stats,
        session_window_stats,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    via_window = session_window_stats(events, gap_seconds=1800).collect()
    via_lag = session_stats(events, gap_seconds=1800).collect()
    assert len(via_window) == len(via_lag)
    assert sum(r.n_events for r in via_window) == events.count()
    assert abs(sum(r.total_value for r in via_window) - sum(r.total_value for r in via_lag)) < 1e-3
