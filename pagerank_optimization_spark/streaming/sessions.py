"""Streaming sessionization over the live events feed.

The batch operator (operators.sessions.session_window_stats, Spark's
native gap-merge ``session_window``) runs UNCHANGED over a stream once a
watermark bounds late data — sessions close and emit (append mode) when
the watermark passes their end (last event + gap). Cross-micro-batch
session merging is the state store's job: a session whose events span
micro-batches is merged server-side and emitted once, closed.

Batch⇄stream equivalence is the test contract (tests/test_streaming.py):
a TIME-SPLIT feed (every later chunk strictly newer, so nothing is
late-dropped) must reproduce the batch operator's rows exactly.

The reference is batch-only (SURVEY.md §2.9); this is engine-brief
territory, same as streaming.edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pagerank_optimization_spark.operators.sessions import session_window_stats


def stream_events(spark: SparkSession, path: str, schema) -> DataFrame:
    """File-source events stream; one file per micro-batch so session state
    demonstrably crosses batches."""
    return spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)


def streaming_session_stats(
    events: DataFrame, *, gap_seconds: int = 1800, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked streaming form of session_window_stats: late events
    beyond ``watermark`` are dropped (bounded state — the 100 TB/continuous
    requirement: without a watermark the session store grows forever);
    sessions emit once closed (append mode).

    Watermarks require TIMESTAMP (not NTZ), so ``ts`` is cast first —
    value-preserving under the engine's pinned-UTC session
    (session.get_spark); the batch operator itself stays NTZ end-to-end
    for driver-session-TZ independence."""
    from pyspark.sql import functions as F

    evs = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return session_window_stats(
        evs.withWatermark("ts", watermark), gap_seconds=gap_seconds
    )
