"""Streaming burst flagging over the live events feed — the
lambda-architecture split of operators.bursts:

- BATCH side trains the baseline: per-type mean/stddev of
  windowed counts (operators.bursts.event_bursts's ``base`` aggregate,
  exposed here as ``burst_baseline``). At 100 TB this is a scheduled
  job whose output is a |types|-row table — trivially broadcastable.
- STREAM side counts (type, window) with a watermarked tumbling window
  and joins the static baseline (stream-static join: no state beyond
  the windowed agg, which the watermark bounds), emitting flags with
  the SAME z formula. A window's flag emits once the watermark passes
  its end (append mode).

Batch⇄stream equivalence is the test contract (tests/test_bursts
streaming case): a time-split feed with a frozen baseline must
reproduce the batch operator's flags exactly.

Why not learn the baseline in-stream: z-scoring a window against a
baseline that includes the window itself needs the full history every
trigger — unbounded state. The frozen-baseline split is how production
anomaly screens actually run (and it makes the semantics deterministic:
same baseline, same flags, any micro-batch slicing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_optimization_spark.operators.bursts import event_bursts  # noqa: F401 (re-export context)
from pagerank_optimization_spark.operators.sessions import _epoch_s


def burst_baseline(
    events: DataFrame, *, bucket_s: int = 3600, type_col: str = "event_type"
) -> DataFrame:
    """Batch-side baseline: → (event_type, mean_per_window, sd) over the
    type's observed windows — the training half of the split."""
    win = (
        F.floor(_epoch_s(F.col("ts")) / F.lit(float(bucket_s))).cast("long")
        * F.lit(int(bucket_s))
    ).alias("window_start_s")
    counts = (
        events.select(F.col(type_col).alias("event_type"), win)
        .groupBy("event_type", "window_start_s")
        .agg(F.count("*").alias("n_events"))
    )
    return counts.groupBy("event_type").agg(
        F.avg("n_events").alias("mean_per_window"),
        F.stddev_samp(F.col("n_events").cast("double")).alias("sd"),
    )


def streaming_burst_flags(
    events: DataFrame,
    baseline: DataFrame,
    *,
    bucket_s: int = 3600,
    z_threshold: float = 3.0,
    watermark: str = "2 hours",
    round_to: int = 6,
) -> DataFrame:
    """Stream side: watermarked tumbling-window counts per type, joined
    against the static ``baseline``, z-flagged with the batch formula.
    → (event_type, window_start_s, n_events, mean_per_window, z),
    append-mode (a window emits once closed by the watermark)."""
    evs = events.withColumn("ts", F.col("ts").cast("timestamp"))
    counts = (
        evs.withWatermark("ts", watermark)
        .groupBy(
            F.col("event_type"),
            F.window("ts", f"{int(bucket_s)} seconds").alias("win"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "event_type",
            F.col("win.start").cast("long").alias("window_start_s"),
            "n_events",
        )
    )
    return (
        counts.join(baseline, "event_type")
        .withColumn(
            "z",
            (F.col("n_events") - F.col("mean_per_window"))
            / F.nullif(F.col("sd"), F.lit(0.0)),
        )
        .filter(F.col("z") >= z_threshold)
        .select(
            "event_type",
            "window_start_s",
            "n_events",
            F.round("mean_per_window", round_to).alias("mean_per_window"),
            F.round("z", round_to).alias("z"),
        )
    )
