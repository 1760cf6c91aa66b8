"""Event-rate burst detection — the ops-side anomaly screen a transcript
platform runs over its event firehose (which tools/event types spiked
this hour): bucket events into fixed windows, z-score each window
against its type's own rate distribution, flag outliers.

Model: for each (event_type, window of ``bucket_s`` seconds):

    n(type, w)  = event count in the window
    z(type, w)  = (n − mean_type) / stddev_type

where mean/stddev are over the type's OBSERVED windows (empty windows
are not rows — a type that fires rarely is judged against its own
firing pattern; the all-zero baseline alternative just shifts every z
by a constant per type). ``stddev`` is the sample standard deviation
(n−1) on both engines (Spark ``stddev_samp`` ⇄ DuckDB ``stddev_samp``).

Scale shape (the 100 TB lens):
- ONE shuffle: the (type, window) count — map-side combinable, and the
  key space is |types| × |windows| (tiny vs |events|), so hot event
  types collapse map-side before the exchange.
- The per-type baseline is a second agg over that already-tiny table,
  joined back type-to-type (broadcast at any realistic type count).
- No window functions, no per-event state — this is the batch twin of
  what a streaming deployment would do with a sliding-window agg.

Determinism: counts are exact integers; z is one float expression over
integers, rounded — cross-engine noise ~1e-15, far below the rounding.
A type with a single observed window (stddev undefined) or constant
rate (stddev 0) emits no flags — nullif guard, same on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sessions import _epoch_s


def event_bursts(
    events: DataFrame,
    *,
    bucket_s: int = 3600,
    z_threshold: float = 3.0,
    ts_col: str = "ts",
    type_col: str = "event_type",
    round_to: int = 6,
) -> DataFrame:
    """→ (event_type, window_start_s, n_events, mean_per_window, z) for
    every (type, window) whose count z-scores ≥ ``z_threshold`` against
    the type's own observed-window distribution."""
    if bucket_s <= 0:
        raise ValueError(f"event_bursts: bucket_s must be positive, got {bucket_s}")
    win = (
        F.floor(_epoch_s(F.col(ts_col)) / F.lit(float(bucket_s))).cast("long")
        * F.lit(int(bucket_s))
    ).alias("window_start_s")
    counts = (
        events.select(F.col(type_col).alias("event_type"), win)
        .groupBy("event_type", "window_start_s")
        .agg(F.count("*").alias("n_events"))
    )
    base = counts.groupBy("event_type").agg(
        F.avg("n_events").alias("mean_per_window"),
        F.stddev_samp(F.col("n_events").cast("double")).alias("sd"),
    )
    return (
        counts.join(base, "event_type")
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


def event_bursts_sql(
    bucket_s: int = 3600, z_threshold: float = 3.0, round_to: int = 6
) -> str:
    """DuckDB twin of event_bursts() over the registered ``events`` view
    (same epoch_us/1e6 float seconds as sessionize_sql; stddev_samp on
    both engines; nullif guard identical)."""
    return f"""
WITH counts AS (
  SELECT event_type,
         CAST(floor(epoch_us(ts)/1000000.0 / {float(bucket_s)}) AS BIGINT) * {int(bucket_s)}
           AS window_start_s,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
base AS (
  SELECT event_type, avg(n_events) AS mean_per_window,
         stddev_samp(CAST(n_events AS DOUBLE)) AS sd
  FROM counts GROUP BY event_type
)
SELECT c.event_type, c.window_start_s, c.n_events,
       round(b.mean_per_window, {round_to}) AS mean_per_window,
       round((c.n_events - b.mean_per_window) / nullif(b.sd, 0.0), {round_to}) AS z
FROM counts c JOIN base b USING (event_type)
WHERE (c.n_events - b.mean_per_window) / nullif(b.sd, 0.0) >= {float(z_threshold)}
"""
