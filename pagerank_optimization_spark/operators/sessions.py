"""Sessionization over the events stream table — gap-based session ids via
window lag + conditional cumsum (the standard Spark idiom; fully
SQL-expressible, so DuckDB-oracle-checked).

A session is a maximal run of a user's events with inter-event gaps below
``gap_seconds``. Output is deterministic: session_seq numbers sessions per
user in time order; ties broken by event_id (total order)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _epoch_s(ts: Column) -> Column:
    """Naive-timestamp epoch seconds, SESSION-TIMEZONE-INDEPENDENT.

    The driver's correctness harness runs these queries in its own session,
    whose timezone we do not control; `unix_micros(cast(ts as timestamp))`
    would interpret the naive value in that session zone (and drift vs the
    DuckDB oracle across DST transitions). Pure NTZ arithmetic —
    timestampdiff against the naive epoch — matches DuckDB's
    epoch_us(naive)/1e6 exactly under any session zone."""
    origin = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    # the ntz cast is a no-op for the batch tables (already NTZ — keeps the
    # driver-session-TZ independence above); the streaming path feeds TZ
    # timestamps (watermarks require TIMESTAMP), converted under the
    # engine's pinned-UTC session (session.get_spark)
    return F.timestamp_diff("MICROSECOND", origin, ts.cast("timestamp_ntz")) / F.lit(1e6)


def sessionize(events: DataFrame, *, gap_seconds: int = 1800) -> DataFrame:
    """→ events + (session_seq, session_id). One shuffle (by user_id)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = _epoch_s(F.col("ts")) - F.lag(_epoch_s(F.col("ts"))).over(w)
    df = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_seconds), F.lit(1)).otherwise(F.lit(0)),
    )
    df = df.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return df.select(
        "event_id",
        "user_id",
        "session_seq",
        F.concat_ws("-", F.col("user_id").cast("string"), F.col("session_seq").cast("string")).alias(
            "session_id"
        ),
    )


def session_stats(events: DataFrame, *, gap_seconds: int = 1800) -> DataFrame:
    """Per-session aggregates: → (session_id, user_id, n_events,
    duration_s, total_value)."""
    s = sessionize(events, gap_seconds=gap_seconds)
    joined = events.select("event_id", "ts", "value").join(s, "event_id")
    return joined.groupBy("session_id", "user_id").agg(
        F.count("*").alias("n_events"),
        F.round(
            F.max(_epoch_s(F.col("ts"))) - F.min(_epoch_s(F.col("ts"))), 3
        ).alias("duration_s"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


def session_window_stats(events: DataFrame, *, gap_seconds: int = 1800) -> DataFrame:
    """Per-session aggregates via Spark's NATIVE ``session_window`` — the
    same logical operator as ``session_stats`` but expressed as a gap-merge
    aggregation instead of a lag+cumsum window chain, which is the form
    that runs UNCHANGED over a stream (streaming.sessions wraps this with a
    watermark; batch callers get a DuckDB-oracle-checkable query).

    Boundary convention differs from ``sessionize`` by design:
    ``session_window`` windows are half-open [ts, ts+gap), so a gap of
    EXACTLY ``gap_seconds`` starts a new session (>=), while the lag-based
    ``sessionize`` keeps it (>). Identical on any corpus without exact-gap
    ties; both conventions are industry-standard — documented, not hidden.

    → (user_id, session_start_s, session_end_s, n_events, duration_s,
    total_value); window bounds as NTZ-safe epoch seconds (see _epoch_s),
    session_end = last event + gap (the session_window close)."""
    gap = f"{gap_seconds} seconds"
    return (
        events.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.max(_epoch_s(F.col("ts"))) - F.min(_epoch_s(F.col("ts"))), 3
            ).alias("duration_s"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.round(_epoch_s(F.col("win.start")), 3).alias("session_start_s"),
            F.round(_epoch_s(F.col("win.end")), 3).alias("session_end_s"),
            "n_events",
            "duration_s",
            "total_value",
        )
    )


def sessionize_sql(gap_seconds: int = 1800) -> str:
    """DuckDB twin of sessionize() over the registered ``events`` view."""
    # epoch_us/1e6 ⇄ Spark's ts.cast(double): microsecond-precision
    # float seconds on both sides; the cumsum window ordering (ts, event_id)
    # must match Spark's exactly or session numbering drifts on ties
    return f"""
WITH g AS (
  SELECT event_id, user_id, ts,
         CASE WHEN epoch_us(ts)/1000000.0 - lag(epoch_us(ts)/1000000.0) OVER w IS NULL
                OR epoch_us(ts)/1000000.0 - lag(epoch_us(ts)/1000000.0) OVER w > {gap_seconds}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT event_id, user_id,
         -- CAST: DuckDB's windowed sum() yields HUGEINT, which pandas
         -- renders as float64; Spark emits int64. Same values, different
         -- bytes under the driver's hash — force BIGINT on the SQL side.
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM g
)
SELECT event_id, user_id, session_seq,
       concat(CAST(user_id AS VARCHAR), '-', CAST(session_seq AS VARCHAR)) AS session_id
FROM s
"""


def session_stats_sql(gap_seconds: int = 1800) -> str:
    return f"""
WITH sess AS ({sessionize_sql(gap_seconds)})
SELECT s.session_id, s.user_id,
       count(*) AS n_events,
       round(max(epoch_us(e.ts)/1000000.0) - min(epoch_us(e.ts)/1000000.0), 3) AS duration_s,
       round(sum(e.value), 6) AS total_value
FROM sess s JOIN events e ON s.event_id = e.event_id
GROUP BY s.session_id, s.user_id
"""


def session_window_stats_sql(gap_seconds: int = 1800) -> str:
    """DuckDB twin of session_window_stats(): the gap-merge semantics
    re-expressed as lag+cumsum with the session_window boundary (>=, since
    [ts, ts+gap) windows are half-open), window end = last event + gap."""
    return f"""
WITH g AS (
  SELECT event_id, user_id, ts, value,
         CASE WHEN epoch_us(ts)/1000000.0 - lag(epoch_us(ts)/1000000.0) OVER w IS NULL
                OR epoch_us(ts)/1000000.0 - lag(epoch_us(ts)/1000000.0) OVER w >= {gap_seconds}
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT user_id,
       round(min(epoch_us(ts)/1000000.0), 3) AS session_start_s,
       round(max(epoch_us(ts)/1000000.0) + {gap_seconds}, 3) AS session_end_s,
       count(*) AS n_events,
       round(max(epoch_us(ts)/1000000.0) - min(epoch_us(ts)/1000000.0), 3) AS duration_s,
       round(sum(value), 6) AS total_value
FROM s
GROUP BY user_id, sid
"""


def conversation_stats(transcripts: DataFrame, *, round_to: int = 3) -> DataFrame:
    """Per-conversation transcript profile — the conversation-level
    analog of session_stats: → (conv_id, n_turns, n_user_turns,
    n_tool_calls, n_distinct_tools, duration_s).

    One map-side-combinable agg keyed by conv_id (conversations are
    bounded — max_turns-capped — so there is no hot-key hazard by
    construction); duration in NTZ-safe epoch seconds (_epoch_s)."""
    return transcripts.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum((F.col("role") == "user").cast("long")).alias("n_user_turns"),
        F.sum(
            ((F.col("role") == "assistant") & F.col("tool").isNotNull()).cast("long")
        ).alias("n_tool_calls"),
        F.count_distinct(
            F.when(
                (F.col("role") == "assistant") & F.col("tool").isNotNull(),
                F.col("tool"),
            )
        ).alias("n_distinct_tools"),
        F.round(
            F.max(_epoch_s(F.col("ts"))) - F.min(_epoch_s(F.col("ts"))), round_to
        ).alias("duration_s"),
    )


def conversation_stats_sql(round_to: int = 3, dialect: str = "duckdb") -> str:
    """DuckDB twin of conversation_stats over the derived transcripts
    CTE (caller supplies the transcripts CTE; epoch_us/1e6 ⇄ _epoch_s)."""
    return f"""
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(coalesce(sum(CASE WHEN role = 'user' THEN 1 END), 0) AS BIGINT) AS n_user_turns,
       CAST(coalesce(sum(CASE WHEN role = 'assistant' AND tool IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_tool_calls,
       CAST(count(DISTINCT CASE WHEN role = 'assistant' AND tool IS NOT NULL THEN tool END) AS BIGINT) AS n_distinct_tools,
       round(max(epoch_us(ts)/1000000.0) - min(epoch_us(ts)/1000000.0), {round_to}) AS duration_s
FROM transcripts GROUP BY conv_id
"""


def tool_transitions(transcripts: DataFrame, *, round_to: int = 8) -> DataFrame:
    """First-order Markov transition matrix over tool invocations within a
    conversation: → (from_tool, to_tool, n_transitions, prob) where prob is
    the row-normalized transition probability P(to | from).

    This is the distilled "tool-invocation adjacency" of the north star —
    the same consecutive-call structure the edge derivation encodes as
    agent→tool edges, here estimated as a transition kernel (what a
    tool-routing policy or an agent-behavior drift monitor consumes).

    Scale shape: the lag window partitions by conv_id — conversations are
    bounded (max-turns-capped) so the per-partition state is O(turns), no
    hot key possible; the transition groupBy key space is n_tools² (tiny);
    the row-normalizing totals join broadcasts. One shuffle by conv_id +
    one bounded agg at ANY corpus size."""
    calls = transcripts.filter(
        (F.col("role") == "assistant") & F.col("tool").isNotNull()
    ).select("conv_id", "turn_idx", "tool")
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    seq = calls.withColumn("from_tool", F.lag("tool").over(w))
    pairs = (
        seq.filter(F.col("from_tool").isNotNull())
        .groupBy("from_tool", F.col("tool").alias("to_tool"))
        .agg(F.count("*").alias("n_transitions"))
    )
    totals = pairs.groupBy("from_tool").agg(F.sum("n_transitions").alias("_tot"))
    return (
        pairs.join(F.broadcast(totals), "from_tool")
        .select(
            "from_tool",
            "to_tool",
            "n_transitions",
            F.round(F.col("n_transitions") / F.col("_tot"), round_to).alias("prob"),
        )
    )


def tool_transitions_sql(round_to: int = 8) -> str:
    """DuckDB twin of tool_transitions (caller supplies the transcripts
    CTE): the identical lag window + count + row-normalized probability."""
    return f"""
SELECT from_tool, to_tool, n_transitions,
       round(n_transitions * 1.0
             / sum(n_transitions) OVER (PARTITION BY from_tool), {round_to}) AS prob
FROM (
  SELECT from_tool, tool AS to_tool, CAST(count(*) AS BIGINT) AS n_transitions
  FROM (
    SELECT conv_id, turn_idx, tool,
           lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS from_tool
    FROM transcripts WHERE role = 'assistant' AND tool IS NOT NULL
  ) s
  WHERE from_tool IS NOT NULL
  GROUP BY 1, 2
) p
"""
