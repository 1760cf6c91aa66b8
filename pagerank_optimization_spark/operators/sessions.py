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


def tool_paths(
    transcripts: DataFrame,
    *,
    length: int = 3,
    top_n: int = 50,
) -> DataFrame:
    """→ (path, n_paths): the ``top_n`` most frequent length-``length``
    chains of CONSECUTIVE tool invocations within a conversation,
    rendered as "a>b>c" — the higher-order completion of the first-order
    ``tool_transitions`` kernel (what a tool-routing policy audits when
    one-step probabilities hide multi-step loops, e.g. retry cycles).

    Consecutive means adjacent in the conversation's tool-call SEQUENCE
    (intervening non-tool turns don't break a chain) — the same
    call-sequence model tool_transitions uses, extended to order
    ``length``. Ties order deterministically by (n_paths DESC, path ASC).

    Scale shape: one window by conv_id (conversations are turn-capped, so
    per-partition state is bounded), a map-side-combinable groupBy whose
    key space is ≤ n_tools^length, and a TakeOrdered top-N — never a
    global sort."""
    if length < 2:
        raise ValueError(f"tool_paths: length must be ≥ 2, got {length}")
    if top_n < 1:
        raise ValueError(f"tool_paths: top_n must be ≥ 1, got {top_n}")
    calls = transcripts.filter(
        (F.col("role") == "assistant") & F.col("tool").isNotNull()
    ).select("conv_id", "turn_idx", "tool")
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    steps = [F.col("tool")] + [F.lead("tool", j).over(w) for j in range(1, length)]
    seq = calls.select(F.concat_ws(">", *steps).alias("path"), steps[-1].alias("_last"))
    return (
        seq.filter(F.col("_last").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.desc("n_paths"), F.asc("path"))
        .limit(top_n)
    )


def tool_paths_sql(length: int = 3, top_n: int = 50) -> str:
    """DuckDB twin of tool_paths (caller supplies the transcripts CTE):
    identical lead-window chain, count, and deterministic top-N cut."""
    leads = ", ".join(
        f"lead(tool, {j}) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS t{j}"
        for j in range(1, length)
    )
    parts = " || '>' || ".join(["tool"] + [f"t{j}" for j in range(1, length)])
    return f"""
SELECT path, CAST(count(*) AS BIGINT) AS n_paths
FROM (
  SELECT {parts} AS path, t{length - 1} AS _last
  FROM (
    SELECT conv_id, turn_idx, tool, {leads}
    FROM transcripts WHERE role = 'assistant' AND tool IS NOT NULL
  ) s
) p
WHERE _last IS NOT NULL
GROUP BY path
ORDER BY n_paths DESC, path ASC
LIMIT {top_n}
"""


def entity_trend(
    transcripts: DataFrame,
    *,
    smoothing: float = 1.0,
    round_to: int = 8,
) -> DataFrame:
    """→ (entity, n_early, n_late, log_ratio): per-entity turn counts in
    the EARLY vs LATE half of the corpus time range (midpoint of
    [min ts, max ts]; the tie row at the exact midpoint counts early on
    both engines — strict >), with the add-``smoothing`` log odds
    log((n_late + s)/(n_early + s)) — the rising/falling-entity screen
    ("who matters LATELY" as a trend statistic rather than a decayed
    rank; complements graph_build's edge_weights="decay").

    Entities are the graph's own turn entities (conv/agent/tool —
    functions.entities.turn_entity_expr), so a trend row joins 1:1
    against any rank vector this engine produces.

    Scale shape: one pass for the global [min, max] epoch (a broadcast
    one-row aggregate riding the plan — zero collects), then ONE
    map-side-combinable groupBy(entity); NTZ-safe epoch arithmetic
    (driver-session-TZ-independent, same contract as sessionize)."""
    if smoothing <= 0:
        raise ValueError(f"entity_trend: smoothing must be > 0, got {smoothing}")
    from ..functions.entities import turn_entity_expr

    t = transcripts.select(
        turn_entity_expr(F.col("role"), F.col("conv_id"), F.col("tool")).alias("entity"),
        _epoch_s(F.col("ts")).alias("e"),
    ).filter(F.col("entity").isNotNull())
    span = t.agg(F.min("e").alias("lo"), F.max("e").alias("hi"))
    late = (F.col("e") * 2 > F.col("lo") + F.col("hi")).cast("long")
    counts = (
        t.crossJoin(F.broadcast(span))
        .select("entity", late.alias("late"))
        .groupBy("entity")
        .agg(
            F.sum(F.lit(1) - F.col("late")).alias("n_early"),
            F.sum("late").alias("n_late"),
        )
    )
    s = float(smoothing)
    return counts.select(
        "entity",
        "n_early",
        "n_late",
        F.round(
            F.log((F.col("n_late") + F.lit(s)) / (F.col("n_early") + F.lit(s))),
            round_to,
        ).alias("log_ratio"),
    )


def entity_trend_sql(smoothing: float = 1.0, round_to: int = 8) -> str:
    """DuckDB twin of entity_trend (caller supplies the transcripts CTE
    and the entity expression via plans.oracle_sql)."""
    # the entity expression is dialect-owned by plans.oracle_sql — this
    # body expects a CTE named ``turns_ts`` with (entity, e) columns
    return f"""
SELECT entity, n_early, n_late,
       round(ln((n_late + {smoothing!r}) / (n_early + {smoothing!r})), {round_to}) AS log_ratio
FROM (
  SELECT entity,
         CAST(sum(CASE WHEN e * 2 > (SELECT lo + hi FROM span) THEN 0 ELSE 1 END) AS BIGINT) AS n_early,
         CAST(sum(CASE WHEN e * 2 > (SELECT lo + hi FROM span) THEN 1 ELSE 0 END) AS BIGINT) AS n_late
  FROM turns_ts
  GROUP BY entity
) c
"""
