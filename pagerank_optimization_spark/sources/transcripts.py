"""Transcript sources.

The reference's only source is a stochastic Kronecker COO generator
(pagerank.c:153-223) seeded with `srand(time(NULL))` (pagerank.c:166) — i.e.
non-reproducible. We fix that defect: every generator here is a pure,
seeded, deterministic function, executed distributed via ``spark.range``
(no driver-side loops, no Python RNG state).

Two sources:

1. ``synthesize_transcripts`` — the primary fixture generator
   (BASELINE.json input_hint schema). Zipf-skewed agents/tools reproduce
   the Kronecker seed's power-law hubs (densities {0.91,0.75,0.63,0.52},
   verify_op.c:160-162) so skew-handling code paths are exercised.

2. ``transcripts_from_events`` — derives a transcripts-shaped table from
   the driver's ``events`` parquet with arithmetic-only expressions, so the
   exact same derivation is expressible in DuckDB SQL for the correctness
   oracle (``transcripts_from_events_sql``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

_U_BITS = 40
_U_MOD = 1 << _U_BITS


def _hash_uniform(*cols, seed: int) -> F.Column:
    """Deterministic U[0,1) from column values — xxhash64 folded to 40 bits.

    Replaces the reference's `rand_float = rand()/RAND_MAX` Bernoulli draw
    (pagerank.c:180-208) with a seedable, distributed, order-independent
    uniform: same row → same u, on any partitioning.
    """
    h = F.xxhash64(*cols, F.lit(seed))
    return (F.pmod(h, F.lit(_U_MOD))).cast("double") / F.lit(float(_U_MOD))


def synthesize_transcripts(
    spark: SparkSession,
    n_conv: int,
    seed: int = 42,
    geo_p: float = 0.15,
    max_turns: int = 64,
    tool_prob: float = 0.4,
) -> DataFrame:
    """Deterministic multi-turn transcript table (input_hint schema).

    - turns per conversation ~ 4 + Geometric(geo_p), capped at ``max_turns``
    - roles alternate user/assistant
    - agent per conversation ~ Zipf over ~n_conv/10 agents (hub skew)
    - assistant turns invoke a tool w.p. ``tool_prob``; tool ~ Zipf over
      ~sqrt(n_conv) tools (hub skew, mirrors Kronecker hubs)
    - text = f"{conv_id}:{turn_idx}:{role}:{payload}" (per-turn equality
      invariant checkable under stable (conv_id, turn_idx) ordering)
    - ts strictly increasing within each conv_id
    """
    n_agents = max(1, n_conv // 10)
    n_tools = max(2, int(n_conv**0.5))

    conv = spark.range(n_conv).select(
        F.format_string("conv-%06d", F.col("id")).alias("conv_id"),
        F.col("id").alias("conv_num"),
    )
    # geometric turn count from one uniform draw: floor(log(1-u)/log(1-p))
    u_turns = _hash_uniform(F.col("conv_num"), F.lit("nturns"), seed=seed)
    conv = conv.withColumn(
        "n_turns",
        F.least(
            F.lit(max_turns),
            (F.lit(4) + F.floor(F.log(F.lit(1.0) - u_turns) / F.log(F.lit(1.0 - geo_p)))).cast("int"),
        ),
    )
    # Zipf(1)-ish agent: floor(exp(u * ln(n_agents))) - 1 → density ∝ 1/x
    u_agent = _hash_uniform(F.col("conv_num"), F.lit("agent"), seed=seed)
    conv = conv.withColumn(
        "agent_idx",
        F.least(F.lit(n_agents - 1), (F.exp(u_agent * F.log(F.lit(float(n_agents)))) - 1).cast("int")),
    )

    turns = conv.select(
        "conv_id",
        "conv_num",
        "agent_idx",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    role = F.when(F.col("turn_idx") % 2 == 0, F.lit("user")).otherwise(F.lit("assistant"))
    u_tool_draw = _hash_uniform(F.col("conv_num"), F.col("turn_idx"), F.lit("tooldraw"), seed=seed)
    u_tool_id = _hash_uniform(F.col("conv_num"), F.col("turn_idx"), F.lit("toolid"), seed=seed)
    tool_idx = F.least(F.lit(n_tools - 1), (F.exp(u_tool_id * F.log(F.lit(float(n_tools)))) - 1).cast("int"))
    tool = F.when(
        (role == "assistant") & (u_tool_draw < F.lit(tool_prob)),
        F.format_string("tool-%04d", tool_idx),
    )
    payload = F.conv(
        F.pmod(F.xxhash64("conv_num", "turn_idx", F.lit(seed)), F.lit(1 << 32)).cast("string"), 10, 16
    )
    out = turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        F.concat_ws(":", "conv_id", F.col("turn_idx").cast("string"), role, payload).alias("text"),
        tool.alias("tool"),
        # agent identity rides in no column (schema is fixed); it is re-derivable
        # from conv_id digits — see functions.entities.agent_key_expr
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=(F.col("conv_num") * 86400 + F.col("turn_idx") * 7).cast("double"))
        ).alias("ts"),
    )
    return out


# --- events → transcripts (oracle-parity derivation) -----------------------
#
# Chunk each user's event stream (ordered by ts, event_id — unique, so the
# ordering is total) into conversations of 8 turns. Arithmetic-only so the
# DuckDB oracle can run the byte-identical logic.

_TURNS_PER_CONV = 8

_TOOL_CASE_SQL = (
    "CASE WHEN (rn - 1) % {tpc} % 2 = 1 THEN "
    "  CASE event_type "
    "    WHEN 'click' THEN 'search' "
    "    WHEN 'view' THEN 'search' "
    "    WHEN 'signup' THEN 'signup' "
    "    WHEN 'error' THEN 'debug' "
    "    WHEN 'purchase' THEN concat('pay-', CAST(user_id % 3 AS {str_t})) "
    "  END "
    "END"
)


def transcripts_from_events(events: DataFrame) -> DataFrame:
    """events(event_id, ts, user_id, event_type, value, props) → transcripts."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    rn = F.row_number().over(w)
    df = events.withColumn("rn", rn)
    turn_idx = ((F.col("rn") - 1) % _TURNS_PER_CONV).cast("int")
    conv_seq = F.floor((F.col("rn") - 1) / _TURNS_PER_CONV).cast("long")
    conv_id = F.concat_ws("-", F.lit("conv"), F.col("user_id").cast("string"), conv_seq.cast("string"))
    role = F.when(turn_idx % 2 == 0, F.lit("user")).otherwise(F.lit("assistant"))
    tool = (
        F.when(
            turn_idx % 2 == 1,
            F.when(F.col("event_type").isin("click", "view"), F.lit("search"))
            .when(F.col("event_type") == "signup", F.lit("signup"))
            .when(F.col("event_type") == "error", F.lit("debug"))
            .when(
                F.col("event_type") == "purchase",
                F.concat(F.lit("pay-"), (F.col("user_id") % 3).cast("string")),
            ),
        )
    )
    return df.select(
        conv_id.alias("conv_id"),
        turn_idx.alias("turn_idx"),
        role.alias("role"),
        F.concat_ws(":", conv_id, turn_idx.cast("string"), role).alias("text"),
        tool.alias("tool"),
        F.col("ts"),
    )


def transcripts_from_events_sql(events_rel: str = "events", dialect: str = "duckdb") -> str:
    """The same derivation as ANSI SQL (a CTE body selecting the transcript
    columns), runnable by DuckDB on the driver's registered ``events`` view.
    """
    str_t = "VARCHAR" if dialect == "duckdb" else "STRING"
    tpc = _TURNS_PER_CONV
    tool_case = _TOOL_CASE_SQL.format(tpc=tpc, str_t=str_t)
    return f"""
    SELECT
      concat('conv-', CAST(user_id AS {str_t}), '-',
             CAST(CAST(floor((rn - 1) / {tpc}) AS BIGINT) AS {str_t})) AS conv_id,
      CAST((rn - 1) % {tpc} AS INTEGER) AS turn_idx,
      CASE WHEN (rn - 1) % {tpc} % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
      concat('conv-', CAST(user_id AS {str_t}), '-',
             CAST(CAST(floor((rn - 1) / {tpc}) AS BIGINT) AS {str_t}),
             ':', CAST(CAST((rn - 1) % {tpc} AS INTEGER) AS {str_t}),
             ':', CASE WHEN (rn - 1) % {tpc} % 2 = 0 THEN 'user' ELSE 'assistant' END) AS text,
      {tool_case} AS tool,
      ts
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM {events_rel}
    )
    """
