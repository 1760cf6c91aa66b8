"""Entity derivation expressions.

Vertices of the link graph are conversation / agent / tool entities
(BASELINE.json north_star). The transcript schema is fixed to
(conv_id, turn_idx, role, text, tool, ts), so agent identity must be a
deterministic function of conv_id. We use arithmetic on the digits of
conv_id (NOT a hash builtin) so the byte-identical rule is expressible in
DuckDB SQL for the correctness oracle.

Reference semantics being reproduced: a COO entry (i, j) is an edge
j → i with out-degree counted per source (pagerank.c:125-135); entities
here play the role of the reference's int32 vertex ids (sparse.h:63-64).
"""

from __future__ import annotations

from pyspark.sql import functions as F

#: number of distinct agent identities derivable from conv_id digits
N_AGENTS = 17


def agent_key_expr(conv_id: F.Column) -> F.Column:
    """Deterministic agent entity key for a conversation: 'a<digits % 17>'."""
    digits = F.regexp_replace(conv_id, "[^0-9]", "")
    num = F.coalesce(F.nullif(digits, F.lit("")), F.lit("0")).cast("long")
    return F.concat(F.lit("a"), (num % N_AGENTS).cast("string"))


def turn_entity_expr(role: F.Column, conv_id: F.Column, tool: F.Column) -> F.Column:
    """The graph entity a turn belongs to.

    user turn       → conversation entity  'conv:<conv_id>'
    assistant turn  → agent entity         'agent:<agent_key>'
    tool turn       → tool entity          'tool:<tool>'
    """
    return (
        F.when(role == "user", F.concat(F.lit("conv:"), conv_id))
        .when(role == "assistant", F.concat(F.lit("agent:"), agent_key_expr(conv_id)))
        .otherwise(F.concat(F.lit("tool:"), tool))
    )


def entity_sql(dialect: str = "duckdb") -> str:
    """The same entity rule as a SQL expression over (conv_id, role, tool)."""
    if dialect == "duckdb":
        digits = "regexp_replace(conv_id, '[^0-9]', '', 'g')"
        str_t = "VARCHAR"
    else:
        digits = "regexp_replace(conv_id, '[^0-9]', '')"
        str_t = "STRING"
    num = f"CAST(coalesce(nullif({digits}, ''), '0') AS BIGINT)"
    return (
        "CASE role "
        "WHEN 'user' THEN concat('conv:', conv_id) "
        f"WHEN 'assistant' THEN concat('agent:a', CAST({num} % {N_AGENTS} AS {str_t})) "
        "ELSE concat('tool:', tool) END"
    )
