from pagerank_optimization_spark.functions.entities import (  # noqa: F401
    N_AGENTS,
    agent_key_expr,
    turn_entity_expr,
)
