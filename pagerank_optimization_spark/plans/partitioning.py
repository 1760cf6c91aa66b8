"""Partitioning / skew utilities (SURVEY.md §4 "skew handling" row).

Kronecker/transcript graphs are power-law: hub tools/agents concentrate a
large fraction of edges on a few keys. Spark's partial (map-side)
aggregation already flattens most groupBy skew, and AQE splits skewed join
partitions; what remains — a single reducer owning one monster key's final
combine, or one task gathering one hub's contributions — is handled here
with explicit degree-based salting (the north rule's "degree-based edge
splitting"):

- ``with_degree_salt``  every edge whose dst in-degree exceeds ``max_deg``
  gets a salt in [0, ceil(indeg/max_deg)) derived from xxhash64(src) —
  deterministic, no RNG;
- ``two_phase_contrib_sum``  groupBy(dst, salt) partial sums, then
  groupBy(dst) final — the hot key's reduce work fans out over its salts;
- ``salted_pagerank_step``  drop-in replacement for the join-agg SpMV step.

Equivalence is exact in structure (same additions, different grouping) and
tested to 1e-12 against the unsalted kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def in_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy("dst").agg(F.count("*").alias("indeg"))


def with_degree_salt(edges: DataFrame, *, max_deg: int = 10_000) -> DataFrame:
    """Adds ``salt`` (int): 0 for normal dsts; hash-spread over
    ceil(indeg/max_deg) values for hub dsts. One broadcast join against the
    |V|-sized degree table — decided once, reused every superstep."""
    deg = in_degrees(edges).filter(F.col("indeg") > max_deg)
    n_salts = F.ceil(F.col("indeg") / F.lit(max_deg)).cast("int")
    return (
        edges.join(F.broadcast(deg), "dst", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("indeg").isNotNull(),
                F.pmod(F.xxhash64("src"), n_salts).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("indeg")
    )


def two_phase_contrib_sum(salted_contribs: DataFrame, id_col: str = "entity") -> DataFrame:
    """(id, salt, contrib) → (id, contrib): partial per-salt sums, then the
    final per-id combine over ≤ n_salts rows per hub."""
    partial = salted_contribs.groupBy(id_col, "salt").agg(F.sum("contrib").alias("contrib"))
    return partial.groupBy(id_col).agg(F.sum("contrib").alias("contrib"))


def salted_pagerank_step(salted_edges: DataFrame, id_col: str = "entity"):
    """step_fn for operators.pagerank._iterate over degree-salted edges."""

    def step(ranks: DataFrame) -> DataFrame:
        contribs = (
            salted_edges.join(ranks.withColumnRenamed(id_col, "src"), "src", "inner")
            .groupBy(F.col("dst").alias(id_col), "salt")
            .agg(F.sum(F.col("weight") * F.col("pr")).alias("contrib"))
        )
        return contribs.groupBy(id_col).agg(F.sum("contrib").alias("contrib"))

    return step


# --- plan audits -------------------------------------------------------------


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def assert_column_pruned(df: DataFrame, column: str) -> None:
    """Fails if the parquet scan reads ``column`` — guards the 'graph jobs
    never deserialize text payloads' contract (SURVEY.md §4 pushdown row)."""
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line and column in line:
            raise AssertionError(f"column {column!r} not pruned from scan: {line.strip()}")


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    if "BroadcastHashJoin" not in plan and "BroadcastNestedLoopJoin" not in plan:
        raise AssertionError("expected a broadcast join in the plan")


def assert_no_single_partition_exchange(df: DataFrame) -> None:
    """Fails if the plan funnels data through ONE partition (a global
    window / global sort) — the serialize-|V|-rows-through-one-task hazard
    that makes an operator a 100 TB non-starter."""
    plan = physical_plan(df)
    if "Exchange SinglePartition" in plan:
        raise AssertionError("plan contains Exchange SinglePartition (global funnel)")


def assert_no_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    if "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan:
        raise AssertionError("expected NO broadcast join in the plan")


def assert_partial_aggregation(df: DataFrame) -> None:
    """Partial+final hash aggregation (the OpenMP array-reduction analog,
    tuned_variant_openmp.c:75-77) must be present for groupBy sums."""
    plan = physical_plan(df)
    if plan.count("HashAggregate") < 2:
        raise AssertionError("expected partial+final HashAggregate pair")
